package graft.models

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Analytics model DAG — the engine's equivalent of the reference's dbt
  * layer (SURVEY §3.3): named models with explicit dependency edges, a
  * `ref()` resolver, and three materialization policies:
  *
  * - View: computed on demand, shared within a run (dbt `view` /
  *   ephemeral CTE).
  * - Incremental(partitionCol): written with dynamic partition overwrite —
  *   only the partitions present in the batch are replaced (dbt
  *   `incremental` + `insert_overwrite`, reference
  *   core__sales_daily.sql:1-14 / incremental_partitions.sql:1-14).
  * - ParamFn: a parameterized model — the TVF materialization
  *   (reference materializations.sql:14-17; PG emulation
  *   table_functions.sql:9-90). In Scala a TVF is just a function; the
  *   probe/`CREATE FUNCTION` machinery disappears. TVFs composing TVFs
  *   (profit_mom → profit_base) is plain `ref` composition.
  *
  * Scale: the registry resolves refs lazily and caches per run, so a model
  * shared by N downstreams is planned once; Catalyst then sees one DAG and
  * reuses exchanges across the shared subtree.
  */
final case class Params(values: Map[String, String] = Map.empty) {
  def apply(key: String): String = values(key)
  def get(key: String): Option[String] = values.get(key)
}

sealed trait Materialization
case object View extends Materialization
final case class Incremental(partitionCol: String) extends Materialization

/** Per-run mutable state: the ref() memo map plus every DataFrame this
  * run persisted (ref promotions AND operator-local persists routed
  * through [[ModelContext.track]]), so the run's cached blocks can be
  * released deterministically instead of waiting for a session-wide
  * cache clear (round-15 directive 3 — in a long multi-query session
  * run-scoped blocks otherwise accumulate until LRU/quiesce).
  */
private[models] final class RunState {
  val cache: mutable.Map[String, DataFrame] = mutable.Map.empty
  private val persisted = mutable.ArrayBuffer.empty[DataFrame]
  def track(df: DataFrame): DataFrame = { persisted += df; df }
  def release(): Unit = {
    persisted.foreach(_.unpersist(blocking = false))
    persisted.clear()
  }
}

final class ModelContext(spark: SparkSession, registry: ModelRegistry,
                         val params: Params,
                         state: RunState) {
  def session: SparkSession = spark
  /** dbt-style ref: resolve a dependency model within this run.
    *
    * A model ref'd by SEVERAL consumers is persisted on its second ref:
    * the cached DataFrame object is shared, but Catalyst INLINES its
    * plan into every consumer and column pruning de-canonicalizes the
    * copies, so ReuseExchange never fires and the shared subtree is
    * recomputed once per consumer (r14 plan audit: q138 carried 62
    * inlined scans, zero reused exchanges). Persisting exactly the
    * multiply-ref'd models is the dbt-view-to-table promotion decided
    * by observed fan-out; single-consumer models stay lazy views. The
    * persist is per-run and lazy — every bench/oracle invocation still
    * computes from the parquet inputs.
    */
  def ref(name: String): DataFrame = {
    val seen = state.cache.contains(name)
    val df = state.cache.getOrElseUpdate(name,
      registry.build(name, spark, params, state))
    if (seen && df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      state.track(df.persist())
    df
  }
  /** Register an operator-local run-scoped persist for release with the
    * rest of the run's cache (call as `ctx.track(frame.persist())` or
    * `ctx.track(frame).persist()` — tracking is by reference, only the
    * persist/unpersist pairing matters).
    */
  def track(df: DataFrame): DataFrame = state.track(df)
}

final case class Model(name: String, deps: Seq[String],
                       materialization: Materialization,
                       build: ModelContext => DataFrame)

final class ModelRegistry {
  private val models = mutable.LinkedHashMap.empty[String, Model]

  def register(model: Model): this.type = {
    require(!models.contains(model.name), s"duplicate model ${model.name}")
    models += model.name -> model
    this
  }

  def apply(name: String): Model =
    models.getOrElse(name, throw new NoSuchElementException(s"model $name"))

  def names: Seq[String] = models.keys.toSeq

  /** Topological order of `name` and its transitive deps; cycles rejected. */
  def topo(name: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val state = mutable.Map.empty[String, Int] // 1=visiting, 2=done
    def visit(n: String): Unit = state.getOrElse(n, 0) match {
      case 2 =>
      case 1 => throw new IllegalStateException(s"cycle at $n")
      case _ =>
        state(n) = 1
        apply(n).deps.foreach(visit)
        state(n) = 2
        out += n
    }
    visit(name)
    out.toSeq
  }

  private[models] def build(name: String, spark: SparkSession, params: Params,
                            state: RunState): DataFrame = {
    val ctx = new ModelContext(spark, this, params, state)
    apply(name).build(ctx)
  }

  /** Compute a model (and its dep subtree) for the given params.
    *
    * The result is LAZY, and run-scoped persists (ref promotions,
    * tracked operator persists) must outlive the caller's action — so
    * this overload cannot release them itself; they are freed by the
    * caller's quiesce (Bench/Verify clear caches between queries) or
    * session end. A caller that controls its own action should prefer
    * [[runReleasable]] and invoke the release handle after it.
    */
  def run(name: String, spark: SparkSession,
          params: Params = Params()): DataFrame =
    build(name, spark, params, new RunState)

  /** [[run]] plus a release handle that unpersists every frame the run
    * persisted — call it AFTER the action that consumes the DataFrame.
    */
  def runReleasable(name: String, spark: SparkSession,
                    params: Params = Params()): (DataFrame, () => Unit) = {
    val state = new RunState
    val df = build(name, spark, params, state)
    (df, () => state.release())
  }

  /** Materialize a model to a warehouse path according to its policy.
    * Incremental models overwrite exactly the partitions present in the
    * batch (empty-batch short-circuit included). Materialization is
    * EAGER for Incremental models, so the run's persisted frames are
    * released before returning (round-15 directive 3); a View
    * registration stays lazy and keeps its run cache alive with the
    * temp view.
    */
  def materialize(name: String, spark: SparkSession, path: String,
                  params: Params = Params()): Unit = {
    val (df, release) = runReleasable(name, spark, params)
    apply(name).materialization match {
      case View =>
        df.createOrReplaceTempView(name)
      case Incremental(partitionCol) =>
        try graft.sources.Sinks.overwritePartitions(df, path,
          Seq(partitionCol))
        finally release()
    }
  }
}
