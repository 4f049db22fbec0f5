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

final class ModelContext(spark: SparkSession, registry: ModelRegistry,
                         val params: Params,
                         cache: mutable.Map[String, DataFrame]) {
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
    val seen = cache.contains(name)
    val df = cache.getOrElseUpdate(name,
      registry.build(name, spark, params, cache))
    if (seen && df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist()
    df
  }
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
                            cache: mutable.Map[String, DataFrame]): DataFrame = {
    val ctx = new ModelContext(spark, this, params, cache)
    apply(name).build(ctx)
  }

  /** Compute a model (and its dep subtree) for the given params. */
  def run(name: String, spark: SparkSession,
          params: Params = Params()): DataFrame =
    build(name, spark, params, mutable.Map.empty)

  /** Materialize a model to a warehouse path according to its policy.
    * Incremental models overwrite exactly the partitions present in the
    * batch (empty-batch short-circuit included).
    */
  def materialize(name: String, spark: SparkSession, path: String,
                  params: Params = Params()): Unit = {
    val df = run(name, spark, params)
    apply(name).materialization match {
      case View =>
        df.createOrReplaceTempView(name)
      case Incremental(partitionCol) =>
        graft.sources.Sinks.overwritePartitions(df, path, Seq(partitionCol))
    }
  }
}
