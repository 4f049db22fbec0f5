package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog over the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's logical `{table_key: table_name}` registry
  * (reference: src/linkmerce/common/transform.py:390,677) — but here the
  * physical layout is parquet-per-table under a scale-factor directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Fact-side tables whose scans feed CPU-heavy per-row pipelines
    * (TRY_CAST ladders, regex staging, shingling + per-shingle hashing,
    * vector math). Dims (region/nation/supplier/customer/part) stay
    * unspread — they broadcast, and a fan-out exchange before a
    * broadcast build is pure overhead.
    */
  private val spreadNames = Set(
    "lineitem", "orders", "events", "documents", "embeddings")

  /** Key column for the ROW-COUNT-HEAVY spread tables: their fan-out
    * repartition hashes on it instead of going round-robin. Round-robin
    * pays a local sort of the FULL rows before the exchange
    * (SPARK-23207's determinism sort — r14 measurement: +0.63s per
    * lineitem materialization at sf0.1, ~half the spread's cost); a hash
    * on a high-cardinality key is deterministic under task retry BY
    * VALUE (guide §2.5), needs no sort, and spreads evenly when
    * distinct keys >> partitions (>= 150k vs 32 here).
    *
    * documents/embeddings (5k/8k rows, heavy per-row CPU) were A/B'd
    * keyed vs round-robin — repeated-run mins overlap (q158 reached
    * 1.86s keyed vs 1.69s RR; q40 1.05 keyed vs 1.33 RR), i.e. the
    * choice is inside box noise for small tables — so they take the
    * same keyed form for uniformity and retry-determinism.
    *
    * INVARIANT: every spread key is its table's primary key and NON-NULL
    * by fixture construction — hash partitioning sends all null keys to
    * ONE partition, silently defeating the fan-out this exists for. A
    * table whose key can be null must not be added here (fall back to
    * the keyless round-robin branch instead).
    */
  private val spreadKey = Map(
    "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
    "events" -> "event_id", "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  /** A parquet file is split by byte range, but rows land in the split
    * holding their row group — a single-row-group file is ONE task no
    * matter what maxPartitionBytes says, and everything narrow above the
    * scan (projections, filters, explodes) runs on one core. When the
    * planned scan has fewer splits than the session's parallelism, fan
    * out once with an explicit-width hash repartition on the table's key
    * (see [[spreadKey]]): a narrow one-pass shuffle of the raw columns,
    * exempt from AQE coalescing (REPARTITION_BY_NUM origin). On a
    * production-size table the scan already has >= parallelism splits
    * and no exchange is inserted.
    */
  private def spread(spark: SparkSession, df: DataFrame,
                     name: String): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < target)
      spreadKey.get(name) match {
        case Some(k) =>
          df.repartition(target, org.apache.spark.sql.functions.col(k))
        case None => df.repartition(target)
      }
    else df
  }

  /** Memoized logical table per (session, dir, name) — METADATA only.
    * Every `apply` used to re-read the parquet footer (schema) and
    * re-plan the scan (the spread check's `toRdd`); a model-DAG query
    * references the same tables many times, so driver-side build time
    * was 15-45% of measured query cost at bench scale (r14 measurement:
    * q132 spent 1.1s of 2.5s constructing plans). The cached value is a
    * lazy DataFrame — a view; every action still scans the parquet
    * files, so results are computed from the inputs on every run (this
    * is a catalog, not a result cache). Keyed by session identity: the
    * spread width depends on the session's parallelism.
    *
    * INVARIANT (round-15 directive 8): source tables are immutable for
    * the lifetime of a session — the memoized plan snapshots the file
    * listing and schema at first `apply`, so a fixture dir rewritten
    * in-session would be served stale. Every writer in this repo
    * (Fixtures.buildOnce, test fixtures) writes to a fresh versioned
    * root, never over a dir a live session has read. Entries are
    * evicted when their session's SparkContext stops (listener below),
    * so suite-scoped sessions no longer pin DataFrames for the JVM
    * lifetime.
    */
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()

  /** Sessions whose context already carries the eviction listener. */
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  private def hookEviction(spark: SparkSession): Unit =
    if (hooked.add(spark))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = {
            hooked.remove(spark)
            val it = memo.keySet.iterator()
            while (it.hasNext) if (it.next()._1 eq spark) it.remove()
          }
        })

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    hookEviction(spark)
    memo.computeIfAbsent((spark, dir, name),
      _ => build(spark, dir, name))
  }

  private def build(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet has carried different physical types for `ts` across
    // generations of the fixture: TIMESTAMP(NANOS) (which Spark's reader
    // only accepts as raw long via the legacy conf) and TIMESTAMP(MICROS)
    // (read natively). Be schema-adaptive, like the reference's ingestion
    // (TRY_CAST everywhere; read_json_auto — reference:
    // src/linkmerce/common/load.py:426): set the nanos-as-long conf (a
    // no-op for micros files), then branch on the dtype actually read.
    val df = if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.expr
      import org.apache.spark.sql.types.LongType
      if (raw.schema("ts").dataType == LongType)
        // integer `div`, not `/`: ns epochs exceed 2^53, double division
        // would lose microseconds
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")
    if (spreadNames(name)) spread(spark, df, name) else df
  }

  /** Register every catalog table as a session temp view so the whole
    * fixture is queryable through plain `spark.sql` (and the GraftSql
    * front end) next to the DataFrame API — the Spark shape of the
    * reference's `{table_key: table_name}` registry binding
    * (transform.py:390,677 resolves logical names inside SQL templates).
    * Registration is metadata-scale but NOT free: every table's parquet
    * footer is read (schema) and its scan planned (the spread check), so
    * all 10 files must exist; table DATA stays unread until a query
    * actually references the view.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
