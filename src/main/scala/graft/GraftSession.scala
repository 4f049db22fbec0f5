package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession factory: the scale-relevant session confs a
  * production deployment of this library wants, in one audited place —
  * the Spark-side analog of the reference's per-warehouse client setup
  * (reference: extensions/bigquery.py:33-76, extensions/postgres.py:33-60
  * centralize connection/session options per engine).
  *
  * Deliberately session-scoped only: master, executor memory, and cluster
  * parallelism belong to spark-submit / the cluster manager, so
  * [[defaults]] decorates a caller-owned builder instead of hiding one.
  *
  * What is set, and why it matters at 100 TB:
  * - AQE + partition coalescing + skew-join: runtime re-planning fixes
  *   the two failure modes no static plan survives at scale — thousands
  *   of near-empty post-shuffle partitions, and one hot key holding a
  *   stage at 99%.
  * - Parquet filter AND aggregate pushdown: scan-level pruning; footer
  *   MIN/MAX/COUNT answers metadata-shaped queries without reading data
  *   pages (aggregate pushdown ships disabled by default).
  * - UTC session time zone: date predicates and timestamp arithmetic
  *   resolve identically on every executor regardless of machine locale —
  *   the engine's date helpers (F.datePredicate) assume it.
  * - Bucketed scans stay bucketed: every catalog-bucketed table this
  *   engine writes (the BM25 serving index, the streaming dedup index,
  *   `writeBucketed` fact tables) exists to be PROBED — bucket pruning
  *   on IN-list probes and exchange-free bucketed joins both require the
  *   scan to honor the layout. Spark's auto-disable rule would silently
  *   drop the layout (and with it the pruning) for any probe it plans as
  *   a broadcast join, so it is off. The trade — a non-beneficial read
  *   of a bucketed table gets one task per bucket instead of splitting —
  *   is the bucketed-layout contract working as designed.
  * - [[graft.plans.GraftExtensions]]: the native vector expressions
  *   (`graft_dot`) registered for SQL use next to the Column API.
  */
object GraftSession {

  /** Apply graft's session defaults to a caller-owned builder. */
  def defaults(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.plans.GraftExtensions())
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")

  /** Fresh builder with the defaults applied. */
  def builder(appName: String = "graft"): SparkSession.Builder =
    defaults(SparkSession.builder().appName(appName))
}
