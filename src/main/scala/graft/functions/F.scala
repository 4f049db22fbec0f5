package graft.functions

import java.time.LocalDate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Expression helper library — the Spark equivalents of the reference's SQL
  * builder utilities and pervasive idioms.
  *
  * - qualify / top-N dedup: reference `ROW_NUMBER() … QUALIFY rn = 1`
  *   (reference: core/smartstore/api/order/models.sql:188,
  *   dbt_bigquery/models/intermediate/sales/core__sales_daily.sql:183-186).
  * - enum recode ladders (reference: core/smartstore/api/order/models.sql:91-117).
  * - minimal-partition date predicates (reference: common/load.py:232-303
  *   `expr_date_range` — date arrays coalesced into BETWEEN/IN/= clauses).
  *
  * All helpers return `Column`s / DataFrames built from
  * `org.apache.spark.sql.functions` so Catalyst codegen + pushdown apply.
  */
object F {

  /** QUALIFY-style top-N per key: keep the first `n` rows of each partition
    * under `order`. Spark has no QUALIFY; this is the canonical
    * window + filter rewrite. Order columns should include a deterministic
    * tie-breaker (the reference relies on PK ordering for stability).
    */
  def qualifyTopN(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                  n: Int = 1): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Enum-recode: CASE-ladder from a code→value map, the Spark shape of the
    * reference's 5–19-arm `CASE WHEN code='X' THEN n` ladders. For wide maps
    * this stays a codegen'd `when` chain (no UDF, no join).
    */
  def recode[V](c: Column, mapping: Seq[(String, V)],
                default: Any = null): Column = {
    val base = mapping.tail.foldLeft(when(c === lit(mapping.head._1), lit(mapping.head._2))) {
      case (acc, (k, v)) => acc.when(c === lit(k), lit(v))
    }
    base.otherwise(lit(default))
  }

  /** Inline dimension table from literal tuples — the Spark shape of the
    * reference's `SELECT * FROM UNNEST([STRUCT(…), …])` literal dims
    * (reference: core/smartstore/api/order/models.sql:210-215). Emitted as
    * `inline(array(struct(...)))` so it stays a LocalRelation the optimizer
    * folds / broadcasts for free.
    */
  def inlineDim(spark: org.apache.spark.sql.SparkSession,
                cols: Seq[String], rows: Seq[Seq[Any]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def typ(v: Any): DataType = v match {
      case _: Int => IntegerType
      case _: Long => LongType
      case _: Double => DoubleType
      case _: Boolean => BooleanType
      case _ => StringType
    }
    val schema = StructType(cols.zip(rows.head).map { case (n, v) =>
      StructField(n, typ(v), nullable = true) })
    // local-list form → a LocalRelation the optimizer can constant-fold
    // and broadcast without ever scheduling an RDD job; the parallelize
    // form planned a LogicalRDD (one distributed stage per dim build)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.map(Row(_: _*)).asJava, schema)
  }

  /** Minimal-partition predicate: coalesce a set of dates into the smallest
    * `BETWEEN` / `IN` / `=` predicate so partition pruning sees literal
    * bounds (reference: common/load.py:232-267 `expr_date_range`).
    */
  def datePredicate(c: Column, dates: Seq[LocalDate]): Column = {
    if (dates.isEmpty) return lit(false)
    val sorted = dates.distinct.sorted
    // split into runs of consecutive days
    val runs = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, d) =>
      if (acc.head.head.plusDays(1) == d) (d :: acc.head) :: acc.tail
      else List(d) :: acc
    }.map(_.reverse).reverse
    val (singles, ranges) = runs.partition(_.size == 1)
    val rangePreds = ranges.map(r =>
      c.between(lit(java.sql.Date.valueOf(r.head)), lit(java.sql.Date.valueOf(r.last))))
    val singlePred =
      if (singles.isEmpty) Nil
      else if (singles.size == 1) Seq(c === lit(java.sql.Date.valueOf(singles.head.head)))
      else Seq(c.isin(singles.map(s => java.sql.Date.valueOf(s.head)): _*))
    (rangePreds ++ singlePred).reduce(_ || _)
  }

  /** Datetime variant of [[datePredicate]] (reference:
    * common/load.py:269-303 `expr_datetime_range` — "half-open bounds"):
    * each run of consecutive days becomes one half-open
    * `[day, nextDay)` range ON THE RAW TIMESTAMP COLUMN. The point is
    * parquet pushdown: filtering `to_date(ts)` wraps the column in a
    * cast, which the parquet filter translator cannot push — the scan
    * reads every row group (q47's DataFilters-but-no-PushedFilters
    * shape). Literals are TIMESTAMP_NTZ (`LocalDateTime`), matching the
    * fixture's physical type, so no cast appears on either side and the
    * whole disjunction lands in `PushedFilters` — at 100 TB that is
    * row-group skipping vs a full-table scan. ScanAuditSpec pins this.
    */
  def datetimePredicate(c: Column, dates: Seq[LocalDate]): Column = {
    if (dates.isEmpty) return lit(false)
    val sorted = dates.distinct.sorted
    val runs = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, d) =>
      if (acc.head.head.plusDays(1) == d) (d :: acc.head) :: acc.tail
      else List(d) :: acc
    }.map(_.reverse).reverse
    runs.map { r =>
      (c >= lit(r.head.atStartOfDay)) &&
        (c < lit(r.last.plusDays(1).atStartOfDay))
    }.reduce(_ || _)
  }

  /** Exact decimal cast for money math — the engine-wide rule replacing the
    * reference's BigQuery NUMERIC semantics (SURVEY §1.2): aggregate doubles
    * through DECIMAL so sums are order-independent and bit-exact.
    */
  def dec(c: Column, precision: Int = 18, scale: Int = 2): Column =
    c.cast(s"decimal($precision,$scale)")

  /** A4 — programmatic aggregation map: `groupby(source, by, {col: how})`
    * (reference: common/load.py:638-667). `how` ∈ count/sum/avg/min/max/
    * first/last/list; first/last ignore nulls (the reference adds
    * `FILTER (WHERE col IS NOT NULL)`); `dropna` filters null group keys.
    * Output columns are named `<col>_<how>`.
    */
  def aggMap(df: DataFrame, by: Seq[Column], aggs: Seq[(String, String)],
             dropna: Boolean = false): DataFrame = {
    val exprs = aggs.map { case (c, how) =>
      val built = how match {
        case "count" => count(col(c))
        case "sum"   => sum(col(c))
        case "avg"   => avg(col(c))
        case "min"   => min(col(c))
        case "max"   => max(col(c))
        case "first" => first(col(c), ignoreNulls = true)
        case "last"  => last(col(c), ignoreNulls = true)
        case "list"  => collect_list(col(c))
        case other   => throw new IllegalArgumentException(s"unknown agg: $other")
      }
      built.as(s"${c}_$how")
    }
    val base = if (dropna) df.filter(by.map(_.isNotNull).reduce(_ && _)) else df
    base.groupBy(by: _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Null-safe optional-parameter predicate: `($p IS NULL) OR (col = $p)`
    * (reference: core/searchad/center/exposure/models.sql:35). When the
    * parameter is absent the predicate folds to `true` at plan time, so the
    * filter disappears from the physical plan entirely.
    */
  def optEquals(c: Column, v: Option[Any]): Column =
    v.map(x => c === lit(x)).getOrElse(lit(true))

  /** Cross-engine-reproducible 60-bit hash: the integer value of the first
    * 15 hex chars of md5. Strictly positive, fits a BIGINT. The same value is
    * computable in any engine with an md5 — DuckDB:
    * `('0x' || substr(md5(s), 1, 15))::BIGINT` — which makes hash-bucketed
    * operators (minhash, simhash, LSH bands) verifiable against an external
    * oracle. ~3× slower than xxhash64; prefer xxhash64 when cross-engine
    * replay is not needed.
    */
  def hash64(c: Column): Column = hash64Str(c).cast("long")

  /** Decimal-digit string form of [[hash64]] — feed this to seeded
    * re-hashing so the variable-length input is md5'd only once.
    */
  def hash64Str(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10)

  /** Per-column data profile in long form: (column, n_rows, n_nonnull,
    * n_distinct) — the reference's table probes (A6) generalized into one
    * statement. All counts are exact (multiple COUNT(DISTINCT)s compile to
    * one expand+aggregate stage, not one job per column); the wide result
    * row is unpivoted with `stack`. Min/max are deliberately omitted:
    * heterogeneous columns would force string rendering, which is not
    * stable across engines for floating point.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    val aggs = cs.flatMap(c => Seq(
      count(lit(1)).as(s"__n_$c"),
      count(col(c)).as(s"__nn_$c"),
      count_distinct(col(c)).as(s"__d_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // backtick-quote the spliced aliases and escape the label literal —
    // column names with spaces/dashes/quotes are legal in Spark
    def lbl(c: String): String = "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    def bq(a: String): String = "`" + a.replace("`", "``") + "`"
    wide.select(expr(
      s"stack(${cs.size}, " +
        cs.map(c => s"${lbl(c)}, ${bq(s"__n_$c")}, ${bq(s"__nn_$c")}, ${bq(s"__d_$c")}")
          .mkString(", ") +
        ") AS (column, n_rows, n_nonnull, n_distinct)"))
  }

  /** Align a frame to a target schema before a keyed write — the implicit
    * contract of every reference `bulk_insert` (staged columns must line up
    * with the declared table): missing columns materialize as typed nulls,
    * extra columns are dropped, order follows the target, and present
    * columns are cast (CAST, not TRY_CAST — a type mismatch at the load
    * boundary should fail loudly; TRY_CAST belongs in staging projections).
    */
  def alignSchema(df: DataFrame,
                  target: org.apache.spark.sql.types.StructType): DataFrame = {
    // match case-insensitively, like Spark's own column resolution — a
    // source header "Amount" must feed a target "amount", not become null
    val byLower = df.columns.groupBy(_.toLowerCase)
    df.select(target.fields.toIndexedSeq.map { f =>
      byLower.get(f.name.toLowerCase) match {
        case Some(Array(src)) => df(src).cast(f.dataType).as(f.name)
        case Some(many) => throw new IllegalArgumentException(
          s"ambiguous source columns ${many.mkString(",")} for target ${f.name}")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** Deterministic dataset split for training pipelines: each row lands in a
    * named bucket by the cross-engine hash of its id — stable across runs,
    * engines, partitioning, and cluster layout (a `rand()`-based split is
    * none of those). `fractions` are integer percents summing to 100.
    */
  def hashSplit(idCol: Column, fractions: Seq[(String, Int)]): Column = {
    require(fractions.map(_._2).sum == 100,
      s"fractions must sum to 100, got ${fractions.map(_._2).sum}")
    val b = pmod(hash64(idCol), lit(100))
    fractions.tail.foldLeft(
      (when(b < fractions.head._2, fractions.head._1), fractions.head._2)) {
      case ((c, acc), (name, pct)) => (c.when(b < acc + pct, name), acc + pct)
    }._1
  }

  /** Lazily install a JVM-lifetime checkpoint dir (removed on shutdown).
    * (ContextCleaner GC of individual checkpoints needs spark.cleaner.
    * referenceTracking.cleanCheckpoints=true AT context build — it cannot
    * be enabled retroactively; production deployments set their own
    * durable checkpoint dir + that flag and own retention.)
    */
  private[graft] def ensureCheckpointDir(
      sc: org.apache.spark.SparkContext): Unit =
    if (sc.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      sc.setCheckpointDir(dir.toString)
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        try {
          val walk = java.nio.file.Files.walk(dir)
          try walk.iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
          finally walk.close()
        } catch { case _: Exception => }
      }
    }

  /** Reliable checkpoint for a frame consumed by SEVERAL plan branches.
    * Catalyst's column pruning pushes a different projection into each
    * consumer's copy of the subtree, so ReuseExchange never matches and
    * an expensive shared frame (a windowed dedup, a shingle table) is
    * recomputed once per consumer. Checkpointing materializes it once;
    * values are unchanged (the input must be deterministic, which every
    * graft frame is by construction).
    */
  def checkpointShared(df: DataFrame): DataFrame = {
    // LOCAL checkpoint (round-15): same plan truncation and the same
    // safety property as the reliable form — a lost block is an ERROR,
    // never a silent recompute under a fresh partitioner — without the
    // disk write + read-back (q112's build time was dominated by these
    // eager materializations). The block-loss availability trade
    // (executor loss fails the job instead of recomputing) is the one
    // the engine's iterative operators already make; a deployment
    // wanting durability swaps this for df.checkpoint() with a durable
    // checkpoint dir.
    df.localCheckpoint(true)
  }

  /** W2 at scale — global ROW_NUMBER without the single-partition window:
    * range-repartition on the order keys (a total order across partitions,
    * since `order` must end in a unique tiebreaker), ROW_NUMBER within each
    * range bucket, then add per-bucket cumulative offsets computed over the
    * `buckets`-row count table (a broadcast self-join, no global window
    * anywhere). Output values are identical to `Window.orderBy(order)` but
    * the sort is distributed across `buckets` tasks.
    *
    * The ranked frame feeds BOTH the output rows and the offsets table, and
    * its `__bucket` comes from `spark_partition_id()` over RangePartitioner
    * sampling — so the two consumers MUST read one materialized evaluation.
    * A `persist()` is not a guarantee: under memory pressure + executor
    * loss the cache silently drops and each consumer recomputes under a
    * freshly sampled partitioner — `__bucket` values from one partitioning
    * meeting `__offset`s from another is silently-wrong ranks. An eager
    * reliable CHECKPOINT is: both consumers read the checkpointed files,
    * and a lost file is an error, never a recompute. (If no checkpoint dir
    * is configured — production clusters point it at durable storage — a
    * local temp dir is used, which matches local/test deployments.)
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String,
                      buckets: Int = 32): DataFrame = {
    val ranged = df.repartitionByRange(buckets, order: _*)
      .withColumn("__bucket", spark_partition_id())
    val w = Window.partitionBy(col("__bucket")).orderBy(order: _*)
    // localCheckpoint(true) keeps the property the scaladoc demands —
    // both consumers read ONE materialized evaluation, and a lost block
    // can only fail, never resample the partitioner — without the disk
    // round-trip (round-15; see checkpointShared)
    val ranked = ranged.withColumn("__rn", row_number().over(w))
      .localCheckpoint(true)
    val counts = ranked.groupBy(col("__bucket")).agg(count(lit(1)).as("__cnt"))
    val offsets = counts.alias("a")
      .join(counts.alias("b"), col("b.__bucket") < col("a.__bucket"), "left")
      .groupBy(col("a.__bucket").as("__bucket"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__offset"))
    ranked.join(broadcast(offsets), "__bucket")
      .withColumn(out, (col("__rn") + col("__offset")).cast("long"))
      .drop("__bucket", "__rn", "__offset")
  }
}
