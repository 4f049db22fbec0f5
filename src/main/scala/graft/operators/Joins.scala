package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join library — the reference's non-trivial join shapes (SURVEY §2.3).
  *
  * Scale notes baked into each operator:
  * - temporal/validity joins broadcast the (small) relation side; the fact
  *   side never shuffles (reference joins a handful of validity rows against
  *   day-partitioned facts).
  * - rolling-interval joins are offered in two forms: the faithful range join
  *   (O(days×facts) BNLJ if unpartitioned — only safe broadcast-small) and a
  *   window `rangeBetween` rewrite that is a single sort within partitions —
  *   the form to use at 100 TB.
  */
object Joins {

  /** J3 — multi-key + temporal-validity join:
    * `ON a.k = b.k AND a.ymd BETWEEN b.start_date AND b.end_date`
    * (reference: dbt_bigquery/models/intermediate/ads/searchad__insight_daily.sql:99-114;
    * relation__ad_id_to_ranged_sbn_ids.sql:17-96).
    * The validity relation is broadcast: equi-keys hash-match first, the
    * range predicate filters within the hash bucket — no sort-merge, no
    * cartesian.
    */
  def temporalJoin(fact: DataFrame, rel: DataFrame, keys: Seq[String],
                   factDate: Column, relStart: Column, relEnd: Column,
                   joinType: String = "left"): DataFrame = {
    val range = factDate.between(relStart, relEnd)
    val cond = keys.map(k => fact(k) === rel(k)).foldRight(range)(_ && _)
    fact.join(broadcast(rel), cond, joinType)
  }

  /** J4 — rolling window via `rangeBetween`: exact rewrite of the reference's
    * `qty.order_date BETWEEN ymd - 30d AND ymd - 1d` interval join
    * (reference: dbt_bigquery/models/intermediate/sales/core__sold_qty_30d_daily.sql:114-119)
    * when the scaffold is dense daily dates. One shuffle on the key, one sort
    * — survives any scale; the range-join form does not.
    *
    * `dateCol` must be castable to days-since-epoch (DateType).
    */
  def rollingSumByDays(df: DataFrame, partition: Seq[Column], dateCol: Column,
                       value: Column, daysBack: Int, out: String): DataFrame = {
    val w = Window.partitionBy(partition: _*)
      .orderBy(unix_date(dateCol.cast("date")))
      .rangeBetween(-daysBack, -1)
    df.withColumn(out, sum(value).over(w))
  }

  /** J5 — band join: `fact.qty BETWEEN band.lo AND band.hi` with bands built
    * by LEAD (reference: smartstore__sales_daily.sql:20-34,298-300). Bands
    * are tiny → broadcast; the fact side streams through unshuffled.
    */
  def bandJoin(fact: DataFrame, bands: DataFrame, value: Column,
               lo: Column, hi: Column, joinType: String = "left"): DataFrame =
    fact.join(broadcast(bands), value.between(lo, hi), joinType)

  /** Build contiguous bands from per-row lower bounds using LEAD: each row's
    * upper bound is next lower bound - 1, last band open-ended
    * (reference: smartstore__sales_daily.sql:20-34).
    */
  def leadBands(df: DataFrame, partition: Seq[Column], loCol: Column,
                outHi: String, openEnd: Long = Long.MaxValue): DataFrame = {
    val w = Window.partitionBy(partition: _*).orderBy(loCol)
    df.withColumn(outHi, coalesce(lead(loCol, 1).over(w) - 1, lit(openEnd)))
  }

  /** Big-big range join: `fact.v BETWEEN ranges.lo AND ranges.hi` where
    * NEITHER side fits in a broadcast (temporalJoin/bandJoin require one).
    * Both sides quantize onto a fixed-width grid: each range row replicates
    * to every grid bucket it overlaps (cost = range-length / bucketWidth
    * rows), each fact row maps to its single bucket, and the join becomes a
    * hash EQUI-join on the bucket id plus the exact range predicate. A fact
    * can only meet a matching range in the fact's own bucket, so no
    * post-join dedup is needed. No broadcast, no nested loop — one shuffle
    * on a well-distributed grid key; pick `bucketWidth` near the typical
    * range length so replication stays O(1) per range.
    *
    * Columns must be numeric in shared units (dates → `unix_date` days).
    */
  def bucketedRangeJoin(fact: DataFrame, factVal: Column,
                        ranges: DataFrame, lo: Column, hi: Column,
                        bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // bucket key = the bucket's start value, computed with exact integer
    // arithmetic (pmod-subtract) — `floor(v / w)` goes through a double
    // quotient, which mis-buckets values above 2^53 (e.g. nanosecond
    // epochs). pmod is non-negative, so negative values floor-align too.
    def bucketOf(c: Column): Column = {
      val v = c.cast("long")
      v - pmod(v, lit(bucketWidth))
    }
    val f = fact.withColumn("__bucket", bucketOf(factVal))
    // malformed ranges (hi < lo) must match nothing, as BETWEEN would —
    // an unguarded sequence(lo, hi) throws on a descending bound and
    // fails the whole job on one bad row
    val r = ranges.filter(lo <= hi).withColumn("__bucket",
      explode(sequence(bucketOf(lo), bucketOf(hi), lit(bucketWidth))))
    f.join(r, f("__bucket") === r("__bucket") && factVal.between(lo, hi))
      .drop("__bucket")
  }

  /** As-of join: for each left row, the single right row with the same key
    * and the greatest `rightTs <= leftTs` (inclusive — standard ASOF
    * semantics). Spark has no native ASOF JOIN and the range-join
    * formulation is quadratic per key; this is the scale rewrite: tag and
    * UNION both sides, one window sort per key carries the latest right row
    * forward (right rows sort before left rows at equal ts, giving the
    * inclusive bound), then keep left rows. One shuffle + one sort at any
    * size. The right side is pre-deduped to one row per (keys, ts) —
    * deterministically, largest value-struct wins — since ASOF is ambiguous
    * under duplicate timestamps. The carried row is one struct, so right
    * columns stay atomic (no per-column carry mixing rows).
    *
    * Output: all left columns ++ `asofTsOut` (matched right ts, null when
    * no right row precedes) ++ `rightValues`. `rightValues` must not
    * collide with left column names.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightValues: Seq[String],
               asofTsOut: String = "asof_ts"): DataFrame = {
    require((rightValues :+ asofTsOut).intersect(left.columns.toSeq).isEmpty,
      s"right value columns ${(rightValues :+ asofTsOut).mkString(",")} collide with left")
    val rDeduped = graft.functions.F.qualifyTopN(
      right.select((keys :+ rightTs).map(col) ++ rightValues.map(col): _*),
      (keys :+ rightTs).map(col),
      // with no value columns the partition rows are identical — any
      // non-empty order keeps the window legal and the pick trivial
      if (rightValues.nonEmpty) rightValues.map(col(_).desc)
      else Seq(col(rightTs)))
    import org.apache.spark.sql.types.{StructField, StructType}
    val rPayload = struct(col(rightTs).as(asofTsOut) +: rightValues.map(col): _*)
    val rPayloadType = StructType(
      StructField(asofTsOut, right.schema(rightTs).dataType) +:
        rightValues.map(c => right.schema(c)))
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lStructType = StructType(left.schema.fields)
    val lTagged = left.select(
      keys.map(col) :+ col(leftTs).as("__ts") :+ lit(0).as("__isR") :+
        lStruct.as("__l") :+ lit(null).cast(rPayloadType).as("__r"): _*)
    val rTagged = rDeduped.select(
      keys.map(col) :+ col(rightTs).as("__ts") :+ lit(1).as("__isR") :+
        lit(null).cast(lStructType).as("__l") :+ rPayload.as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isR").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__isR") === 0)
      .select(left.columns.map(c => col(s"__l.$c")) ++
        (col(s"__m.$asofTsOut").as(asofTsOut) +:
          rightValues.map(c => col(s"__m.$c").as(c))): _*)
  }

  /** Skew-safe two-phase aggregation: partial-aggregate on (key, salt) —
    * spreading a hot key over `buckets` reducers — then final-aggregate on
    * the key. `partials` must be decomposable aggregates expressed over the
    * salted stage's outputs (sum-of-sums, sum-of-counts, …).
    *
    * AQE handles skewed *joins* automatically, but a groupBy with one
    * dominant key still funnels into a single reducer; salting is the
    * explicit fix (SURVEY §"Optimize for scale": salting for skew).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[Column], buckets: Int,
                      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    // Salt derives from row CONTENT, never from spark_partition_id /
    // monotonically_increasing_id: those recompute differently when a stage
    // retries after a fetch failure (SPARK-23207 class), silently dropping
    // or duplicating rows in the salted aggregation — at exactly the cluster
    // scale salting exists for. Hashing all hashable columns spreads rows of
    // a hot key; exact-duplicate rows sharing a bucket costs balance, not
    // correctness.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(hashableCols(df): _*), lit(buckets)))
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    partial.groupBy(keys: _*).agg(finals.head, finals.tail: _*)
  }

  /** Skew-safe broadcast-style join against a small dimension when the
    * fact side has hot keys and the dim cannot be broadcast whole: the dim
    * is replicated `buckets` times with a salt column, the fact side gets a
    * random-but-deterministic salt, and the join key becomes (key, salt) —
    * hot fact keys spread across `buckets` tasks instead of one.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    // content-derived salt — deterministic across task/stage retries
    // (see saltedAggregate)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(hashableCols(fact): _*), lit(buckets)))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Hot-key-bounded skew join — [[saltedJoin]]'s production form when
    * BOTH sides are too large to replicate whole: only keys whose fact
    * frequency exceeds `hotThreshold` pay the salt/replicate treatment
    * (the hot-key list is one aggregate, expected tiny, and broadcast);
    * every other key takes the ordinary shuffled equi-join. This is
    * what AQE's skew-join split does at runtime, expressed statically
    * so the plan is deterministic and the hot set is auditable; the
    * result set is IDENTICAL to a plain inner join by construction
    * (q231's oracle states it as one).
    *
    * Scale: cold path = one shuffle each side; hot path = the salted
    * bucketing over only `|hotKeys| × |dim rows of hot keys| × buckets`
    * replicas. Hot-key detection adds one pre-aggregate over the fact's
    * key column (map-side partials, ~distinct-key-count rows shuffled).
    */
  def skewJoin(fact: DataFrame, dim: DataFrame, key: String,
               buckets: Int, hotThreshold: Long): DataFrame = {
    require(buckets >= 1 && hotThreshold >= 1, "bad skewJoin params")
    val hot = fact.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > hotThreshold).select(col(key))
    val coldJoined = fact.join(broadcast(hot), Seq(key), "left_anti")
      .join(dim.join(broadcast(hot), Seq(key), "left_anti"), Seq(key))
    val hotJoined = saltedJoin(
      fact.join(broadcast(hot), Seq(key), "left_semi"),
      dim.join(broadcast(hot), Seq(key), "left_semi"),
      key, buckets)
    coldJoined.unionByName(hotJoined)
  }

  /** Blocked fuzzy (edit-distance) join — the scalable form of the
    * reference's product/option NAME matching problem (its 3-strategy
    * matcher, relation__smt_opt_to_sbn_ids.sql:76-84, falls back to
    * space-stripped equality; this operator generalizes to bounded
    * Levenshtein). All-pairs edit distance is quadratic, so candidates
    * are BLOCKED first on a cheap equi-key — (first character, length
    * band) — and only same-block pairs pay the `levenshtein` verify.
    * Blocking is a recall contract, not a heuristic accident: a match is
    * found iff the pair shares first char and `floor(len / bandWidth)`
    * band, documented so an oracle can replay it exactly. One hash
    * shuffle on the block key; block sizes are bounded by the key's
    * selectivity (tune `bandWidth` for skewed length distributions).
    *
    * Output: left id/name, right id/name, dist — pairs with
    * `dist <= maxDist` only.
    */
  def fuzzyNameJoin(left: DataFrame, leftId: Column, leftName: Column,
                    right: DataFrame, rightId: Column, rightName: Column,
                    maxDist: Int = 2, bandWidth: Int = 4): DataFrame = {
    require(maxDist >= 0 && bandWidth >= 1, "bad fuzzyNameJoin params")
    def norm(c: Column) = lower(trim(c))
    def block(n: Column) = struct(
      substring(n, 1, 1).as("c0"),
      floor(length(n) / lit(bandWidth)).cast("long").as("lb"))
    val l = left.select(leftId.as("left_id"), norm(leftName).as("left_name"))
      .withColumn("__b", block(col("left_name")))
    val r = right.select(rightId.as("right_id"),
        norm(rightName).as("right_name"))
      .withColumn("__b", block(col("right_name")))
    l.join(r, "__b")
      .withColumn("dist",
        levenshtein(col("left_name"), col("right_name")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("left_id"), col("left_name"), col("right_id"),
        col("right_name"), col("dist"))
  }

  /** Columns usable as salt input: xxhash64 rejects MapType (maps have no
    * canonical element order), so map-typed columns are excluded. Requires
    * unique column names (`col(name)` is ambiguous otherwise).
    */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    require(df.columns.distinct.length == df.columns.length,
      s"salting requires unique column names, got ${df.columns.mkString(",")}")
    val ok = df.schema.fields.filterNot(f => hasMap(f.dataType))
      .map(f => df(f.name)).toSeq
    // all-map frame: degenerate single bucket (correct, just unspread)
    if (ok.nonEmpty) ok else Seq(lit(0L))
  }
}
