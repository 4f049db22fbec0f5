package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** Deterministic, cross-engine-replayable sketches for corpus profiling
  * at scale. Classic probabilistic sketches (HLL, SpaceSaving) give
  * engine-dependent answers — useless under an exact oracle gate and
  * irreproducible across runs. Both operators here instead derive their
  * randomness from the content itself via the md5 60-bit hash family
  * (`F.hash64`), so the estimate is a pure function of the data: the same
  * corpus gives the same answer in Spark, in DuckDB, and on any cluster
  * size.
  *
  * The reference has no sketch layer (its profiling probes are exact
  * COUNT(DISTINCT) passes, common/transform.py's probe helpers); these
  * are the scale path for the same questions on corpora where an exact
  * pass per question is too expensive.
  */
object Sketches {

  private val HashSpace = math.pow(2.0, 60.0) // F.hash64 values are 60-bit

  /** KMV (k-minimum-values) distinct-count estimate: hash every key,
    * keep the k smallest DISTINCT hash values, estimate
    * `(k-1) * 2^60 / h_k`. Two-phase, bounded-state: each input partition
    * streams through a size-k ordered set (O(k) memory, one pass, no
    * per-partition materialization of the distinct key space), emits its
    * local k smallest distinct hashes, and only those ~numPartitions*k
    * survivors are merged globally — the full key space is never
    * shuffled, unlike an exact COUNT(DISTINCT).
    *
    * Returns one row: (k_used, kth_min_hash, n_distinct_est). For inputs
    * with fewer than k distinct keys the estimate degrades to the exact
    * distinct count (all hashes retained).
    */
  def kmvDistinct(df: DataFrame, key: Column, k: Int = 1024): DataFrame = {
    require(k > 1, "k must be > 1")
    import df.sparkSession.implicits._
    val localTopK = df.select(F.hash64(key).as("__h"))
      .filter(col("__h").isNotNull)
      .as[Long]
      .mapPartitions { it =>
        val s = scala.collection.mutable.TreeSet.empty[Long]
        it.foreach { h =>
          if (s.size < k) s.add(h)
          else if (h < s.last) { s.add(h); if (s.size > k) s.remove(s.last) }
        }
        s.iterator
      }
    val hashes = localTopK.toDF("__h")
      .distinct()
      .orderBy(col("__h"))
      .limit(k)
    hashes.agg(
      count(lit(1)).as("k_used"),
      max(col("__h")).as("kth_min_hash"))
      .select(col("k_used"), col("kth_min_hash"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise((col("k_used") - 1).cast("double") * lit(HashSpace) /
            col("kth_min_hash").cast("double"))
          .as("n_distinct_est"))
  }

  /** Quantiles over a hash-sample: a deterministic simple-random-sample
    * by ROW-IDENTITY hash (sampling on the identity key, not the value,
    * keeps the sample unbiased for the value distribution), then EXACT
    * interpolated percentiles over the sample. The un-sampled exact form
    * is W5's grouped percentile_cont; this is the scale path when even
    * one exact sort of the value column is too expensive.
    *
    * Returns one row per requested quantile: (quantile, value).
    */
  def hashSampledQuantiles(df: DataFrame, identityKey: Column,
                           value: Column, probs: Seq[Double],
                           sampleBits: Int = 4): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1))
    require(sampleBits >= 0 && sampleBits < 30, "sampleBits out of range")
    val m = 1L << sampleBits
    val sampled = df
      .filter(pmod(F.hash64(identityKey), lit(m)) === 0)
      .select(value.as("__v"))
    val aggs = probs.zipWithIndex.map { case (p, i) =>
      round(expr(s"percentile_cont($p) WITHIN GROUP (ORDER BY __v)"), 4)
        .as(s"__q$i")
    }
    sampled.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(probs.zipWithIndex.map { case (p, i) =>
        struct(lit(p).as("quantile"), col(s"__q$i").as("value"))
      }: _*)).as("r"))
      .select(col("r.quantile").as("quantile"), col("r.value").as("value"))
  }

  /** Heavy hitters over a hash-sample: keep only keys whose content hash
    * falls in a `1/2^sampleBits` bucket (deterministic Bernoulli — the
    * same keys are sampled on every engine and every run; sampling by KEY
    * keeps each kept key's count EXACT), count, scale by `2^sampleBits`,
    * and return the top n by scaled count with full content tie-breaks.
    *
    * The un-sampled exact form is a plain count-and-rank; this is the
    * scale path when the key space itself is too large to shuffle.
    */
  def hashSampledTopK(df: DataFrame, key: Column, sampleBits: Int = 4,
                      topN: Int = 20): DataFrame = {
    require(sampleBits >= 0 && sampleBits < 30, "sampleBits out of range")
    val m = 1L << sampleBits
    df.select(key.as("key"))
      .filter(col("key").isNotNull)
      .filter(pmod(F.hash64(col("key")), lit(m)) === 0)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("sampled_count"))
      .select(col("key"), col("sampled_count"),
        (col("sampled_count") * m).as("est_total_count"))
      .orderBy(col("est_total_count").desc, col("key"))
      .limit(topN)
  }

  /** HyperLogLog distinct-count estimate (Flajolet et al. 2007), grouped
    * — and, unlike every library HLL, ENGINE-REPLAYABLE: the register
    * index is the hash's top `p` bits, the rank is the leading-zero
    * count of the remaining 60−p bits (computed as a binary-string
    * length — exact integers, no float log2), and the harmonic-mean
    * denominator Σ 2^−M_j is summed as the EXACT integer Σ 2^(60−M_j)
    * in DECIMAL(38,0) before ONE double division — so the estimate is
    * order-invariant at any parallelism and identical in an external
    * SQL engine (q236's oracle). Small-range correction: linear
    * counting (m·ln(m/V)) when raw ≤ 2.5m and empty registers exist.
    *
    * Scale: two hash aggregates — (groups, register) max-rank, then
    * (groups) fold over ≤ 2^p register rows per group. Constant
    * 2^p-bounded state per group at ANY key cardinality: the whole
    * point vs an exact COUNT(DISTINCT), whose expand-shuffle carries
    * every distinct key. KMV ([[kmvDistinct]]) needs one top-k heap per
    * group of hashes; HLL's fixed registers also MERGE (max per
    * register), making it the incremental/partitioned form.
    *
    * Output: (groupCols..., n_empty, n_hll).
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
                  p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 14, "p out of range (registers = 2^p)")
    val m = 1 << p
    val field = 60 - p
    val h = F.hash64(key)
    val w = h.bitwiseAND(lit((1L << field) - 1))
    val rank = when(w === 0, lit(field + 1))
      .otherwise(lit(field + 1) - length(bin(w)))
    val regs = df
      .select((groupCols.map(col) :+ shiftright(h, field).as("__j") :+
        rank.as("__r")): _*)
      .groupBy((groupCols.map(col) :+ col("__j")): _*)
      .agg(max(col("__r")).as("__m"))
    val two60 = lit(1152921504606846976L) // 2^60
    val agg = regs.groupBy(groupCols.map(col): _*)
      .agg(sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), 60 - __m) " +
          "AS DECIMAL(38,0))")).as("__zsum"),
        count(lit(1)).as("__np"))
    val zeros = lit(m) - col("__np")
    val zscaled = col("__zsum") +
      zeros.cast("decimal(38,0)") * two60.cast("decimal(38,0)")
    val zd = zscaled.cast("double") / two60.cast("double")
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val raw = alpha * lit(m.toDouble * m) / zd
    val est = when(raw <= lit(2.5 * m) && zeros > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    agg.select((groupCols.map(col) :+ zeros.cast("long").as("n_empty") :+
      est.cast("decimal(18,4)").cast("double").as("n_hll")): _*)
  }
}
