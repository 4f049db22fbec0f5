package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Corpus-selection operators for a training-data pipeline: stratified
  * sampling and weighted corpus mixing. Both accept/reject on a CONTENT
  * hash of the row key, never an RNG — so a sample is rerun-stable,
  * independent of cluster size and partitioning, replayable by another
  * engine from the same key, and a stage retry cannot change membership.
  * Pure codegen'd expressions: no shuffle, no UDF, filters push to scan.
  */
object Sampling {

  /** 0..999999 acceptance ticket from the row key — ~uniform over the
    * md5-derived 60-bit space, shared by both operators and by their
    * DuckDB oracle spellings.
    */
  private def ticket(keyCol: Column, seed: String): Column =
    pmod(F.hash64(concat_ws("|", lit(seed), keyCol)), lit(1000000L))

  private def perStratum(strataCol: Column,
                         rates: Seq[(String, Double)]): Column =
    rates.foldLeft(lit(null).cast("double")) { case (acc, (k, f)) =>
      when(strataCol === k, lit(f)).otherwise(acc)
    }

  /** Stratified sample: keep each row with its stratum's probability.
    * Quotas are exact in expectation and deterministic in membership
    * (hash acceptance); strata missing from `rates` are dropped —
    * explicit-allowlist semantics, the safe default for corpus curation.
    */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
                       rates: Seq[(String, Double)],
                       seed: String = "strat"): DataFrame = {
    require(rates.forall { case (_, f) => f >= 0 && f <= 1 },
      "rates must be probabilities")
    df.filter(ticket(keyCol, seed) <
      coalesce(perStratum(strataCol, rates), lit(0.0)) * 1000000L)
  }

  /** Weighted corpus mix: repeat each corpus `weight` times — the
    * data-mixing step that assembles a training set from source corpora
    * with per-source epoch counts. A weight of 2.5 yields two full
    * copies of every row plus a deterministic half-sample third copy;
    * weights under 1 subsample. Output rows carry an `epoch` column
    * (1-based) so downstream shuffling/sharding can keep copies apart.
    *
    * Scale: the fan-out is an explode over a per-row `sequence` — no
    * join, no shuffle; with integer weights the output is exactly
    * `sum(weight_c * |c|)` rows.
    */
  def corpusMix(df: DataFrame, keyCol: Column, corpusCol: Column,
                weights: Seq[(String, Double)],
                seed: String = "mix"): DataFrame = {
    require(weights.forall { case (_, w) => w >= 0 },
      "weights must be non-negative")
    val w = coalesce(perStratum(corpusCol, weights), lit(0.0))
    val fullCopies = floor(w).cast("int")
    val fractional = w - floor(w)
    val copies = fullCopies +
      when(ticket(keyCol, seed).cast("double") / 1000000.0 < fractional, 1)
        .otherwise(0)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1), col("__copies"))))
      .drop("__copies")
  }

  /** Deterministic global training-order shuffle + sharding: every row
    * gets a shard (hash-assigned) and a dense 0-based position inside its
    * shard (hash order, key tie-break). Reading shards in index order and
    * each shard by position replays ONE fixed pseudo-random permutation
    * of the corpus — the "shuffle once, stream forever" layout a
    * pretraining run wants, rerun-stable and engine-independent because
    * the order comes from a content hash, never an RNG or partition
    * enumeration order.
    *
    * Scale: one hash-shuffle on `shard` + a per-shard window sort — no
    * global ordering, no single-partition exchange at any corpus size.
    * Size `numShards` to the cluster (≥ executor cores) so shard windows
    * parallelize; a different `seed` is a fresh permutation (per-epoch
    * reshuffles are seed strings, not data movement).
    *
    * Output: every input column + (shard, pos).
    */
  def shuffleShard(df: DataFrame, keyCol: Column, numShards: Int,
                   seed: String = "shuffle"): DataFrame =
    shuffleShardImpl(df, keyCol, numShards, seed)

  /** `shuffleShard` with `numShards` sized to the measured corpus (one
    * count job — metadata-scale): `ceil(rows / targetRowsPerShard)`,
    * floored at the session's parallelism so shard windows always fill
    * the cluster. Each shard's window sorts in ONE task, so a fixed
    * default (say 8) would shard a 100 TB corpus into eight multi-TB
    * single-task sorts — this form removes that foot-gun (the
    * `lshTopKAuto` pattern). The declared benchmark query pins
    * `numShards` instead so its oracle replays deterministically; use
    * this form on corpora of unknown size. Shard membership and order
    * stay content-hash-deterministic either way — only the shard COUNT
    * depends on corpus size.
    */
  def shuffleShardAuto(df: DataFrame, keyCol: Column,
                       targetRowsPerShard: Long = 4L << 20,
                       seed: String = "shuffle"): DataFrame = {
    require(targetRowsPerShard > 0, "targetRowsPerShard must be positive")
    val rows = df.count()
    val byRows = (rows + targetRowsPerShard - 1) / targetRowsPerShard
    val floor = df.sparkSession.sparkContext.defaultParallelism.toLong
    val shards = math.min(byRows.max(floor).max(1L), Int.MaxValue.toLong)
    shuffleShardImpl(df, keyCol, shards.toInt, seed)
  }

  private def shuffleShardImpl(df: DataFrame, keyCol: Column, numShards: Int,
                               seed: String): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val h = F.hash64(concat_ws("|", lit(seed), keyCol))
    val w = Window.partitionBy(col("__shard"))
      .orderBy(col("__h"), col("__key"))
    df.withColumn("__h", h)
      .withColumn("__key", keyCol)
      .withColumn("__shard", pmod(col("__h"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .withColumn("shard", col("__shard"))
      .drop("__h", "__key", "__shard")
  }
}
