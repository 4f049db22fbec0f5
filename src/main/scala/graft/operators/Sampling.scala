package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Temperature-flattened domain mix — the multilingual-LM sampling rule
    * (Conneau & Lample 2019, arXiv:1901.07291 §3.1; mT5's α-sampling):
    * each domain's share of the mixed corpus is ∝ n_d^alpha, so alpha=1
    * keeps natural proportions and alpha→0 approaches uniform-per-domain,
    * boosting low-resource domains without hand-written weights. Domain
    * counts are measured (one hash aggregate), per-domain copy weights
    * derive as `targetRows · n_d^alpha / Σ n^alpha / n_d` (rounded to
    * 6dp so the float replays across engines), and [[corpusMix]] applies
    * them with its deterministic fractional-copy ticket.
    *
    * Scale: the only driver-side state is one row per DOMAIN (bounded by
    * `maxDomains` with a loud error — a high-cardinality column here is
    * a mis-specified mix, not a big corpus). Everything row-scale stays
    * in [[corpusMix]]'s explode: no joins, no extra shuffle.
    */
  def temperatureMix(df: DataFrame, keyCol: Column, domainCol: Column,
                     alpha: Double, targetRows: Long,
                     seed: String = "mix",
                     maxDomains: Int = 100000): DataFrame = {
    require(alpha >= 0 && alpha <= 1, "alpha must be in [0, 1]")
    require(targetRows > 0, "targetRows must be positive")
    val counts = df.groupBy(domainCol.as("__dom"))
      .agg(count(lit(1)).as("__n"))
      // collect-bound: <= maxDomains+1 domain rows (limit-capped, loud require below)
      .limit(maxDomains + 1).collect()
      .map(r => (String.valueOf(r.get(0)), r.getLong(1)))
      .sortBy(_._1)
    require(counts.length <= maxDomains,
      s"temperatureMix: more than $maxDomains distinct domains — this " +
        "collect is per-DOMAIN state; a key this wide is not a mix axis")
    val z = counts.map { case (_, n) => math.pow(n.toDouble, alpha) }.sum
    val weights = counts.map { case (d, n) =>
      d -> BigDecimal(
          targetRows.toDouble * math.pow(n.toDouble, alpha) / z / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toSeq
    corpusMix(df, keyCol, domainCol, weights, seed)
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
  /** Deterministic, leakage-safe train/val/test split assignment.
    *
    * The split is keyed on a GROUP key — typically the URL host or
    * source — not the row id: near-duplicate documents overwhelmingly
    * share their group key, so keying the hash on it makes it
    * impossible for two sibling near-dups to straddle train and eval
    * (the classic benchmark-contamination bug a row-hash split
    * reintroduces no matter how well the corpus was deduped). Membership
    * is a pure hash of content keys: stable under reruns, re-partitions,
    * corpus growth (existing groups never move), and engine choice.
    *
    * `splits` are (label, fraction) in priority order; fractions map to
    * cumulative integer thresholds over the 10^6 ticket space and any
    * remainder falls to "train". Map-only: zero shuffle at any scale.
    */
  def splitAssign(df: DataFrame, groupKeyCol: Column,
                  splits: Seq[(String, Double)],
                  seed: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to <= 1 (remainder is train)")
    val t = ticket(groupKeyCol, seed)
    var acc = 0L
    val bounds = splits.map { case (n, f) =>
      acc += math.round(f * 1000000.0); (n, acc)
    }
    val label = bounds.foldRight(lit("train"): Column) {
      case ((n, ub), els) => when(t < ub, n).otherwise(els)
    }
    df.withColumn("split", label)
  }

  /** Per-domain quota cap: keep at most `n` rows per domain, preferring
    * rows by `orderBy` (pass a TOTAL order — break ties on the row id).
    * The cap every web corpus applies so one mega-domain can't dominate
    * the mix (C4/RefinedWeb-style host caps).
    *
    * Skew-safe two-phase shape: a straight per-domain window sends a
    * hot domain's entire row set to one reducer; here phase 1 ranks
    * within (domain, salt) — the hot domain spreads over `salts`
    * reducers — and only the per-salt top-n survivors (<= n*salts rows
    * per domain, bounded) meet in the phase-2 window. EXACT: the global
    * top-n under a total order is contained in the union of per-salt
    * top-n under the same order.
    */
  def domainQuotaSample(df: DataFrame, keyCol: Column, domainCol: Column,
                        orderBy: Seq[Column], n: Int,
                        salts: Int = 16): DataFrame = {
    require(n >= 1 && salts >= 1, "need n >= 1 and salts >= 1")
    val salt = pmod(F.hash64(concat_ws("|", lit("dq"), keyCol)),
      lit(salts.toLong))
    val w1 = Window.partitionBy(domainCol, salt).orderBy(orderBy: _*)
    val w2 = Window.partitionBy(domainCol).orderBy(orderBy: _*)
    df.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= n)
      .withColumn("rank_in_domain", row_number().over(w2).cast("long"))
      .filter(col("rank_in_domain") <= n)
      .drop("__r1")
  }

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

  /** DSIR-style importance weights (Xie et al. 2023, Data Selection for
    * Language Models via Importance Resampling): score every document by
    * how much more likely its hashed-bigram features are under a TARGET
    * distribution than under the RAW distribution — the standard "select
    * web data that looks like the high-quality corpus" pass. `targetCol`
    * marks the target-domain exemplar docs; both feature models train in
    * the same single pass over the corpus.
    *
    * `w(doc) = avg over bigram occurrences of
    *   ln((ct[b]+1)/(Tt+B)) − ln((cr[b]+1)/(Tr+B))`
    * with `b` the bigram's bucket in `[0, B)`, `ct/cr` per-bucket counts
    * on the target/raw side, `Tt/Tr` the side totals (add-one smoothing
    * over `B` buckets, so both terms are proper probabilities).
    *
    * Cross-engine determinism: the per-bucket log-ratio snapshots to
    * DECIMAL(18,8) before the per-doc sum (ngramLmScore's rule — decimal
    * addition is exact and order-free), and the final average goes
    * through a DECIMAL(38,10) snapshot before its 4dp round.
    *
    * Scale: one explode → per-(doc,bucket) count (map-side combined);
    * the feature table is ≤ `buckets` rows — it BROADCASTS to the
    * scoring join, so the corpus-side frame shuffles exactly once (the
    * doc-grain aggregation). Totals are one broadcast single-row
    * aggregate. The per-(doc,bucket) frame feeds both the bucket counts
    * and the scoring join — persisted behind `materialize`.
    */
  def importanceWeights(df: DataFrame, idCol: Column, textCol: Column,
                        targetCol: Column, buckets: Int = 4096,
                        materialize: Boolean = true): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    val toks = split(graft.operators.TextAnalysis.normText(textCol), " ")
    val bigramArr = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    val grams0 = df.select(idCol.as("doc_id"), targetCol.as("is_target"),
        explode(bigramArr).as("g"))
      .select(col("doc_id"), col("is_target"),
        pmod(F.hash64(concat(lit("dsir|"), col("g"))),
          lit(buckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("k"))
    val grams = if (materialize) grams0.persist() else grams0
    val bucketCounts = grams.groupBy(col("bucket"))
      .agg(sum(when(col("is_target"), col("k")).otherwise(0L)).as("ct"),
        sum(when(!col("is_target"), col("k")).otherwise(0L)).as("cr"))
    val totals = bucketCounts
      .agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val lr = (log((col("ct") + 1).cast("double")) -
      log((col("tt") + buckets).cast("double")) -
      log((col("cr") + 1).cast("double")) +
      log((col("tr") + buckets).cast("double")))
    val lrTab = bucketCounts.crossJoin(broadcast(totals))
      .select(col("bucket"), round(lr, 8).cast("decimal(18,8)").as("__lr"))
    val scored = grams
      .join(broadcast(lrTab), Seq("bucket"))
      .groupBy(col("doc_id"), col("is_target"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k").cast("decimal(9,0)") * col("__lr")).as("sum_lr"))
      .select(col("doc_id"), col("is_target"), col("n_bigrams"),
        round((col("sum_lr").cast("double") / col("n_bigrams"))
          .cast("decimal(38,10)"), 4).cast("double").as("dsir_logweight"))
    df.select(idCol.as("doc_id"), targetCol.as("is_target"))
      .join(scored, Seq("doc_id", "is_target"), "left")
      .select(col("doc_id"), col("is_target"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("dsir_logweight"))
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
