package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact hash, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design:
  * - exact: one hash-shuffle on the digest — the cheapest possible dedup.
  * - ngram Jaccard: exact similarity but O(n²) pairs — only for verification
  *   / within small candidate buckets.
  * - MinHash+LSH: the 100 TB path. shingle → k minhashes → b bands → shuffle
  *   on (band, bandHash) so only same-bucket docs pair up; candidate pairs
  *   are then verified with exact Jaccard. No global cross join ever exists.
  * - SimHash: 64-bit signature; near-dups share signature (or low Hamming
  *   distance); bucket on the signature directly.
  *
  * Hashing is pluggable via [[HashFamily]]: `XxHash` (Spark's codegen'd
  * xxhash64 — fastest) or `CrossEngineHash` (md5-derived 60-bit values any
  * engine can reproduce — used where results must replay against an external
  * SQL oracle). No UDFs in either family.
  */
object Dedup {

  import TextAnalysis.normText
  import graft.functions.F

  /** A 64-bit hash function family: a one-time base hash of a raw string plus
    * k cheap seeded re-hashes of that base (so the variable-length string is
    * hashed once, not once per seed).
    */
  sealed trait HashFamily {
    /** Base hash of the raw string; the Column feeds `seeded`. */
    def base(c: Column): Column
    /** Seed-mixed re-hash of a `base` value. */
    def seeded(base: Column, seed: Int): Column
    /** Direct hash of a string column. */
    def hash(c: Column): Column
  }

  /** xxhash64: fastest, Spark-only — the default for production dedup. */
  case object XxHash extends HashFamily {
    def base(c: Column): Column = xxhash64(c)
    def seeded(base: Column, seed: Int): Column = xxhash64(base, lit(seed))
    def hash(c: Column): Column = xxhash64(c)
  }

  /** md5-derived 60-bit hash replicable in DuckDB/Postgres/BigQuery
    * (`('0x'||substr(md5(s),1,15))::BIGINT`); seeded re-hashes are a
    * 2-universal modular family over the Mersenne prime 2^31-1 —
    * `(a_seed * (base % P) + b_seed) % P` — so the string is md5'd ONCE and
    * each seed costs one multiply+mod, with every product < 2^62 (no
    * overflow in Spark's wrapping longs NOR engines that error on BIGINT
    * overflow, so both compute identical values).
    */
  case object CrossEngineHash extends HashFamily {
    val P: Long = 2147483647L // 2^31 - 1
    private def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    /** Multiplier for seed: deterministic, in [1, P-1]. */
    def a(seed: Int): Long = 1 + math.floorMod(mix64(2L * seed), P - 1)
    /** Offset for seed: deterministic, in [0, P-1]. */
    def b(seed: Int): Long = math.floorMod(mix64(2L * seed + 1), P)
    def base(c: Column): Column = F.hash64(c)
    def seeded(base: Column, seed: Int): Column =
      pmod(lit(a(seed)) * pmod(base, lit(P)) + lit(b(seed)), lit(P))
    def hash(c: Column): Column = F.hash64(c)
  }

  /** Exact dedup: keep the smallest `idCol` per normalized-text digest.
    * Survivors + their duplicate count.
    */
  def exact(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.select(idCol.as("doc_id"), md5(normText(textCol)).as("digest"))
      .groupBy(col("digest"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact span dedup at chunk grain — the "remove exact token spans seen
    * elsewhere in the corpus" operator (Lee et al. 2022, Deduplicating
    * Training Data Makes Language Models Better), catching the boilerplate
    * and quotation overlap that whole-document [[exact]] dedup misses.
    * Each doc's normalized tokens are cut into NON-overlapping `n`-token
    * chunks (the trailing partial chunk is dropped — a short tail is not a
    * span); a chunk is duplicated when its hash occurs at two or more
    * (doc, position) sites corpus-wide — including repeats inside one doc.
    * Output per doc: `n_chunks`, `dup_chunks`, `dup_frac`, and `keep`
    * (`dup_frac <= maxDupFrac`).
    *
    * Scale: explode to chunk grain (corpus token volume / n rows), one
    * hash groupBy for global chunk frequency, one equi-join back on the
    * 64-bit chunk hash — the same bounded two-exchange shape as [[exact]];
    * no self-join, no cross join, and the shuffled key is a fixed-width
    * hash, never the span text.
    */
  def chunkDedup(df: DataFrame, idCol: Column, textCol: Column,
                 n: Int = 20, maxDupFrac: Double = 0.3,
                 hashes: HashFamily = XxHash,
                 materialize: Boolean = true): DataFrame = {
    require(n >= 1, "chunk length must be >= 1")
    val toks = split(normText(textCol), " ")
    val k = floor(size(toks) / lit(n)).cast("int")
    // guard k<=0: sequence(0, -1) would produce a DESCENDING range
    val chunks = when(k <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), k - 1),
        i => concat_ws(" ", slice(toks, i * n + 1, lit(n)))))
    // the chunk frame feeds BOTH the frequency agg and the join-back:
    // persist it (ids + fixed-width hashes only) or the corpus-scale
    // tokenize+explode+hash pipeline runs twice
    val ch0 = df.select(idCol.as("doc_id"), explode(chunks).as("chunk"))
      .select(col("doc_id"),
        hashes.hash(concat(lit("chunk|"), col("chunk"))).as("h"))
    val ch = if (materialize) ch0.persist() else ch0
    val freq = ch.groupBy(col("h")).agg(count(lit(1)).as("c"))
    val per = ch.join(freq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_chunks"))
    df.select(idCol.as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_chunks", "dup_chunks"))
      .withColumn("dup_frac",
        when(col("n_chunks") === 0, lit(0.0))
          .otherwise(col("dup_chunks") / col("n_chunks")))
      .withColumn("keep", col("dup_frac") <= maxDupFrac)
  }

  /** Span REMOVAL with reassembly — [[chunkDedup]]'s repair counterpart
    * (Lee et al. 2022's ExactSubstr policy): instead of flagging a doc,
    * delete every duplicated `n`-token span EXCEPT its canonical first
    * occurrence (smallest `(doc_id, position)` corpus-wide) and emit the
    * doc rewritten from its surviving spans in original order. Unlike
    * chunkDedup the trailing partial span is KEPT — reassembly must be
    * lossless for unique text.
    *
    * Scale: same bounded two-exchange shape as [[chunkDedup]] (explode →
    * hash groupBy → join-back on the 64-bit span hash) plus one per-doc
    * aggregation whose `sort_array(collect_list)` state is a single
    * document's spans — bounded by doc length, never corpus-wide. The
    * span frame feeds both the frequency agg and the join-back, so it
    * persists behind `materialize`. The canonical-occurrence key is a
    * `(doc_id, pos)` STRUCT min — structs order lexicographically in
    * the aggregate, so the selection is correct for ANY id range
    * (negative, full-64-bit) with no packed-integer bound to violate.
    */
  def removeDupSpans(df: DataFrame, idCol: Column, textCol: Column,
                     n: Int = 10, hashes: HashFamily = XxHash,
                     materialize: Boolean = true): DataFrame = {
    require(n >= 1, "span length must be >= 1")
    val toks = split(normText(textCol), " ")
    val k = ceil(size(toks).cast("double") / lit(n)).cast("int")
    val spans = when(k <= 0, array().cast("array<struct<pos:int,span:string>>"))
      .otherwise(transform(sequence(lit(0), k - 1),
        i => struct(i.cast("int").as("pos"),
          concat_ws(" ", slice(toks, i * n + 1, lit(n))).as("span"))))
    val sp0 = df.select(idCol.as("doc_id"), explode(spans).as("u"))
      .select(col("doc_id"), col("u.pos").as("pos"), col("u.span").as("span"),
        hashes.hash(concat(lit("span|"), col("u.span"))).as("h"),
        struct(col("doc_id"), col("u.pos").as("pos")).as("okey"))
    val sp = if (materialize) sp0.persist() else sp0
    val g = sp.groupBy(col("h"))
      .agg(min(col("okey")).as("keeper"), count(lit(1)).as("c"))
    val kept = sp.join(g, "h")
      .filter(col("c") === 1 || col("okey") === col("keeper"))
    val agg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("span")))),
          x => x.getField("span")), " ").as("clean_text"))
    val tot = sp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_spans"))
    df.select(idCol.as("doc_id"))
      .join(tot, Seq("doc_id"), "left")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (coalesce(col("n_spans"), lit(0L)) -
          coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Sliding-window ExactSubstr dedup — the offset-invariant form of
    * [[removeDupSpans]] and the DataFrame re-expression of Lee et al.
    * 2022's suffix-array policy at threshold `l` (reference behavior:
    * duplicated-training-span removal; cf. `/root/reference` dedup
    * pipeline grain). [[removeDupSpans]] tiles the doc into DISJOINT
    * n-token spans, so a copy shifted by one token tiles differently and
    * escapes; here every token position opens an `l`-token window, and a
    * position is removed when its window re-occurs anywhere else in the
    * corpus (other than the window's canonical first occurrence —
    * corpus-wide lexicographic-min `(doc_id, pos)`). A duplicated region
    * of length m >= l is covered by exactly its m-l+1 duplicated windows,
    * which union back to the full region — the suffix-array answer at
    * threshold l, with no alignment assumption.
    *
    * Self-overlapping repeats (period < l) keep only the canonical
    * window's l tokens, not one full period — same edge the published
    * suffix-array tool has on periodic strings.
    *
    * Scale shape (100 TB lens):
    * - window frame = ONE row per token position carrying a fixed-width
    *   `(doc_id, pos, h)` — the l× blow-up is map-side CPU (hashing l
    *   tokens per position), never shuffle bytes; the shuffle is one
    *   token-grain hash aggregate (map-side combinable) — the honest
    *   cost of exact-substring dedup without a machine-sized suffix
    *   array, ~24 B/token.
    * - only DUPLICATED window hashes (count > 1) join back, so the
    *   join-back frame tracks the duplicate volume, not the corpus.
    * - the rebuild runs at DOC grain in expression land: covered
    *   positions = distinct union of the marked windows' spans (bounded
    *   by doc token count), token keep-test is `array_contains` —
    *   O(tokens × covered) per doc, degrading only for docs that are
    *   themselves mostly duplicate (and those shrink to ~nothing).
    * - the window frame feeds both the frequency agg and the join-back:
    *   `materialize` persists ids+hashes only.
    */
  def exactSubstrDedup(df: DataFrame, idCol: Column, textCol: Column,
                       l: Int = 20, hashes: HashFamily = XxHash,
                       materialize: Boolean = true): DataFrame = {
    require(l >= 2, "window length must be >= 2")
    val toks = split(normText(textCol), " ")
    val nw = size(toks) - (l - 1)
    val wins = when(nw <= 0, array().cast("array<struct<pos:int,h:bigint>>"))
      .otherwise(transform(sequence(lit(0), nw - 1),
        i => struct(i.cast("int").as("pos"),
          hashes.hash(concat(lit("xw|"),
            concat_ws(" ", slice(toks, i + 1, lit(l))))).as("h"))))
    val w0 = df.select(idCol.as("doc_id"), explode(wins).as("u"))
      .select(col("doc_id"), col("u.pos").as("pos"), col("u.h").as("h"),
        struct(col("doc_id"), col("u.pos").as("pos")).as("okey"))
    val w = if (materialize) w0.persist() else w0
    val dup = w.groupBy(col("h"))
      .agg(min(col("okey")).as("keeper"), count(lit(1)).as("c"))
      .filter(col("c") > 1).select("h", "keeper")
    val marked = w.join(dup, "h").filter(col("okey") =!= col("keeper"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("marked"))
    val covered = array_distinct(flatten(transform(col("marked"),
      p => sequence(p, p + lit(l - 1)))))
    df.select(idCol.as("doc_id"), toks.as("toks"))
      .join(marked, Seq("doc_id"), "left")
      .withColumn("covered",
        when(col("marked").isNull, array().cast("array<int>"))
          .otherwise(covered))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("covered")).cast("long").as("n_removed"),
        array_join(filter(col("toks"),
          (_, i) => !array_contains(col("covered"), i)), " ")
          .as("clean_text"))
  }

  /** Word n-gram shingles of `n` tokens as an array column. */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val toks = split(normText(textCol), " ")
    val cnt = size(toks) - (n - 1)
    when(cnt <= 0, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), cnt - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Asymmetric n-gram CONTAINMENT join: ordered pairs (a, b) with
    * |sh(a) ∩ sh(b)| / |sh(a)| >= threshold — the quote/subset-copy
    * detector Jaccard cannot express (a short doc fully embedded in a
    * long one has low Jaccard but containment 1.0; dedup policy usually
    * drops the CONTAINED side).
    *
    * Prefix filtering adapts to the asymmetry: containment >= t means at
    * least ceil(t·|A|) of A's shingles appear in B, so A's prefix of
    * |A| − ceil(t·|A|) + 1 rarest shingles (global-frequency order) must
    * intersect B's FULL shingle set — candidates are prefix(A) ⋈
    * postings(B) on the shingle key, complete at the threshold by the
    * standard prefix-filter argument. The joined keys are each doc's
    * RAREST shingles, so bucket sizes track the corpus's rare-shingle
    * ceiling, not its hot phrases; verification is the exact
    * intersect-over-|A| on the candidate pairs only.
    *
    * Persist lifetime: with materialize=true the shingle cache lives
    * until LRU eviction or `spark.catalog.clearCache()` — the result is
    * lazy, so the operator cannot unpersist before the caller's action.
    * Long-lived sessions issuing many calls should pass
    * materialize=false and checkpoint the shingle frame themselves.
    */
  def ngramContainmentPairs(df: DataFrame, idCol: Column, textCol: Column,
                            n: Int = 3, threshold: Double = 0.9,
                            materialize: Boolean = true,
                            hashShingles: Option[HashFamily] = None)
      : DataFrame = {
    val shRaw = array_distinct(shingles(textCol, n))
    val shCol = hashShingles match {
      case Some(fam) => array_distinct(transform(shRaw, s => fam.hash(s)))
      case None => shRaw
    }
    val sh0 = df.select(idCol.as("id"), shCol.as("sh"))
      .filter(size(col("sh")) > 0)
    val sh = if (materialize) sh0.persist() else sh0
    val ex = sh.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s"))
    val freq = ex.groupBy(col("s")).agg(count(lit(1)).as("freq"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("freq"), col("s"))
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .cast("int")
    val prefix = ex.join(freq, "s")
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <= prefixLen)
      .select(col("id"), col("s"))
    val cand = prefix.alias("a")
      .join(ex.select(col("id"), col("s")).alias("b"),
        col("a.s") === col("b.s") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(col("sh_a"))).as("__c"))
      // threshold on the EXACT ratio — the prefix filter's completeness
      // guarantee holds for exact containment >= t; thresholding on the
      // 4dp-rounded value would admit pairs in [t - 5e-5, t) that the
      // candidate join is allowed to miss. Round only for display.
      .filter(col("__c") >= threshold)
      .select(col("id_a"), col("id_b"),
        round(col("__c"), 4).as("containment"))
  }

  /** Exact n-gram Jaccard similarity join: all pairs with sim >= threshold.
    *
    * Implemented as a PPJoin-style prefix-filtered similarity join — the
    * 100 TB form of the problem — NOT an all-pairs cross join:
    * 1. explode shingles, compute global shingle frequency;
    * 2. canonical shingle order = (frequency asc, shingle) — rarest first;
    * 3. per doc keep only the prefix of length |sh| - ceil(t*|sh|) + 1
    *    (prefix-filter guarantee: any pair with Jaccard >= t shares at
    *    least one prefix shingle — no false negatives);
    * 4. candidate pairs = equi-join on prefix shingles (rare → tiny
    *    buckets, near-linear), dedup;
    * 5. verify candidates with exact intersect/union Jaccard.
    * Every stage is a hash shuffle on a well-distributed key; no cross
    * join exists at any scale.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: Column, textCol: Column,
                        n: Int = 3, threshold: Double = 0.8,
                        materialize: Boolean = true,
                        hashShingles: Option[HashFamily] = None): DataFrame = {
    // the shingle table feeds three consumers (prefix index + two verify
    // sides) — materialize it once instead of re-running the tokenize/
    // slice/concat pipeline per consumer. At data-lake scale prefer
    // materialize=false + an explicit checkpoint of the shingle table.
    //
    // hashShingles: map each shingle string to a 64-bit hash up front —
    // every downstream shuffle, group, join, and set-intersect then works
    // on fixed-width longs instead of variable-length strings (Jaccard is
    // identical modulo negligible 60/64-bit collisions). With
    // CrossEngineHash the hashed pipeline still replays in a SQL oracle.
    val shRaw = array_distinct(shingles(textCol, n))
    val shCol = hashShingles match {
      case Some(fam) => array_distinct(transform(shRaw, s => fam.hash(s)))
      case None => shRaw
    }
    val sh0 = df.select(idCol.as("id"), shCol.as("sh"))
    val sh = if (materialize) sh0.persist() else sh0
    jaccardPairsFromShingles(sh, threshold)
  }

  /** The PPJoin pipeline of [[ngramJaccardPairs]] over a PREPARED shingle
    * frame (columns `id`, `sh` = distinct shingle array) — callers that
    * derive the shingle frame once for several consumers (e.g.
    * [[minHashEstimatePairs]], which also feeds the same frame to the
    * signature aggregate) enter here and skip the tokenize/slice/hash scan.
    */
  private[operators] def jaccardPairsFromShingles(sh: DataFrame,
                                                  threshold: Double)
      : DataFrame = {
    val ex = sh.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s"))
    val freq = ex.groupBy(col("s")).agg(count(lit(1)).as("freq"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("freq"), col("s"))
    val prefixLen = (col("sz") - ceil(lit(threshold) * col("sz")) + 1).cast("int")
    val prefix = ex.join(freq, "s")
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <= prefixLen)
      .select(col("id"), col("s"), col("sz"), col("pos"))
    // PPJoin candidate reduction (Xiao et al., WWW'08; round-15
    // directive 2): two lossless prunes INSIDE the prefix join, before
    // the distinct shuffle and the array-verify joins.
    //
    // Length filter: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so J >= t
    // forces min >= t*max — a two-int compare per joined row.
    //
    // Positional filter: both docs order shingles by the SAME global
    // (freq, s) key, so for the FIRST shared shingle s* (positions pa,
    // pb) every other shared shingle sits strictly after it on both
    // sides: overlap O <= 1 + min(|A|-pa, |B|-pb). J >= t forces
    // O >= t/(1+t)*(|A|+|B|), so a row whose positional upper bound
    // misses that lower bound cannot be the s* row of a qualifying
    // pair; the s* row itself always survives (completeness: O >= t*|A|
    // puts s* inside both prefixes — the standard prefix-filter
    // argument — and the bound above holds at s* by construction), so
    // every qualifying pair still reaches the verify join through at
    // least its s* row. The 1e-9 slack keeps a double rounding of
    // t/(1+t)*(sz_a+sz_b) from pruning an exact integer tie; verify
    // recomputes exact Jaccard, so over-admission is only wasted work.
    val reqOverlap =
      lit(threshold / (1.0 + threshold)) * (col("a.sz") + col("b.sz")) -
        lit(1e-9)
    val cand = prefix.alias("a")
      .join(prefix.alias("b"),
        col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
          least(col("a.sz"), col("b.sz")).cast("double") >=
            lit(threshold) * greatest(col("a.sz"), col("b.sz")) - lit(1e-9) &&
          (lit(1) + least(col("a.sz") - col("a.pos"),
            col("b.sz") - col("b.pos"))).cast("double") >= reqOverlap)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("__j"))
      // exact-ratio threshold (prefix completeness holds for exact >= t;
      // a rounded threshold admits pairs the candidate join may miss)
      .filter(col("__j") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__j"), 4).as("jaccard"))
  }

  /** k MinHash values per doc: min over shingle hashes under k independent
    * seeded xxhash64 functions. Returns (id, array of k signatures).
    * Computed explode-side (one row per shingle, k narrow hash columns,
    * one groupBy) so the shingle pipeline runs once — not re-evaluated per
    * hash function as a naive array<->transform expression would.
    */
  /** Shingle sets pre-hashed to 64-bit base values: each shingle string is
    * hashed ONCE here; everything downstream — minhash seeds, LSH buckets,
    * exact-Jaccard verify — operates on fixed-width longs.
    */
  private def hashedShingles(textCol: Column, n: Int, fam: HashFamily): Column =
    array_distinct(transform(array_distinct(shingles(textCol, n)),
      s => fam.base(s)))

  def minHashSignatures(df: DataFrame, idCol: Column, textCol: Column,
                        n: Int = 3, k: Int = 32,
                        fam: HashFamily = XxHash): DataFrame =
    minHashSignaturesFromShingles(
      df.select(idCol.as("id"), hashedShingles(textCol, n, fam).as("sh")),
      k, fam)

  /** [[minHashSignatures]] over a PREPARED pre-hashed shingle frame
    * (columns `id`, `sh`) — the shared-scan entry point.
    */
  private[operators] def minHashSignaturesFromShingles(sh: DataFrame, k: Int,
                                                       fam: HashFamily)
      : DataFrame = {
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    ex.groupBy(col("id"))
      .agg(minHashAggs(k, fam).head, minHashAggs(k, fam).tail: _*)
      .select(col("id"), array((0 until k).map(s => col(s"h$s")): _*).as("minhash"))
  }

  /** MinHash estimator evaluation: for every TRUE near-dup pair (exact
    * n-gram Jaccard >= threshold, the prefix-filtered ground truth),
    * the k-component MinHash agreement fraction next to the exact value
    * — the tune-k loop's evidence table (E[est] = J, sd = sqrt(J(1-J)/k),
    * so k=32 puts ±0.09 around 0.7; promote k until the observed spread
    * supports the LSH band design). `est_jaccard` is an exact n/k
    * rational in double, so the whole row replays in a SQL oracle.
    *
    * Scale: ground truth via [[ngramJaccardPairs]] (no cross join),
    * signatures via [[minHashSignatures]] (one agg), then two equi-joins
    * of pairs to signatures and a 32-element compare — pair-volume cost.
    */
  def minHashEstimatePairs(df: DataFrame, idCol: Column, textCol: Column,
                           n: Int = 3, k: Int = 32,
                           threshold: Double = 0.5,
                           fam: HashFamily = XxHash,
                           materialize: Boolean = true): DataFrame = {
    // ONE shingle scan serves both consumers (round 9 tokenized+shingled
    // the corpus twice — once for the ground truth, once for the
    // signatures; that was ~half the query's corpus-linear cost).
    // hash == base for every HashFamily, so the shared pre-hashed frame
    // produces bit-identical values on both paths and the oracle replays
    // unchanged. materialize=false for long-lived sessions (see
    // [[ngramContainmentPairs]]'s persist-lifetime note).
    val sh0 = df.select(idCol.as("id"),
      hashedShingles(textCol, n, fam).as("sh"))
    val sh = if (materialize) sh0.persist() else sh0
    val exact = jaccardPairsFromShingles(sh, threshold)
    val sigs = minHashSignaturesFromShingles(sh, k, fam)
    val matches = aggregate(
      zip_with(col("__ma"), col("__mb"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    exact
      .join(sigs.select(col("id").as("id_a"), col("minhash").as("__ma")),
        "id_a")
      .join(sigs.select(col("id").as("id_b"), col("minhash").as("__mb")),
        "id_b")
      .select(col("id_a"), col("id_b"), col("jaccard"),
        (matches.cast("double") / k).as("est_jaccard"))
  }

  /** k min-hash aggregate columns over a PRE-HASHED shingle column named
    * `s`: the k independent hash functions re-hash the small base value
    * with a seed — far cheaper than re-hashing the full string per
    * function, same uniformity.
    */
  private def minHashAggs(k: Int, fam: HashFamily): Seq[Column] =
    (0 until k).map(seed => min(fam.seeded(col("s"), seed)).as(s"h$seed"))

  /** Bounded same-bucket candidate pairs over a banded signature table
    * (columns: `id` + `bucketKeys`). The naive form — self-join on the
    * bucket key with `a.id < b.id` — is quadratic in bucket occupancy: a
    * cluster of k near-identical docs (the common case in web-scale dedup:
    * boilerplate, mirrors) lands in one bucket and emits O(k²) candidate
    * rows before any verify filter runs.
    *
    * This helper bounds that. Per-bucket occupancy and min id come from one
    * hash aggregate (map-side combinable — no window sort) joined back on
    * the same key the candidate join shuffles on. Buckets at or under
    * `maxBucket` keep exact all-pairs semantics; buckets over it switch to
    * a REPRESENTATIVE STAR — each member pairs with the bucket's smallest
    * id only, O(k) rows. Both branches filter BEFORE their join, so neither
    * the all-pairs join (≤ maxBucket² per bucket) nor the star join (build
    * side = one row per hot bucket) ever iterates a quadratic stream.
    *
    * Contract under the cap: a hot bucket emits only representative pairs,
    * so downstream union-find/grouping still recovers the cluster through
    * the representative, but non-representative pairs inside a hot bucket
    * are not enumerated (and a verify filter may drop a member whose
    * distance to the representative exceeds the threshold even though some
    * other in-bucket pair would have passed). That is the documented trade:
    * candidate volume stays linear exactly on the near-dup-heavy inputs
    * dedup exists for.
    *
    * `project` is evaluated against the pair join aliased `a` (smaller id) /
    * `b` — e.g. `Seq(col("a.id").as("id_a"), col("b.id").as("id_b"))`.
    */
  private[operators] def boundedBucketPairs(banded: DataFrame,
                                            bucketKeys: Seq[String],
                                            maxBucket: Int,
                                            project: Seq[Column]): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val stats = banded.groupBy(bucketKeys.map(col): _*)
      .agg(count(lit(1)).as("__occ"), min(col("id")).as("__rep"))
    val marked = banded.join(stats, bucketKeys)
    val cond = bucketKeys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val small = marked.filter(col("__occ") <= maxBucket)
    val hotRep = marked.filter(col("__occ") > maxBucket && col("id") === col("__rep"))
    val hotRest = marked.filter(col("__occ") > maxBucket && col("id") =!= col("__rep"))
    val smallPairs = small.alias("a")
      .join(small.alias("b"), cond && col("a.id") < col("b.id"))
      .select(project: _*)
    // representative id is the bucket min, so a.id < b.id holds by construction
    val starPairs = hotRep.alias("a").join(hotRest.alias("b"), cond)
      .select(project: _*)
    smallPairs.unionByName(starPairs)
  }

  /** MinHash LSH candidate pairs: split the k-signature into `bands` bands of
    * k/bands rows, bucket docs by (band index, hash of band slice), emit
    * pairs sharing any bucket, dedup pairs, then verify with exact Jaccard.
    * The only shuffles are the bucket groupBy and the final distinct — no
    * cross join at any point. Candidate volume per bucket is bounded by
    * `maxBucket` (see [[boundedBucketPairs]] for the hot-bucket contract).
    */
  /** LSH index for one document set: the pre-hashed shingle table
    * `(id, sh)` (fixed-width longs — Jaccard over hashed sets is
    * identical modulo negligible 64-bit collisions) and the banded
    * bucket table `(id, band, bucket)`. The shingle table is shared by
    * the signature explode and the verify joins, so `materialize`
    * persists it once (see ngramJaccardPairs on the tradeoff).
    */
  private[operators] def lshIndex(df: DataFrame, idCol: Column,
      textCol: Column, n: Int, k: Int, bands: Int, fam: HashFamily,
      materialize: Boolean): (DataFrame, DataFrame) = {
    val rows = k / bands
    val sh0 = df.select(idCol.as("id"), hashedShingles(textCol, n, fam).as("sh"))
    val sh = if (materialize) sh0.persist() else sh0
    val ex = sh.select(col("id"), explode(col("sh")).as("s"))
    // (banded persists below: it is consumed 2-3x — occupancy stats +
    // pair join in boundedBucketPairs, plus the probe side in
    // incrementalDedup — and each consumer would otherwise replay the
    // k-way minhash aggregation over the exploded shingles)
    val sigs = ex.groupBy(col("id"))
      .agg(minHashAggs(k, fam).head, minHashAggs(k, fam).tail: _*)
      .select(col("id"), array((0 until k).map(s => col(s"h$s")): _*).as("minhash"))
    val banded = sigs.select(col("id"),
      posexplode(array((0 until bands).map { b =>
        fam.hash(concat_ws(",",
          (0 until rows).map(r => col("minhash").getItem(b * rows + r)): _*))
      }: _*)).as(Seq("band", "bucket")))
    (sh, if (materialize) banded.persist() else banded)
  }

  /** Exact-Jaccard verification of candidate pairs against two shingle
    * tables (4dp-rounded ratio, the cross-engine comparison form).
    */
  private def verifyJaccard(cand: DataFrame, shLeft: DataFrame,
      shRight: DataFrame, leftId: String, rightId: String,
      threshold: Double): DataFrame =
    cand
      .join(shLeft.select(col("id").as(leftId), col("sh").as("sh_a")), leftId)
      .join(shRight.select(col("id").as(rightId), col("sh").as("sh_b")), rightId)
      // NO length pre-filter here (round-15 measurement): LSH-banded
      // candidates already share k/bands exact minhash components, which
      // implies near-compatible set sizes — a measured sf0.1 run kept
      // 256 of 256 candidates, so the extra per-row predicate was pure
      // overhead. The PPJoin length/positional prunes live where they
      // pay: inside the prefix join of jaccardPairsFromShingles.
      .select(col(leftId), col(rightId),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)

  def minHashLshPairs(df: DataFrame, idCol: Column, textCol: Column,
                      n: Int = 3, k: Int = 32, bands: Int = 8,
                      verifyThreshold: Double = 0.7,
                      materialize: Boolean = true,
                      fam: HashFamily = XxHash,
                      maxBucket: Int = 64): DataFrame = {
    val (sh, banded) = lshIndex(df, idCol, textCol, n, k, bands, fam,
      materialize)
    val cand = boundedBucketPairs(banded, Seq("band", "bucket"), maxBucket,
        Seq(col("a.id").as("id_a"), col("b.id").as("id_b")))
      .distinct()
    // verify candidates with exact Jaccard on shingles
    verifyJaccard(cand, sh, sh, "id_a", "id_b", verifyThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over word shingles: for each bit, sum +1/-1 weighted by
    * shingle-hash bit, take sign. Near-identical docs get identical
    * signatures; bucket-join on the signature for near-dup candidates.
    * Pure aggregate expressions (explode + groupBy) — scales as one shuffle.
    *
    * The 64 per-bit counters are PACKED into 32 lane-sum aggregates: each
    * aggregate `p_j = SUM((h >> j) & 0x0000000100000001)` accumulates bit
    * j in its low 32-bit lane and bit j+32 in its high lane, halving the
    * aggregation width. 32-bit lanes (not 16) keep the packed sum inside a
    * signed long for up to 2^30 shingles per doc — a 16-bit-lane packing
    * would hit Spark's ANSI sum-overflow error at ~32k shingles, a size
    * real documents reach. The unpacked signature is bit-identical to the
    * naive 64-aggregate form (the DuckDB oracles replay that form).
    */
  def simHash(df: DataFrame, idCol: Column, textCol: Column,
              n: Int = 2, fam: HashFamily = XxHash): DataFrame = {
    val exploded = df.select(idCol.as("id"),
        explode(array_distinct(shingles(textCol, n))).as("sh"))
      .withColumn("h", fam.hash(col("sh")))
    // branch-free: ones_b = lane b of SUM((h >> (b%32)) & laneMask);
    // bit set iff 2*ones > count
    val laneMask = lit(0x0000000100000001L)
    val laneSums = (0 until 32).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(laneMask)).as(s"p$j")
    } :+ count(lit(1)).as("cnt")
    val agg = exploded.groupBy(col("id")).agg(laneSums.head, laneSums.tail: _*)
    val sig = (0 until 64).map { b =>
      val ones = shiftrightunsigned(col(s"p${b % 32}"), 32 * (b / 32))
        .bitwiseAND(lit(0xFFFFFFFFL))
      when(ones * 2 > col("cnt"), shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col("id"), sig.as("simhash"))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Quality-aware survivor selection over ANY clustering: keep the
    * best-scored member per cluster (score desc, id asc tie-break) plus
    * the cluster size — the "keep the longest / cleanest variant" policy
    * production dedup wants where [[exact]]/[[dedupClusters]]' min-id
    * survivor is arbitrary. Composes with any (id, cluster) assignment
    * (exact digest, simhash signature, CC cluster id) and any (id, score)
    * frame (text length, [[TextAnalysis.gopherFilter]] stats, an LM
    * score). One equi-join on id + one window shuffle on the cluster key.
    *
    * Output: (cluster, keep_id, score, n_members).
    */
  def bestSurvivor(assign: DataFrame, idCol: Column, clusterCol: Column,
                   scores: DataFrame, scoreIdCol: Column,
                   scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = assign.select(idCol.as("doc_id"), clusterCol.as("cluster"))
    val s = scores.select(scoreIdCol.as("doc_id"), scoreCol.as("score"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("score").desc, col("doc_id"))
    a.join(s, "doc_id")
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy(col("cluster"))))
      .filter(col("__rn") === 1)
      .select(col("cluster"), col("doc_id").as("keep_id"), col("score"),
        col("n_members"))
  }

  /** SimHash near-dup retrieval (the Manku et al. WWW'07 design): pairs of
    * docs whose simhashes differ in at most `maxHamming` bits.
    * Candidates come from banding the signature's `sigBits` low bits into
    * `bands` equal slices — by pigeonhole, any pair with hamming distance
    * < `bands` matches exactly on at least one slice, so the (band, slice)
    * equi-join has NO false negatives for maxHamming < bands; exact hamming
    * filters the candidates. One shuffle on the slice values, no cross
    * join — the same scale shape as `minHashLshPairs` with a packed
    * signature instead of a k-value sketch.
    *
    * `sigBits` is the signature's effective width: 64 for `XxHash`, 60 for
    * `CrossEngineHash` (its md5-derived values occupy bits 0–59, so every
    * simhash bit 60–63 is constant-zero — banding over 64 bits would give
    * the top band only sigBits-48 informative bits and a collision rate
    * 2^(64-sigBits)× the others, exactly where hot buckets are born).
    * Slicing bits 0 to sigBits-1 keeps every band equally selective, and
    * the pigeonhole guarantee is unaffected: the constant-zero high bits
    * never differ, so all differing bits live inside the banded range.
    *
    * Hot buckets are bounded by `maxBucket` via [[boundedBucketPairs]];
    * see its scaladoc for the representative-star contract above the cap.
    */
  def simHashNearDupPairs(df: DataFrame, idCol: Column, textCol: Column,
                          n: Int = 2, maxHamming: Int = 3, bands: Int = 4,
                          fam: HashFamily = XxHash,
                          materialize: Boolean = true,
                          sigBits: Int = 64,
                          maxBucket: Int = 64): DataFrame = {
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands ($maxHamming >= $bands)")
    require(sigBits > 0 && sigBits <= 64 && sigBits % bands == 0,
      s"sigBits must be in (0, 64] and divisible by bands, got $sigBits/$bands")
    val bandBits = sigBits / bands
    val mask = (1L << bandBits) - 1
    // both sides of the banded self-join consume the signature table —
    // materialize it once or the full shingle+hash+bit-sum pipeline runs
    // twice (same tradeoff knob as ngramJaccardPairs)
    val sigs0 = simHash(df, idCol, textCol, n, fam)
    val sigs = if (materialize) sigs0.persist() else sigs0
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until bands).map { b =>
        shiftright(col("simhash"), b * bandBits).bitwiseAND(mask)
      }: _*)).as(Seq("band", "slice")))
    boundedBucketPairs(banded, Seq("band", "slice"), maxBucket,
        Seq(col("a.id").as("id_a"), col("b.id").as("id_b"),
          hamming(col("a.simhash"), col("b.simhash")).cast("long").as("hamming")))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over an undirected pair list via alternating
    * large-star / small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", SoCC'14) — the O(log n)-round formulation
    * that scales past the O(diameter) min-label propagation loop.
    *
    * Each round is two hash aggregations + two joins on node id (no
    * collect_list — a high-degree hub never materializes its neighbor
    * set on one row). Edge counts can only shrink or stay flat, so the
    * driver-side loop checks a one-row (count, checksum) aggregate per
    * round and stops at the fixpoint; with min-based stars the result is
    * deterministic regardless of partitioning.
    *
    * Input: (src, dst) long pairs, any direction, self-loops ignored.
    * Output: (id, component) for every node in the edge list, where
    * component = min node id of the cluster; roots map to themselves.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val raw = pairs.toDF("src", "dst").filter(col("src") =!= col("dst"))

    // large-star: link every strictly-larger neighbor of u to
    // m(u) = min(N(u) ∪ {u}); keeps (u, m) so minima survive the round
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("mn"), col("src")).as("m"))
      sym.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }

    // small-star: canonicalize to parent pointers (src > dst), link every
    // not-larger neighbor (and u itself) to the min
    def smallStar(e: DataFrame): DataFrame = {
      val canon = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val mins = canon.groupBy(col("src")).agg(min(col("dst")).as("m"))
      canon.join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // fixpoint signature: one-row scan; XOR is order-insensitive and
    // overflow-free, and rounds emit DISTINCT edges so set semantics hold
    def sig(e: DataFrame): (Long, Long) = {
      val r = e.select(F.hash64(concat_ws(":", col("src"), col("dst")))
        .as("h")).agg(count(lit(1)), expr("bit_xor(h)")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // lineage MUST be cut every round: both stars reference their input
    // several times, so without truncation the logical plan (and any
    // recomputation) grows exponentially in the round count. LAZY
    // localCheckpoint pins the round's edges and flattens the plan to a
    // scan, and the round's OWN sig() aggregate is the action that
    // materializes it — the eager form ran a second, separate
    // materialization job per round for nothing (r14: one job per round
    // instead of two, across every CC consumer). On a real cluster swap
    // in reliable checkpointing.
    //
    // Per-round shuffle sizing (round-15 directive 9): every round's
    // exchanges inherit the session's flat spark.sql.shuffle.partitions,
    // but edge counts shrink monotonically — at bench scale a late round
    // shuffles a few thousand 16-byte pairs across 32 partitions of pure
    // task overhead, and AQE's coalescing declines to shrink below the
    // default parallelism (parallelismFirst). The driver loop already
    // KNOWS each round's exact edge count from sig(); size the next
    // round's exchanges to ~2M pair rows (~32 MB, guide §2.2 "fewer,
    // larger") per partition, capped at the session's configured value
    // so a production-sized setting is never exceeded, and restore the
    // session conf afterwards. Partitioning never affects the result
    // (min-based stars are deterministic under any row placement).
    val spark = pairs.sparkSession
    val confKey = "spark.sql.shuffle.partitions"
    val sessionParts = scala.util.Try(spark.conf.get(confKey).toInt)
      .getOrElse(-1)
    val rowsPerPart = 2L << 20
    def roundParts(edgeCount: Long): Int =
      math.max(1L, math.min(sessionParts.toLong,
        (edgeCount + rowsPerPart - 1) / rowsPerPart)).toInt
    var edges = raw.localCheckpoint(false)
    var last = sig(edges)
    var done = last._1 == 0
    var it = 0
    try {
      while (!done && it < maxIter) {
        if (sessionParts > 0) spark.conf.set(confKey, roundParts(last._1))
        // (round-15 note: a double-step — two star alternations per
        // checkpoint — was tried to halve the serial action count and
        // measured 2x WORSE: each star references its input ~4 times,
        // so the un-checkpointed inner alternation is recomputed per
        // reference. One alternation per checkpoint is the optimum.)
        val next = smallStar(largeStar(edges)).localCheckpoint(false)
        val s = sig(next)
        edges = next
        done = s == last
        last = s
        it += 1
      }
    } finally {
      if (sessionParts > 0) spark.conf.set(confKey, sessionParts)
    }
    require(done, s"connectedComponents did not converge in $maxIter rounds")
    // converged edges are (member, root); roots label themselves
    edges.select(col("src").as("id"), col("dst").as("component"))
      .union(edges.select(col("dst").as("id"), col("dst").as("component")))
      .groupBy(col("id")).agg(min(col("component")).as("component"))
  }

  /** End-to-end near-duplicate clustering: MinHash+LSH candidate pairs →
    * connected components → one survivor per cluster (the min doc id —
    * deterministic and rerun-stable). Singletons are their own cluster.
    * This is the keep-one-per-cluster shape a pretraining-corpus dedup
    * actually ships: the pair list alone under-deletes (A~B, B~C must
    * drop two of three even when A~C missed the threshold).
    *
    * Output: (doc_id, cluster_id, is_survivor) for EVERY input doc.
    */
  def dedupClusters(df: DataFrame, idCol: Column, textCol: Column,
                    n: Int = 3, k: Int = 32, bands: Int = 8,
                    verifyThreshold: Double = 0.7,
                    fam: HashFamily = XxHash,
                    maxBucket: Int = 64): DataFrame = {
    val pairs = minHashLshPairs(df, idCol, textCol, n, k, bands,
        verifyThreshold, materialize = true, fam, maxBucket)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val cc = connectedComponents(pairs)
    df.select(idCol.as("doc_id"))
      .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .withColumn("is_survivor", col("cluster_id") === col("doc_id"))
  }

  /** Incremental near-dup admission: which docs of a NEW batch survive
    * against an already-admitted corpus — the daily-ingest shape of a
    * production dedup. The batch's bands PROBE the corpus band index;
    * the corpus is never self-joined, so per-ingest cost scales with the
    * batch, not the corpus (in production the corpus's `lshIndex` tables
    * are precomputed and stored — this recomputes them for verification
    * self-containment). Hot corpus buckets are capped at `maxBucket`
    * representatives (smallest ids — deterministic); within-batch pairs
    * go through the same [[boundedBucketPairs]] bound as q28.
    *
    * A batch doc whose verified-similarity component touches ANY corpus
    * doc is rejected with `dup_of` = the component's smallest corpus id
    * (transitive: B~A~corpus rejects B even when B~corpus missed the
    * threshold). Corpus-free components keep their smallest batch id.
    * Ids must be unique ACROSS both tables.
    *
    * Output: (doc_id, is_admitted, dup_of) for every batch doc.
    */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame,
                       idCol: Column, textCol: Column,
                       n: Int = 3, k: Int = 32, bands: Int = 8,
                       verifyThreshold: Double = 0.7,
                       fam: HashFamily = XxHash,
                       maxBucket: Int = 64,
                       materialize: Boolean = true): DataFrame = {
    val (shC, bandedC) = lshIndex(corpus, idCol, textCol, n, k, bands,
      fam, materialize)
    val (shB, bandedB) = lshIndex(batch, idCol, textCol, n, k, bands,
      fam, materialize)
    incrementalDedupAgainstIndex(shC, bandedC, shB, bandedB, batch, idCol,
      verifyThreshold, maxBucket)
  }

  /** Pair-level precision/recall of an approximate duplicate-pair
    * generator against exact ground truth —
    * [[graft.operators.Similarity.annRecall]]'s dedup sibling, closing
    * the tune-then-trust loop for band/threshold choices (run the exact
    * quadratic generator on a SAMPLE, measure what the LSH pipeline
    * recovers, then trust the LSH numbers at corpus scale). Inputs are
    * canonical `(id_a < id_b)` pair frames; one equi-join on the pair
    * key + one single-row aggregate (the A7 scalar shape).
    */
  def pairRecall(exact: DataFrame, approx: DataFrame): DataFrame = {
    val e = exact.select(col("id_a"), col("id_b")).withColumn("__e", lit(1L))
    val a = approx.select(col("id_a"), col("id_b")).withColumn("__a", lit(1L))
    e.join(a, Seq("id_a", "id_b"), "full_outer")
      .agg(sum(col("__e")).as("n_exact"), sum(col("__a")).as("n_approx"),
        sum(col("__e") * col("__a")).as("n_hit"))
      .select(
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        coalesce(col("n_approx"), lit(0L)).as("n_approx"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_approx"), lit(0L)), lit(1L))
            .cast("double"), 4).as("pair_precision"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_exact"), lit(0L)), lit(1L))
            .cast("double"), 4).as("pair_recall"))
  }

  /** Ticket-modulus BITS for an auto-sized hash sample: the smallest
    * power of two with `n / 2^bits <= targetSample` — pure integer
    * derivation, no float-boundary drift between engines. One count()
    * action; `sampleBits >= 0` pins the modulus and skips it.
    */
  private def sampleTicketBits(df: DataFrame, sampleBits: Int,
                               targetSample: Int): Int =
    if (sampleBits >= 0) sampleBits
    else {
      val cnt = df.count()
      val q = (cnt + targetSample - 1) / targetSample
      if (q <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(q - 1)
    }

  /** [[pairRecall]] with the exact side SAMPLED — the production form of
    * the tune-then-trust loop. The corpus-quadratic exact generator never
    * sees the corpus: a deterministic hash-ticket on the doc id (the
    * [[Sketches.hashSampledQuantiles]] sampling rule — identity-keyed, so
    * the same docs are sampled on every engine and every run) selects
    * ≈`targetSample` docs, BOTH generators run on that sample, and
    * precision/recall are evaluated over the sampled pair universe — an
    * unbiased estimate of corpus-level pair recall at any corpus size.
    *
    * Sizing is AUTOMATIC by default (`sampleBits < 0`): the ticket
    * modulus is the smallest power of two with `n / 2^bits <=
    * targetSample` ([[sampleTicketBits]]), so the exact side's cost is
    * ~constant as the corpus grows; pass an explicit `sampleBits` to pin
    * the modulus. One count() action sizes the ticket; everything else
    * is lazy.
    *
    * Output (single row): n_sample, sample_bits, n_exact, n_approx,
    * n_hit, pair_precision, pair_recall.
    */
  def pairRecallSampled(df: DataFrame, idCol: Column, textCol: Column,
                        sampleBits: Int = -1, targetSample: Int = 4096,
                        n: Int = 3, threshold: Double = 0.7,
                        k: Int = 32, bands: Int = 8,
                        fam: HashFamily = XxHash,
                        maxBucket: Int = 64): DataFrame = {
    require(targetSample >= 2, "targetSample must be >= 2")
    val bits = sampleTicketBits(df, sampleBits, targetSample)
    val m = 1L << bits
    val sample = df.select(idCol.as("id"), textCol.as("text"))
      .filter(pmod(F.hash64(col("id")), lit(m)) === 0)
      .persist()
    val exact = ngramJaccardPairs(sample, col("id"), col("text"), n,
      threshold, materialize = true, hashShingles = Some(fam))
    val approx = minHashLshPairs(sample, col("id"), col("text"), n, k,
      bands, threshold, materialize = true, fam, maxBucket)
    // single-row stats × single-row sample size — the A7 broadcast shape.
    // Degenerate ratios surface as NULL, not a fake 0.0: zero exact pairs
    // in the sample means "sample too small to measure recall at this
    // dup rate — raise targetSample", which a 0.0 would mask as "LSH
    // recovered nothing".
    sample.agg(count(lit(1)).as("n_sample"))
      .withColumn("sample_bits", lit(bits.toLong))
      .crossJoin(pairRecall(exact, approx))
      .withColumn("pair_precision",
        when(col("n_approx") > 0, col("pair_precision")))
      .withColumn("pair_recall",
        when(col("n_exact") > 0, col("pair_recall")))
  }

  /** [[pairRecall]] with only the EXACT side sampled — the production/
    * bench form when the LSH pipeline ITSELF is the system under test:
    * the approx generator runs at CORPUS scale (its cost is the number
    * being trusted), the corpus-quadratic exact generator runs on the
    * hash-ticket sample, and precision/recall are evaluated over the
    * sampled pair universe — approx pairs restricted by the same
    * deterministic ticket predicate on BOTH endpoints (a filter, not a
    * join: ticket membership is recomputable from the id). Unbiased for
    * the same reason [[pairRecallSampled]] is; differs from it in that
    * the candidate-generation cost being measured is the corpus-scale
    * one. Output shape matches pairRecallSampled (single row).
    */
  def pairRecallSampledExact(df: DataFrame, idCol: Column, textCol: Column,
                             sampleBits: Int = -1, targetSample: Int = 128,
                             n: Int = 3, threshold: Double = 0.7,
                             k: Int = 32, bands: Int = 8,
                             fam: HashFamily = XxHash,
                             maxBucket: Int = 64): DataFrame = {
    require(targetSample >= 2, "targetSample must be >= 2")
    val named = df.select(idCol.as("id"), textCol.as("text"))
    val bits = sampleTicketBits(named, sampleBits, targetSample)
    val m = 1L << bits
    def inSample(c: Column): Column = pmod(F.hash64(c), lit(m)) === 0
    val sample = named.filter(inSample(col("id"))).persist()
    val exact = ngramJaccardPairs(sample, col("id"), col("text"), n,
      threshold, materialize = true, hashShingles = Some(fam))
    val approx = minHashLshPairs(named, col("id"), col("text"), n, k,
        bands, threshold, materialize = true, fam, maxBucket)
      .filter(inSample(col("id_a")) && inSample(col("id_b")))
    sample.agg(count(lit(1)).as("n_sample"))
      .withColumn("sample_bits", lit(bits.toLong))
      .crossJoin(pairRecall(exact, approx))
      .withColumn("pair_precision",
        when(col("n_approx") > 0, col("pair_precision")))
      .withColumn("pair_recall",
        when(col("n_exact") > 0, col("pair_recall")))
  }

  /** [[minHashEstimatePairs]] over a hash-ticket SAMPLE of the corpus —
    * the 100 TB form of the estimator-quality eval. The exact all-pairs
    * ground truth is corpus-quadratic, so production tunes k on a
    * deterministic identity-keyed sample (same ticket rule as
    * [[pairRecallSampled]]: every engine and every run samples the same
    * docs) whose cost is ~CONSTANT as the corpus grows — the only
    * corpus-linear step left is the ticket filter scan itself. The
    * estimator-vs-exact rows over the sampled pair universe read the
    * estimator's spread at any corpus size; the exact whole-corpus form
    * ([[minHashEstimatePairs]]) stays the small-scale tune-time tool.
    */
  def minHashEstimatePairsSampled(df: DataFrame, idCol: Column,
                                  textCol: Column, sampleBits: Int = -1,
                                  targetSample: Int = 512, n: Int = 3,
                                  k: Int = 32, threshold: Double = 0.5,
                                  fam: HashFamily = XxHash): DataFrame = {
    require(targetSample >= 2, "targetSample must be >= 2")
    val named = df.select(idCol.as("id"), textCol.as("text"))
    val bits = sampleTicketBits(named, sampleBits, targetSample)
    val m = 1L << bits
    minHashEstimatePairs(
      named.filter(pmod(F.hash64(col("id")), lit(m)) === 0),
      col("id"), col("text"), n, k, threshold, fam)
  }

  /** The (shingles, bands) index tables [[incrementalDedupAgainstIndex]]
    * probes — public so a production pipeline can PERSIST them and pay
    * corpus-side indexing exactly once per document instead of once per
    * ingest: `sh` is (id, sh array<bigint>) — the doc's shingle-hash set
    * for exact-Jaccard verification; `banded` is (id, band, bucket) —
    * the LSH candidate-lookup rows.
    */
  def lshIndexTables(df: DataFrame, idCol: Column, textCol: Column,
                     n: Int = 3, k: Int = 32, bands: Int = 8,
                     fam: HashFamily = XxHash,
                     materialize: Boolean = true)
      : (DataFrame, DataFrame) =
    lshIndex(df, idCol, textCol, n, k, bands, fam, materialize)

  /** [[incrementalDedup]] with BOTH sides' index tables precomputed —
    * the probe core. Feed it a persisted corpus index
    * ([[lshIndexTables]] output, maintained incrementally as admitted
    * docs' rows are appended) and the per-ingest cost is genuinely
    * batch-sized: the corpus is neither re-shingled nor re-minhashed,
    * only probed by equi-join on (band, bucket) and on shingle ids.
    */
  def incrementalDedupAgainstIndex(corpusShingles: DataFrame,
                                   corpusBands: DataFrame,
                                   batchShingles: DataFrame,
                                   batchBands: DataFrame,
                                   batch: DataFrame, idCol: Column,
                                   verifyThreshold: Double = 0.7,
                                   maxBucket: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shC = corpusShingles
    val shB = batchShingles
    val bandedB = batchBands
    val wBucket = Window.partitionBy(col("band"), col("bucket"))
      .orderBy(col("id"))
    // probe-first: only corpus band rows whose (band,bucket) the batch
    // actually touches enter the occupancy cap — capping is per-bucket,
    // so restricting to probed buckets changes nothing downstream, and
    // the per-trigger window sorts O(probed buckets), not the whole
    // corpus index (the "batch-sized" contract made real)
    val bandedC = corpusBands.join(
      bandedB.select(col("band"), col("bucket")).distinct(),
      Seq("band", "bucket"), "left_semi")
    val cappedC = bandedC
      .withColumn("__rn", row_number().over(wBucket))
      .filter(col("__rn") <= maxBucket).drop("__rn")
    val candBC = bandedB.select(col("id").as("id_b"), col("band"),
        col("bucket"))
      .join(cappedC.select(col("id").as("id_c"), col("band"),
        col("bucket")), Seq("band", "bucket"))
      .select(col("id_b"), col("id_c")).distinct()
    val candBB = boundedBucketPairs(bandedB, Seq("band", "bucket"),
        maxBucket, Seq(col("a.id").as("id_b"), col("b.id").as("id_c")))
      .distinct()
    val edges =
      verifyJaccard(candBC, shB, shC, "id_b", "id_c", verifyThreshold)
        .select(col("id_b").as("src"), col("id_c").as("dst"))
      .union(
        verifyJaccard(candBB, shB, shB, "id_b", "id_c", verifyThreshold)
          .select(col("id_b").as("src"), col("id_c").as("dst")))
    val cc = connectedComponents(edges)
    val compCorpusMin = cc.join(shC.select(col("id")), "id")
      .groupBy(col("component")).agg(min(col("id")).as("corpus_min"))
    batch.select(idCol.as("doc_id"))
      .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .join(compCorpusMin, Seq("component"), "left")
      .select(col("doc_id"),
        (col("component").isNull ||
          (col("corpus_min").isNull && col("doc_id") === col("component")))
          .as("is_admitted"),
        when(col("corpus_min").isNotNull, col("corpus_min"))
          .when(col("doc_id") =!= col("component"), col("component"))
          .otherwise(lit(null).cast("long")).as("dup_of"))
  }

  /** Semantic deduplication over an embedding column — the SemDeDup shape
    * (Abbas et al. 2023, arXiv:2303.09540): random-hyperplane LSH buckets
    * stand in for the paper's k-means clusters, within-bucket pairs are
    * verified at exact cosine >= `threshold`, and the verified-similarity
    * graph collapses to one survivor per connected component (the min id —
    * deterministic and rerun-stable). The text-shingle analog is
    * [[dedupClusters]]; this catches paraphrase-level duplicates whose
    * surface n-grams share nothing.
    *
    * Scale: candidate generation is [[Similarity.lshCosinePairs]] (bucket
    * equi-join, hot buckets bounded — no cross join at any corpus size);
    * the closure is the same bounded large-star/small-star loop as every
    * other dedup. Singletons are their own cluster.
    *
    * Output: (vec_id, cluster_id, is_survivor) for EVERY input vector.
    */
  def semanticDedup(df: DataFrame, idCol: Column, vecCol: Column,
                    threshold: Double, bits: Int = 64, bands: Int = 8,
                    dim: Int = 64, maxBucket: Int = 64): DataFrame = {
    val pairs = Similarity.lshCosinePairs(df, idCol, vecCol, threshold,
      bits, bands, dim, maxBucket)
    val cc = connectedComponents(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    df.select(idCol.as("vec_id"))
      .join(cc.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("cluster_id"))
      .withColumn("is_survivor", col("cluster_id") === col("vec_id"))
  }

  // ---- Bloom-prefiltered incremental EXACT dedup ------------------------
  //
  // The daily-ingest form of [[exact]]: a batch is admitted against an
  // already-stored corpus. A plain `batch LEFT ANTI corpus` join must
  // shuffle-build on the CORPUS side (the build side of an anti join is
  // the right relation), so per-ingest cost tracks the corpus. The bloom
  // path inverts that: the corpus is summarized ONCE into a bitmap sketch
  // (built distributed with map-side combine, persisted and reused across
  // every future ingest), each batch row probes the broadcast bitmap at
  // scan speed, and only the sketch's "maybe" rows — ≈ true dups +
  // fpp·|batch| — reach an exact confirmation join whose corpus side is
  // semi-join-pruned first. The final answer is EXACT: the bloom only
  // decides who must be double-checked, never who is a duplicate.

  /** Optimal Bloom geometry for `expectedItems` keys at false-positive
    * rate `fpp`: `mBits = ceil(-n ln p / ln² 2)` rounded up to a whole
    * 64-bit word, `k = round(m/n · ln 2)` clamped to ≥ 1.
    */
  def bloomSizing(expectedItems: Long, fpp: Double): (Long, Int) = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val ln2 = math.log(2.0)
    val mRaw = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    val m = ((math.max(mRaw, 64L) + 63L) / 64L) * 64L
    // upper clamp matters for degenerate corpora: the 64-bit floor makes
    // m/n huge at n≲4, and the "optimal" k would exceed the 32-probe
    // bound (extra probes past 32 only cost time — fpp is already ~0)
    val k = math.min(32,
      math.max(1, math.round(m.toDouble / expectedItems * ln2).toInt))
    (m, k)
  }

  /** Maximum bitmap size: 2^30 bits = 128 MiB of driver/broadcast state
    * (~90 M keys at 1% fpp). Beyond that, shard the corpus by a hash
    * prefix and build one bitmap per shard — a bitmap that no longer
    * broadcasts has lost the reason to exist.
    */
  val MaxBloomBits: Long = 1L << 30

  /** Build the bitmap distributed: each key explodes to its k bit
    * positions, positions collapse to (word, OR of bits) with ordinary
    * partial aggregation — at most m/64 rows per partition cross the
    * wire regardless of corpus size — and the ≤ m/64 final words are
    * collected into a dense driver array. No UDF, no driver pass over
    * keys, one shuffle whose volume is the sketch, not the data.
    */
  def buildBloomBitmap(df: DataFrame, keyCol: Column, mBits: Long, k: Int,
                       fam: HashFamily = XxHash): Array[Long] = {
    require(mBits >= 64 && mBits % 64 == 0 && mBits <= MaxBloomBits,
      s"mBits must be a multiple of 64 in [64, $MaxBloomBits] " +
        "(shard the corpus for larger sketches)")
    require(k >= 1 && k <= 32, "k must be in [1, 32]")
    val base = fam.base(keyCol)
    val positions = array((0 until k).map(i =>
      pmod(fam.seeded(base, i), lit(mBits))): _*)
    val words = df
      .select(explode(positions).as("pos"))
      .select(floor(col("pos") / lit(64L)).cast("long").as("w"),
        call_function("shiftleft", lit(1L),
          (col("pos") % lit(64L)).cast("int")).as("bit"))
      .groupBy(col("w")).agg(bit_or(col("bit")).as("word"))
      // collect-bound: mBits/64 bitmap words — bloom-filter-sized, not corpus-sized
      .collect()
    val arr = new Array[Long]((mBits / 64L).toInt)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership-test column against a driver-held bitmap: k seeded
    * probes, each an `element_at` into the array LITERAL (one object in
    * the generated code, shipped once per task like any literal) plus a
    * variable shift-and-mask. False negatives are impossible; a `true`
    * is "maybe present" at the bitmap's design fpp.
    */
  def bloomMightContain(words: Array[Long], mBits: Long, k: Int,
                        keyCol: Column,
                        fam: HashFamily = XxHash): Column = {
    require(words.length.toLong * 64 == mBits,
      s"bitmap has ${words.length} words, expected ${mBits / 64}")
    val wordsLit = typedlit(words.toSeq)
    val base = fam.base(keyCol)
    (0 until k).map { i =>
      val pos = pmod(fam.seeded(base, i), lit(mBits))
      call_function("shiftright",
        element_at(wordsLit, floor(pos / lit(64L)).cast("int") + lit(1)),
        (pos % lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Persist a bitmap as a one-column parquet of words (index order)
    * named by a `_bloom_meta.json` sidecar (mBits, k, hash family, words
    * dir) — the build-once/probe-forever corpus index for
    * [[bloomIncrementalExact]]. The write is CRASH-SAFE generationally:
    * words land in a fresh `words-<uuid>` dir first and the meta swap
    * (tmp + ATOMIC_MOVE) publishes them last, so a reader never observes
    * a torn bitmap — a torn bitmap would mean false negatives, the one
    * failure a dedup bloom must never have. Superseded word dirs are
    * cleaned after the swap.
    */
  def writeBloomIndex(spark: org.apache.spark.sql.SparkSession,
                      words: Array[Long], mBits: Long, k: Int,
                      fam: HashFamily, path: String): Unit = {
    import spark.implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val gen = s"words-${java.util.UUID.randomUUID().toString.take(8)}"
    Files.createDirectories(Paths.get(path))
    // an explicit word index travels with each row: the reader sorts by
    // it rather than trusting row order out of a parquet scan, so no
    // row-group split or reader change can silently permute the bitmap
    // (a scrambled bitmap = false negatives = exact dups admitted)
    words.toSeq.zipWithIndex.map { case (w, i) => (i, w) }
      .toDF("idx", "word").coalesce(1)
      .write.mode("overwrite").parquet(Paths.get(path, gen).toString)
    val famName = fam match {
      case XxHash => "xxhash"
      case CrossEngineHash => "crossengine"
    }
    val meta =
      s"""{"mBits":$mBits,"k":$k,"family":"$famName","dir":"$gen"}"""
    val tmp = Paths.get(path, "_bloom_meta.json.tmp")
    Files.writeString(tmp, meta)
    Files.move(tmp, Paths.get(path, "_bloom_meta.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val ls = Files.list(Paths.get(path))
    try ls.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("words-") &&
        p.getFileName.toString != gen)
      .toSeq.foreach { stale =>
        val walk = Files.walk(stale)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
        finally walk.close()
      }
    finally ls.close()
  }

  /** Load a persisted bloom index: (words, mBits, k, family). */
  def readBloomIndex(spark: org.apache.spark.sql.SparkSession,
                     path: String): (Array[Long], Long, Int, HashFamily) = {
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "_bloom_meta.json")))
    val mBits = meta.get("mBits").asLong()
    val k = meta.get("k").asInt()
    val fam = meta.get("family").asText() match {
      case "crossengine" => CrossEngineHash
      case _ => XxHash
    }
    val words = new Array[Long]((mBits / 64L).toInt)
    val df = spark.read.parquet(
      java.nio.file.Paths.get(path, meta.get("dir").asText()).toString)
    // place each word by its persisted idx — never by scan row order
    // (legacy single-column indices fall back to the coalesce(1) order
    // they were written with)
    if (df.columns.contains("idx"))
      // collect-bound: mBits/64 persisted bitmap words — bloom-filter-sized
      df.select("idx", "word").collect().foreach { r =>
        words(r.getInt(0)) = r.getLong(1)
      }
    else
      // collect-bound: mBits/64 persisted bitmap words (legacy single-column layout)
      df.collect().zipWithIndex.foreach { case (r, i) =>
        words(i) = r.getLong(0)
      }
    (words, mBits, k, fam)
  }

  /** Incremental EXACT dedup with a bloom prefilter. Semantics match
    * [[incrementalDedup]] at exact grain: a batch doc whose normalized
    * text already exists in the corpus is rejected with `dup_of` = the
    * smallest matching corpus id; within-batch exact dups keep the
    * smallest batch id; everything else is admitted. Output: (doc_id,
    * is_admitted, dup_of, bloom_maybe) — `bloom_maybe` marks the rows
    * that needed the confirmation join (observability for fpp tuning;
    * engine-specific, so oracle projections drop it).
    *
    * Pass `index` (from [[readBloomIndex]]) to skip the corpus sketch
    * build — the production path, where the corpus is summarized once
    * and every subsequent ingest pays only: one batch scan (bitmap
    * probes), one batch-sized groupBy, and a corpus scan that
    * semi-joins against the broadcast-small maybe-set before its
    * fingerprint aggregate. Nothing in the plan shuffles the corpus.
    */
  def bloomIncrementalExact(corpus: DataFrame, batch: DataFrame,
                            idCol: Column, textCol: Column,
                            fpp: Double = 0.01,
                            fam: HashFamily = XxHash,
                            index: Option[(Array[Long], Long, Int)] = None)
      : DataFrame = {
    def fps(df: DataFrame) = df.select(idCol.as("doc_id"),
      fam.hash(normText(textCol)).as("fp"))
    val corpusFp = fps(corpus)
    val (words, m, k) = index.getOrElse {
      val n = math.max(corpusFp.count(), 1L)
      val (m0, k0) = bloomSizing(n, fpp)
      (buildBloomBitmap(corpusFp, col("fp"), m0, k0, fam), m0, k0)
    }
    val batchFp = fps(batch)
      .withColumn("bloom_maybe", bloomMightContain(words, m, k, col("fp"), fam))
    val maybeFps = batchFp.filter(col("bloom_maybe"))
      .select(col("fp")).distinct()
    val corpusHits = corpusFp
      .join(broadcast(maybeFps), Seq("fp"), "left_semi")
      .groupBy(col("fp")).agg(min(col("doc_id")).as("corpus_dup"))
    val batchMin = batchFp.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("batch_min"))
    batchFp
      .join(corpusHits, Seq("fp"), "left")
      .join(batchMin, Seq("fp"))
      .select(col("doc_id"),
        coalesce(col("corpus_dup"),
          when(col("doc_id") =!= col("batch_min"), col("batch_min")))
          .as("dup_of"),
        col("bloom_maybe"))
      .select(col("doc_id"), col("dup_of").isNull.as("is_admitted"),
        col("dup_of"), col("bloom_maybe"))
  }
}
