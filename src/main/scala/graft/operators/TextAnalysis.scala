package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting. All pure `functions._` column
  * expressions — codegen'd, no UDFs, fully pushdown/prune-friendly, scale
  * linearly with no shuffle.
  */
object TextAnalysis {

  /** Normalized text: lowercase, collapse whitespace, strip leading/trailing. */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish subword count estimate: word-boundary pieces + digit runs +
    * punctuation, approximating a byte-pair tokenizer's piece count with a
    * deterministic regex (≈ tokens = words + punct + ceil(longword/4) extras).
    */
  def tokenCountBpe(c: Column): Column = {
    val pieces = size(split(trim(c), "[^A-Za-z0-9]+"))
    val punct = length(c) - length(regexp_replace(c, "[^A-Za-z0-9\\s]", ""))
    val longExtra = (length(c) / lit(16)).cast("int")
    when(length(trim(c)) === 0, lit(0)).otherwise(pieces + punct + longExtra)
  }

  /** Quality metrics struct: n_chars, n_tokens, punct_ratio, stopword_ratio,
    * mean_token_len. Ratios rounded to 4 decimals for cross-engine
    * determinism.
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  def qualityColumns(text: Column): Seq[Column] = {
    val t = normText(text)
    val nChars = length(t)
    val toks = split(t, " ")
    val nToks = size(toks)
    val punct = length(t) - length(regexp_replace(t, "[^a-z0-9 ]", ""))
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, x => array_contains(stopArr, x)))
    Seq(
      nChars.as("n_chars_norm"),
      nToks.as("n_tokens"),
      round(punct.cast("double") / greatest(nChars, lit(1)), 4).as("punct_ratio"),
      round(nStop.cast("double") / greatest(nToks, lit(1)), 4).as("stopword_ratio"),
      round(nChars.cast("double") / greatest(nToks, lit(1)), 4).as("mean_token_len"))
  }

  /** Initial BPE vocabulary: distinct words with corpus frequencies and
    * symbol sequences (characters + an explicit `</w>` end-of-word
    * marker). ONE corpus-scale shuffle; every BPE iteration after this
    * operates on the vocab table — orders of magnitude smaller than the
    * corpus — the same collapse SentencePiece/fastBPE trainers rely on
    * (pair counts are word-frequency-weighted, so the vocab table carries
    * the full corpus statistics exactly).
    */
  def bpeInitVocab(df: DataFrame, textCol: Column): DataFrame =
    df.select(explode(split(normText(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", concat(split(col("word"), ""), array(lit("</w>"))))

  /** Adjacent symbol pairs of a symbol-sequence column. */
  private def pairsOf(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<l:string,r:string>>"))
      .otherwise(transform(sequence(lit(0), size(syms) - 2),
        i => struct(element_at(syms, i + 1).as("l"),
          element_at(syms, i + 2).as("r"))))

  /** Corpus-weighted adjacent-symbol pair counts over a
    * [[bpeInitVocab]]-shaped vocab — the inner statistic of BPE training.
    * Output: (left_sym, right_sym, freq).
    */
  def bpePairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("freq"), explode(pairsOf(col("syms"))).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("freq")).as("freq"))

  /** Greedy left-to-right application of one merge (l, r) → l+r over a
    * symbol array, as a single codegen'd fold (state = emitted prefix +
    * one pending symbol; a match consumes both, so "a a a" merges to
    * ["aa","a"] and "a a a a" to ["aa","aa"] — standard BPE scan order).
    */
  private def applyMerge(syms: Column, l: String, r: String): Column = {
    val zero = struct(array().cast("array<string>").as("out"),
      lit(null).cast("string").as("prev"))
    aggregate(syms, zero,
      (acc, s) => {
        val out = acc.getField("out")
        val prev = acc.getField("prev")
        when(prev === lit(l) && s === lit(r),
          struct(concat(out, array(lit(l + r))).as("out"),
            lit(null).cast("string").as("prev")))
          .otherwise(struct(
            when(prev.isNull, out).otherwise(concat(out, array(prev)))
              .as("out"),
            s.as("prev")))
      },
      acc => when(acc.getField("prev").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("prev")))))
  }

  /** Distributed BPE vocabulary induction (Sennrich et al. 2016): learn
    * `merges` merge rules from the corpus. Shape: one corpus-scale shuffle
    * ([[bpeInitVocab]]), then per merge one SMALL vocab-table aggregation
    * (pair counts → arg-max pair, a bounded 1-row collect) and one
    * codegen'd per-row merge application; the corpus itself is never
    * re-read. Stops early when no pair occurs twice. The learned table
    * (merge_rank, left_sym, right_sym, freq) is the artifact a tokenizer
    * consumes; ranks are deterministic — ties break by (left, right)
    * symbol order, and every statistic is exact, not sampled.
    */
  def bpeTrain(df: DataFrame, textCol: Column, merges: Int): DataFrame = {
    require(merges >= 1, "merges must be >= 1")
    val spark = df.sparkSession
    var vocab = bpeInitVocab(df, textCol).persist()
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < merges && !done) {
      val top = bpePairCounts(vocab)
        .orderBy(col("freq").desc, col("left_sym"), col("right_sym"))
        // collect-bound: limit(1) — the single best merge pair per BPE iteration
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < 2) done = true
      else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        learned += ((i + 1, l, r, top.head.getLong(2)))
        val next = vocab
          .withColumn("syms", applyMerge(col("syms"), l, r)).persist()
        next.count() // materialize before dropping the previous generation
        vocab.unpersist()
        vocab = next
      }
      i += 1
    }
    vocab.unpersist()
    import spark.implicits._
    learned.toSeq.toDF("merge_rank", "left_sym", "right_sym", "freq")
  }

  /** Apply learned BPE merges to a text column: per-word symbol sequences
    * ([[bpeInitVocab]]'s chars + `</w>` form) folded through the merge
    * rules IN RANK ORDER, returning the tokenized corpus as
    * (id, tokens array<string>, n_tokens). Pure per-row codegen — the
    * merge chain compiles to `merges.size` nested folds, so keep the rule
    * count bounded (tens; beyond that Spark falls back from codegen to
    * interpreted evaluation — correct, slower). Production tokenizers
    * apply thousands of merges with a trie; this operator's contract is
    * the exact replay of [[bpeTrain]]'s rules for validation and for
    * token-count statistics at corpus scale.
    */
  def bpeEncode(df: DataFrame, idCol: Column, textCol: Column,
                merges: Seq[(String, String)]): DataFrame = {
    val words = filter(split(normText(textCol), " "), w => length(w) > 0)
    val base = transform(words,
      w => concat(split(w, ""), array(lit("</w>"))))
    val encodedWord = merges.foldLeft((syms: Column) => syms) {
      case (enc, (l, r)) => (syms: Column) => applyMerge(enc(syms), l, r)
    }
    df.select(idCol.as("doc_id"),
        flatten(transform(base, w => encodedWord(w))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")).cast("long"))
  }

  /** Gopher-style hard quality gate (Rae et al. 2021, Appendix A — the
    * rule family every production corpus filter descends from): per-doc
    * lexical statistics plus a conjunctive `keep` verdict. Emits every
    * statistic alongside the verdict so a pipeline can audit WHICH rule
    * fired (a bare boolean filter is undebuggable at corpus scale);
    * thresholds are knobs with the paper's defaults. Rules: word count in
    * [minWords, maxWords]; mean word length in [minMeanLen, maxMeanLen];
    * fraction of words containing an alphabetic character >= minAlphaFrac;
    * at least minStopwords stop-word hits.
    *
    * Pure per-row codegen'd higher-order functions — no shuffle, no UDF;
    * runs at scan speed, and a downstream `.filter(col("keep"))` pushes
    * to the scan like any other predicate.
    */
  def gopherFilter(df: DataFrame, idCol: Column, textCol: Column,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   minAlphaFrac: Double = 0.8,
                   minStopwords: Int = 2): DataFrame =
    df.select((idCol.as("doc_id") +: gopherStatColumns(textCol)): _*)
      .withColumn("keep", gopherKeep(minWords, maxWords, minMeanLen,
        maxMeanLen, minAlphaFrac, minStopwords))

  /** The Gopher rule statistics as named columns over a text column —
    * shared by [[gopherFilter]] (the batch gate) and the streaming
    * quality monitor ([[graft.streaming.Streams.qualityMonitor]]).
    */
  def gopherStatColumns(textCol: Column): Seq[Column] = {
    val toks = split(normText(textCol), " ")
    val n = size(toks)
    val sumLen = aggregate(toks, lit(0L), (acc, w) => acc + length(w))
    val alpha = size(filter(toks, w => w.rlike("[a-z]")))
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, w => array_contains(stopArr, w)))
    Seq(n.cast("long").as("n_words"),
      round(sumLen / greatest(n, lit(1)), 4).as("mean_word_len"),
      round(alpha / greatest(n, lit(1)), 4).as("alpha_frac"),
      nStop.cast("long").as("n_stopwords"))
  }

  /** The conjunctive Gopher verdict over [[gopherStatColumns]] output. */
  def gopherKeep(minWords: Int = 50, maxWords: Int = 100000,
                 minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                 minAlphaFrac: Double = 0.8,
                 minStopwords: Int = 2): Column =
    col("n_words").between(minWords, maxWords) &&
      col("mean_word_len").between(minMeanLen, maxMeanLen) &&
      col("alpha_frac") >= minAlphaFrac &&
      col("n_stopwords") >= minStopwords

  /** Language-ID heuristic: score text against per-language marker-word sets
    * (n-gram/stopword heuristic). Deterministic and SQL-expressible — the
    * point is the operator shape (argmax over per-language scores), not NLP
    * accuracy; swap marker sets for real profiles in production.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "is", "of", "to"),
    "de" -> Seq("der", "und", "ist", "von", "zu"),
    "es" -> Seq("el", "y", "es", "de", "que"),
    "fr" -> Seq("le", "et", "est", "de", "que"))

  def langIdScore(text: Column, markers: Seq[String]): Column = {
    val toks = split(normText(text), " ")
    val arr = array(markers.map(lit): _*)
    size(filter(toks, x => array_contains(arr, x)))
  }

  /** Predicted language = argmax over marker scores, ties broken by language
    * order; "und" (undetermined) when no marker hits.
    */
  def langIdPredict(text: Column): Column = {
    val scored = langMarkers.map { case (l, m) => (l, langIdScore(text, m)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // when-chain in declaration order: earlier languages win ties
    scored.tail.foldLeft(
      when(scored.head._2 === best && best > 0, lit(scored.head._1))) {
      case (acc, (l, s)) => acc.when(s === best && best > 0, lit(l))
    }.otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of normalized text — the exact-dup signature. */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Rolling polynomial fingerprint over the token stream:
    * `acc = (acc * 31 + hash64(token)) mod 2^31-1`, folded left to right —
    * ORDER-SENSITIVE, unlike the set-based md5 fingerprint, so token
    * transpositions produce different prints (the Rabin-Karp shape used for
    * content-defined signatures). Pure codegen'd higher-order functions, no
    * shuffle; every step is < 2^36 so no overflow in any engine, and the
    * per-token hash is the cross-engine md5-derived one — the whole print
    * replays in an external SQL oracle.
    */
  def fingerprintRolling(c: Column): Column = {
    val P = 2147483647L
    val hashed = transform(split(normText(c), " "),
      t => pmod(graft.functions.F.hash64(t), lit(P)))
    aggregate(hashed, lit(0L), (acc, h) => pmod(acc * 31 + h, lit(P)))
  }

  /** Top-k TF-IDF terms per document: term frequency per doc, document
    * frequency per term (one row per (doc, term) already, so df is a plain
    * count), corpus size via a broadcast single-row aggregate (no driver
    * collect — the q05 scalar-subquery shape), `tf * ln(N/df)` rounded for
    * cross-engine determinism, ranked per doc with a term tiebreak.
    * Shuffles: token groupBy, term groupBy, rank window — all on
    * well-distributed keys.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: Column, textCol: Column,
                    k: Int = 3): DataFrame = {
    val toks = df.select(idCol.as("doc_id"),
      explode(split(normText(textCol), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(idCol.as("doc_id")).distinct()
      .agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"),
        col("tfidf"), col("rank").cast("long").as("rank"))
  }

  /** End-to-end corpus cleaning — the standard pre-training filter chain
    * composed from this module + Dedup's exact signature:
    * quality gate (min tokens, max punctuation ratio) → exact dedup over
    * the SURVIVING docs (the group winner is the smallest passing id).
    * Returns kept docs with their quality stats. Two shuffles total
    * (digest groupBy + keeper join); at 100 TB both keys are
    * well-distributed hashes.
    */
  def cleanCorpus(df: DataFrame, idCol: Column, textCol: Column,
                  minTokens: Long = 5, maxPunctRatio: Double = 0.3)
      : DataFrame = {
    val q = qualityColumns(textCol)
    val scored = df.select(idCol.as("doc_id"),
      q(1).cast("long").as("n_tokens"), q(2).as("punct_ratio"),
      fingerprint(textCol).as("digest"))
    val passed = scored.filter(
      col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio)
    val keepers = passed.groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
    passed.join(keepers, Seq("digest", "doc_id"))
      .select(col("doc_id"), col("digest"), col("n_tokens"), col("punct_ratio"))
  }
  /** Cross-split n-gram decontamination — the standard LLM training-data
    * check (no reference analog; flag evaluation-split documents whose
    * n-gram shingles leak from the training split). Split assignment is
    * the content-stable hash split (rerun-safe), shingling reuses
    * `Dedup.shingles`, and the verdict counts DISTINCT shingles shared
    * with the train split's distinct shingle set.
    *
    * Scale: one explode + distinct per side, the train side reduced to
    * distinct shingles before a single left join (no fan-out: the right
    * side is distinct on the join key), one aggregation per eval doc.
    * Both shuffles key on the shingle string.
    */
  def crossSplitContamination(df: DataFrame, idCol: Column,
                              textCol: Column,
                              fractions: Seq[(String, Int)],
                              trainName: String, n: Int = 3,
                              minShared: Int = 3): DataFrame = {
    val ex = df.select(idCol.as("doc_id"),
        graft.functions.F.hashSplit(idCol, fractions).as("split"),
        explode(Dedup.shingles(textCol, n)).as("shingle"))
      .distinct()
    val train = ex.filter(col("split") === trainName)
      .select(col("shingle")).distinct().withColumn("__hit", lit(1))
    ex.filter(col("split") =!= trainName)
      .join(train, Seq("shingle"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_shared"))
      .select(col("doc_id"), col("split"), col("n_shingles"),
        col("n_shared"),
        (col("n_shared") >= minShared).as("is_contaminated"))
  }

  /** Within-document repetition metrics (the Gopher/MassiveText quality
    * rules, Rae et al. 2021 §A.1.1): per doc, the total and distinct
    * n-gram counts, the most-frequent n-gram's count, and the duplicate
    * n-gram fraction — the standard filters for boilerplate and
    * degenerate repetition in a pretraining corpus.
    *
    * Scale: explode + two hash aggregations, both keyed by doc (partial
    * aggregation combines map-side); no joins, no windows.
    */
  def repetitionMetrics(df: DataFrame, idCol: Column, textCol: Column,
                        n: Int = 2): DataFrame = {
    val toks = split(normText(textCol), " ")
    // sliding n-grams, non-distinct (unlike Dedup.shingles — repetition is
    // exactly what distinctness would erase); sequence() flips direction
    // when start > stop, so short docs guard to an empty array
    val gramArr = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
    val grams = df.select(idCol.as("doc_id"),
      explode(gramArr).as("gram"))
    grams
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"),
        max(col("cnt")).as("top_ngram_count"))
      .select(col("doc_id"),
        col("total_ngrams").cast("long").as("total_ngrams"),
        col("distinct_ngrams"), col("top_ngram_count"),
        ((col("total_ngrams") - col("distinct_ngrams")).cast("double")
          / col("total_ngrams").cast("double")).as("dup_ngram_frac"))
  }

  /** Corpus-trained bigram-LM scoring — the CCNet/perplexity-filter shape
    * (Wenzek et al. 2020): the corpus itself trains an add-one-smoothed
    * bigram model, and every document is scored by its average negative
    * log-likelihood under that model (low = fluent/common, high = noise).
    * `P(w2|w1) = (C(w1,w2)+1) / (C(w1)+V)` with C(w1) the count of bigram
    * CONTEXTS (so the distribution normalizes) and V the corpus vocabulary.
    *
    * Cross-engine determinism: double addition is order-sensitive, so each
    * bigram's nll is snapshotted to DECIMAL(18,4) BEFORE the per-doc sum —
    * decimal addition is exact and order-free — and the final average goes
    * through a DECIMAL(38,10) snapshot before its 4dp round (rounding a
    * raw double at output scale is engine-dependent at shortest-repr ties;
    * see Allocation's identical rule). The multiply stays within
    * DECIMAL(9,0)×DECIMAL(18,4) = DECIMAL(28,4) so Spark's
    * precision-overflow scale reduction (p>38 → scale loss) never fires
    * and both engines keep the product exact.
    *
    * Scale: one explode; count tables aggregate with map-side combine;
    * the score join keys on (w1,w2) — Zipf-skewed at the hot bigrams, so
    * pre-aggregate per (doc,bigram) first (done) and let AQE skew-split
    * the rest. No windows, no cross join; docs with <2 tokens surface with
    * n_bigrams=0 and a NULL score via the left spine join.
    */
  def ngramLmScore(df: DataFrame, idCol: Column, textCol: Column)
      : DataFrame = {
    val toks = split(normText(textCol), " ")
    val bigramArr = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"),
          element_at(toks, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    // the per-doc bigram counts feed BOTH the model (c2/c1 marginals) and
    // the scoring join — persist, or the explode + first shuffle replay
    // once per consumer (measured 20.6s → persisted form in one pass)
    val grams = df.select(idCol.as("doc_id"),
        explode(bigramArr).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))
      .persist()
    val cBig = grams.groupBy(col("w1"), col("w2"))
      .agg(sum(col("k")).as("c2"))
    val cCtx = cBig.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val vocab = df.select(explode(split(normText(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .agg(count_distinct(col("w")).as("v"))
    val nll = (log((col("c1") + col("v")).cast("double")) -
      log((col("c2") + 1).cast("double"))).cast("decimal(18,4)")
    // one (w1,w2)-grain probability table — a single scoring join instead
    // of two against the doc-grain frame (the bigger side)
    val nllTab = cBig.join(cCtx, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), nll.as("__nll"))
    val scored = grams
      .join(nllTab, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("k")).as("n_bigrams"),
        sum(col("k").cast("decimal(9,0)") * col("__nll")).as("sum_nll"))
      .select(col("doc_id"), col("n_bigrams"),
        round((col("sum_nll").cast("double") / col("n_bigrams"))
          .cast("decimal(38,10)"), 4).cast("double").as("avg_nll"))
    df.select(idCol.as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_nll"))
  }

  /** BM25 ranked retrieval (Robertson & Zaragoza 2009, the Lucene
    * `k1/b` form): score a small set of keyword queries against the
    * corpus and return the top-k documents per query.
    *
    * `score(d,q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf(t) = ln(1 + (N−df+0.5)/(df+0.5))` (always positive — the
    * Lucene variant).
    *
    * Scale shape: the corpus token explode is filtered to QUERY TERMS
    * first via a broadcast semi join — only matching postings survive the
    * explode, so the tf/df aggregations run over |matches|, not |corpus
    * tokens|. Document length is a per-row column (no shuffle); N and
    * avgdl are one broadcast single-row aggregate (the A7 scalar
    * pattern). Per-term scores snapshot to DECIMAL(18,6) before the
    * per-(query,doc) sum so double addition order can't drift
    * cross-engine; ranking is one window keyed by query_id.
    *
    * `queries` is (query_id long, term string) — one row per query term,
    * terms pre-normalized like [[normText]] output.
    */
  def bm25TopK(df: DataFrame, idCol: Column, textCol: Column,
               queries: DataFrame, k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = queries.select(col("query_id").cast("long").as("query_id"),
      col("term").cast("string").as("term"))
    // ONE tokenized projection feeds both consumers (each pass over it
    // still scans the raw text — the SERVING form is [[bm25BuildIndex]]
    // + [[bm25TopKFromIndex]], which persists these tables once and
    // serves many query batches; this operator is the single-pass form)
    val base = df.select(idCol.as("doc_id"),
      split(normText(textCol), " ").as("__toks"))
    val docs = base
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
    // corpus stats: one broadcast single-row aggregate over the doc grain
    val stats = base
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // postings list restricted to query terms BEFORE any aggregation
    val postings = docs
      .join(broadcast(qTerms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    bm25Score(postings, dfreq, stats, qTerms, k, k1, b)
  }

  /** The shared BM25 scorer over (postings, dfreq, stats, query terms) —
    * identical arithmetic for the single-pass and index-served forms.
    */
  private def bm25Score(postings: DataFrame, dfreq: DataFrame,
                        stats: DataFrame, qTerms: DataFrame,
                        k: Int, k1: Double, b: Double): DataFrame = {
    // avgdl = sum_dl/n_docs: one double division of two exact integers —
    // bit-identical in any IEEE engine (never sum doubles)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val sat = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    postings
      .join(dfreq, Seq("term"))
      .join(broadcast(qTerms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__s", round(idf * sat, 6).cast("decimal(18,6)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matched"),
        sum(col("__s")).cast("double").as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("n_matched"),
        col("score"), col("rank"))
  }

  /** Build the persisted BM25 serving index — the corpus pass happens
    * ONCE, then [[bm25TopKFromIndex]] serves any number of query batches
    * from the stored tables (the [[bm25TopK]] scaladoc's serving form).
    * Returns (postings, dfreq, stats):
    * postings (term, doc_id, tf, dl), dfreq (term, df), stats one row
    * (n_docs, sum_dl). Write postings bucketed/partitioned by term and
    * the query-time probe becomes a pruned scan.
    */
  def bm25BuildIndex(df: DataFrame, idCol: Column, textCol: Column)
      : (DataFrame, DataFrame, DataFrame) = {
    val base = df.select(idCol.as("doc_id"),
      split(normText(textCol), " ").as("__toks"))
    val postings = base
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val stats = base
      .select(size(col("__toks")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    (postings, dfreq, stats)
  }

  /** Serve BM25 top-k from a prebuilt [[bm25BuildIndex]] index: both
    * index sides are filtered to the query terms by a broadcast semi
    * join before scoring, so query cost tracks the matched postings, not
    * the corpus. Result is bit-identical to [[bm25TopK]] on the same
    * corpus (a term's df over the full index equals its df over the
    * query-filtered postings — filtering other terms cannot change it).
    */
  def bm25TopKFromIndex(postings: DataFrame, dfreq: DataFrame,
                        stats: DataFrame, queries: DataFrame,
                        k: Int = 10, k1: Double = 1.2,
                        b: Double = 0.75): DataFrame = {
    val qTerms = queries.select(col("query_id").cast("long").as("query_id"),
      col("term").cast("string").as("term"))
    val wanted = qTerms.select(col("term")).distinct()
    bm25Score(
      postings.join(broadcast(wanted), Seq("term")),
      dfreq.join(broadcast(wanted), Seq("term")),
      stats, qTerms, k, k1, b)
  }

  /** Catalog names for a stored BM25 index at `path` — derived from the
    * path so two indexes never collide in the shared session catalog. */
  private[graft] def bm25IndexTableNames(path: String): (String, String) = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
    (s"graft_bm25_${h}_postings", s"graft_bm25_${h}_dfreq")
  }

  /** Persist a [[bm25BuildIndex]] index as BUCKETED catalog tables at
    * `path` — postings and dfreq bucketed AND sorted by `term`
    * (`buckets` files each), stats as a one-row parquet. The layout buys
    * the two properties a serving index needs at corpus scale:
    *
    *  - a query batch's `term IN (...)` probe reads only the matching
    *    bucket files (SelectedBucketsCount in the scan), and within a
    *    bucket file the term-sorted row groups let parquet skip
    *    non-matching pages — probe I/O tracks the query terms, not the
    *    corpus;
    *  - the postings-dfreq join clusters on `term` on BOTH sides, so the
    *    scoring plan has NO exchange under the per-(query,doc) aggregate
    *    (pinned by RetrievalCurationSpec).
    *
    * Requires bucketed scans to honor the layout
    * ([[graft.GraftSession]] sets
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`;
    * Spark's auto-disable rule would silently drop bucket pruning for
    * broadcast-planned probes). Rebuilds overwrite in place.
    */
  def bm25WriteIndex(spark: SparkSession, df: DataFrame, idCol: Column,
                     textCol: Column, path: String,
                     buckets: Int = 64): Unit = {
    import org.apache.spark.sql.SaveMode
    val (p, f, st) = bm25BuildIndex(df, idCol, textCol)
    val (pT, fT) = bm25IndexTableNames(path)
    p.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", s"$path/postings")
      .bucketBy(buckets, "term").sortBy("term").saveAsTable(pT)
    f.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", s"$path/dfreq")
      .bucketBy(buckets, "term").sortBy("term").saveAsTable(fT)
    st.write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** Serve BM25 top-k from a [[bm25WriteIndex]] store: the query batch's
    * distinct terms (driver-collected — a query batch is small by
    * definition; capped at `maxTerms` with a full-scan fallback) become
    * an IN-list filter on both bucketed tables, so the probe is
    * bucket-pruned at file level and page-pruned within files. Results
    * are bit-identical to [[bm25TopK]] over the indexed corpus.
    */
  def bm25TopKFromStoredIndex(spark: SparkSession, path: String,
                              queries: DataFrame, k: Int = 10,
                              k1: Double = 1.2, b: Double = 0.75,
                              maxTerms: Int = 1 << 16): DataFrame = {
    val (pT, fT) = bm25IndexTableNames(path)
    val terms = queries.select(col("term").cast("string").as("term"))
      // collect-bound: <= maxTerms+1 distinct query terms (limit-capped)
      .distinct().limit(maxTerms + 1).collect().map(_.getString(0))
    val (p, f) =
      if (terms.length > maxTerms) (spark.table(pT), spark.table(fT))
      else (spark.table(pT).filter(col("term").isInCollection(
          terms.toIndexedSeq)),
        spark.table(fT).filter(col("term").isInCollection(
          terms.toIndexedSeq)))
    bm25TopKFromIndex(p, f, spark.read.parquet(s"$path/stats"),
      queries, k, k1, b)
  }

  /** Corpus vocabulary coverage (the tokenizer-design question: "what
    * fraction of the token stream does a top-k vocabulary cover?"):
    * token frequencies ranked descending with the cumulative corpus
    * coverage fraction of each rank prefix.
    *
    * Scale shape: one token-grain hash aggregation (map-side combined),
    * then a distributed TakeOrdered top-k — the ONLY globally-ordered
    * state is the k-row result, so the rank/cumulative window that
    * follows runs over k rows, not the vocabulary (bounded
    * single-partition, the q88 contract). The token-stream total is a
    * broadcast single-row aggregate.
    */
  def vocabCoverage(df: DataFrame, textCol: Column, k: Int = 100)
      : DataFrame = {
    val toks = df.select(explode(split(normText(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
    // the stream total is the vocabulary's frequency sum — computed from
    // the aggregated (vocab-sized) table, not a second corpus explode
    val total = freq.agg(sum(col("freq")).as("n_total"))
    val topk = freq.orderBy(col("freq").desc, col("token")).limit(k)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("token"))
    topk.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_freq",
        sum(col("freq")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("token"), col("freq"), col("rank"),
        round(col("cum_freq").cast("double") /
          col("n_total").cast("double"), 6).as("cum_frac"))
  }

  /** Deterministic pseudo-trained weight table for
    * [[hashedLinearScore]]: bucket → integer milli-weight in
    * [-1000, 1000], a pure function of the bucket id via the
    * cross-engine hash (so an external oracle regenerates the identical
    * "model"). A real deployment replaces this with weights exported
    * from a trained fastText/logreg classifier — the SCORING path below
    * is unchanged.
    */
  def hashedModelWeights(spark: org.apache.spark.sql.SparkSession,
                         buckets: Int): DataFrame =
    spark.range(buckets.toLong).select(
      col("id").cast("long").as("bucket"),
      (pmod(graft.functions.F.hash64(concat(lit("w|"), col("id"))),
        lit(2001L)) - 1000L).cast("long").as("w_milli"))

  /** Hashed-feature linear classifier scoring (the fastText/DSIR-style
    * "apply a quality classifier to the whole corpus" pass): each token
    * hashes to one of `buckets` feature slots, the document's score is
    * the weight-sum of its token stream normalized by length, squashed
    * through a sigmoid.
    *
    * The inner product runs in INTEGER space (token counts × integer
    * milli-weights) so the per-doc sum is exact and order-free in any
    * engine; only the final normalize+sigmoid touches floating point, on
    * identical integer inputs. Scale shape: explode → per-(doc,bucket)
    * count (map-side combined) → broadcast join against the ≤`buckets`
    * weight table → per-doc sum. No windows, no global state.
    */
  def hashedLinearScore(df: DataFrame, idCol: Column, textCol: Column,
                        weights: DataFrame, buckets: Int): DataFrame = {
    val toks = df.select(idCol.as("doc_id"),
      explode(split(normText(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
    val feat = toks
      .select(col("doc_id"),
        pmod(graft.functions.F.hash64(concat(lit("f|"), col("token"))),
          lit(buckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    val scored = feat
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("w_milli")).as("dot_milli"))
    // null-safe: a token-less doc scores sigmoid(0) = 0.5. The spine is
    // the raw doc frame (one row per input row, like every sibling
    // operator and the oracle's LEFT JOIN) — no distinct, no extra
    // exchange
    val norm = coalesce(col("dot_milli"), lit(0L)).cast("double") /
      (greatest(coalesce(col("n_tokens"), lit(0L)), lit(1L)).cast("double")
        * 1000.0)
    df.select(idCol.as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dot_milli"), lit(0L)).as("dot_milli"),
        round(lit(1.0) / (lit(1.0) + exp(-norm)), 4).as("score"))
  }

  /** PII patterns: email and dashed phone numbers (KR mobile shape). Kept
    * simple and anchored on word-ish boundaries — the operator contract
    * (count + redact deterministically, pure codegen regex) is the point;
    * production swaps in its jurisdiction's pattern set.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "[0-9]{2,3}-[0-9]{3,4}-[0-9]{4}"

  /** PII detection + redaction: per doc, match counts per category and
    * the text with emails → `<EMAIL>`, phones → `<PHONE>` (emails first —
    * an email's digits must not be half-eaten by the phone pass). Pure
    * `regexp_extract_all`/`regexp_replace` — codegen, no shuffle.
    */
  def redactPii(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val noEmail = regexp_replace(textCol, emailPattern, "<EMAIL>")
    df.select(idCol.as("doc_id"),
      size(regexp_extract_all(textCol, lit(emailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(textCol, lit(phonePattern), lit(0)))
        .cast("long").as("n_phones"),
      regexp_replace(noEmail, phonePattern, "<PHONE>").as("redacted"))
  }

  /** Canonical URL — the web-corpus URL-dedup preprocessing step: the
    * same page crawled as `HTTPS://WWW.Site.com:443/a/?utm_source=x&b=2
    * &a=1#frag` and `https://site.com/a?a=1&b=2` must collapse to ONE
    * key before any exact/near dedup runs. Normalizations (each pure
    * codegen string/array functions — no UDF, scan speed):
    * scheme+host lowercased, `www.` and default ports (`:80`/`:443`)
    * stripped, trailing path `/` dropped (root stays `/`), empty path
    * becomes `/`, fragment dropped, query params SORTED with tracking
    * params (`utm_*`, `fbclid`, `gclid`, `msclkid`) removed.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostRaw = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = regexp_replace(
      regexp_replace(hostRaw, "^www\\.", ""), ":(80|443)$", "")
    val pathRaw = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val pathClean = when(pathRaw === "", lit("/"))
      .otherwise(when(length(pathRaw) > 1 &&
          pathRaw.substr(length(pathRaw), lit(1)) === "/",
        pathRaw.substr(lit(1), length(pathRaw) - 1)).otherwise(pathRaw))
    val queryRaw = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(queryRaw, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)"))
    val query = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&")))
      .otherwise(lit(""))
    when(scheme === "" || host === "", lower(url)) // not a URL: lowercase as-is
      .otherwise(concat(scheme, lit("://"), host, pathClean, query))
  }

  /** Exact URL dedup on the canonical form: every row keeps its
    * canonical URL and the smallest doc_id sharing it — the grouping
    * key a crawl-frontier / recrawl-collapse step joins on. One hash
    * aggregate + one equi-join (the [[graft.operators.Dedup.exact]]
    * shape at URL grain).
    */
  def urlDedup(df: DataFrame, idCol: Column, urlCol: Column): DataFrame = {
    val base = df.select(idCol.as("doc_id"), canonicalUrl(urlCol).as("curl"))
    val groups = base.groupBy(col("curl"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
    base.join(groups, "curl")
      .select(col("doc_id"), col("curl"), col("keep_id"), col("n_dups"))
  }

  /** Domain-scoped boilerplate line removal — the CCNet/RefinedWeb move
    * (Wenzek et al. 2020, arXiv:1911.00359 §3; Penedo et al. 2023,
    * arXiv:2306.01116 §4): a LINE recurring across many documents of the
    * same domain (nav bars, cookie banners, footers) carries no content;
    * remove it everywhere, keep the per-document prose. A line is
    * boilerplate in a domain when it appears (normalized) in MORE than
    * `maxDocFrac` of the domain's docs AND in at least `minDocs` docs;
    * whitespace-only lines are never counted and never removed.
    *
    * Scale: explode to line grain, ONE hash agg for per-(domain, line)
    * document frequency, one broadcast-sized domain-doc-count join, one
    * equi-join back, one per-doc reassembly agg — [[Dedup.chunkDedup]]'s
    * bounded two-exchange shape with the frequency key scoped by domain
    * (so a planet-scale corpus shards naturally by site and no single
    * line's count concentrates on one reducer beyond its own domain).
    *
    * Output per input doc: (doc_id, text cleaned, n_lines, n_removed).
    */
  def removeBoilerplate(df: DataFrame, idCol: Column, textCol: Column,
                        domainCol: Column, maxDocFrac: Double = 0.5,
                        minDocs: Int = 3,
                        materialize: Boolean = true): DataFrame = {
    val base = df.select(idCol.as("doc_id"), domainCol.as("domain"),
      textCol.as("text"))
    val lines0 = base.select(col("doc_id"), col("domain"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("lnorm", normText(col("line")))
    val lines = if (materialize) lines0.persist() else lines0
    val domDocs = base.groupBy(col("domain"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    val boiler = lines.filter(length(col("lnorm")) > 0)
      .groupBy(col("domain"), col("lnorm"))
      .agg(countDistinct(col("doc_id")).as("line_df"))
      .join(domDocs, "domain")
      .filter(col("line_df") >= minDocs &&
        col("line_df").cast("double") / col("n_docs").cast("double")
          > maxDocFrac)
      .select(col("domain"), col("lnorm"), lit(true).as("is_boiler"))
    val kept = lines.join(boiler, Seq("domain", "lnorm"), "left")
      .filter(col("is_boiler").isNull)
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    base.select(col("doc_id"),
        size(split(col("text"), "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }

  /** Lowercased host of a URL (port stripped), '' when not a URL. */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      ":[0-9]+$", "")

  /** Domain-blocklist verdicts — the UT1/adult-list curation step every
    * web corpus runs before quality filtering: a URL is blocked when its
    * host IS a listed domain or is a SUBDOMAIN of one (`a.b.example.com`
    * matches listed `example.com`, never `notexample.com`).
    *
    * Scale: the host's suffix chain is generated inline (bounded by the
    * label count, ≤~10 entries — pure codegen array ops), exploded to
    * (doc, suffix) grain, and equi-joined against the blocklist. Real
    * blocklists are a few million short strings (tens of MB) — we
    * broadcast, so the corpus never shuffles; a larger list degrades to
    * a shuffled equi-join on the suffix key, still never a scan-per-rule
    * regex. Output keeps every input row with a verdict + the matched
    * rule, so the same frame serves filtering (`!blocked`) and audit.
    *
    * `blocklist`: one column `domain` (lowercased registrable suffix or
    * exact host).
    */
  def domainBlocklistFilter(docs: DataFrame, idCol: Column, urlCol: Column,
                            blocklist: DataFrame,
                            broadcastList: Boolean = true): DataFrame = {
    val base = docs.select(idCol.as("doc_id"), urlCol.as("url"),
      urlHost(urlCol).as("host"))
    val labels = split(col("host"), "\\.")
    val suffixes = transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels) - i + 1), "."))
    val cand = base.filter(col("host") =!= "")
      .select(col("doc_id"), explode(suffixes).as("sfx"))
    val rules0 = blocklist.select(lower(col("domain")).as("sfx")).distinct()
    val rules = if (broadcastList) broadcast(rules0) else rules0
    val hits = cand.join(rules, "sfx")
      .groupBy(col("doc_id"))
      // longest (most specific) matching rule wins the audit column
      .agg(max(struct(length(col("sfx")).as("l"), col("sfx").as("s")))
        .getField("s").as("matched_domain"))
    base.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("url"), col("host"),
        col("matched_domain").isNotNull.as("blocked"),
        col("matched_domain"))
  }

  /** HTML → text extraction — the stage between a crawl's `response`
    * payloads and the text-curation pipeline (reference behavior: the
    * jusText/trafilatura role, reduced to a deterministic, engine-
    * portable transform). Drops script/style blocks and comments,
    * turns block-level tags into line breaks (so the boilerplate
    * remover still sees line structure), strips remaining tags,
    * decodes the six entities that dominate real markup, and
    * normalizes whitespace to single-spaced non-blank lines.
    *
    * Pure `regexp_replace`/`replace` chain — codegen'd, zero shuffle,
    * linear in payload bytes; every pattern uses inline `(?i)(?s)`
    * flags and no backreferences, so the identical regexes run under
    * DuckDB's RE2 for the oracle. Malformed markup degrades softly
    * (an unclosed `<script>` eats to end-of-document — the same
    * choice browsers make).
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(coalesce(html, lit("")),
      "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    // any opener still present is unclosed -> eats to end-of-document
    val noOpen = regexp_replace(noStyle,
      "(?is)<(script|style)\\b[^>]*>.*$", " ")
    val noComment = regexp_replace(noOpen, "(?s)<!--.*?-->", " ")
    val blockBroken = regexp_replace(noComment,
      "(?i)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|blockquote|" +
        "section|article|header|footer|title|pre|form)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blockBroken, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    val oneSpace = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val tightLines = regexp_replace(oneSpace, " *\\n *", "\n")
    val oneNewline = regexp_replace(tightLines, "\\n+", "\n")
    trim(oneNewline, " \n")
  }

  /** Resolve an href against its page URL (RFC 3986 subset): absolute
    * URLs pass through, `//host/...` takes the base's scheme, `/path`
    * takes the base's origin, anything else joins the base's directory;
    * fragments are stripped and `/./` segments collapsed. Dot-dot
    * segments are left unresolved (documented subset — they are rare in
    * href attributes and a canonical-URL stage downstream treats the
    * raw string uniformly). Pure string/regex ops, engine-portable.
    */
  def resolveUrl(base: Column, href: Column): Column = {
    val h = trim(regexp_replace(href, "#.*$", ""))
    val scheme = regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    val origin = regexp_extract(base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val baseNoQ = regexp_replace(base, "[?#].*$", "")
    // directory of the base: through the last '/' after the origin;
    // a bare origin (no path) gets '/'
    val baseDir = when(regexp_replace(baseNoQ, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "") === "",
        concat(origin, lit("/")))
      .otherwise(regexp_replace(baseNoQ, "[^/]*$", ""))
    val resolved =
      when(h === "", baseNoQ)
        .when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), h)
        .when(h.startsWith("//"), concat(scheme, lit(":"), h))
        .when(h.startsWith("/"), concat(origin, h))
        .otherwise(concat(baseDir, h))
    // collapse '/./' runs (twice: adjacent '/././' leaves one after a
    // single pass because matches cannot overlap)
    regexp_replace(regexp_replace(resolved, "/\\./", "/"), "/\\./", "/")
  }

  /** Outbound links of an HTML page: every `<a href=...>` value (double-
    * or single-quoted), resolved against the page URL, filtered to
    * http(s) targets (javascript:/mailto:/data: dropped). One output row
    * per (page, href occurrence) — duplicates kept; aggregate downstream
    * (e.g. [[linkGraphEdges]] counts them at domain grain).
    *
    * Scale: two `regexp_extract_all` passes + explode — scan-speed,
    * map-only, zero shuffle; output volume is the page's anchor count.
    */
  def extractLinks(df: DataFrame, idCol: Column, urlCol: Column,
                   htmlCol: Column): DataFrame = {
    val dq = regexp_extract_all(htmlCol,
      lit("(?i)<a\\b[^>]*\\bhref\\s*=\\s*\"([^\"]*)\""), lit(1))
    val sq = regexp_extract_all(htmlCol,
      lit("(?i)<a\\b[^>]*\\bhref\\s*=\\s*'([^']*)'"), lit(1))
    df.select(idCol.as("doc_id"), urlCol.as("url"),
        explode(concat(dq, sq)).as("href"))
      .select(col("doc_id"), col("url"), col("href"),
        resolveUrl(col("url"), col("href")).as("link"))
      .filter(col("link").rlike("^https?://"))
  }

  /** Anchor (href, text) pairs — anchor text is the classic external
    * relevance/quality signal for a linked page (it describes the TARGET,
    * written by a third party). Two `regexp_extract_all` passes over the
    * same pattern (group 1 = href, group 2 = inner markup) zip
    * positionally — identical pattern ⇒ identical match sets, so the
    * zip is total. The inner markup is cleaned with [[htmlToText]]
    * (anchors may contain <b>/<img>/entities), the href resolved with
    * [[resolveUrl]]; double-quoted hrefs only (the dominant form — the
    * [[extractLinks]] single-quote pass has no per-match text
    * alignment across two patterns, documented subset). Map-only.
    */
  def extractAnchors(df: DataFrame, idCol: Column, urlCol: Column,
                     htmlCol: Column): DataFrame = {
    val pat = "(?is)<a\\b[^>]*\\bhref\\s*=\\s*\"([^\"]*)\"[^>]*>" +
      "(.*?)</a\\s*>"
    val zipped = zip_with(
      regexp_extract_all(htmlCol, lit(pat), lit(1)),
      regexp_extract_all(htmlCol, lit(pat), lit(2)),
      (h, t) => struct(h.as("href"), t.as("raw")))
    df.select(idCol.as("doc_id"), urlCol.as("url"),
        explode(zipped).as("z"))
      .select(col("doc_id"), col("url"), col("z.href").as("href"),
        resolveUrl(col("url"), col("z.href")).as("link"),
        htmlToText(col("z.raw")).as("anchor_text"))
      .filter(col("link").rlike("^https?://"))
  }

  /** Sitemap entries: every `<url>`/`<sitemap>` block's `<loc>` (+
    * optional `<lastmod>`) — the crawl-discovery companion to
    * [[graft.operators.Robots]] (sitemaps are advertised in robots.txt).
    * Handles both urlset and sitemapindex documents with one pattern;
    * `&amp;` in locs decoded (the one entity the sitemap spec requires
    * escaping that URLs commonly contain). lastmod is NULL when absent.
    */
  def sitemapEntries(df: DataFrame, idCol: Column, xmlCol: Column)
      : DataFrame = {
    val blocks = regexp_extract_all(coalesce(xmlCol, lit("")),
      lit("(?is)<(?:url|sitemap)\\b[^>]*>(.*?)</(?:url|sitemap)\\s*>"),
      lit(1))
    val loc = trim(regexp_extract(col("__b"),
      "(?is)<loc\\s*>\\s*(.*?)\\s*</loc\\s*>", 1))
    val lastmod = trim(regexp_extract(col("__b"),
      "(?is)<lastmod\\s*>\\s*(.*?)\\s*</lastmod\\s*>", 1))
    df.select(idCol.as("doc_id"), explode(blocks).as("__b"))
      .select(col("doc_id"),
        replace(loc, lit("&amp;"), lit("&")).as("loc"),
        when(lastmod === "", lit(null).cast("string"))
          .otherwise(lastmod).as("lastmod"))
      .filter(col("loc") =!= "")
  }

  /** Per-document Unicode SCRIPT profile — the multilingual routing gate
    * a corpus pipeline runs before language-specific processing (CCNet's
    * per-language sharding assumes one; the n-gram [[langId]] only
    * separates languages WITHIN a script). Counts letters per script via
    * regex-class strip-and-diff (`length(s) - length(remove(class, s))`)
    * — six codegen'd regexp_replace passes, zero explode, zero shuffle;
    * per-char work is map-only and linear in bytes at any corpus size.
    *
    * `dominant` is the first script (in the fixed column order below)
    * whose count equals the max — deterministic under ties; `keep` gates
    * on the dominant script holding at least `minDominantRatio` of all
    * letters (mixed-script spam fails it). Ratios divide two exact longs
    * in IEEE double — engine-order-invariant, so the whole frame is
    * SQL-oracle-expressible (RE2 spells the same classes `\p{Latin}`…).
    */
  def scriptProfile(df: DataFrame, idCol: Column, textCol: Column,
                    minDominantRatio: Double = 0.5): DataFrame = {
    def cnt(cls: String): Column =
      (length(textCol) - length(regexp_replace(textCol, cls, "")))
        .cast("long")
    val scripts = Seq(
      "latin" -> cnt("[\\p{IsLatin}]"),
      "cyrillic" -> cnt("[\\p{IsCyrillic}]"),
      "han" -> cnt("[\\p{IsHan}]"),
      "kana" -> cnt("[\\p{IsHiragana}\\p{IsKatakana}]"),
      "arabic" -> cnt("[\\p{IsArabic}]"),
      "hangul" -> cnt("[\\p{IsHangul}]"))
    val letters = cnt("[\\p{L}]")
    val withCounts = df.select(
      (idCol.as("doc_id") +: scripts.map { case (n, c) => c.as(s"c_$n") } :+
        letters.as("n_letters")): _*)
    val denom = greatest(col("n_letters"), lit(1L)).cast("double")
    val mx = greatest(scripts.map { case (n, _) => col(s"c_$n") }: _*)
    val dominant = scripts.foldLeft(when(mx === 0, "none")) {
      case (acc, (n, _)) => acc.when(col(s"c_$n") === mx, n)
    }.otherwise("other")
    withCounts.select(
      (col("doc_id") +: col("n_letters") +:
        scripts.map { case (n, _) =>
          (col(s"c_$n").cast("double") / denom).as(s"${n}_ratio") } :+
        dominant.as("dominant") :+
        (mx.cast("double") / denom >= lit(minDominantRatio)).as("keep")): _*)
  }

  /** Domain-grain link graph from [[extractLinks]] output: one edge per
    * (source domain, target domain) with the link count, self-loops
    * dropped — the frame [[Graphs.pageRank]] consumes. One hash
    * aggregate; edge cardinality is bounded by distinct domain pairs.
    */
  def linkGraphEdges(links: DataFrame, urlCol: Column,
                     linkCol: Column): DataFrame =
    links.select(urlHost(urlCol).as("src_domain"),
        urlHost(linkCol).as("dst_domain"))
      .filter(col("src_domain") =!= "" && col("dst_domain") =!= "" &&
        col("src_domain") =!= col("dst_domain"))
      .groupBy(col("src_domain"), col("dst_domain"))
      .agg(count(lit(1)).as("n_links"))

  /** Corpus-wide bigram collocations by pointwise mutual information —
    * the classic multiword-expression extractor (Church & Hanks 1990):
    * PMI = ln( p(w1,w2) / (p(w1)·p(w2)) ) with p from exact integer
    * counts (bigrams over B, unigrams over N), snapshotted to 6dp
    * DECIMAL so the ranking replays in any engine. `minCount` suppresses
    * the low-frequency PMI explosion (a hapax pair maxes the score).
    *
    * Scale: bigrams are built IN-EXPRESSION (zip tokens with their own
    * tail — map-only, no positional self-join); then one hash aggregate
    * at bigram grain, one at unigram grain, two equi-joins of bigram
    * counts to unigram counts on the word key, and the N/B single-row
    * aggregate broadcast (q61's corpus-stats pattern). Top-k is a
    * distributed TakeOrdered, never a global window.
    */
  def collocations(df: DataFrame, idCol: Column, textCol: Column,
                   minCount: Long = 5, k: Int = 100): DataFrame = {
    val toks = split(normText(textCol), " ")
    val bgArr = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val pairs = df.select(explode(bgArr).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val big = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val uni = df.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val stats = df.select(toks.as("t"))
      .agg(sum(size(col("t"))).cast("long").as("n_tok"),
        sum(greatest(size(col("t")) - 1, lit(0))).cast("long").as("n_big"))
    // DECIMAL-snapshot (no round(): cast rounding is the cross-engine-
    // stable form) of one double expression with pinned parenthesization
    val pmi = log(
      (col("n_ab").cast("double") / col("n_big").cast("double")) /
        ((col("n_a").cast("double") / col("n_tok").cast("double")) *
          (col("n_b").cast("double") / col("n_tok").cast("double"))))
      .cast("decimal(18,6)").cast("double")
    big
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .crossJoin(broadcast(stats))
      .select(col("w1"), col("w2"), col("n_ab"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }

  /** Exact phrase search over a positional token index — the retrieval
    * primitive BM25's bag-of-words scoring cannot express ("new york"
    * must not match "york ... new"). Alignment algebra instead of a
    * per-position self-join chain: a phrase of length L occurs at start
    * position a of a doc iff for EVERY phrase offset p the doc has
    * phrase-term(p) at token position a+p — so each (doc token ⋈ phrase
    * term) match votes for start = pos − p, and a start with L distinct
    * votes is an occurrence. One equi-join against the BROADCAST phrase
    * terms + one (query, doc, start) hash aggregate: cost tracks the
    * matched postings (like [[bm25TopK]]), never doc_len × phrase_len
    * windows, and phrase length never changes the plan shape.
    *
    * Output: (query_id, doc_id, n_hits, first_pos) — one row per doc
    * containing the phrase at least once.
    */
  def phraseSearch(df: DataFrame, idCol: Column, textCol: Column,
                   phrases: DataFrame): DataFrame = {
    val pt = phrases.select(col("query_id").cast("long").as("query_id"),
        posexplode(split(normText(col("phrase")), " "))
          .as(Seq("ppos", "term")))
      .withColumn("__plen", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))))
    val postings = df.select(idCol.as("doc_id"),
        posexplode(split(normText(textCol), " ")).as(Seq("pos", "term")))
    postings
      .join(broadcast(pt), Seq("term"))
      .filter(col("pos") - col("ppos") >= 0)
      .groupBy(col("query_id"), col("doc_id"),
        (col("pos") - col("ppos")).as("__start"))
      .agg(count(lit(1)).as("__votes"), first(col("__plen")).as("__plen"))
      .filter(col("__votes") === col("__plen"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("__start")).cast("long").as("first_pos"))
  }

  /** Line/block-grain main-content extraction by LINK DENSITY — the
    * jusText/trafilatura-family heuristic (Pomikálek 2011): navigation,
    * footers, and link farms are blocks whose text is mostly anchor
    * text; body prose is not. Blocks split on the block-level tag
    * boundaries, each scored by anchor-chars vs text-chars, and kept
    * when `anchorChars * den <= textChars * num` — an INTEGER
    * comparison (num/den is the max link density as a rational), so the
    * keep decision is exact in any engine, no float ratio anywhere.
    * Complements [[removeBoilerplate]] (cross-document frequency) with
    * a purely LOCAL signal: works on a single page, no corpus pass.
    *
    * Map-only until the per-doc reassembly aggregate (keyed by doc id);
    * all regex/string codegen — scan speed, zero corpus-wide state.
    *
    * Output: (doc_id, n_blocks, n_kept, main_text) — kept blocks'
    * tag-stripped text joined in document order.
    */
  def extractMainContent(df: DataFrame, idCol: Column, htmlCol: Column,
                         maxDensityNum: Int = 1, maxDensityDen: Int = 2)
      : DataFrame = {
    require(maxDensityNum >= 0 && maxDensityDen > 0,
      "max link density must be a non-negative rational")
    val blockSplit = "(?i)</?(?:p|div|li|ul|ol|h[1-6]|br|table|tr|td|section|article|header|footer|nav)[^>]*>"
    val blocks = df.select(idCol.as("doc_id"),
      posexplode(split(htmlCol, blockSplit)).as(Seq("bpos", "block")))
    val anchorText = array_join(regexp_extract_all(col("block"),
      lit("(?i)<a\\b[^>]*>([^<]*)</a>"), lit(1)), "")
    val text = trim(regexp_replace(col("block"), "<[^>]*>", ""))
    val scored = blocks
      .withColumn("__text", text)
      .withColumn("__alen", length(anchorText).cast("long"))
      .withColumn("__tlen", length(col("__text")).cast("long"))
      .filter(col("__tlen") > 0)
      .withColumn("keep",
        col("__alen") * maxDensityDen <= col("__tlen") * maxDensityNum)
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("keep"),
            struct(col("bpos"), col("__text"))))),
          b => b.getField("__text")), "\n").as("main_text"))
  }

  /** Pseudo-relevance-feedback query expansion (RM3-lite): run BM25,
    * take each query's top `fbDocs` documents as relevance feedback,
    * promote the terms occurring in at least `minFbDf` of them (ranked
    * by feedback document frequency, ties by term — pure integers, so
    * the expansion set is engine-replayable), union them into the query,
    * and score again. The classic recall lever when queries are short
    * and the corpus vocabulary is broad — and the standard sparse
    * counterpart to dense-retrieval fusion ([[graft.operators.Similarity.rrfFuse]]).
    *
    * Scale shape: the corpus is tokenized ONCE into a persisted
    * [[bm25BuildIndex]] index; both scoring passes serve from it
    * (bit-identical to [[bm25TopK]] by that operator's contract), and
    * the term-promotion aggregate reads the postings' (term, doc) grain
    * directly — no second tokenization anywhere. The feedback doc set
    * is `|queries| × fbDocs` rows, broadcast onto the postings, so the
    * promotion aggregate is feedback-bounded, not corpus-bounded.
    *
    * Output: [[bm25TopK]]'s shape over the EXPANDED term sets, plus
    * n_expanded (how many terms PRF added for the row's query).
    *
    * Persist lifetime: with materialize=true the postings cache lives
    * until LRU eviction or `spark.catalog.clearCache()` — the result is
    * lazy, so the operator cannot unpersist before the caller's action.
    * Long-lived sessions issuing many calls should pass
    * materialize=false and serve from the STORED index instead
    * ([[bm25WriteIndex]] / [[bm25TopKFromStoredIndex]]).
    */
  def prfExpandTopK(df: DataFrame, idCol: Column, textCol: Column,
                    queries: DataFrame, k: Int = 10, fbDocs: Int = 5,
                    fbTerms: Int = 3, minFbDf: Int = 2,
                    materialize: Boolean = true): DataFrame = {
    val qTerms = queries.select(col("query_id").cast("long").as("query_id"),
      col("term").cast("string").as("term"))
    val (postings0, dfreq0, stats0) = bm25BuildIndex(df, idCol, textCol)
    // the index feeds both scoring passes AND the promotion aggregate —
    // persist it instead of re-tokenizing the corpus per consumer (at
    // data-lake scale prefer materialize=false + the STORED index,
    // bm25WriteIndex / bm25TopKFromStoredIndex)
    val postings = if (materialize) postings0.persist() else postings0
    // stats and dfreq are consumed by BOTH scoring passes: unpersisted,
    // each pass re-TOKENIZED the corpus for the one-row stats frame and
    // re-aggregated the full vocabulary for dfreq (r14 measurement: two
    // extra corpus scans per run). Both are tiny (1 row; |vocab| rows)
    // and derive from the same build — persist alongside the postings.
    val dfreq = if (materialize) dfreq0.persist() else dfreq0
    val stats = if (materialize) stats0.persist() else stats0
    val fb = bm25TopKFromIndex(postings, dfreq, stats, qTerms, k = fbDocs)
      .select(col("query_id"), col("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("fb_df").desc, col("term").asc)
    val expansions = postings
      // postings are already (term, doc_id)-distinct — doc-frequency grain
      .select(col("doc_id"), col("term"))
      .join(broadcast(fb), Seq("doc_id"))
      .groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("fb_df"))
      .filter(col("fb_df") >= minFbDf)
      // never re-add an original term
      .join(qTerms.withColumn("__orig", lit(1)),
        Seq("query_id", "term"), "left_anti")
      .withColumn("__tr", row_number().over(w))
      .filter(col("__tr") <= fbTerms)
      .select(col("query_id"), col("term"))
    val nExp = expansions.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_expanded"))
    val expanded = qTerms.unionByName(expansions).distinct()
    bm25TopKFromIndex(postings, dfreq, stats, expanded, k = k)
      .join(broadcast(nExp), Seq("query_id"), "left")
      .select(col("query_id"), col("doc_id"), col("n_matched"),
        col("score"), col("rank"),
        coalesce(col("n_expanded"), lit(0L)).as("n_expanded"))
  }

}
