package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Document fingerprint: md5 of normalized text — the exact-dup signature.
    * (Rolling-hash content-defined chunk fingerprints are in Dedup.) */
  def fingerprint(c: Column): Column = md5(normText(c))

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
}
