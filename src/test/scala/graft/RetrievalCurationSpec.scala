package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Specs for the retrieval/curation operators added in round 5:
  * BM25 ranked retrieval, ExactSubstr span removal with reassembly,
  * DSIR importance weights, vocabulary coverage, hashed linear
  * classifier scoring.
  */
class RetrievalCurationSpec extends SparkSpec {

  test("bm25TopK ranks higher-tf docs first; rare terms outweigh common") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark runs fast"),
      (2L, "spark runs on a cluster"),
      (3L, "the cluster is big and the cluster is busy"),
      (4L, "nothing relevant here at all")).toDF("doc_id", "text")
    val queries = Seq((0L, "spark"), (1L, "cluster")).toDF("query_id", "term")
    val out = TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"),
      queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(3), r.getLong(4)))
      .toMap
    // query 0 ("spark"): doc 1 (tf=3) above doc 2 (tf=1); doc 3/4 absent
    assert(out((0L, 1L))._2 == 1L)
    assert(out((0L, 2L))._2 == 2L)
    assert(!out.contains((0L, 3L)) && !out.contains((0L, 4L)))
    // query 1 ("cluster"): doc 3 (tf=2) ranks above doc 2 (tf=1)
    assert(out((1L, 3L))._2 == 1L)
    assert(out((1L, 2L))._2 == 2L)
    // scores are positive and rank order matches score order
    assert(out.values.forall(_._1 > 0.0))
  }

  test("bm25TopK is deterministic under repartition and caps at k") {
    import spark.implicits._
    val docs = (1L to 40L)
      .map(i => (i, s"term${i % 5} filler$i words here"))
      .toDF("doc_id", "text")
    val queries = Seq((7L, "term0"), (7L, "term1")).toDF("query_id", "term")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bm25TopK(d, col("doc_id"), col("text"), queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
        .sortBy(x => (x._1, x._3)).toSeq
    val a = run(docs)
    assert(run(docs.repartition(7)) == a)
    assert(a.size == 5, "16 matching docs capped at k=5")
  }

  test("bm25 index round-trips through parquet and serves batches exactly") {
    import spark.implicits._
    val docs = (1L to 60L)
      .map(i => (i, s"term${i % 6} filler$i words and more here"))
      .toDF("doc_id", "text")
    val (p, f, st) = TextAnalysis.bm25BuildIndex(docs, col("doc_id"),
      col("text"))
    // persist the index once — the serving contract
    val dir = java.nio.file.Files.createTempDirectory("bm25idx")
      .toFile.getAbsolutePath
    p.write.parquet(s"$dir/postings")
    f.write.parquet(s"$dir/dfreq")
    st.write.parquet(s"$dir/stats")
    def served(queries: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bm25TopKFromIndex(
        spark.read.parquet(s"$dir/postings"),
        spark.read.parquet(s"$dir/dfreq"),
        spark.read.parquet(s"$dir/stats"), queries, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
          r.getLong(4))).sortBy(x => (x._1, x._4)).toSeq
    // batch 1 equals the single-pass operator bit-for-bit
    val q1 = Seq((0L, "term0"), (1L, "term1")).toDF("query_id", "term")
    val single = TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"),
        q1, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3),
        r.getLong(4))).sortBy(x => (x._1, x._4)).toSeq
    assert(served(q1) == single, "index-served == single-pass")
    // batch 2 serves from the SAME stored index, no corpus re-read
    val q2 = Seq((9L, "term5")).toDF("query_id", "term")
    val out2 = served(q2)
    assert(out2.nonEmpty && out2.forall(_._1 == 9L))
  }

  test("bucketed BM25 store: bit-identical serving, pruned exchange-free probe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case n => n +: n.children.flatMap(allNodes)
    }
    val docs = (1L to 80L)
      .map(i => (i, s"term${i % 8} filler$i words and more content here"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bm25bkt")
      .toFile.getAbsolutePath + "/idx"
    TextAnalysis.bm25WriteIndex(spark, docs, col("doc_id"), col("text"),
      dir, buckets = 32)
    val queries = Seq((0L, "term0"), (0L, "term3"), (1L, "term5"))
      .toDF("query_id", "term")
    // the GraftSession contract: bucketed scans honor the layout
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(autoKey, "true")
    spark.conf.set(autoKey, "false")
    try {
      val served = TextAnalysis.bm25TopKFromStoredIndex(spark, dir,
        queries, k = 5)
      val rows = served.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
        .sortBy(x => (x._1, x._4)).toSeq
      val single = TextAnalysis.bm25TopK(docs, col("doc_id"), col("text"),
          queries, k = 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
        .sortBy(x => (x._1, x._4)).toSeq
      assert(rows == single, "stored-index serving == single-pass, bit-identical")
      // plan pins: every index scan is bucket-pruned, and no shuffle sits
      // between an index scan and the postings-dfreq join (both sides
      // cluster on term from the layout alone)
      val plan = served.queryExecution.executedPlan
      val idxScans = allNodes(plan).collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(p => p.toString.contains("/idx/postings") ||
            p.toString.contains("/idx/dfreq")) => f
      }
      assert(idxScans.size == 2, s"postings + dfreq scans: ${idxScans.size}")
      idxScans.foreach { f =>
        val s = f.toString
        val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
          .findFirstMatchIn(s)
          .getOrElse(fail(s"index scan not bucket-pruned: ${s.take(300)}"))
        assert(m.group(1).toInt < m.group(2).toInt, m.matched)
      }
      val joins = allNodes(plan).filter(n =>
        n.nodeName.contains("Join") &&
          allNodes(n).count(idxScans.contains) == 2)
      assert(joins.nonEmpty, "postings-dfreq join present")
      // the index sides flow into the join with NO shuffle (the only
      // permitted exchange is the query batch's own tiny distinct) —
      // i.e. no ShuffleExchange has an index scan below it
      val shuffledIndex = allNodes(joins.last).collect {
        case s: ShuffleExchangeExec
          if allNodes(s.child).exists(idxScans.contains) => s
      }
      assert(shuffledIndex.isEmpty,
        s"index side must not shuffle:\n${joins.last}")
    } finally spark.conf.set(autoKey, prev)
  }

  test("removeDupSpans keeps the canonical first occurrence and reassembles") {
    import spark.implicits._
    // n=3 spans; docs 1 and 2 share their first span exactly; doc 3 is
    // unique and must round-trip losslessly (incl. its 2-token tail)
    val docs = Seq(
      (1L, "aa bb cc dd ee ff"),
      (2L, "aa bb cc xx yy zz"),
      (3L, "uu vv ww tail1 tail2")).toDF("doc_id", "text")
    val out = Dedup.removeDupSpans(docs, col("doc_id"), col("text"), n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 owns the canonical (smallest doc_id) copy of "aa bb cc"
    assert(out(1L) == ((2L, 0L, "aa bb cc dd ee ff")))
    // doc 2 loses that span but keeps its own unique second span
    assert(out(2L) == ((2L, 1L, "xx yy zz")))
    // unique doc round-trips losslessly, tail span kept
    assert(out(3L) == ((2L, 0L, "uu vv ww tail1 tail2")))
  }

  test("removeDupSpans: within-doc repeats collapse; partitioning-invariant") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rep rep rep rep rep rep rep rep"), // 4 identical 2-token spans
      (2L, "solo text only four tokens x")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.removeDupSpans(d, col("doc_id"), col("text"), n = 2)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val a = run(docs)
    assert(a(1L) == ((4L, 3L, "rep rep")), "one canonical span survives")
    assert(a(2L)._2 == 0L)
    assert(run(docs.repartition(5)) == a, "content-hash keys, no RNG")
  }

  test("exactSubstrDedup catches copies at ANY alignment (tiling misses)") {
    import spark.implicits._
    // doc 2 repeats doc 1's 4-token run shifted by one token: the n=4
    // TILES of doc 2 never line up with doc 1's, so removeDupSpans sees
    // nothing — the sliding window must still cover it
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),
      (2L, "zz aa bb cc dd qq rr ss")).toDF("doc_id", "text")
    val tiled = Dedup.removeDupSpans(docs, col("doc_id"), col("text"),
        n = 4).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(tiled(2L) == 0L, "tiled spans are blind to the shifted copy")
    val out = Dedup.exactSubstrDedup(docs, col("doc_id"), col("text"),
        l = 4).collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 owns the canonical occurrence of "aa bb cc dd" -> untouched
    assert(out(1L) == ((8L, 0L, "aa bb cc dd ee ff gg hh")))
    // doc 2 loses exactly the 4 duplicated tokens, keeps the rest
    assert(out(2L) == ((8L, 4L, "zz qq rr ss")))
  }

  test("exactSubstrDedup: long overlap covers the union of its windows") {
    import spark.implicits._
    // a duplicated region of 6 tokens at l=4 -> 3 duplicated windows
    // whose union is the full 6-token region, nothing more
    val docs = Seq(
      (1L, "p q r s t u tail1 tail2"),
      (2L, "head p q r s t u")).toDF("doc_id", "text")
    val out = Dedup.exactSubstrDedup(docs, col("doc_id"), col("text"),
        l = 4).collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((0L, "p q r s t u tail1 tail2")))
    assert(out(2L) == ((6L, "head")))
  }

  test("exactSubstrDedup: short docs, within-doc repeats, partitioning") {
    import spark.implicits._
    val docs = Seq(
      (1L, "too short"),                       // < l tokens: untouched
      (2L, "x y z x y z x y z"),               // period-3 self-repeat
      (3L, "")).toDF("doc_id", "text")         // empty text round-trips
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.exactSubstrDedup(d, col("doc_id"), col("text"), l = 3)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val a = run(docs)
    assert(a(1L) == ((2L, 0L, "too short")))
    // windows at pos 0..6 all repeat; canonical pos 0 kept -> 3 tokens
    assert(a(2L) == ((9L, 6L, "x y z")))
    assert(a(3L) == ((1L, 0L, "")))
    assert(run(docs.repartition(7)) == a, "content-hash keys, no RNG")
  }

  test("importanceWeights scores target-like docs above off-distribution") {
    import spark.implicits._
    // targets share the bigram vocabulary; probe 10 mirrors it, probe 11
    // uses disjoint bigrams. DSIR: w(10) > w(11).
    val docs = (1L to 8L).map(i => (i, "good clean prose text", true)) ++
      Seq((10L, "good clean prose text", false),
        (11L, "zz qq ww ee rr", false),
        (12L, "one", false)) // < 2 tokens -> NULL weight
    val df = docs.toDF("doc_id", "text", "tgt")
    val out = Sampling.importanceWeights(df, col("doc_id"), col("text"),
        col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(10L)._3.get > out(11L)._3.get,
      "target-like doc outweighs off-distribution doc")
    assert(out(12L) == ((false, 0L, None)), "short doc: 0 bigrams, NULL")
    assert(out(1L)._1, "target flag carried through")
  }

  test("vocabCoverage ranks by frequency with monotone cumulative coverage") {
    import spark.implicits._
    val df = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabCoverage(df, col("text"), k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq("a", "b", "c"), "freq desc, token tie")
    assert(out.map(_._2).toSeq == Seq(4L, 3L, 1L))
    // 9 tokens total: cum fractions 4/9, 7/9, 8/9
    assert(math.abs(out(0)._4 - 4.0 / 9) < 1e-4)
    assert(math.abs(out(2)._4 - 8.0 / 9) < 1e-4)
    assert(out.map(_._4).toSeq == out.map(_._4).sorted.toSeq, "monotone")
  }

  test("hashedLinearScore: exact integer dot product, sigmoid bounds") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha alpha alpha"),
      (3L, "")).toDF("doc_id", "text")
    val w = TextAnalysis.hashedModelWeights(spark, 32)
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.hashedLinearScore(d, col("doc_id"), col("text"), w, 32)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val out = run(docs)
    assert(out(1L)._1 == 3L)
    // doc 2: one token three times -> dot = 3 * w(alpha); doc 1's dot is
    // the sum of three single weights — both exactly reproducible
    val wAlpha = out(2L)._2 / 3
    assert(out(2L)._2 == 3 * wAlpha)
    assert(out.values.forall { case (_, _, s) => s > 0.0 && s < 1.0 })
    assert(out(3L) == ((0L, 0L, 0.5)), "token-less doc scores sigmoid(0)")
    assert(run(docs.repartition(4)) == out, "deterministic")
  }
}
