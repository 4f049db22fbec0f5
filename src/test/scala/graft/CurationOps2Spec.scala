package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graphs, Joins, MergeOps, Similarity, TextAnalysis}

/** Round-9 operator semantics: label propagation, phrase search,
  * main-content extraction, binary-quantized rerank, prototype pruning,
  * PRF expansion — edge cases the sf-scale oracles don't isolate.
  */
class CurationOps2Spec extends SparkSpec {
  import spark.implicits._

  test("labelPropagation converges a clique to its smallest id") {
    // triangle 1-2-3 plus disjoint triangle 10-11-12: communities must
    // never bleed across components, and each converges to the min id
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val got = Graphs.labelPropagation(edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("labelPropagation star converges (self-vote damps oscillation)") {
    // star: hub 9 with leaves 1..4 — the bipartite shape that flips
    // hub/leaf labels forever under plain synchronous LPA. The self-vote
    // settles it: hub adopts 1 (smallest tied leaf label), every leaf
    // then ties {1, own} -> 1; stable by round 3
    val edges = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L))
      .toDF("src", "dst")
    val got = Graphs.labelPropagation(edges, iters = 4)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L), s"star must converge to one: $got")
  }

  test("phraseSearch counts overlapping occurrences and repeated terms") {
    val docs = Seq(
      (1L, "a b a b a"), // "a b a" occurs at 0 AND 2 (overlap)
      (2L, "b a b"),
      (3L, "c c c")).toDF("doc_id", "text")
    val phrases = Seq((0L, "a b a"), (1L, "b a b"), (2L, "a c"))
      .toDF("query_id", "phrase")
    val got = TextAnalysis.phraseSearch(docs, col("doc_id"), col("text"),
        phrases)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got == Map(
      (0L, 1L) -> (2L, 0L), // two overlapping hits, first at 0
      (1L, 1L) -> (1L, 1L),
      (1L, 2L) -> (1L, 0L)))
  }

  test("phraseSearch never matches across token gaps") {
    val docs = Seq((1L, "new deal york")).toDF("doc_id", "text")
    val phrases = Seq((0L, "new york")).toDF("query_id", "phrase")
    assert(TextAnalysis.phraseSearch(docs, col("doc_id"), col("text"),
      phrases).count() == 0)
  }

  test("extractMainContent drops link-dense blocks, keeps prose order") {
    val html = "<div><a href=\"/a\">Home</a> <a href=\"/b\">About</a></div>" +
      "<p>real prose paragraph one</p>" +
      "<div>mixed <a href=\"/c\">tiny</a> block with plenty of prose text</div>" +
      "<p>second paragraph</p>" +
      "<div><a href=\"/t\">Terms</a></div>"
    val got = TextAnalysis.extractMainContent(
        Seq((1L, html)).toDF("doc_id", "html"),
        col("doc_id"), col("html"))
      .as[(Long, Long, Long, String)].collect().head
    // blocks with text: nav, p1, mixed, p2, terms = 5; nav+terms drop
    assert(got._2 == 5 && got._3 == 3)
    assert(got._4 == "real prose paragraph one\n" +
      "mixed tiny block with plenty of prose text\nsecond paragraph")
  }

  test("binaryRerankTopK with full-corpus shortlist equals brute force") {
    // 24 deterministic 8-d vectors; shortlist >= corpus-1 makes the
    // Hamming stage a no-op filter, so the rerank MUST reproduce the
    // exact brute-force ranking
    val vecs = (0L until 24L).map { i =>
      (i, Array.tabulate(8)(j =>
        math.sin(i * 7 + j * 3).abs + 0.1))
    }.toDF("vec_id", "vec")
    val q = vecs.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(vecs, col("vec_id"), col("vec"),
        q, col("vec_id"), col("vec"), k = 5)
      .select("query_id", "corpus_id", "rank", "cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    val two = Similarity.binaryRerankTopK(vecs, col("vec_id"), col("vec"),
        q, col("vec_id"), col("vec"), shortlist = 23, k = 5, dim = 8)
      .select("query_id", "corpus_id", "rank", "cos")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(two == exact)
  }

  test("prototypePrune keeps exactly ceil(n*frac) hardest per cluster") {
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j =>
        math.cos(i * 13 + j * 5) + 2.0))
    }.toDF("vec_id", "vec")
    val got = Similarity.prototypePrune(vecs, col("vec_id"), col("vec"),
        k = 4, keepNum = 1, keepDen = 3)
      .select("cluster_id", "sim", "rank_in_cluster", "keep")
      .as[(Long, Double, Long, Boolean)].collect()
    got.groupBy(_._1).foreach { case (cid, rows) =>
      val n = rows.length
      val quota = (n + 2) / 3 // ceil(n/3)
      assert(rows.count(_._4) == quota, s"cluster $cid quota")
      // kept = the LOWEST-sim (hardest) ranks
      val keptMax = rows.filter(_._4).map(_._3).max
      val dropMin =
        if (rows.exists(!_._4)) rows.filter(!_._4).map(_._3).min
        else Long.MaxValue
      assert(keptMax < dropMin, s"cluster $cid keeps the hardest prefix")
    }
  }

  test("skewJoin reproduces the plain inner join exactly") {
    // key 0 is hot (60 rows > threshold 10); 1..9 are cold
    val fact = (0 until 100).map(i =>
      (i.toLong, if (i % 5 < 3) 0L else (i % 9 + 1).toLong, i * 1.5))
      .toDF("row_id", "k", "v")
    val dim = (0L to 9L).map(k => (k, s"grp${k % 3}")).toDF("k", "g")
    val plain = fact.join(dim, "k")
      .select("row_id", "k", "v", "g")
      .as[(Long, Long, Double, String)].collect().sorted.toSeq
    val skewed = Joins.skewJoin(fact, dim, "k", buckets = 4,
        hotThreshold = 10L)
      .select("row_id", "k", "v", "g")
      .as[(Long, Long, Double, String)].collect().sorted.toSeq
    assert(skewed == plain)
  }

  test("skewJoin with no hot keys degrades to the plain join") {
    val fact = (0 until 30).map(i => (i.toLong, (i % 10).toLong))
      .toDF("row_id", "k")
    val dim = (0L to 9L).map(k => (k, k * 2)).toDF("k", "d")
    val plain = fact.join(dim, "k").select("row_id", "d")
      .as[(Long, Long)].collect().sorted.toSeq
    val skewed = Joins.skewJoin(fact, dim, "k", buckets = 4,
        hotThreshold = 1000L)
      .select("row_id", "d").as[(Long, Long)].collect().sorted.toSeq
    assert(skewed == plain)
  }

  test("applyCdcBatch: latest change wins, D drops, I/U land") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val changes = Seq(
      (2L, "b2", "U", 1L), // update k=2
      (3L, "c", "D", 1L), // delete k=3
      (4L, "d", "I", 1L), // insert k=4
      (2L, "b2", "D", 2L) // seq-2 delete overrides the seq-1 update
    ).toDF("k", "name", "op", "seq")
    val got = MergeOps.applyCdcBatch(base, changes, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (4L, "d")))
  }

  test("applyCdcBatch rejects an ambiguous winning (key, seq) pair") {
    // validation is lazy (no job at construction) and fires at execution
    val base = Seq((1L, "a")).toDF("k", "name")
    val changes = Seq((1L, "x", "U", 1L), (1L, "y", "U", 1L))
      .toDF("k", "name", "op", "seq")
    val df = MergeOps.applyCdcBatch(base, changes, Seq("k")) // must not throw
    val e = intercept[Exception] { df.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate")), messages(e))
  }

  test("applyCdcBatch fails loudly on a NULL or unknown op") {
    val base = Seq((1L, "a")).toDF("k", "name")
    val changes = Seq((1L, "x", null.asInstanceOf[String], 1L))
      .toDF("k", "name", "op", "seq")
    val e = intercept[Exception] {
      MergeOps.applyCdcBatch(base, changes, Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("op must be I/U/D")), messages(e))
  }

  test("applyCdcBatch validates LOSING changes too (full-batch contract)") {
    // round-10 advice fix: the old per-row opCol rewrite let the
    // optimizer skip validation for rows pruned by the latest-wins
    // filter — a bad op on a superseded change slid through silently
    val base = Seq((1L, "a")).toDF("k", "name")
    val changes = Seq(
      (1L, "x", "BOGUS", 1L), // loses to seq 2 — must STILL raise
      (1L, "y", "U", 2L)
    ).toDF("k", "name", "op", "seq")
    val e = intercept[Exception] {
      MergeOps.applyCdcBatch(base, changes, Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("op must be I/U/D")), messages(e))
  }

  test("collocations: exact PMI from integer counts, minCount filter") {
    // "alpha beta" 6x (passes minCount=5); every filler bigram is unique
    val docs = ((1L to 6L).map(i => (i, "alpha beta")) ++
      (10L to 19L).map(i => (i, s"f${i}a f${i}b f${i}c")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, col("doc_id"), col("text"),
        minCount = 5, k = 10)
      .as[(String, String, Long, Double)].collect()
    assert(got.length == 1, s"only the alpha-beta pair qualifies: ${got.toSeq}")
    val (w1, w2, nAb, pmi) = got.head
    assert((w1, w2, nAb) == ("alpha", "beta", 6L))
    // N = 6*2 + 10*3 = 42 tokens; B = 6*1 + 10*2 = 26 bigrams
    val expected = BigDecimal(math.log((6.0 / 26.0) /
        ((6.0 / 42.0) * (6.0 / 42.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pmi == expected, s"pmi $pmi != $expected")
  }

  test("ngramContainmentPairs finds proper-subset copies one-way") {
    val docs = Seq(
      (1L, "p q r s t u v w"),
      (2L, "p q r s t u v w x y z"), // 1 is fully contained in 2
      (3L, "completely different words here entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.ngramContainmentPairs(docs, col("doc_id"),
        col("text"), n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    // sh(1) = 6 3-grams, all present in doc 2 -> containment 1.0;
    // reverse = 6/9 = 0.667 < 0.9; doc 3 shares nothing
    assert(got == Set((1L, 2L, 1.0)))
  }

  test("minHashEstimatePairs: identical docs estimate 1.0; est is n/k") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta DIFFERENT"),
      (4L, "totally unrelated words in this one here")
    ).toDF("doc_id", "text")
    val got = Dedup.minHashEstimatePairs(docs, col("doc_id"), col("text"),
        n = 3, k = 32, threshold = 0.5)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val (j12, e12) = got((1L, 2L))
    assert(j12 == 1.0 && e12 == 1.0, "identical docs: exact and est 1.0")
    // every estimate is an exact n/32 rational
    got.values.foreach { case (_, e) =>
      assert((e * 32).isWhole, s"est $e must be n/32") }
    // pair (1,3) shares 5 of 7 shingles (j = 5/8 ~ 0.56): present, and
    // the estimator lands within the k=32 binomial spread of the truth
    val (j13, e13) = got((1L, 3L))
    assert(j13 > 0.5 && math.abs(e13 - j13) < 0.35, s"($j13, $e13)")
    assert(!got.contains((1L, 4L)) && !got.contains((4L, 1L)))
  }

  test("prfExpandTopK promotes feedback terms and rescues new docs") {
    val docs = Seq(
      (1L, "x y filler1"), (2L, "x y filler2"), (3L, "x y filler3"),
      (4L, "y z only"), (5L, "z w none")).toDF("doc_id", "text")
    val q = Seq((0L, "x")).toDF("query_id", "term")
    val got = TextAnalysis.prfExpandTopK(docs, col("doc_id"), col("text"),
        q, k = 10, fbDocs = 3, fbTerms = 1, minFbDf = 2)
      .select("doc_id", "n_expanded")
      .as[(Long, Long)].collect()
    // feedback docs {1,2,3}; their only shared non-original term is "y"
    // (fb_df=3) -> expansion "y" rescues doc 4, which pass 1 missed
    assert(got.forall(_._2 == 1L), s"one expansion expected: ${got.toSeq}")
    assert(got.map(_._1).toSet.contains(4L), "expanded term must rescue doc 4")
    assert(!got.map(_._1).toSet.contains(5L), "doc 5 matches nothing")
  }
}
