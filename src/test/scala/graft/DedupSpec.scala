package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 1
    (4L, "completely different text about spark engines here"),
    (5L, "THE  Quick   Brown fox jumps over the lazy dog") // normalized dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
    val dupGroup = out.filter(col("n_dups") === 3).collect()
    assert(dupGroup.length == 1)
    assert(dupGroup(0).getAs[Long]("keep_id") == 1L)
    assert(out.count() == 3) // {1,2,5}, {3}, {4}
  }

  test("ngram Jaccard finds near-duplicate pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
      n = 3, threshold = 0.5).collect()
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keys.contains((1L, 2L))) // exact dups → jaccard 1.0
    assert(keys.contains((1L, 3L))) // near dup above 0.5
    assert(!keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("PPJoin length+positional filters are lossless vs brute-force " +
      "all-pairs Jaccard") {
    // round-15: the prefix join carries PPJoin candidate prunes; they
    // must never drop a qualifying pair. Brute-force every doc pair on
    // the real fixture and compare the FULL output (ids and rounded
    // jaccard) at a threshold with integer-tie overlap bounds (0.5:
    // t/(1+t)*(szA+szB) is an exact integer whenever szA+szB % 3 == 0)
    // and at the production 0.7.
    val d = Tables.documents(spark, sf001).limit(300)
    val sh = d.select(col("doc_id").as("id"),
      array_distinct(Dedup.shingles(col("text"), 3)).as("sh"))
    val brute = sh.alias("a").join(sh.alias("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("j"))
    for (t <- Seq(0.5, 0.7)) {
      val expect = brute.filter(col("j") >= t)
        .select(col("id_a"), col("id_b"), round(col("j"), 4).as("jaccard"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val got = Dedup.ngramJaccardPairs(d, col("doc_id"), col("text"),
          n = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(got == expect,
        s"t=$t: PPJoin output != brute force (missing ${expect -- got}, " +
          s"extra ${got -- expect})")
      assert(expect.nonEmpty, s"t=$t: fixture lost its near-dup pairs")
    }
  }

  test("minhash LSH recall vs exact ngram Jaccard on real docs") {
    val d = Tables.documents(spark, sf001)
    val exact = Dedup.ngramJaccardPairs(d, col("doc_id"), col("text"),
        n = 3, threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashLshPairs(d, col("doc_id"), col("text"),
        n = 3, k = 32, bands = 8, verifyThreshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "expected known near-dup pairs in testdata")
    // verify step guarantees precision; recall should be high for sim>=0.8
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall too low (found ${lsh.size} of ${exact.size})")
    assert((lsh -- exact).isEmpty, "verified LSH pairs must be a subset of exact pairs")
  }

  test("simHashNearDupPairs retrieves identical/near docs, no cross join") {
    val pairs = Dedup.simHashNearDupPairs(docs, col("doc_id"), col("text"))
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)), "identical docs (hamming 0) must pair")
    assert(got.contains((1L, 5L)))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "banded join must be equi")
  }

  test("hot-bucket bound: 1k-doc identical cluster emits a linear star, not k² pairs") {
    // the adversarial dedup input: one giant near-dup cluster (mirrors/
    // boilerplate). All 1000 docs share every (band, slice) bucket; the
    // unbounded join would emit 999*1000/2 = 499,500 candidate pairs.
    val cluster = (1L to 1000L)
      .map(i => (i, "identical boilerplate text repeated across mirrored pages"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simHashNearDupPairs(cluster, col("doc_id"), col("text"),
      maxBucket = 16).collect()
    assert(pairs.length == 999, s"star reduce must emit k-1 pairs, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 1L), "every pair anchors at the representative")
    // connectivity: every cluster member reaches the representative
    assert((pairs.map(_.getLong(1)).toSet + 1L).size == 1000)

    val lsh = Dedup.minHashLshPairs(cluster, col("doc_id"), col("text"),
      maxBucket = 16).collect()
    assert(lsh.length == 999, s"minhash star reduce must emit k-1 pairs, got ${lsh.length}")
    assert(lsh.forall(r => r.getLong(0) == 1L && r.getDouble(2) == 1.0))
  }

  test("buckets at or under maxBucket keep exact all-pairs semantics") {
    val cluster = (1L to 20L)
      .map(i => (i, "identical boilerplate text repeated across mirrored pages"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simHashNearDupPairs(cluster, col("doc_id"), col("text"))
    assert(pairs.count() == 190, "20 identical docs under the cap -> C(20,2) pairs")
  }

  test("simHashNearDupPairs sigBits=60 bands cover the 60-bit cross-engine hash") {
    // same retrieval result as the 64-bit banding (banding changes candidate
    // generation, never the verified output) on the mixed doc set
    val got = Dedup.simHashNearDupPairs(docs, col("doc_id"), col("text"),
        fam = Dedup.CrossEngineHash, sigBits = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && got.contains((1L, 5L)))
  }

  test("simhash: identical docs share signature, near dups are close") {
    val sig = Dedup.simHash(docs, col("doc_id"), col("text"), n = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) == sig(5L))
    val nearDist = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    val farDist = java.lang.Long.bitCount(sig(1L) ^ sig(4L))
    assert(nearDist < farDist,
      s"near-dup hamming $nearDist should be < unrelated $farDist")
  }

  test("connectedComponents labels every node with its cluster min") {
    // components: {1,2,3,9} (chain 9-3, 3-1, 1-2), {5,7}, isolated 8 absent
    val pairs = Seq((9L, 3L), (3L, 1L), (2L, 1L), (7L, 5L), (5L, 7L))
      .toDF("src", "dst")
    val out = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L,
      5L -> 5L, 7L -> 5L))
  }

  test("connectedComponents handles a long chain and empty input") {
    // path 10-9-8-...-1 forces multiple star rounds
    val chain = (1L until 10L).map(i => (i + 1, i)).toDF("src", "dst")
    val out = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == (1L to 10L).map(_ -> 1L).toMap)
    val empty = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(empty.count() == 0)
  }

  test("incrementalDedup: batch admission against an existing corpus") {
    val corpus = Seq(
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "completely different text about spark engines here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),  // dup of corpus 2
      (3L, "the quick brown fox jumps over the lazy cat"),  // near dup → same comp
      (5L, "unique penguin sentence with no relatives at all"),
      (7L, "unique penguin sentence with no relatives at all") // batch dup of 5
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, batch, col("doc_id"),
        col("text"), n = 2, k = 16, bands = 8, verifyThreshold = 0.5)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out(1L) == ((false, Some(2L))), "exact corpus dup rejected")
    assert(out(3L) == ((false, Some(2L))), "transitive corpus dup rejected")
    assert(out(5L) == ((true, None)), "novel doc admitted")
    assert(out(7L) == ((false, Some(5L))), "within-batch dup points at survivor")
  }

  test("dedupClusters: transitive near-dups collapse to one survivor") {
    val out = Dedup.dedupClusters(docs, col("doc_id"), col("text"),
        n = 2, k = 16, bands = 8, verifyThreshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // 1,2,5 are (normalized-)identical; 3 is a near dup above 0.5 Jaccard
    assert(out(1L) == ((1L, true)))
    assert(out(2L) == ((1L, false)))
    assert(out(5L) == ((1L, false)))
    assert(out(3L)._1 == 1L && !out(3L)._2)
    // 4 is unrelated: its own singleton cluster, survives
    assert(out(4L) == ((4L, true)))
  }

  test("bestSurvivor keeps the best-scored member per cluster") {
    import spark.implicits._
    val assign = Seq((1L, 100L), (2L, 100L), (3L, 100L), (4L, 200L))
      .toDF("id", "cluster")
    val scores = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 5L))
      .toDF("id", "score")
    val out = Dedup.bestSurvivor(assign, col("id"), col("cluster"),
        scores, col("id"), col("score"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // cluster 100: ids 2 and 3 tie on score 30 -> smaller id wins
    assert(out(100L) == ((2L, 30L, 3L)))
    assert(out(200L) == ((4L, 5L, 1L)), "singleton survives itself")
  }

  test("pairRecall: hit/miss/false-positive accounting") {
    import spark.implicits._
    val exact = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val approx = Seq((1L, 2L), (4L, 5L), (7L, 8L)).toDF("id_a", "id_b")
    val r = Dedup.pairRecall(exact, approx).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 2L)))
    assert(r.getDouble(3) == 0.6667, "precision: 2 of 3 approx pairs real")
    assert(r.getDouble(4) == 0.6667, "recall: 2 of 3 exact pairs found")
    // empty approx side: zero hits, no division blowup
    val r0 = Dedup.pairRecall(exact, approx.limit(0)).head()
    assert((r0.getLong(1), r0.getLong(2), r0.getDouble(4)) == ((0L, 0L, 0.0)))
  }

  test("pairRecallSampled: sample-sized exact side tracks the full recall") {
    import spark.implicits._
    // planted corpus: 200 base docs + a near-dup for every 5th one
    // (~40 true pairs at Jaccard >= 0.7, spread uniformly over ids so a
    // hash sample keeps a measurable pair count)
    val base = (1L to 200L).map(i => (i,
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i " +
        s"iota$i kappa$i lambda$i mu$i"))
    val dups = (1L to 200L).filter(_ % 5 == 0).map(i => (1000L + i,
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i " +
        s"iota$i kappa$i lambda$i mu$i"))   // exact text dup of doc i
    val corpus = (base ++ dups).toDF("doc_id", "text")
    val full = Dedup.pairRecall(
      Dedup.ngramJaccardPairs(corpus, col("doc_id"), col("text"),
        n = 3, threshold = 0.7, hashShingles = Some(Dedup.XxHash)),
      Dedup.minHashLshPairs(corpus, col("doc_id"), col("text"))).head()
    assert(full.getLong(0) >= 30, s"planted pairs present: ${full.getLong(0)}")
    // explicit 1-bit ticket: ~half the docs, dup pairs survive when both
    // ends ticket in — deterministic, so the assertion is stable
    val s = Dedup.pairRecallSampled(corpus, col("doc_id"), col("text"),
      sampleBits = 1).head()
    val (nSample, nExact) = (s.getLong(0), s.getLong(2))
    assert(nSample > 60 && nSample < 140, s"~half sampled: $nSample")
    assert(nExact >= 5, s"sampled pair universe is measurable: $nExact")
    assert(!s.isNullAt(6) && math.abs(s.getDouble(6) - full.getDouble(4)) <= 0.2,
      s"sampled recall ${s.getDouble(6)} tracks full recall ${full.getDouble(4)}")
    // auto-sizing: a target at-or-above the corpus size keeps every doc
    val all = Dedup.pairRecallSampled(corpus, col("doc_id"), col("text"),
      targetSample = 4096).head()
    assert(all.getLong(0) == corpus.count() && all.getLong(1) == 0L)
    // degenerate sample (no exact pairs) reports NULL, not 0.0
    val distinctDocs = (1L to 50L).map(i => (i, s"only$i unique$i words$i " +
      s"here$i now$i then$i when$i how$i")).toDF("doc_id", "text")
    val d = Dedup.pairRecallSampled(distinctDocs, col("doc_id"), col("text"),
      sampleBits = 0).head()
    assert(d.getLong(2) == 0L && d.isNullAt(5) && d.isNullAt(6),
      "no measurable pairs -> NULL ratios")
  }

  test("chunkDedup: partitioning-invariant, dup counts bounded") {
    import spark.implicits._
    val df = (1L to 60L).map(i => (i,
      if (i % 3 == 0) "aa bb cc dd ee ff gg hh"
      else s"w$i x$i y$i z$i q$i r$i s$i t$i")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Dedup.chunkDedup(d, col("doc_id"), col("text"), n = 4)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val a = run(df)
    assert(run(df.repartition(7)) == a, "content-hash counts, no RNG")
    assert(a.values.forall { case (n, d, f) =>
      d <= n && f >= 0.0 && f <= 1.0 })
    // the 20 identical docs: every chunk duplicated
    assert(a(3L) == ((2L, 2L, 1.0)))
  }

  test("bloom bitmap: no false negatives, fpp within design bound") {
    import spark.implicits._
    val n = 2000L
    val keys = (1L to n).toDF("k")
    val (m, k) = Dedup.bloomSizing(n, 0.01)
    val words = Dedup.buildBloomBitmap(keys, col("k"), m, k)
    val contains = Dedup.bloomMightContain(words, m, k, col("k"))
    // every inserted key MUST test positive
    assert(keys.filter(!contains).count() == 0, "bloom false negative")
    // fresh keys: false-positive rate near the design point (3x slack
    // for the small-sample variance of 20k probes)
    val fresh = (n + 1 to n + 20000).toDF("k")
    val fp = fresh.filter(contains).count().toDouble / 20000
    assert(fp <= 0.03, s"fp rate $fp exceeds 3x design fpp 0.01")
  }

  test("bloomIncrementalExact survives degenerate corpora (0 and 1 docs)") {
    import spark.implicits._
    val batch = Seq((1L, "only doc"), (2L, "other doc")).toDF("doc_id", "text")
    // k would be ~44 unclamped at n=1 — the sizing clamp keeps it legal
    val (m1, k1) = Dedup.bloomSizing(1, 0.01)
    assert(k1 <= 32 && m1 == 64)
    val one = Seq((9L, "only doc")).toDF("doc_id", "text")
    val out1 = Dedup.bloomIncrementalExact(one, batch,
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out1 == Map(1L -> false, 2L -> true),
      "doc 1 duplicates the single corpus doc")
    val empty = one.limit(0)
    val out0 = Dedup.bloomIncrementalExact(empty, batch,
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out0 == Map(1L -> true, 2L -> true), "empty corpus admits all")
  }

  test("bloom index round-trips through parquet + meta sidecar") {
    import spark.implicits._
    val keys = (1L to 500L).toDF("k")
    val (m, k) = Dedup.bloomSizing(500, 0.01)
    val words = Dedup.buildBloomBitmap(keys, col("k"), m, k,
      Dedup.CrossEngineHash)
    val dir = java.nio.file.Files.createTempDirectory("bloomidx")
      .resolve("idx").toString
    Dedup.writeBloomIndex(spark, words, m, k, Dedup.CrossEngineHash, dir)
    val (w2, m2, k2, fam2) = Dedup.readBloomIndex(spark, dir)
    assert(m2 == m && k2 == k && fam2 == Dedup.CrossEngineHash)
    assert(java.util.Arrays.equals(words, w2))
  }

  test("bloomIncrementalExact matches plain anti-join semantics") {
    import spark.implicits._
    val corpus = Seq(
      (2L, "stored doc alpha"), (4L, "stored doc beta"),
      (6L, "stored doc alpha")).toDF("doc_id", "text") // 6 dups 2 in-corpus
    val batch = Seq(
      (1L, "stored doc ALPHA"),   // corpus dup of 2 (normalized)
      (3L, "fresh doc gamma"),    // new
      (5L, "fresh doc gamma"),    // within-batch dup of 3
      (7L, "fresh doc delta")     // new
    ).toDF("doc_id", "text")
    val out = Dedup.bloomIncrementalExact(corpus, batch,
        col("doc_id"), col("text"), fpp = 0.01)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(out(1L) == ((false, Some(2L))), "corpus dup -> smallest corpus id")
    assert(out(3L) == ((true, None)))
    assert(out(5L) == ((false, Some(3L))), "batch dup -> smallest batch id")
    assert(out(7L) == ((true, None)))
  }

  test("bloomIncrementalExact with persisted index == inline build; " +
    "corpus never shuffles in the probe plan") {
    val d = Tables.documents(spark, sf001)
    val corpus = d.filter(pmod(col("doc_id"), lit(2)) === 0)
    val batch = d.filter(pmod(col("doc_id"), lit(2)) === 1)
    val inline = Dedup.bloomIncrementalExact(corpus, batch,
      col("doc_id"), col("text"))
    val fps = corpus.select(graft.functions.F.hash64(
      graft.operators.TextAnalysis.normText(col("text"))).as("fp"))
    val (m, k) = Dedup.bloomSizing(math.max(corpus.count(), 1L), 0.01)
    val words = Dedup.buildBloomBitmap(fps, col("fp"), m, k)
    val indexed = Dedup.bloomIncrementalExact(corpus, batch,
      col("doc_id"), col("text"), index = Some((words, m, k)))
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(r => (r.getLong(0), r.getBoolean(1), Option(r.get(2)))).toSet
    assert(key(inline) == key(indexed))
    // scale property: the corpus side of the confirm join is semi-join
    // pruned against a BROADCAST maybe-set — no corpus-side exchange
    // feeds a sort-merge/shuffled-hash join anywhere in the plan
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "maybe-set semi join must broadcast")
  }
}
