package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: orthogonal=0, identical=1, zero-vector safe") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0))
    ).toDF("a", "b")
    val out = df.select(round(Similarity.cosine(col("a"), col("b")), 6).as("c"))
      .collect().map(_.getDouble(0))
    assert(out(0) == 0.0)
    assert(out(1) == 1.0)
    assert(out(2) == 0.0)
  }

  test("bruteForceTopK ranks nearest vectors first") {
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    val q = e.filter(col("vec_id") === 0)
    val out = Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
      q, col("vec_id"), col("vec"), k = 5).collect()
    assert(out.length == 5)
    val cosines = out.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos"))
    assert(cosines.sliding(2).forall(p => p(0) >= p(1)), "cos must be descending by rank")
    assert(!out.exists(_.getAs[Long]("corpus_id") == 0L), "self excluded")
  }

  test("lshCosinePairs ⊆ exact cosinePairs; catches true near-dups") {
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    // plant a true near-duplicate: vec 9001 = vec 1 scaled (cosine 1.0)
    val dup = e.filter(col("vec_id") === 1)
      .select(lit(9001L).as("vec_id"), transform(col("vec"), x => x * 2.0).as("vec"))
    val corpus = e.unionByName(dup)
    val exact = Similarity.cosinePairs(corpus, col("vec_id"), col("vec"), 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshCosinePairs(corpus, col("vec_id"), col("vec"), 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH pairs must be a subset of exact pairs")
    assert(lsh.contains((1L, 9001L)), "a cosine-1.0 duplicate must always collide")
  }

  test("lshCosinePairs plan has no cross join") {
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    val plan = Similarity.lshCosinePairs(e, col("vec_id"), col("vec"), 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "bucketed near-dup must not cross join")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "bucketed near-dup must equi-join")
  }

  test("hot-bucket bound: identical-vector cluster stays linear") {
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    // 500 copies of one vector: every copy lands in the same bucket in all
    // 8 bands — the unbounded pair join would emit 124,750 candidates
    val clones = e.filter(col("vec_id") === 1)
      .select(explode(sequence(lit(10001L), lit(10500L))).as("vec_id"), col("vec"))
    val pairs = Similarity.lshCosinePairs(clones, col("vec_id"), col("vec"),
      threshold = 0.9, maxBucket = 16).collect()
    assert(pairs.length == 499, s"star reduce must emit k-1 pairs, got ${pairs.length}")
    assert(pairs.forall(_.getLong(0) == 10001L))

    // top-k: every member must still GET results — probe side is capped at
    // the bucket's 16 smallest ids, so each of the 500 queries re-ranks
    // <= 16 candidates instead of 499
    val topk = Similarity.lshTopK(clones, col("vec_id"), col("vec"),
      k = 5, maxBucket = 16)
    val got = topk.groupBy(col("query_id")).agg(count(lit(1)).as("n")).collect()
    assert(got.length == 500, "every query keeps candidates under the cap")
    assert(got.forall(_.getAs[Long]("n") == 5L))
  }

  test("ivfTopK results are real neighbors (precision vs brute force)") {
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    val brute = Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
        e, col("vec_id"), col("vec"), k = 20)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(e, col("vec_id"), col("vec"), k = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.nonEmpty)
    val hits = ivf.count(brute.contains).toDouble / ivf.length
    assert(hits >= 0.3, s"IVF precision@top20 too low: $hits")
  }

  test("ivfTopKAuto sizes centroids ~sqrt(n) and keeps precision") {
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("vec"))
    val brute = Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
        e, col("vec_id"), col("vec"), k = 20)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopKAuto(e, col("vec_id"), col("vec"), k = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.nonEmpty)
    val hits = ivf.count(brute.contains).toDouble / ivf.length
    assert(hits >= 0.3, s"auto-sized IVF precision too low: $hits")
  }

  test("adaptiveBandBits scales with corpus; lshTopKAuto finds real neighbors") {
    assert(Similarity.adaptiveBandBits(1000) == 8)          // floor
    assert(Similarity.adaptiveBandBits(1000000) == 14)      // 10^6/64 ≈ 2^14
    assert(Similarity.adaptiveBandBits(1000000000L) == 24)  // 10^9/64 ≈ 2^24
    assert(Similarity.adaptiveBandBits(Long.MaxValue) == 30) // cap
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    val auto = Similarity.lshTopKAuto(e, col("vec_id"), col("vec"), k = 3)
      .collect()
    assert(auto.nonEmpty)
    assert(auto.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("corpus_id")))
  }

  test("lshTopK results are real neighbors (precision vs brute force)") {
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    val brute = Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
        e, col("vec_id"), col("vec"), k = 20)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(e, col("vec_id"), col("vec"), k = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh.nonEmpty, "LSH should produce candidates on 500 vectors")
    val hits = lsh.count(brute.contains).toDouble / lsh.length
    // LSH top-3 should mostly fall inside the exact top-20 neighborhood
    assert(hits >= 0.5, s"LSH precision@top20 too low: $hits")
  }

  test("semanticDedup: scaled clone collapses into its source's cluster") {
    import graft.operators.Dedup
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("vec"))
    // vec 9001 = vec 1 scaled (cosine 1.0) — must land in vec 1's cluster
    val dup = e.filter(col("vec_id") === 1)
      .select(lit(9001L).as("vec_id"), transform(col("vec"), x => x * 2.0).as("vec"))
    val corpus = e.unionByName(dup)
    val out = Dedup.semanticDedup(corpus, col("vec_id"), col("vec"),
        threshold = 0.45)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out.size == corpus.count(), "every vector labeled")
    assert(out(9001L)._1 == out(1L)._1, "clone shares vec 1's cluster")
    assert(!out(9001L)._2, "clone is never the survivor (min-id wins)")
    val survivors = out.count(_._2._2)
    val clusters = out.values.map(_._1).toSet.size
    assert(survivors == clusters, "exactly one survivor per cluster")
    assert(out.forall { case (id, (c, s)) => s == (c == id) })
  }

  test("quantizeInt8: symmetric codes, zero vector, exact scale") {
    val df = Seq(
      (1L, Seq(1.0, -0.5, 0.25, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0)),
      (3L, Seq(-2.0, 2.0, 1.0, -1.0))
    ).toDF("vec_id", "vec")
    val out = Similarity.quantizeInt8(df, col("vec_id"), col("vec"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Long](2))).toMap
    // 1.0→127; -0.5→floor(-63.5+0.5)=-63; 0.25→floor(31.75+0.5)=32; 0→0
    assert(out(1L)._2 == Seq(127L, -63L, 32L, 0L))
    assert(out(1L)._1 == 1.0 / 127)
    assert(out(2L) == ((0.0, Seq(0L, 0L, 0L, 0L))), "zero vector → zeros")
    assert(out(3L)._2 == Seq(-127L, 127L, 64L, -63L),
      "negative max uses full range symmetrically")
  }

  test("annRecall: per-query hit fractions, zero-hit queries surface") {
    val exact = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2)
    ).toDF("query_id", "corpus_id", "rank")
    val approx = Seq(
      (1L, 10L, 1), (1L, 99L, 2), (1L, 12L, 3),  // 2 of 3 exact found
      (2L, 98L, 1), (2L, 97L, 2),                 // 0 of 2 found
      (2L, 21L, 4)                                 // beyond k: ignored
    ).toDF("query_id", "corpus_id", "rank")
    val out = Similarity.annRecall(exact, approx, k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((3L, 2L, 0.6667)))
    assert(out(2L) == ((2L, 0L, 0.0)), "zero-hit query must not drop out")
  }

  test("rrfFuse rewards cross-list consensus over single-list rank") {
    import spark.implicits._
    // doc 20 is mid-rank in BOTH lists; docs 10/30 top ONE list each.
    // RRF: 2/(60+2) > 1/(60+1) — consensus wins.
    val a = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "id", "rank")
    val b = Seq((1L, 30L, 1L), (1L, 20L, 2L)).toDF("query_id", "id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), k = 10)
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out(20L)._1 == 2L && out(20L)._3 == 1L, "consensus doc first")
    assert(out(10L)._1 == 1L && out(30L)._1 == 1L)
    // equal single-list contributions tie-break on id
    assert(out(10L)._3 == 2L && out(30L)._3 == 3L)
    assert(math.abs(out(20L)._2 - 2.0 / 62) < 1e-9)
  }

  test("int8TopK: exact integer dot recovers the float ranking") {
    import spark.implicits._
    // values are exact multiples of amax/127, so quantization is lossless
    // and the dequantized score equals the true dot product
    val corpus = Seq(
      (1L, Seq(127.0, 0.0, 0.0)),
      (2L, Seq(127.0, 127.0, 0.0)),
      (3L, Seq(0.0, 0.0, 127.0)),
      (9L, Seq(127.0, 64.0, 0.0))).toDF("vec_id", "vec")
    val q = corpus.filter(col("vec_id") === 9L)
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.int8TopK(c, col("vec_id"), col("vec"),
          q, col("vec_id"), col("vec"), k = 3)
        .collect().map(r =>
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
        .sortBy(_._4).toSeq
    val out = run(corpus)
    // dots vs (127,64,0): doc2 = 127*127+127*64, doc1 = 127*127, doc3 = 0
    assert(out.map(_._1) == Seq(2L, 1L, 3L), "integer-dot ranking")
    assert(out(0)._2 == 127L * 127 + 127L * 64, "dot is exact integer math")
    assert(out(0)._3 == 127.0 * 127 + 127.0 * 64,
      "scale=1 dequantizes to the true dot")
    assert(run(corpus.repartition(5)) == out, "deterministic")
  }

  test("pqTopK: ADC ranks the same-cluster neighbor first; ties break " +
    "on id; deterministic under repartition") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(0.0, 0.0, 10.0, 10.0)),   // seed A
      (1L, Seq(10.0, 10.0, 0.0, 0.0)),   // seed B
      (2L, Seq(0.5, 0.5, 9.5, 9.5)),     // near A
      (3L, Seq(9.5, 9.5, 0.5, 0.5))      // near B
    ).toDF("vec_id", "vec")
    def run(c: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(c, col("vec_id"), col("vec"),
          c, col("vec_id"), col("vec"), k = 3, mSub = 2, nCodes = 2,
          dim = 4)
        .collect().map(r => ((r.getLong(0), r.getInt(3)),
          (r.getLong(1), r.getDouble(2)))).toMap
    val out = run(corpus)
    // query 2 shares cluster-A codes with 0: its ADC to 0 is its distance
    // to A's centroid, far below its distance to B's — 0 ranks first;
    // 1 and 3 carry identical B codes (equal ADC), so id breaks the tie
    assert(out((2L, 1))._1 == 0L)
    assert(out((2L, 2))._1 == 1L && out((2L, 3))._1 == 3L)
    assert(out((2L, 2))._2 == out((2L, 3))._2, "same codes -> same ADC")
    assert(out((3L, 1))._1 == 1L, "query 3's cluster mate ranks first")
    assert(run(corpus.repartition(5)) == out,
      "decimal ADC sums are partition-order-invariant")
  }

  test("ivfPqTopK: probed-list ADC finds true near neighbors; " +
    "deterministic under repartition") {
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), org.apache.spark.sql.functions.transform(
        col("embedding"), x => x.cast("double")).as("vec"))
    val q = e.filter(col("vec_id") < 30)
    val k = 10
    val exact = Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
      q, col("vec_id"), col("vec"), k)
    val approx = Similarity.ivfPqTopK(e, col("vec_id"), col("vec"),
      q, col("vec_id"), col("vec"), k)
    val r = Similarity.annRecall(exact, approx, k)
      .agg(org.apache.spark.sql.functions.avg("recall")).head().getDouble(0)
    // coarse 16-list routing with nProbe=2 + 8x16 residual codebooks on
    // a 500-vector corpus: a real compression, so the bar is "clearly
    // better than chance", not brute-force parity
    assert(r > 0.3, s"IVF-PQ recall@10 $r suspiciously low")
    val key = (df: org.apache.spark.sql.DataFrame) => df.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2),
        x.getInt(3))).toSet
    val a = key(approx)
    val b = key(Similarity.ivfPqTopK(e.repartition(13), col("vec_id"),
      col("vec"), q, col("vec_id"), col("vec"), k))
    assert(a == b, "decimal ADC + rounded codebooks: partition-invariant")
  }

  test("lshTopKMultiProbe: recall >= single-probe at identical band " +
    "params; probes only widen the query side") {
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), org.apache.spark.sql.functions.transform(
        col("embedding"), x => x.cast("double")).as("vec"))
    val q = e.filter(col("vec_id") < 30)
    val k = 10
    val exact = Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
      q, col("vec_id"), col("vec"), k)
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.annRecall(exact, approx, k)
        .agg(org.apache.spark.sql.functions.avg("recall")).head()
      r.getDouble(0)
    }
    val single = Similarity.lshTopKMultiProbe(e, col("vec_id"), col("vec"),
      q, col("vec_id"), col("vec"), k, probes = 0)
    val multi = Similarity.lshTopKMultiProbe(e, col("vec_id"), col("vec"),
      q, col("vec_id"), col("vec"), k, probes = 2)
    val (rs, rm) = (recallOf(single), recallOf(multi))
    assert(rm >= rs, s"multi-probe recall $rm < single-probe $rs")
    // probes=0 equals the plain lshTopK pipeline restricted to the same
    // query ids — the probe set degenerates to the own-bucket lookup
    val plain = Similarity.lshTopK(e, col("vec_id"), col("vec"), k)
      .filter(col("query_id") < 30)
    val keyOf = (df: org.apache.spark.sql.DataFrame) => df
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(keyOf(single) == keyOf(plain),
      "probes=0 reproduces the single-probe candidate semantics")
  }
}
