package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("kmvDistinct estimates within the 1/sqrt(k) band") {
    val n = 50000
    val df = (1 to n).map(i => s"key-$i").toDF("k")
    val row = Sketches.kmvDistinct(df, col("k"), k = 1024).collect().head
    assert(row.getAs[Long]("k_used") === 1024L)
    val est = row.getAs[Double]("n_distinct_est")
    // 1/sqrt(1024) ~ 3.1% standard error; 5 sigma of headroom
    assert(math.abs(est - n) / n < 0.16, s"estimate $est vs $n")
  }

  test("kmvDistinct degrades to the exact count below k") {
    val df = (1 to 37).map(i => s"key-$i").toDF("k")
    val row = Sketches.kmvDistinct(df, col("k"), k = 1024).collect().head
    assert(row.getAs[Long]("k_used") === 37L)
    assert(row.getAs[Double]("n_distinct_est") === 37.0)
  }

  test("kmvDistinct ignores duplicate keys") {
    val df = ((1 to 500) ++ (1 to 500)).map(i => s"key-$i").toDF("k")
    val row = Sketches.kmvDistinct(df, col("k"), k = 1024).collect().head
    assert(row.getAs[Double]("n_distinct_est") === 500.0)
  }

  test("hashSampledQuantiles tracks the true distribution") {
    val df = (1 to 20000).map(i => (s"id-$i", i.toDouble)).toDF("id", "v")
    val got = Sketches.hashSampledQuantiles(df, col("id"), col("v"),
      probs = Seq(0.5, 0.9), sampleBits = 3).collect()
      .map(r => r.getAs[Double]("quantile") -> r.getAs[Double]("value"))
      .toMap
    // ~2500-row sample of a uniform distribution: generous 10% band
    assert(math.abs(got(0.5) - 10000) / 10000 < 0.1, got)
    assert(math.abs(got(0.9) - 18000) / 18000 < 0.1, got)
  }

  test("hashSampledTopK keeps exact counts for sampled keys") {
    // key i appears i times; sampling is by KEY, so every kept key's
    // count must be exact (i), scaled by the sample modulus
    val rows = (1 to 200).flatMap(i => Seq.fill(i)(s"u$i")).toDF("u")
    val got = Sketches.hashSampledTopK(rows, col("u"), sampleBits = 2,
      topN = 1000).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val i = r.getAs[String]("key").drop(1).toInt
      assert(r.getAs[Long]("sampled_count") === i.toLong)
      assert(r.getAs[Long]("est_total_count") === i.toLong * 4)
    }
    // roughly a quarter of the 200 keys survive a 1/4 sample
    assert(got.length > 20 && got.length < 90)
  }

  test("hllDistinct: sketch-accurate, partition/duplicate-invariant") {
    import spark.implicits._
    val df = spark.range(0, 5000).select(lit("g").as("g"), col("id"))
    def est(d: org.apache.spark.sql.DataFrame): Double =
      Sketches.hllDistinct(d, Seq("g"), col("id"))
        .select("n_hll").as[Double].head()
    val e = est(df)
    // m=256 -> standard error ~1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert(math.abs(e - 5000) / 5000.0 < 0.2, s"estimate $e vs 5000")
    // the estimate is a pure function of the key SET: same under any
    // partitioning and under duplicated rows
    assert(est(df.repartition(13)) == e)
    assert(est(df.union(df)) == e)
  }

  test("hllDistinct small-range linear counting branch") {
    import spark.implicits._
    val df = spark.range(0, 30).select(lit("g").as("g"), col("id"))
    val row = Sketches.hllDistinct(df, Seq("g"), col("id"))
      .select("n_empty", "n_hll").as[(Long, Double)].head()
    assert(row._1 > 200, "30 keys must leave most of 256 registers empty")
    assert(math.abs(row._2 - 30) / 30.0 < 0.15, s"linear count ${row._2}")
  }
}
