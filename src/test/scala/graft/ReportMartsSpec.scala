package graft

import org.apache.spark.sql.functions._

/** Report/relation-mart mechanics not directly expressible as a value
  * compare (q114-q121 carry the full-pipeline DuckDB oracles).
  */
class ReportMartsSpec extends SparkSpec {

  private lazy val registry = graft.models.Analytics.registry(sf001)

  test("stock_time_ds: fixed batches never fall back, MAX-batch path does") {
    // 2024-01-31 has no events: the MAX-batch request falls back to 01-30
    val fb = registry.run("stock_time_ds", spark, graft.models.Params(Map(
      "report_date" -> "2024-01-31", "report_batch" -> "30"))).collect()
    assert(fb.nonEmpty)
    assert(fb.forall(_.getAs[java.sql.Date]("report_date").toString
      == "2024-01-30"))
    // a FIXED batch (10) on the same empty day must return nothing — the
    // reference disables the fallback for explicit batches
    val fixed = registry.run("stock_time_ds", spark, graft.models.Params(Map(
      "report_date" -> "2024-01-31", "report_batch" -> "10")))
    assert(fixed.count() == 0)
    // and when the primary is non-empty, the fallback must be gated OUT
    // (exactly one report_date in the output)
    val prim = registry.run("stock_time_ds", spark, graft.models.Params(Map(
      "report_date" -> "2024-01-15", "report_batch" -> "30")))
    val dates = prim.select("report_date").distinct().collect()
    assert(dates.length == 1 && dates.head.get(0).toString == "2024-01-15")
  }

  test("nsh relation ladder: deepest match wins and is never overwritten") {
    val rel = registry.run("nsh_prd_to_grp_id", spark).cache()
    try {
      assert(rel.count() > 0)
      // one row per product (the final QUALIFY)
      assert(rel.select("product_id").distinct().count() == rel.count())
      // depth-4 keyword-free mapping: category_id4 = 7 products must map to
      // G-A (mapping_seq 1 beats anything shallower), never a depth<4 group
      val d4 = rel.filter(col("category_id") === 7 &&
        pmod(col("category_id"), lit(4)) + 1 === 4)
      if (d4.count() > 0)
        assert(d4.filter(col("group_id") =!= "G-A").count() == 0)
    } finally rel.unpersist()
  }

  test("ranged relation: sentinel bundles split into pre/post windows") {
    val rel = registry.run("smt_prd_ranged_relation", spark).cache()
    try {
      // a mixed sentinel bundle: pre window keeps 100088, post drops it
      val mixed = rel.filter(col("bundle_product_ids") === "100081,100088")
      assert(mixed.count() > 0)
      assert(mixed.filter(col("end_date") =!= "1996-06-09").count() == 0)
      val post = rel.filter(col("start_date") === "1996-06-10")
      assert(post.count() > 0)
      // no post-window bundle may still contain the sentinel
      assert(post.filter(array_contains(
        split(col("bundle_product_ids"), ","), "100088")).count() == 0)
      // sentinel-only bundles expanded to the 7-product list
      assert(rel.filter(col("bundle_product_ids") ===
        "100081,100082,100083,100084,100085,100086,100087").count() > 0)
    } finally rel.unpersist()
  }
}
