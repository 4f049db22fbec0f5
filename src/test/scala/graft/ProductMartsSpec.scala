package graft

import org.apache.spark.sql.functions._

/** The product-mart family's distinctive mechanics (q109-q113 carry the
  * full-pipeline DuckDB oracles; these pin the invariants a value-compare
  * can't express as directly).
  */
class ProductMartsSpec extends SparkSpec {

  private lazy val registry = graft.models.Analytics.registry(sf001)

  test("brand_master: one row per brand AND per product, dense global seq") {
    val b = registry.run("core_brand_master", spark).cache()
    try {
      val n = b.count()
      assert(n > 0)
      // double-QUALIFY: both keys unique
      assert(b.select("brand_id").distinct.count() == n)
      assert(b.select("brand_name").distinct.count() == n)
      // no placeholder brands survive the NULLIF filter
      assert(b.filter(col("brand_name") === "브랜드 없음" ||
        col("brand_name").isNull).count() == 0)
      // distributed global rank is dense 1..n
      val seqs = b.select("brand_seq").collect().map(_.getLong(0)).sorted
      assert(seqs.toSeq == (1L to n).toSeq)
    } finally b.unpersist()
  }

  test("sabangnet product master: core-listed products are 대표 and the " +
    "scale scalar keeps sort-key terms disjoint") {
    val m = registry.run("sabangnet_product_master", spark).cache()
    try {
      // every product that exists in the core item master must be 대표
      val itm = graft.models.ProductMarts.coreMaster(spark, sf001)
        .select(col("product_id"))
      val mism = m.join(itm, Seq("product_id"), "left_semi")
        .filter(col("option_type") =!= "대표" || col("option_type").isNull)
      assert(mism.count() == 0)
      // the quantity term never bleeds into the type term: qty < scale by
      // construction, so sort_key % scale recovers the quantity exactly
      val qty = m.filter(col("sort_key").isNotNull)
        .select(pmod(col("sort_key"), lit(10L)).as("q")).distinct()
        .collect().map(_.getLong(0))
      assert(qty.forall(q => q >= 0 && q <= 9))
    } finally m.unpersist()
  }

  test("sabangnet option master: bundle names keep component order and " +
    "unmatched products get the all-9s sentinel") {
    val om = registry.run("sabangnet_option_master", spark).cache()
    try {
      val bundles = om.filter(col("bundle_option_ids").isNotNull &&
          col("bundle_option_names").isNotNull)
        .select("bundle_option_ids", "bundle_option_names")
        .collect()
      assert(bundles.nonEmpty)
      bundles.foreach { r =>
        val nParts = r.getString(0).split(",").length
        assert(r.getString(1).split("\n").length == nParts,
          s"name count != component count for ${r.getString(0)}")
      }
      // sentinel: options whose product is absent from the product master
      // get the all-9s key, and it is >= every real key
      val maxReal = om.filter(col("model_code").isNotNull)
        .agg(max(col("sort_key"))).head.getLong(0)
      val sentinels = om.filter(col("model_code").isNull)
        .select("sort_key").distinct().collect().map(_.getLong(0))
      assert(sentinels.nonEmpty)
      assert(sentinels.forall(s => s.toString.forall(_ == '9') && s >= maxReal))
    } finally om.unpersist()
  }
}
