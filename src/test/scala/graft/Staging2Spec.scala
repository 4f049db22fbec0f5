package graft

import java.sql.Timestamp
import graft.staging.{SearchAdCampaign, ShopSearch}

class Staging2Spec extends SparkSpec {
  import spark.implicits._

  test("SearchAdCampaign: quoted headers, boolean derivation, enum recode") {
    val raw = Seq(
      ("cmp-001", "Brand A", "WEB_SITE", "0", "2024-01-10T09:00:00.000", null),
      ("cmp-002", "Shop B", "SHOPPING", "1", "2024-02-01T10:00:00.000",
        "2024-06-01T00:00:00.000"),
      (null, "orphan", "WEB_SITE", "0", "2024-01-01T00:00:00.000", null)
    ).toDF("Campaign ID", "Campaign Name", "Campaign Type", "ON/OFF", "regTm", "delTm")
    val out = SearchAdCampaign.stage(raw, customerId = 777L)
      .orderBy("campaign_id").collect()
    assert(out.length == 2) // null id filtered
    val c1 = out(0)
    assert(c1.getAs[Boolean]("is_enabled"))        // ON/OFF = 0 → enabled
    assert(!c1.getAs[Boolean]("is_deleted"))
    assert(c1.getAs[Int]("campaign_type") == 1)
    assert(c1.getAs[Timestamp]("created_at") == Timestamp.valueOf("2024-01-10 09:00:00"))
    val c2 = out(1)
    assert(!c2.getAs[Boolean]("is_enabled"))
    assert(c2.getAs[Boolean]("is_deleted"))
    assert(c2.getAs[Timestamp]("deleted_at") != null)
  }

  test("ShopSearch: rank offset, tag strip, link extract, sentinel mall") {
    val raw = Seq(
      ("<b>Red</b> Widget", "https://shop.example/products/12345", "900001", "1",
        "StoreA", "BrandX", "cat1", "cat2", "15900"),
      ("Plain Gadget", "https://shop.example/catalog/item", "900002", "2",
        "네이버", "", "cat1", "cat2", "25000")
    ).toDF("title", "link", "productId", "productType", "mallName", "brand",
      "category1", "category2", "lprice")
    val out = ShopSearch.stage(raw, keyword = "widget", start = 11).collect()
    assert(out.map(_.getAs[Long]("display_rank")).toSeq == Seq(11L, 12L))
    val r1 = out(0)
    assert(r1.getAs[String]("product_name") == "Red Widget")   // tags stripped
    assert(r1.getAs[Long]("product_id") == 12345L)
    assert(r1.getAs[Int]("product_type") == 0)                 // (1+2)%3
    assert(r1.getAs[String]("mall_name") == "StoreA")
    val r2 = out(1)
    assert(r2.isNullAt(r2.fieldIndex("product_id")))           // no /products/ match
    assert(r2.isNullAt(r2.fieldIndex("mall_name")))            // sentinel → NULL
    assert(r2.isNullAt(r2.fieldIndex("brand")))                // '' → NULL
    assert(r2.getAs[Long]("low_price") == 25000L)
  }
}
