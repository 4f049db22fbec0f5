package graft

import org.apache.spark.sql.functions._
import graft.staging._

class Staging8Spec extends SparkSpec {
  import spark.implicits._

  test("center report: tombstone strip + ELSE-2 recodes") {
    val out = SearchadCenterReport.stageDailyReport(Seq(
        ("nad-1(삭제)", "네이버", "PC", "검색", 10L, 1L, 100L, 0L, 0L, 1.5, 2.25, 30.5, "2024-01-02"),
        ("nad-2", "파트너", "태블릿", "기타망", 5L, 0L, 50L, 0L, 0L, 0.0, 0.0, 0.0, "2024-01-02")
      ).toDF("nccAdId", "mediaNm", "pcMblTp", "ntwkTp", "impCnt", "clkCnt",
        "salesAmt", "ccnt", "convAmt", "avgRnk", "pv", "stayTm", "ymd"),
      customerId = 1).orderBy("ad_id").collect()
    assert(out(0).getString(0) == "nad-1", "(삭제) suffix stripped")
    assert(out(1).getInt(3) == 2 && out(1).getInt(4) == 2,
      "unknown device/network land in the 기타 bucket, not null")
  }

  test("gfa: numbered ladder + status-derived deletion flag") {
    val camp = GfaReport.stageCampaign(Seq(
        (77L, "c", "PMAX", 5L, true, false),
        (78L, "d", "WHATEVER", 5L, false, true)
      ).toDF("no", "name", "objective", "adAccountNo", "activated", "deleted"))
      .orderBy("campaign_id").collect()
    assert(camp(0).getString(0) == "77" && camp(0).getInt(2) == 108)
    assert(camp(1).isNullAt(2), "unknown objective -> null type")
    val adset = GfaReport.stageAdSet(Seq(
        (1L, 77L, "a", "MAX_CONV", true, "DELETED", 900L)
      ).toDF("no", "campaignNo", "name", "bidGoal", "activated", "status",
        "bidPrice"), accountNo = 5L).collect().head
    assert(adset.getAs[Boolean]("is_deleted"), "status = 'DELETED' derives flag")
    assert(adset.getAs[Int]("adgroup_type") == 102)
  }

  test("blog search: rank offset by page start, tags stripped") {
    val out = NaverOpenapiSearch.stageBlogSearch(Seq(
        (2L, "<b>two</b>", "u2", "d <i>x</i>", "b", "bu", "20240115"),
        (1L, "<b>one</b>", "u1", "plain", "b", "bu", "bad")
      ).toDF("ord", "title", "link", "description", "bloggername",
        "bloggerlink", "postdate"),
      keyword = "kw", start = 31, orderCol = col("ord"))
      .orderBy("display_rank").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(31, 32), "ranks offset by $start")
    assert(out(0).getString(2) == "one" && out(1).getString(2) == "two")
    assert(out(1).getString(4) == "d x", "inner tags stripped globally")
    assert(out(0).isNullAt(out(0).fieldIndex("post_date")))
  }

  test("smartstore product: delivery ladder + ISO-T truncation") {
    val out = SmartstoreProduct.stageProduct(Seq(
        ("5000001", "4000001", "12", "n", "mg", "md", "b", "7", "SALE", "ON",
          "t", 100L, 90L, "DAWN_ARRIVAL", 0L, "2023-06-02T10:11:12+09:00",
          "2024-02-02T23:59:59"),
        ("5000002", "4000002", "x", "n", "mg", "md", "b", "?", "WAIT", "ON",
          "t", 100L, 90L, "TELEPORT", 0L, "nope", "2024-02-02T23:59:59")
      ).toDF("channelProductNo", "originProductNo", "modelId", "name",
        "sellerManagementCode", "modelName", "brandName", "categoryId",
        "statusType", "channelProductDisplayStatusType", "sellerTags",
        "salePrice", "discountedPrice", "deliveryAttributeType",
        "deliveryFee", "regDate", "modifiedDate"),
      channelSeq = 3L).orderBy("product_id").collect()
    assert(out(0).getAs[Int]("delivery_type") == 5)
    assert(out(0).getAs[java.sql.Timestamp]("register_dt").toString
      .startsWith("2023-06-02 10:11:12"), "+09:00 offset truncated")
    assert(out(1).isNullAt(out(1).fieldIndex("delivery_type")))
    assert(out(1).isNullAt(out(1).fieldIndex("catalog_id")))
    assert(out(1).isNullAt(out(1).fieldIndex("register_dt")))
  }

  test("catalog: '>'-path levels split with empty->null; maker 0 nulled") {
    val pl =
      """{"identifier":9,"prodName":"p","makerSeq":0,"makerName":"m",
        |"brandSeq":3,"brandName":"b",
        |"category":{"identifier":"55","name":"c","fullId":"1>2",
        |"fullName":"A>B"},
        |"lowestPrice":10,"productCount":2,"totalReviewCount":7,
        |"registerDate":"2022-05-06T08:09:10+09:00"}""".stripMargin.replace("\n", "")
    val r = HcenterCatalog.stageBrandCatalog(Seq(pl).toDF("p"), col("p"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("maker_id")), "makerSeq 0 -> null")
    assert(r.getAs[Int]("category_id1") == 1 && r.getAs[Int]("category_id2") == 2)
    assert(r.isNullAt(r.fieldIndex("category_id3")) &&
      r.isNullAt(r.fieldIndex("category_name3")), "missing levels null out")
    assert(r.getAs[String]("category_name2") == "B")

    val acct = SabangnetAccount.stageAccountNormal(Seq(("4", "S1"))
      .toDF("acntRegsSrno", "shmaId")).collect().head
    assert(acct.getAs[Int]("account_no") == 4 &&
      acct.isNullAt(acct.fieldIndex("shop_name")),
      "normal variant links ids, attributes stay null for backfill")
  }
}
