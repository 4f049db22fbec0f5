package graft

import org.apache.spark.sql.functions._
import graft.staging.{DableReport, GoogleAds, HcenterPageview, MetaAds}

class Staging7Spec extends SparkSpec {
  import spark.implicits._

  test("pageview URL classifier: product id, main sentinel, drop others") {
    def pl(url: String) =
      s"""{"measuredThrough":{"device":"Pc","url":$url},
         |"visit":{"pageClick":3,"userClick":2,"timeOnSite":40},
         |"ymd":"2024-02-03"}""".stripMargin.replace("\n", "")
    val raw = Seq(pl("\"/myshop/products/123\""), pl("\"/myshop\""),
      pl("\"/myshop/reviews/9\""), pl("null")).toDF("p")
    val out = HcenterPageview.stageByProduct(raw, col("p"), mallSeq = 5L)
      .orderBy("product_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 123L),
      "main page -> sentinel 10, product URL -> trailing id, rest dropped")
  }

  test("pageview device staging filters unknown devices (no -1 rows)") {
    def pl(dev: String) =
      s"""{"measuredThrough":{"device":"$dev","url":null},
         |"visit":{"pageClick":1,"userClick":1,"timeOnSite":9},
         |"ymd":"2024-02-03"}""".stripMargin.replace("\n", "")
    val out = HcenterPageview.stageByDevice(
      Seq(pl("Pc"), pl("Mobile"), pl("All"), pl("Tablet")).toDF("p"),
      col("p"), mallSeq = 5L).orderBy("device_type").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 1, 2), "Tablet filtered")
  }

  test("dable report: '-' bucket, zero-impression guard, campaign dim split") {
    val raw = Seq(
      (null.asInstanceOf[String], null.asInstanceOf[String], 10L, 5L, 1L, 100L, 0L, "20240115"),
      ("C1", "One", 20L, 0L, 0L, 50L, 0L, "20240115"),   // 0 impressions -> dropped
      ("C1", "One", 30L, 8L, 2L, 70L, 1L, "20240116")
    ).toDF("campaign_id", "campaign_name", "exposes", "impressions",
      "clicks", "cost_spent", "convertion_cnt", "ymd")
    val rep = DableReport.stageDailyReport(raw).orderBy("campaign_id").collect()
    assert(rep.length == 2)
    assert(rep(0).getString(0) == "-" &&
      rep(0).getAs[java.sql.Date]("ymd").toString == "2024-01-15")
    assert(DableReport.stageCampaignDim(raw).count() == 1,
      "null ids dropped, dup campaigns deduped")
  }

  test("google ads: micros normalize, malformed-to-zero, try-parsed start") {
    def pl(micros: String, start: String) =
      s"""{"campaign":{"id":"GC1","name":"n","advertisingChannelType":"SEARCH",
         |"status":"ENABLED","biddingStrategyType":"TARGET_ROAS",
         |"startDateTime":$start},
         |"campaignBudget":{"amountMicros":$micros},
         |"metrics":{"impressions":"7","clicks":"3","costMicros":"2500000"}}"""
        .stripMargin.replace("\n", "")
    val out = GoogleAds.stageCampaign(
      Seq(pl("\"1500000\"", "\"2024-01-15 10:30:00\""),
        pl("\"junk\"", "\"bad\""), pl("null", "null")).toDF("p"),
      col("p"), customerId = 1L).collect()
    assert(out(0).getAs[Int]("campaign_budget") == 2, "1.5M micros rounds to 2")
    assert(out(1).getAs[Int]("campaign_budget") == 0, "junk micros -> 0")
    assert(out(2).getAs[Int]("campaign_budget") == 0, "absent micros -> 0")
    assert(out.forall(_.getAs[Int]("ad_cost_30d") == 3), "2.5M micros rounds to 3")
    assert(out(0).getAs[java.sql.Timestamp]("created_at") != null)
    assert(out(1).isNullAt(out(1).fieldIndex("created_at")))
  }

  test("meta ads: ISO-T timestamp truncation + insights campaign dim") {
    val camps = MetaAds.stageCampaigns(Seq(
        ("c1", "N", "OUTCOME_SALES", "ACTIVE", "2024-01-15T10:30:00+0000"),
        ("c2", "M", "REACH", "PAUSED", "not-a-time")
      ).toDF("id", "name", "objective", "effective_status", "created_time"),
      accountId = "A").orderBy("campaign_id").collect()
    assert(camps(0).getAs[java.sql.Timestamp]("created_at").toString
      .startsWith("2024-01-15 10:30:00"), "+0000 offset truncated away")
    assert(camps(1).isNullAt(camps(1).fieldIndex("created_at")))

    val ins = Seq(
      ("c1", "CN", "a1", "ad1", 10L, 5L, 2L, 1L, 30L, "2024-01-15"),
      ("c1", "CN", "a2", "ad2", 20L, 9L, 3L, 2L, 40L, "2024-01-15")
    ).toDF("campaign_id", "campaign_name", "adset_id", "ad_id", "impressions",
      "reach", "clicks", "inline_link_clicks", "spend", "date_start")
    assert(MetaAds.insightsCampaignDim(ins, "A").count() == 1,
      "dim dedups to one row per campaign")
    assert(MetaAds.stageInsights(ins, "A").count() == 2)
  }
}
