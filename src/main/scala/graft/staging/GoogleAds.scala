package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L2 staging — Google Ads campaign master (reference:
  * core/google/api/ads/models.sql, Campaign): the GAQL response's nested
  * resources (`campaign.*`, `campaignBudget.*`, `metrics.*`) projected
  * flat, with the MICROS→currency normalization
  * (`ROUND(COALESCE(TRY_CAST(amountMicros), 0) / 1e6)`) and the
  * `%Y-%m-%d %H:%M:%S` start-time try-parse.
  */
object GoogleAds {

  val campaignSchema: StructType = StructType(Seq(
    StructField("campaign", StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("advertisingChannelType", StringType),
      StructField("status", StringType),
      StructField("biddingStrategyType", StringType),
      StructField("startDateTime", StringType)))),
    StructField("campaignBudget", StructType(Seq(
      StructField("amountMicros", StringType)))),
    StructField("metrics", StructType(Seq(
      StructField("impressions", StringType),
      StructField("clicks", StringType),
      StructField("costMicros", StringType))))))

  /** Micros string column → whole currency units:
    * ROUND(COALESCE(TRY_CAST(micros), 0)/1e6) — malformed values become 0
    * (reference models.sql:37,40), never a cast error.
    */
  private def microsToUnits(name: String): Column =
    round(coalesce(expr(s"try_cast($name AS BIGINT)"), lit(0L)) / 1e6)
      .cast("int")

  def stageCampaign(raw: DataFrame, payloadCol: Column,
                    customerId: Long): DataFrame = {
    // single parse into a struct attribute — see HcenterCatalog (r15):
    // per-field JSON pruning otherwise multiplies the parse per row
    val parsed = raw.select(from_json(payloadCol, campaignSchema).as("__p"))
    val p = col("__p")
    val c = p.getField("campaign"); val m = p.getField("metrics")
    parsed.select(
        c.getField("id").as("campaign_id"),
        c.getField("name").as("campaign_name"),
        lit(customerId).as("customer_id"),
        c.getField("advertisingChannelType").as("campaign_type"),
        c.getField("status").as("campaign_status"),
        c.getField("biddingStrategyType").as("bidding_strategy"),
        p.getField("campaignBudget").getField("amountMicros").as("__budget"),
        m.getField("impressions").as("__imp"),
        m.getField("clicks").as("__clk"),
        m.getField("costMicros").as("__cost"),
        c.getField("startDateTime").as("__start"))
      .select(col("campaign_id"), col("campaign_name"), col("customer_id"),
        col("campaign_type"), col("campaign_status"), col("bidding_strategy"),
        microsToUnits("__budget").as("campaign_budget"),
        coalesce(expr("try_cast(__imp AS INT)"), lit(0))
          .as("impression_count_30d"),
        coalesce(expr("try_cast(__clk AS INT)"), lit(0)).as("click_count_30d"),
        microsToUnits("__cost").as("ad_cost_30d"),
        expr("try_to_timestamp(__start, 'yyyy-MM-dd HH:mm:ss')")
          .as("created_at"))
  }

  /** Common: status literal dim (models.sql:1-9). */
  def statusDim(spark: org.apache.spark.sql.SparkSession): DataFrame =
    graft.functions.F.inlineDim(spark, Seq("seq", "code", "name"), Seq(
      Seq(0, "ENABLED", "운영 가능"), Seq(1, "PAUSED", "일시중지됨"),
      Seq(2, "REMOVED", "삭제됨"), Seq(3, "UNKNOWN", "알 수 없음"),
      Seq(4, "UNSPECIFIED", "지정되지 않음")))
}
