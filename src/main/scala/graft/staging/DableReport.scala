package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L2 staging — dable native-ad daily report (reference:
  * core/dable/api/report/models.sql): one raw feed fans into the metrics
  * table (campaign id nulls become the '-' bucket, zero-impression rows
  * dropped, `%Y%m%d` string date) and the campaign-name dim (null ids
  * dropped — the dim keys on real campaigns only).
  */
object DableReport {

  def stageDailyReport(raw: DataFrame): DataFrame =
    raw.filter(col("impressions") > 0)
      .select(
        coalesce(col("campaign_id"), lit("-")).as("campaign_id"),
        col("exposes").cast("int").as("expose_count"),
        col("impressions").cast("int").as("impression_count"),
        col("clicks").cast("int").as("click_count"),
        col("cost_spent").cast("int").as("ad_cost"),
        col("convertion_cnt").cast("int").as("conv_count"),
        expr("to_date(try_to_timestamp(ymd, 'yyyyMMdd'))").as("ymd"))

  def stageCampaignDim(raw: DataFrame): DataFrame =
    raw.filter(col("campaign_id").isNotNull)
      .select(col("campaign_id"), col("campaign_name"))
      .dropDuplicates("campaign_id")
}
