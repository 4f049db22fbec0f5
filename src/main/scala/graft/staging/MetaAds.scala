package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L2 staging — Meta ads (reference: core/meta/api/ads/models.sql).
  *
  * - `stageCampaigns` (models.sql:30-40): rename projection with the
  *   ISO-8601 'T' timestamp — `SUBSTR(created_time, 1, 19)` then
  *   `%Y-%m-%dT%H:%M:%S` try-parse (the API appends a +0000 offset the
  *   reference truncates away).
  * - `stageInsights` (models.sql:206-218) + `insightsCampaignDim`
  *   (models.sql:172-181): the insights feed fans into the metrics table
  *   and placeholder master dims (null attribute columns — masters are
  *   backfilled by their own loaders; the dim rows exist so FK joins
  *   resolve).
  */
object MetaAds {

  private def isoT(c: String) =
    expr(s"try_to_timestamp(substring($c, 1, 19), \"yyyy-MM-dd'T'HH:mm:ss\")")

  def stageCampaigns(raw: DataFrame, accountId: String): DataFrame =
    raw.select(
      col("id").as("campaign_id"),
      col("name").as("campaign_name"),
      lit(accountId).as("account_id"),
      col("objective"),
      col("effective_status"),
      isoT("created_time").as("created_at"))

  def stageInsights(raw: DataFrame, accountId: String): DataFrame =
    raw.select(
      lit(accountId).as("account_id"),
      col("campaign_id"), col("adset_id"), col("ad_id"),
      col("impressions").cast("int").as("impression_count"),
      col("reach").cast("int").as("reach_count"),
      col("clicks").cast("int").as("click_count"),
      col("inline_link_clicks").cast("int").as("link_click_count"),
      col("spend").cast("int").as("ad_cost"),
      expr("try_cast(date_start AS DATE)").as("ymd"))

  /** Placeholder campaign dim from the insights feed (attributes null —
    * the campaign loader owns them; dedup keys the dim).
    */
  def insightsCampaignDim(raw: DataFrame, accountId: String): DataFrame =
    raw.select(
        col("campaign_id"), col("campaign_name"),
        lit(accountId).as("account_id"),
        lit(null).cast("string").as("objective"),
        lit(null).cast("string").as("effective_status"),
        lit(null).cast("timestamp").as("created_at"))
      .dropDuplicates("account_id", "campaign_id")
}
