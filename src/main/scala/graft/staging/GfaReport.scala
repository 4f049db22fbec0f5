package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.F

/** L2 staging — naver GFA (performance display) campaign/adset masters
  * (reference: core/searchad/gfa/report/models.sql): numeric ids cast to
  * VARCHAR keys, the NUMBERED campaign-objective ladder (101–108 — the
  * reference's cross-platform campaign_type namespace), and boolean
  * derivations (`activated` passthrough, `status = 'DELETED'`).
  */
object GfaReport {

  /** objective → campaign_type (models.sql:17-26). */
  val campaignType: Seq[(String, Int)] = Seq(
    "CONVERSION" -> 101, "WEB_SITE_TRAFFIC" -> 102, "INSTALL_APP" -> 103,
    "WATCH_VIDEO" -> 104, "CATALOG" -> 105, "SHOPPING" -> 106,
    "LEAD" -> 107, "PMAX" -> 108)

  /** bidGoal → adgroup_type (models.sql:66-71). */
  val adgroupType: Seq[(String, Int)] = Seq(
    "MAX_CLICK" -> 101, "MAX_CONV" -> 102, "MAX_CONV_VALUE" -> 103,
    "NONE" -> 104)

  def stageCampaign(raw: DataFrame): DataFrame =
    raw.select(
      col("no").cast("string").as("campaign_id"),
      col("name").as("campaign_name"),
      F.recode(col("objective"), campaignType).cast("int").as("campaign_type"),
      col("adAccountNo").cast("bigint").as("customer_id"),
      col("activated").cast("boolean").as("is_enabled"),
      col("deleted").cast("boolean").as("is_deleted"))

  def stageAdSet(raw: DataFrame, accountNo: Long): DataFrame =
    raw.select(
      col("no").cast("string").as("adgroup_id"),
      col("campaignNo").cast("string").as("campaign_id"),
      col("name").as("adgroup_name"),
      F.recode(col("bidGoal"), adgroupType).cast("int").as("adgroup_type"),
      lit(accountNo).as("customer_id"),
      col("activated").cast("boolean").as("is_enabled"),
      (col("status") === "DELETED").as("is_deleted"),
      col("bidPrice").cast("int").as("bid_amount"))
}
