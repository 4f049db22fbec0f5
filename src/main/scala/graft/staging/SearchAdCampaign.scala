package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L2 staging — SearchAd campaign master data (FIXTURES.md §3; reference:
  * core/searchad/api/report/models.sql:19-35): flat records with quoted
  * headers ("Campaign ID", "ON/OFF", "regTm", "delTm") staged into a typed
  * campaign table with derived booleans:
  * `is_enabled ← ("ON/OFF" = 0)`, `is_deleted ← (delTm IS NOT NULL)`.
  */
object SearchAdCampaign {

  val campaignType: Seq[(String, Int)] = Seq(
    "WEB_SITE" -> 1, "SHOPPING" -> 2, "POWER_CONTENTS" -> 3,
    "BRAND_SEARCH" -> 4, "PLACE" -> 5)

  /** Stage raw records (columns as delivered, quoted headers included)
    * into the `campaign` table shape.
    */
  def stage(raw: DataFrame, customerId: Long): DataFrame = {
    def c(name: String): Column = raw(s"`$name`")
    raw.select(
        c("Campaign ID").as("campaign_id"),
        c("Campaign Name").as("campaign_name"),
        graft.functions.F.recode(c("Campaign Type"), campaignType, null)
          .cast("int").as("campaign_type"),
        lit(customerId).as("customer_id"),
        (c("ON/OFF").cast("int") === 0).as("is_enabled"),
        c("delTm").isNotNull.as("is_deleted"),
        try_to_timestamp(substring(c("regTm"), 1, 19),
          lit("yyyy-MM-dd'T'HH:mm:ss")).as("created_at"),
        try_to_timestamp(substring(c("delTm"), 1, 19),
          lit("yyyy-MM-dd'T'HH:mm:ss")).as("deleted_at"))
      .filter(col("campaign_id").isNotNull)
  }
}
