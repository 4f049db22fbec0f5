package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L2 staging — coupang advertising product-ad report (reference:
  * core/coupang/advertising/report/models.sql, ProductAdReport):
  * Korean spreadsheet headers with COMMA-GROUPED numerics
  * (`REPLACE(.., ',', '')` before TRY_CAST — '1,234' must load as 1234),
  * the 3-arm placement recode whose ELSE is 2 (external channel), the
  * conversion-option COALESCE-to-0 (a PK member), the `%Y%m%d` integer
  * date, and the re-aggregation to the table's PK grain — the raw report
  * repeats (campaign, option, placement) rows per creative.
  */
object CoupangAdsReport {

  private def numericComma(name: String) =
    expr(s"try_cast(replace(cast(`$name` AS STRING), ',', '') AS INT)")

  def stageProductAdReport(raw: DataFrame, vendorId: String): DataFrame = {
    val report = raw.select(
      expr("cast(`캠페인 ID` AS BIGINT)").as("campaign_id"),
      expr("cast(`광고집행 옵션ID` AS BIGINT)").as("option_id"),
      coalesce(expr("cast(`광고전환매출발생 옵션ID` AS BIGINT)"), lit(0L))
        .as("option_conv_id"),
      when(col("광고 노출 지면") === "검색 영역", lit(0))
        .when(col("광고 노출 지면") === "비검색 영역", lit(1))
        .otherwise(lit(2)).as("placement_group"),
      numericComma("노출수").as("impression_count"),
      numericComma("클릭수").as("click_count"),
      numericComma("광고비").as("ad_cost"),
      numericComma("총 주문수(1일)").as("conv_count"),
      numericComma("총 전환매출액(1일)").as("conv_amount"),
      expr("to_date(try_to_timestamp(cast(cast(`날짜` AS BIGINT) AS STRING), 'yyyyMMdd'))")
        .as("ymd"))
    report
      .groupBy(col("ymd"), col("campaign_id"), col("option_id"),
        col("option_conv_id"), col("placement_group"))
      .agg(
        sum(col("impression_count")).cast("int").as("impression_count"),
        sum(col("click_count")).cast("int").as("click_count"),
        sum(col("ad_cost")).cast("int").as("ad_cost"),
        sum(col("conv_count")).cast("int").as("conv_count"),
        sum(col("conv_amount")).cast("int").as("conv_amount"))
      .select(col("campaign_id"), lit(vendorId).as("vendor_id"),
        col("option_id"), col("option_conv_id"), col("placement_group"),
        col("impression_count"), col("click_count"), col("ad_cost"),
        col("conv_count"), col("conv_amount"), col("ymd"))
  }
}
