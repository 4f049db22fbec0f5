package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L2 staging — searchad center daily report (reference:
  * core/searchad/center/report/models.sql): the '(삭제)' tombstone suffix
  * stripped off ad ids, the PC/모바일 and 검색/콘텐츠 recodes whose ELSE
  * arm is 2 (기타 — a real bucket, not a reject), and DECIMAL(18,1)/(18,2)
  * quality metrics (average rank, pageviews and stay time per visit).
  */
object SearchadCenterReport {

  def stageDailyReport(raw: DataFrame, customerId: Int): DataFrame =
    raw.select(
      regexp_replace(col("nccAdId"), "\\(삭제\\)", "").as("ad_id"),
      lit(customerId).as("customer_id"),
      col("mediaNm").as("media_name"),
      when(col("pcMblTp") === "PC", lit(0))
        .when(col("pcMblTp") === "모바일", lit(1))
        .otherwise(lit(2)).as("pc_mobile_type"),
      when(col("ntwkTp") === "검색", lit(0))
        .when(col("ntwkTp") === "콘텐츠", lit(1))
        .otherwise(lit(2)).as("network_type"),
      col("impCnt").cast("int").as("impression_count"),
      col("clkCnt").cast("int").as("click_count"),
      col("salesAmt").cast("int").as("ad_cost"),
      col("ccnt").cast("int").as("conv_count"),
      col("convAmt").cast("int").as("conv_amount"),
      col("avgRnk").cast("decimal(18,1)").as("avg_rank"),
      col("pv").cast("decimal(18,2)").as("page_view_per_visit"),
      col("stayTm").cast("decimal(18,2)").as("stay_time_per_visit"),
      col("ymd").cast("date").as("ymd"))
}
