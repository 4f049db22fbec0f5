package graft.staging

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.F

/** L2 staging — searchad keyword tool (reference:
  * core/searchad/api/keyword/models.sql): the `'< 10'` censored-count
  * special case (the API reports tiny volumes as a literal string —
  * recoded to 10, other non-numerics to 0), the 3-arm Korean competition
  * index, DECIMAL(18,1) average click counts, and the relative
  * [today-31, today-1] validity window — `today` is caller-bound so loads
  * replay (the reference stamps CURRENT_DATE).
  */
object SearchadKeyword {

  /** compIdx → comp_idx (models.sql:24-28). */
  val compIdx: Seq[(String, Int)] = Seq("낮음" -> 0, "중간" -> 1, "높음" -> 2)

  private def censoredCount(c: String) =
    when(col(c) === "< 10", lit(10))
      .otherwise(coalesce(expr(s"try_cast($c AS INT)"), lit(0)))

  def stage(raw: DataFrame, today: LocalDate): DataFrame =
    raw.select(
      col("relKeyword").as("keyword"),
      censoredCount("monthlyPcQcCnt").as("monthly_qc_cnt_pc"),
      censoredCount("monthlyMobileQcCnt").as("monthly_qc_cnt_mo"),
      col("monthlyAvePcClkCnt").cast("decimal(18,1)")
        .as("monthly_avg_click_cnt_pc"),
      col("monthlyAveMobileClkCnt").cast("decimal(18,1)")
        .as("monthly_avg_click_cnt_mo"),
      F.recode(col("compIdx"), compIdx).cast("int").as("comp_idx"),
      col("plAvgDepth").cast("int").as("avg_depth_pc"),
      lit(java.sql.Date.valueOf(today.minusDays(31))).as("start_date"),
      lit(java.sql.Date.valueOf(today.minusDays(1))).as("end_date"))
}
