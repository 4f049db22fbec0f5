package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L2 staging — marketplace settlement report (reference:
  * core/coupang/wing/settlement/models.sql:1-70 `RocketSettlement`).
  *
  * The reference shape, mirrored here:
  * - string-typed numeric detail fields `TRY_CAST` to integers (API payloads
  *   arrive as strings; unparseable values become NULL, not errors);
  * - group-level `SUM(...) OVER (PARTITION BY settlementGroupKey)` projected
  *   onto detail rows — W4 aggregate-over-window inside the staging
  *   projection (models.sql:40-48);
  * - settlement period bounds parsed and shifted to market-local time
  *   (`+ INTERVAL 9 HOUR`, models.sql:66-67) — kept as TIMESTAMP_NTZ so the
  *   wall-clock shift is engine-timezone-independent;
  * - one row per group_key: the reference's `PRIMARY KEY (group_key)` +
  *   `ON CONFLICT DO NOTHING` keeps the first inserted row per group; here
  *   the "first" is made deterministic by an explicit `dedupOrder` instead
  *   of insert order. The window sums still see every detail row.
  */
object Settlement {

  def stage(raw: DataFrame, vendorId: String,
            dedupOrder: Seq[Column]): DataFrame = {
    val wg = Window.partitionBy(col("settlementGroupKey"))
    val wr = Window.partitionBy(col("settlementGroupKey")).orderBy(dedupOrder: _*)
    raw
      .withColumn("__rn", row_number().over(wr))
      .select(
        col("settlementGroupKey").as("group_key"),
        lit(vendorId).as("vendor_id"),
        sum(expr("try_cast(settlementRatio AS INT)")).over(wg)
          .cast("long").as("settlement_ratio"),
        sum(expr("try_cast(finalSettlementAmount AS INT)")).over(wg)
          .cast("long").as("settlement_amount"),
        expr("try_cast(totalSalesAmount AS INT)").as("sales_amount"),
        expr("try_cast(totalRefundedAmount AS INT)").as("refund_amount"),
        sum(expr("try_cast(totalPayableAmount AS INT)")).over(wg)
          .cast("long").as("payable_amount"),
        (col("settlementPeriodStartDate").cast("timestamp_ntz")
          + expr("INTERVAL 9 HOURS")).as("start_date"),
        (col("settlementPeriodEndDate").cast("timestamp_ntz")
          + expr("INTERVAL 9 HOURS")).as("end_date"),
        col("__rn"))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
