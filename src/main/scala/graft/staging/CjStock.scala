package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L2 staging — CJ eflexs warehouse stock (reference:
  * core/cj/eflexs/stock/models.sql:23-44): rename projection, TRY_CAST
  * numerics, and the `STRPTIME('%Y%m%d')` integer-date parse for
  * `inbound_date`. The reference stamps `updated_at` with
  * `CURRENT_TIMESTAMP`; here it is a caller-bound parameter so loads are
  * replayable (same rule as HcenterSales' payment date).
  */
object CjStock {

  def stage(raw: DataFrame, updatedAt: java.time.LocalDateTime): DataFrame =
    raw.select(
      col("itemCd").as("item_code"),
      col("itemVarcode").as("barcode"),
      col("strrId").cast("bigint").as("customer_id"),
      col("itemNm").as("item_name"),
      col("whCd").as("warehouse_code"),
      col("whNm").as("warehouse_name"),
      col("zoneCd").as("zone_code"),
      col("wcellNm").as("location_name"),
      expr("try_cast(lotNo AS BIGINT)").as("lot_no"),
      col("invnQty").cast("int").as("total_quantity"),
      col("avlbQty").cast("int").as("usable_quantity"),
      col("hldQty").cast("int").as("hold_quantity"),
      expr("try_cast(remainInvnDays AS INT)").as("remain_days"),
      expr("try_cast(validDatetime AS DATE)").as("validate_date"),
      expr("try_to_timestamp(cast(inbDate AS STRING), 'yyyyMMdd')")
        .cast("date").as("inbound_date"),
      lit(java.sql.Timestamp.valueOf(updatedAt)).as("updated_at"))
}
