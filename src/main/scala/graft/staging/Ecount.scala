package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L2 staging — ecount ERP inventory/product (reference:
  * core/ecount/api/inventory/models.sql, core/ecount/api/product/models.sql).
  *
  * The product feed stores its fields in generic CONT1..CONT6 slots; the
  * staging projection names them, and `expiration_date` resolves through
  * the reference's `COALESCE(NULLIF(CONT2,'0'), NULLIF(CONT3,'0'))` —
  * '0' is the feed's "not set" marker, so it must coalesce THROUGH, not
  * short-circuit. `updated_at` is caller-bound (replayable loads) where
  * the reference stamps CURRENT_TIMESTAMP.
  */
object Ecount {

  def stageProduct(raw: DataFrame,
                   updatedAt: java.time.LocalDateTime): DataFrame =
    raw.select(
      col("PROD_CD").as("product_code"),
      col("CONT4").as("option_id"),
      col("PROD_DES").as("product_name"),
      col("CONT6").as("product_keyword"),
      col("CONT1").as("brand_name"),
      col("REMARKS_WIN").as("remarks"),
      expr("try_cast(SIZE_DES AS INT)").as("unit_quantity"),
      col("UNIT").as("unit_name"),
      expr("try_cast(IN_PRICE AS INT)").as("org_price"),
      coalesce(nullif(col("CONT2"), lit("0")), nullif(col("CONT3"), lit("0")))
        .as("expiration_date"),
      lit(java.sql.Timestamp.valueOf(updatedAt)).as("updated_at"))

  def stageInventory(raw: DataFrame,
                     updatedAt: java.time.LocalDateTime): DataFrame =
    raw.select(
      col("PROD_CD").as("product_code"),
      col("BAL_QTY").cast("int").as("quantity"),
      lit(java.sql.Timestamp.valueOf(updatedAt)).as("updated_at"))
}
