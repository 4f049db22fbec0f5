package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L2 staging — coupang wing product (reference:
  * core/coupang/wing/product/models.sql).
  *
  * - `stageRocketOption` (models.sql:242-273): a deeply nested rocket-
  *   inventory payload — struct-path projection with a 3-level COALESCE
  *   over display-category levels, `COALESCE(cc.productName,
  *   listing.vendorInventoryName)`, and the conditional product-status
  *   (`isHiddenByVendor` → 2, else `IF(onSale, 0, 1)` only when the
  *   creturn view object exists at all).
  * - `stageProductDownload` (models.sql:156-174): Korean spreadsheet
  *   headers, the 2-arm 판매상태 recode, TRY_CAST numerics, and the
  *   caller-bound `$vendor_id` / `$is_deleted` parameters.
  */
object CoupangProduct {

  val rocketSchema: StructType = StructType(Seq(
    StructField("vendorItemId", LongType),
    StructField("unitsSoldForLast30Days", IntegerType),
    StructField("listingDetails", StructType(Seq(
      StructField("vendorInventoryId", LongType),
      StructField("productId", LongType),
      StructField("vendorInventoryName", StringType)))),
    StructField("creturnConfigViewDto", StructType(Seq(
      StructField("vendorId", StringType),
      StructField("productName", StringType),
      StructField("itemName", StringType),
      StructField("onSale", BooleanType),
      StructField("displayCategoryCodeLevel1", IntegerType),
      StructField("displayCategoryCodeLevel3", IntegerType),
      StructField("displayCategoryCodeLevel5", IntegerType)))),
    StructField("inventoryDetails", StructType(Seq(
      StructField("isHiddenByVendor", BooleanType),
      StructField("orderableQuantity", IntegerType))))))

  /** RocketOption staging over a JSON payload column. `vendorId` is the
    * caller-bound `$vendor_id` fallback.
    */
  def stageRocketOption(raw: DataFrame, payloadCol: Column,
                        vendorId: String): DataFrame = {
    // single parse into a struct attribute (own projection) — getField
    // over from_json in one projection lets Catalyst's JSON pruning
    // rewrite every access into its own single-field parse (r15 q91
    // finding: 13 parses/row); all fields are consumed here, so parse
    // once and extract from the attribute
    val parsed = raw.select(from_json(payloadCol, rocketSchema).as("__p"))
    val p = col("__p")
    val cc = p.getField("creturnConfigViewDto")
    val ld = p.getField("listingDetails")
    val inv = p.getField("inventoryDetails")
    parsed.select(
      ld.getField("vendorInventoryId").as("vendor_inventory_id"),
      ld.getField("productId").as("product_id"),
      p.getField("vendorItemId").as("option_id"),
      coalesce(cc.getField("vendorId"), lit(vendorId)).as("vendor_id"),
      coalesce(cc.getField("productName"), ld.getField("vendorInventoryName"))
        .as("product_name"),
      cc.getField("itemName").as("option_name"),
      coalesce(cc.getField("displayCategoryCodeLevel5"),
        cc.getField("displayCategoryCodeLevel3"),
        cc.getField("displayCategoryCodeLevel1")).as("display_category_id"),
      when(inv.getField("isHiddenByVendor"), lit(2))
        .when(cc.isNotNull,
          when(cc.getField("onSale"), lit(0)).otherwise(lit(1)))
        .otherwise(lit(null).cast("int")).as("product_status"),
      p.getField("unitsSoldForLast30Days").as("order_quantity"),
      inv.getField("orderableQuantity").as("stock_quantity"))
  }

  /** 판매상태 recode (models.sql:167). */
  val productStatus: Seq[(String, Int)] = Seq("판매중" -> 0, "판매중지" -> 1)

  /** ProductDownload staging over Korean spreadsheet headers. */
  def stageProductDownload(raw: DataFrame, vendorId: String,
                           isDeleted: Boolean): DataFrame =
    raw.select(
      expr("cast(`등록상품ID` AS BIGINT)").as("vendor_inventory_id"),
      expr("cast(`Product ID` AS BIGINT)").as("product_id"),
      expr("cast(`옵션 ID` AS BIGINT)").as("option_id"),
      col("바코드").as("barcode"),
      lit(vendorId).as("vendor_id"),
      col("쿠팡 노출 상품명").as("vendor_inventory_name"),
      col("업체 등록 상품명").as("product_name"),
      graft.functions.F.recode(col("판매상태"), productStatus).cast("int")
        .as("product_status"),
      lit(isDeleted).as("is_deleted"),
      expr("try_cast(`할인율기준가` AS INT)").as("price"),
      expr("try_cast(`판매가격` AS INT)").as("sales_price"),
      expr("try_cast(`판매수량` AS INT)").as("order_quantity"),
      expr("try_cast(`잔여수량(재고)` AS INT)").as("stock_quantity"))
}
