package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.F

/** L2 staging — smartstore API product master (reference:
  * core/smartstore/api/product/models.sql): channel/origin product ids,
  * the 12-arm delivery-attribute ladder, TRY_CAST ids/categories, and the
  * ISO-8601 'T' register/modify timestamps (SUBSTR(1,19) truncation).
  */
object SmartstoreProduct {

  /** deliveryAttributeType → delivery_type (models.sql:57-69). */
  val deliveryType: Seq[(String, Int)] = Seq(
    "NORMAL" -> 0, "TODAY" -> 1, "OPTION_TODAY" -> 2, "HOPE" -> 3,
    "TODAY_ARRIVAL" -> 4, "DAWN_ARRIVAL" -> 5, "PRE_ORDER" -> 6,
    "ARRIVAL_GUARANTEE" -> 7, "SELLER_GUARANTEE" -> 8,
    "HOPE_SELLER_GUARANTEE" -> 9, "PICKUP" -> 10, "QUICK" -> 11)

  private def isoT(c: String) =
    expr(s"try_to_timestamp(substring($c, 1, 19), \"yyyy-MM-dd'T'HH:mm:ss\")")

  def stageProduct(raw: DataFrame, channelSeq: Long): DataFrame =
    raw.select(
      col("channelProductNo").cast("bigint").as("product_id"),
      col("originProductNo").cast("bigint").as("product_no"),
      expr("try_cast(modelId AS BIGINT)").as("catalog_id"),
      lit(channelSeq).as("channel_seq"),
      col("name").as("product_name"),
      col("sellerManagementCode").as("management_code"),
      col("modelName").as("model_name"),
      col("brandName").as("brand_name"),
      expr("try_cast(categoryId AS INT)").as("category_id"),
      col("statusType").as("status_type"),
      col("channelProductDisplayStatusType").as("display_type"),
      col("sellerTags").as("tags"),
      col("salePrice").cast("int").as("price"),
      col("discountedPrice").cast("int").as("sales_price"),
      F.recode(col("deliveryAttributeType"), deliveryType).cast("int")
        .as("delivery_type"),
      col("deliveryFee").cast("int").as("delivery_fee"),
      isoT("regDate").as("register_dt"),
      isoT("modifiedDate").as("modify_dt"))
}
