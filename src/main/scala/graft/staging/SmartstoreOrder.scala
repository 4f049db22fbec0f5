package graft.staging

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.F
import graft.operators.MergeOps

/** L2 staging pipeline — the reference's core transform shape, end to end:
  * raw nested JSON API response → four typed relational tables with
  * primary keys and upsert semantics.
  *
  * Reference: core/smartstore/api/order/models.sql (DDL :1-66, projections
  * :69-200, enum ladders :91-117, QUALIFY dedup :188, coalescing upsert
  * :189-200) and transform.py:24-45 (parser schema, scope `data.contents`).
  *
  * Spark shape: explicit StructType + permissive from_json (schema is
  * declared, bad branches go null — the TRY_CAST idiom), pure column
  * projections (P1-P4), optional-param predicates (P6), window dedup (W1),
  * and MergeOps upserts (D1-D3). No UDFs anywhere; the whole pipeline is
  * one narrow projection per table over a shared parsed scan.
  */
object SmartstoreOrder {

  // -- response schema (FIXTURES.md §2) ------------------------------------
  val shippingAddressSchema: StructType = StructType(Seq(
    StructField("zipCode", StringType), StructField("latitude", StringType),
    StructField("longitude", StringType)))

  val responseSchema: StructType = StructType(Seq(
    StructField("productOrderId", StringType),
    StructField("content", StructType(Seq(
      StructField("order", StructType(Seq(
        StructField("orderId", StringType),
        StructField("ordererNo", StringType),
        StructField("payLocationType", StringType),
        StructField("orderDate", StringType),
        StructField("paymentDate", StringType)))),
      StructField("productOrder", StructType(Seq(
        StructField("merchantChannelId", StringType),
        StructField("productId", StringType),
        StructField("itemNo", StringType),
        StructField("productClass", StringType),
        StructField("deliveryAttributeType", StringType),
        StructField("inflowPath", StringType),
        StructField("inflowPathAdd", StringType),
        StructField("quantity", StringType),
        StructField("unitPrice", StringType),
        StructField("optionPrice", StringType),
        StructField("productDiscountAmount", StringType),
        StructField("expectedSettlementAmount", StringType),
        StructField("deliveryFeeAmount", StringType),
        StructField("shippingAddress", shippingAddressSchema),
        StructField("sellerProductCode", StringType),
        StructField("optionManageCode", StringType),
        StructField("productName", StringType),
        StructField("productOption", StringType)))),
      StructField("delivery", StructType(Seq(
        StructField("trackingNumber", StringType),
        StructField("deliveryCompany", StringType),
        StructField("deliveryMethod", StringType),
        StructField("pickupDate", StringType),
        StructField("sendDate", StringType)))),
      StructField("completedClaims", StructType(Seq(
        // digit-keyed struct field (reference models.sql:301-309)
        StructField("0", StructType(Seq(
          StructField("claimType", StringType),
          StructField("claimRequestAdmissionDate", StringType))))))))))))

  /** Parse raw JSON response lines (`{"data": {"contents": [...]}}`) into
    * one row per product order — the `UNNEST($rows)` scan primitive (S1).
    */
  def parseResponse(spark: SparkSession, raw: Dataset[String]): DataFrame = {
    val wrapper = StructType(Seq(StructField("data", StructType(Seq(
      StructField("contents", ArrayType(responseSchema)))))))
    spark.read.schema(wrapper).json(raw)
      .select(explode(col("data.contents")).as("r"))
      .select(col("r.*"))
  }

  /** ISO timestamp prefix parse — the reference's
    * `TRY_STRPTIME(SUBSTR(.., 1, 19), ..)` (models.sql:78). */
  private def tsCol(c: Column): Column =
    try_to_timestamp(substring(c, 1, 19), lit("yyyy-MM-dd'T'HH:mm:ss"))

  // enum ladders (reference models.sql:91-117 — value sets representative)
  val payLocation: Seq[(String, Int)] = Seq("PC" -> 0, "MOBILE" -> 1)
  val productClass: Seq[(String, Int)] = Seq("단일상품" -> 0, "조합형옵션상품" -> 1)
  val deliveryAttr: Seq[(String, Int)] =
    Seq("NORMAL" -> 0, "TODAY" -> 1, "HOPE" -> 2, "TODAY_ARRIVAL" -> 3, "PRE_ORDER" -> 4)
  val deliveryMethodMap: Seq[(String, Int)] =
    Seq("DELIVERY" -> 0, "GDFW_ISSUE_SVC" -> 1, "FULFILLMENT" -> 2, "DIRECT_DELIVERY" -> 3)

  /** 'null'/'undefined' literal strings → NULL (models.sql:119-121). */
  private def cleanStr(c: Column): Column =
    when(c.isin("null", "undefined", ""), lit(null)).otherwise(c)

  /** `smartstore_order` — one row per order, top-1 by product order id
    * (W1 dedup: multiple product orders share one order). Rows without a
    * paymentDate are excluded (models.sql:81).
    */
  def stageOrder(parsed: DataFrame, channelSeq: Long): DataFrame = {
    val base = parsed.select(
        expr("try_cast(content.order.orderId AS BIGINT)").as("order_id"),
        lit(channelSeq).as("channel_seq"),
        expr("try_cast(content.order.ordererNo AS BIGINT)").as("orderer_no"),
        F.recode(col("content.order.payLocationType"), payLocation, null)
          .cast("int").as("payment_location"),
        tsCol(col("content.order.orderDate")).as("order_dt"),
        tsCol(col("content.order.paymentDate")).as("payment_dt"))
      .filter(col("payment_dt").isNotNull && col("order_id").isNotNull)
    F.qualifyTopN(base, Seq(col("order_id"), col("channel_seq")),
      Seq(col("payment_dt"), col("orderer_no")))
  }

  /** `smartstore_product_order` — one row per product order (PK). */
  def stageProductOrder(parsed: DataFrame, channelSeq: Long): DataFrame = {
    val base = parsed.select(
        expr("try_cast(productOrderId AS BIGINT)").as("product_order_id"),
        expr("try_cast(content.order.orderId AS BIGINT)").as("order_id"),
        lit(channelSeq).as("channel_seq"),
        expr("try_cast(content.productOrder.productId AS BIGINT)").as("product_id"),
        expr("try_cast(content.productOrder.itemNo AS BIGINT)").as("option_id"),
        F.recode(col("content.productOrder.productClass"), productClass, null)
          .cast("int").as("product_type"),
        F.recode(col("content.productOrder.deliveryAttributeType"), deliveryAttr, null)
          .cast("int").as("delivery_type"),
        cleanStr(col("content.productOrder.inflowPath")).as("inflow_path"),
        cleanStr(col("content.productOrder.inflowPathAdd")).as("inflow_path_add"),
        expr("try_cast(content.productOrder.quantity AS INT)").as("order_quantity"),
        expr("try_cast(content.productOrder.unitPrice AS INT)").as("unit_price"),
        expr("try_cast(content.productOrder.optionPrice AS INT)").as("option_price"),
        expr("try_cast(content.productOrder.productDiscountAmount AS INT)").as("discount_amount"),
        expr("try_cast(content.productOrder.expectedSettlementAmount AS INT)").as("supply_amount"),
        expr("try_cast(content.productOrder.deliveryFeeAmount AS INT)").as("delivery_fee"),
        tsCol(col("content.order.paymentDate")).as("payment_dt"),
        col("content.completedClaims.0.claimType").as("claim_type"))
      .filter(col("payment_dt").isNotNull && col("product_order_id").isNotNull)
    F.qualifyTopN(base, Seq(col("product_order_id")), Seq(col("payment_dt")))
  }

  /** `smartstore_delivery` — shipping + tracking projection. */
  def stageDelivery(parsed: DataFrame, channelSeq: Long): DataFrame = {
    val base = parsed.select(
        expr("try_cast(productOrderId AS BIGINT)").as("product_order_id"),
        expr("try_cast(content.order.orderId AS BIGINT)").as("order_id"),
        lit(channelSeq).as("channel_seq"),
        cleanStr(col("content.delivery.trackingNumber")).as("invoice_no"),
        cleanStr(col("content.delivery.deliveryCompany")).as("delivery_company"),
        F.recode(col("content.delivery.deliveryMethod"), deliveryMethodMap, null)
          .cast("int").as("delivery_method"),
        col("content.productOrder.shippingAddress.zipCode").as("zip_code"),
        col("content.productOrder.shippingAddress.latitude").as("latitude"),
        col("content.productOrder.shippingAddress.longitude").as("longitude"),
        tsCol(col("content.delivery.pickupDate")).as("pickup_dt"),
        tsCol(col("content.delivery.sendDate")).as("send_dt"),
        tsCol(col("content.order.paymentDate")).as("payment_dt"))
      .filter(col("product_order_id").isNotNull && col("payment_dt").isNotNull)
    F.qualifyTopN(base, Seq(col("product_order_id")), Seq(col("payment_dt")))
  }

  /** `smartstore_option` — product/option dimension with first/last payment
    * timestamps; upserted with LEAST/GREATEST widening (D3).
    */
  def stageOption(parsed: DataFrame, channelSeq: Long): DataFrame = {
    val base = parsed.select(
        expr("try_cast(content.productOrder.productId AS BIGINT)").as("product_id"),
        expr("try_cast(content.productOrder.itemNo AS BIGINT)").as("option_id"),
        lit(channelSeq).as("channel_seq"),
        cleanStr(col("content.productOrder.sellerProductCode")).as("seller_product_code"),
        cleanStr(col("content.productOrder.optionManageCode")).as("seller_option_code"),
        F.recode(col("content.productOrder.productClass"), productClass, null)
          .cast("int").as("product_type"),
        col("content.productOrder.productName").as("product_name"),
        cleanStr(col("content.productOrder.productOption")).as("option_name"),
        expr("try_cast(content.productOrder.unitPrice AS INT)").as("sales_price"),
        expr("try_cast(content.productOrder.optionPrice AS INT)").as("option_price"),
        tsCol(col("content.order.paymentDate")).as("first_payment_dt"),
        tsCol(col("content.order.paymentDate")).as("last_payment_dt"))
      .filter(col("product_id").isNotNull && col("first_payment_dt").isNotNull)
    F.qualifyTopN(base, Seq(col("product_id"), col("option_id")),
      Seq(col("first_payment_dt")))
  }

  /** Coalescing upsert of a staged option batch into the existing dim
    * (D3: first_payment_dt = LEAST, last_payment_dt = GREATEST, other
    * columns COALESCE(source, target) — models.sql:189-200).
    */
  def upsertOptions(target: DataFrame, staged: DataFrame): DataFrame =
    MergeOps.upsert(target, staged, Seq("product_id", "option_id"),
      Map("first_payment_dt" -> MergeOps.Least,
          "last_payment_dt" -> MergeOps.Greatest),
      default = MergeOps.SourceFirst,
      dedupOrder = Seq(col("first_payment_dt")))
}
