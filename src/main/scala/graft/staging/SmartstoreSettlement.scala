package graft.staging

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F

/** L2 staging — smartstore API settlement (reference:
  * core/smartstore/api/settlement/models.sql).
  *
  * - `stage` (models.sql:20-47): camelCase → snake_case projection, the
  *   7-arm settle-type recode, TRY-parsed ISO dates with the
  *   `payment_date IS NOT NULL` reject guard, and the caller-bound
  *   `$channel_seq`. `product_order_id` is staged as DECIMAL(38,0) —
  *   the reference declares HUGEINT (ids exceed BIGINT in the wild).
  * - `productOrderTypeDim` / `settleTypeDim` (models.sql:49-91): the
  *   reference's `UNNEST([STRUCT(...)])` literal dimensions as inline
  *   local relations (broadcast for free).
  */
object SmartstoreSettlement {

  /** (seq, code, name) rows of the settle-type dim (models.sql:81-91) —
    * the single source for the recode ladder, the inline dim, and the
    * declared query's oracle.
    */
  val settleTypeRows: Seq[(Int, String, String)] = Seq(
    (0, "NORMAL_SETTLE_ORIGINAL", "일반 정산"),
    (1, "NORMAL_SETTLE_AFTER_CANCEL", "정산 후 취소"),
    (2, "NORMAL_SETTLE_BEFORE_CANCEL", "정산 전 취소"),
    (3, "QUICK_SETTLE_ORIGINAL", "빠른정산"),
    (4, "QUICK_SETTLE_CANCEL", "빠른정산 회수"),
    (5, "QUANTITY_CANCEL_DEDUCTION", "수량 취소 정산(공제)"),
    (6, "QUANTITY_CANCEL_RESTORE", "수량 취소 정산(환급)"))

  /** settleType → settle_type (models.sql:28-36). */
  val settleType: Seq[(String, Int)] = settleTypeRows.map(r => r._2 -> r._1)

  def stage(raw: DataFrame, channelSeq: Long): DataFrame =
    raw.select(
        col("productOrderId").cast("decimal(38,0)").as("product_order_id"),
        col("orderId").cast("bigint").as("order_id"),
        lit(channelSeq).as("channel_seq"),
        expr("try_cast(productId AS BIGINT)").as("product_id"),
        col("productOrderType").as("product_order_type"),
        F.recode(col("settleType"), settleType).cast("int").as("settle_type"),
        col("paySettleAmount").cast("int").as("payment_amount"),
        col("totalPayCommissionAmount").cast("int").as("pay_commision_amount"),
        col("benefitSettleAmount").cast("int").as("benefit_settle_amount"),
        col("settleExpectAmount").cast("int").as("settle_expect_amount"),
        expr("try_cast(payDate AS DATE)").as("payment_date"),
        expr("try_cast(settleCompleteDate AS DATE)").as("settlement_date"))
      .filter(col("payment_date").isNotNull)

  /** Settlement: settle_type literal dim (models.sql:81-91). */
  def settleTypeDim(spark: SparkSession): DataFrame =
    F.inlineDim(spark, Seq("seq", "code", "name"),
      settleTypeRows.map(r => Seq(r._1, r._2, r._3)))

  /** Settlement: product_order_type literal dim, first rows of
    * models.sql:49-79 (the full 27-row table follows the same shape).
    */
  def productOrderTypeDim(spark: SparkSession): DataFrame =
    F.inlineDim(spark, Seq("seq", "code", "name"), Seq(
      Seq(0, "PROD_ORDER", "상품 주문"),
      Seq(1, "DELIVERY", "배송비"),
      Seq(2, "EXTRAFEE", "기타 비용"),
      Seq(3, "WITHDRAW", "결제 수단 출금"),
      Seq(4, "REFUND", "구매자 환불"),
      Seq(7, "PROD_PAY", "상품 결제"),
      Seq(13, "REVIEW", "리뷰 적립"),
      Seq(15, "QUICK_SETTLE", "빠른정산")))
}
