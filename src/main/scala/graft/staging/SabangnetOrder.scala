package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.operators.MergeOps

/** L2 staging — sabangnet admin order download (reference:
  * core/sabangnet/admin/order/models.sql — the reference's widest raw
  * domain, downloaded as Korean-headed spreadsheet rows).
  *
  * - `stageInvoice` (models.sql:200-242): rename/TRY_CAST projection over
  *   the raw Korean headers, the 6-arm order-division and 18-arm
  *   order-status recode ladders, and the reject-unparseable WHERE guard
  *   (no invoice number / unparseable order timestamp → dropped).
  * - `upsertOption` (models.sql:161-198): QUALIFY rn=1 latest-order-first
  *   dedup per option key, then the coalescing MERGE — every attribute
  *   `COALESCE(EXCLUDED.c, c)`, validity window widened with
  *   `LEAST(first_order_dt)` / `GREATEST(last_order_dt)` — via [[MergeOps]]
  *   so the same strategy DSL drives parquet and JDBC loads.
  */
object SabangnetOrder {

  /** 주문구분 → order_status_div (models.sql:207-215). */
  val orderStatusDiv: Seq[(String, Int)] = Seq(
    "주문(진행)" -> 1, "주문(완료)" -> 2, "교발(진행)" -> 3,
    "교발(완료)" -> 4, "회수(진행)" -> 5, "회수(완료)" -> 6)

  /** 주문상태 → order_status (models.sql:216-236). */
  val orderStatus: Seq[(String, Int)] = Seq(
    "신규주문" -> 1, "주문확인" -> 2, "출고대기" -> 3, "출고완료" -> 4,
    "배송보류" -> 6, "취소접수" -> 7, "교환접수" -> 8, "반품접수" -> 9,
    "취소완료" -> 10, "교환완료" -> 11, "반품완료" -> 12,
    "교환발송준비" -> 21, "교환발송완료" -> 22, "교환회수준비" -> 23,
    "교환회수완료" -> 24, "반품회수준비" -> 25, "반품회수완료" -> 26,
    "폐기" -> 999)

  private def orderDt = expr("try_cast(`주문일시(YYYY-MM-DD HH:MM)` AS TIMESTAMP)")

  /** Invoice staging (bulk_insert_invoice): recode ladders + parse guard. */
  def stageInvoice(raw: DataFrame): DataFrame =
    raw.select(
        expr("cast(`주문번호(사방넷)` AS BIGINT)").as("order_seq"),
        expr("cast(`계정등록순번` AS INT)").as("account_no"),
        col("송장번호").as("invoice_no"),
        col("택배사").as("delivery_company"),
        F.recode(col("주문구분"), orderStatusDiv).cast("int").as("order_status_div"),
        F.recode(col("주문상태"), orderStatus).cast("int").as("order_status"),
        orderDt.as("order_dt"),
        expr("try_cast(`송장등록일자(YYYY-MM-DD)` AS DATE)").as("invoice_date"))
      .filter(col("invoice_no").isNotNull && col("order_dt").isNotNull)

  /** Option-dim projection (bulk_insert_option's SELECT list, trimmed to
    * the load-bearing columns).
    */
  def stageOption(raw: DataFrame): DataFrame =
    raw.select(
      col("상품코드(사방넷)").as("option_id"),
      col("상품코드(쇼핑몰)").as("product_id_shop"),
      expr("cast(`계정등록순번` AS INT)").as("account_no"),
      col("모델명").as("model_code"),
      col("상품명(확정)").as("product_name"),
      expr("try_cast(`판매가(상품)` AS INT)").as("sales_price"),
      col("주문번호(쇼핑몰)").as("order_id"),
      orderDt.as("first_order_dt"),
      orderDt.as("last_order_dt"))

  /** Deterministic form of the reference's unordered `QUALIFY rn = 1`:
    * latest order first (DESC NULLS LAST), then value columns so remaining
    * ties are identical rows.
    */
  val optionDedupOrder: Seq[org.apache.spark.sql.Column] = Seq(
    col("first_order_dt").desc_nulls_last, col("order_id").desc_nulls_last,
    col("product_name").desc_nulls_last, col("model_code").desc_nulls_last,
    col("sales_price").desc_nulls_last)

  /** Option-dim coalescing upsert (bulk_insert_option's ON CONFLICT). */
  def upsertOption(target: DataFrame, raw: DataFrame): DataFrame =
    MergeOps.upsert(target, stageOption(raw),
      Seq("account_no", "product_id_shop", "option_id"),
      Map("first_order_dt" -> MergeOps.Least,
          "last_order_dt" -> MergeOps.Greatest),
      default = MergeOps.SourceFirst,
      dedupOrder = optionDedupOrder)
}
