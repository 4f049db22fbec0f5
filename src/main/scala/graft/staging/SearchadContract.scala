package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.F

/** L2 staging — searchad brand contracts (reference: core/searchad/api/
  * contract/models.sql): two API payloads (TimeContract → contract_type 0,
  * BrandNewContract → contract_type 1) staged into one PK'd table.
  *
  * Semantics carried over:
  *  - the per-payload contract_status ladders (6-arm time, 12-arm
  *    brand-new; unknown codes → NULL);
  *  - the KST shift: every timestamp gets `+ INTERVAL 9 HOUR` before the
  *    DATE cast, so late-UTC rows land on the next Korean day;
  *  - TRY_CAST tolerance on optional timestamps (invalid → NULL) while
  *    the NOT NULL contract window uses plain CAST;
  *  - the TimeContract VAT uplift (`paymentAmt * 1.1`) — computed in
  *    DECIMAL with half-up rounding (the reference's DOUBLE-multiply
  *    TRY_CAST is engine-rounding-dependent; the DECIMAL spelling is the
  *    deterministic equivalent both engines agree on);
  *  - ON CONFLICT DO NOTHING across the two loads: the time load lands
  *    first, so on id collision the type-0 row wins — spelled as a
  *    QUALIFY over contract_id ordered by contract_type.
  */
object SearchadContract {

  val timeStatus: Seq[(String, Int)] = Seq(
    "UPCOMING_EXPOSE" -> 20, "ON_EXPOSING" -> 21,
    "CANCELED_BEFORE_EXPOSING" -> 22, "CANCELED_ON_EXPOSING" -> 23,
    "UPCOMING_CANCEL" -> 24, "EXPOSE_COMPLETED" -> 30)

  val brandNewStatus: Seq[(String, Int)] = Seq(
    "BIDDING" -> 10, "BILLING" -> 11, "CANCELED_ON_BIDDING" -> 12,
    "REBIDDING" -> 13, "UPCOMING_EXPOSE" -> 20, "ON_EXPOSING" -> 21,
    "CANCELED_BEFORE_EXPOSING" -> 22, "CANCELED_ON_EXPOSING" -> 23,
    "EXPOSE_COMPLETED" -> 30, "DEFEATED" -> 31, "BILLING_DEFEATED" -> 32,
    "FAILED_CONTRACT" -> 33)

  private def kstDate(c: String, tolerant: Boolean) = {
    val ts =
      if (tolerant) expr(s"try_cast($c AS TIMESTAMP)")
      else col(c).cast("timestamp")
    (ts + expr("INTERVAL 9 HOUR")).cast("date")
  }

  private def kstTs(c: String) =
    expr(s"try_cast($c AS TIMESTAMP)") + expr("INTERVAL 9 HOUR")

  /** TimeContract: bulk_insert (models.sql:25-55). */
  def stageTime(raw: DataFrame): DataFrame =
    raw.select(
      col("nccTimeContractId").as("contract_id"),
      col("nccAdgroupId").as("adgroup_id"),
      col("customerId").cast("int").as("customer_id"),
      col("contractName").as("contract_name"),
      lit(0).as("contract_type"),
      F.recode(col("contractStatus"), timeStatus).cast("int")
        .as("contract_status"),
      round(col("paymentAmt").cast("decimal(18,0)") *
        lit(new java.math.BigDecimal("1.1")), 0).cast("int")
        .as("contract_amount"),
      col("refundAmt").cast("int").as("refund_amount"),
      col("contractQc").cast("int").as("contract_qc"),
      col("totalKeywordQc").cast("int").as("keyword_qc"),
      kstTs("regTm").as("register_dt"),
      kstTs("editTm").as("edit_dt"),
      kstDate("contractStartDt", tolerant = false)
        .as("contract_start_date"),
      kstDate("contractEndDt", tolerant = false).as("contract_end_date"),
      kstDate("exposureStartDt", tolerant = true)
        .as("exposure_start_date"),
      kstDate("exposureEndDt", tolerant = true).as("exposure_end_date"),
      kstDate("cancelTm", tolerant = true).as("cancel_date"))

  /** BrandNewContract: bulk_insert (models.sql:98-133). */
  def stageBrandNew(raw: DataFrame): DataFrame =
    raw.select(
      col("brandNewContractId").as("contract_id"),
      col("nccAdgroupId").as("adgroup_id"),
      col("customerId").cast("int").as("customer_id"),
      col("contractName").as("contract_name"),
      lit(1).as("contract_type"),
      F.recode(col("contractStatus"), brandNewStatus).cast("int")
        .as("contract_status"),
      col("paymentAmt").cast("int").as("contract_amount"),
      col("refundAmt").cast("int").as("refund_amount"),
      lit(null).cast("int").as("contract_qc"),
      lit(null).cast("int").as("keyword_qc"),
      kstTs("regTm").as("register_dt"),
      kstTs("editTm").as("edit_dt"),
      kstDate("contractStartDt", tolerant = false)
        .as("contract_start_date"),
      kstDate("contractEndDt", tolerant = false).as("contract_end_date"),
      kstDate("exposureStartDt", tolerant = true)
        .as("exposure_start_date"),
      kstDate("exposureEndDt", tolerant = true).as("exposure_end_date"),
      kstDate("cancelTm", tolerant = true).as("cancel_date"))

  /** Both loads into the PK'd table: time first, brand-new's conflicting
    * ids dropped (ON CONFLICT DO NOTHING of the second load).
    */
  def stageAll(timeRaw: DataFrame, brandNewRaw: DataFrame): DataFrame =
    F.qualifyTopN(
      stageTime(timeRaw).unionByName(stageBrandNew(brandNewRaw)),
      Seq(col("contract_id")), Seq(col("contract_type")))
}
