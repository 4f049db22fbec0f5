package graft

import org.apache.spark.sql.functions._
import graft.staging.Settlement

class Staging3Spec extends SparkSpec {
  import spark.implicits._

  private def rawRows = Seq(
    // group A: two detail rows; sums must cover both, output keeps first
    ("A", 1L, "60", "1000", "900", "-50", "800", "2024-01-01", "2024-01-14"),
    ("A", 2L, "40", "500", "450", "bad", "400", "2024-01-01", "2024-01-14"),
    // group B: single row, unparseable ratio -> NULL contributes nothing
    ("B", 3L, "n/a", "200", "180", "-10", "150", "2024-02-01", "2024-02-14")
  ).toDF("settlementGroupKey", "o_orderkey", "settlementRatio",
    "finalSettlementAmount", "totalSalesAmount", "totalRefundedAmount",
    "totalPayableAmount", "settlementPeriodStartDate", "settlementPeriodEndDate")

  test("settlement staging: window sums over all rows, first row kept") {
    val out = Settlement.stage(rawRows, "V9", Seq(col("o_orderkey")))
      .orderBy("group_key").collect()
    assert(out.length == 2)
    val a = out(0)
    assert(a.getAs[String]("group_key") == "A")
    assert(a.getAs[String]("vendor_id") == "V9")
    assert(a.getAs[Long]("settlement_ratio") == 100)    // 60 + 40
    assert(a.getAs[Long]("settlement_amount") == 1500)  // 1000 + 500
    assert(a.getAs[Int]("sales_amount") == 900)         // first row's detail
    assert(a.getAs[Int]("refund_amount") == -50)
    assert(a.getAs[Long]("payable_amount") == 1200)
    val b = out(1)
    assert(b.isNullAt(b.fieldIndex("settlement_ratio")) ||
      b.getAs[Any]("settlement_ratio") == null)          // 'n/a' -> NULL sum
  }

  test("settlement staging: TRY_CAST tolerates junk, +9h shift applied") {
    val out = Settlement.stage(rawRows, "V9", Seq(col("o_orderkey")))
      .filter(col("group_key") === "A").collect().head
    // row 2's refund 'bad' would be NULL, but row 1 is kept: -50 present
    assert(out.getAs[Int]("refund_amount") == -50)
    val start = out.getAs[java.time.LocalDateTime]("start_date")
    assert(start == java.time.LocalDateTime.of(2024, 1, 1, 9, 0, 0),
      s"expected 2024-01-01T09:00 local wall clock, got $start")
  }
}
