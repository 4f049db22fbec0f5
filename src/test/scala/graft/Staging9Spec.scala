package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.staging.SearchadContract

/** Edge semantics of the late-round ports: the searchad contract staging
  * (q143) and the batch stock family's parsing rules (q140-q142).
  */
class Staging9Spec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def rawDf(rows: Seq[Row], cols: String*) = {
    val schema = org.apache.spark.sql.types.StructType(
      cols.map(c => org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(rows.asJava, schema)
  }

  private val timeCols = Seq("nccTimeContractId", "nccAdgroupId",
    "customerId", "contractName", "contractStatus", "paymentAmt",
    "refundAmt", "contractQc", "totalKeywordQc", "regTm", "editTm",
    "contractStartDt", "contractEndDt", "exposureStartDt", "exposureEndDt",
    "cancelTm")

  private def timeRow(id: String, status: String, pay: String,
                      reg: String): Row =
    Row(id, "grp-1", "7", "CT", status, pay, null, "3", "9", reg,
      "1996-01-02 10:00:00", "1996-01-03 16:00:00", "1996-02-03 10:00:00",
      "bad", null, null)

  test("searchad contract staging: KST shift, ladders, VAT, tolerance") {
    val staged = SearchadContract.stageTime(rawDf(Seq(
      timeRow("TC1", "ON_EXPOSING", "100", "1996-01-01 20:00:00"),
      timeRow("TC2", "NOT_A_STATUS", "5", "-")), timeCols: _*))
    val rows = staged.orderBy("contract_id").collect()

    // +9h KST: 16:00 start crosses midnight → next day's date; the 20:00
    // register timestamp shifts to 05:00 next day
    assert(rows(0).getAs[java.sql.Date]("contract_start_date").toString
      === "1996-01-04")
    assert(rows(0).getAs[java.sql.Timestamp]("register_dt").toString
      === "1996-01-02 05:00:00.0")
    // VAT in DECIMAL, half-up: 100*1.1=110; 5*1.1=5.5 → 6
    assert(rows(0).getAs[Int]("contract_amount") === 110)
    assert(rows(1).getAs[Int]("contract_amount") === 6)
    // unknown status → NULL; invalid regTm → NULL register_dt; the 'bad'
    // exposure start is tolerated to NULL
    assert(rows(0).getAs[Int]("contract_status") === 21)
    assert(rows(1).isNullAt(rows(1).fieldIndex("contract_status")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("register_dt")))
    assert(rows(0).isNullAt(rows(0).fieldIndex("exposure_start_date")))
  }

  test("searchad contract staging: second load's conflicts are dropped") {
    val t = rawDf(Seq(timeRow("TC1", "ON_EXPOSING", "100",
      "1996-01-01 10:00:00")), timeCols: _*)
    val bnCols = Seq("brandNewContractId", "nccAdgroupId", "customerId",
      "contractName", "contractStatus", "paymentAmt", "refundAmt", "regTm",
      "editTm", "contractStartDt", "contractEndDt", "exposureStartDt",
      "exposureEndDt", "cancelTm")
    val bn = rawDf(Seq(
      Row("TC1", "grp-2", "8", "BN-dup", "BIDDING", "50", null,
        "1996-01-01 10:00:00", "1996-01-02 10:00:00",
        "1996-01-03 10:00:00", "1996-02-03 10:00:00", null, null, null),
      Row("BC9", "grp-3", "9", "BN-new", "DEFEATED", "70", null,
        "1996-01-01 10:00:00", "1996-01-02 10:00:00",
        "1996-01-03 10:00:00", "1996-02-03 10:00:00", null, null, null)),
      bnCols: _*)
    val out = SearchadContract.stageAll(t, bn).orderBy("contract_id")
      .collect()
    assert(out.length === 2)
    // TC1: the time row (type 0) wins; BC9 is the brand-new row
    assert(out(0).getAs[String]("contract_id") === "BC9")
    assert(out(0).getAs[Int]("contract_status") === 31)
    assert(out(1).getAs[String]("contract_id") === "TC1")
    assert(out(1).getAs[Int]("contract_type") === 0)
    assert(out(1).getAs[String]("contract_name") === "CT")
  }

  test("stock batch: ':qty' multiplier parse tolerates missing suffix") {
    import spark.implicits._
    // mirrors the coupang_rfm model's multiplier expression
    val df = Seq("55:2", "77", null).toDF("product").select(
      coalesce(expr("try_element_at(split(product, ':'), 1)"),
        lit("200000")).as("product_id"),
      expr("coalesce(try_cast(try_element_at(split(product, ':'), 2) " +
        "AS BIGINT), 1)").as("mult"))
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("55", 2L), ("77", 1L), ("200000", 1L)))
  }
}
