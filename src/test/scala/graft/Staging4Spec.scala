package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.staging.{HcenterSales, SabangnetProduct}

class Staging4Spec extends SparkSpec {
  import spark.implicits._

  private def payload(pid: Long, cat: String, click: Long, cnt: Long,
                      amt: Long): String =
    s"""{"product":{"identifier":"$pid","category":{"identifier":"$cat"}},""" +
      s""""visit":{"click":$click},"sales":{"paymentCount":$cnt,"paymentAmount":$amt}}"""

  test("hcenter stageSales: distinct + re-agg over nested payload") {
    // two identical rows for pid=1 (DISTINCT collapses), one different row
    // for pid=1 (sums), junk category (-> null), one row pid=2
    val raw = Seq(
      payload(1, "10", 3, 1, 100), payload(1, "10", 3, 1, 100),
      payload(1, "x", 2, 1, 50), payload(2, "20", 5, 2, 200)
    ).toDF("payload")
    val out = HcenterSales.stageSales(raw, col("payload"), mallSeq = 9,
        paymentDate = java.time.LocalDate.of(2024, 2, 1))
      .orderBy("product_id").collect()
    assert(out.length == 2)
    val p1 = out(0)
    assert(p1.getAs[Long]("product_id") == 1L)
    assert(p1.getAs[Int]("category_id3") == 10)   // MAX skips the null
    assert(p1.getAs[Long]("click_count") == 5)    // 3 + 2 (dup collapsed)
    assert(p1.getAs[Long]("payment_amount") == 150)
    assert(out(1).getAs[Long]("payment_amount") == 200)
  }

  private val productSchema = StructType(Seq(
    StructField("product_id", LongType), StructField("mall_seq", IntegerType),
    StructField("category_id", IntegerType), StructField("category_id3", IntegerType),
    StructField("product_name", StringType), StructField("sales_price", LongType),
    StructField("first_payment_date", DateType),
    StructField("last_payment_date", DateType)))

  test("hcenter upsertProduct: coalescing D3 merge widens validity window") {
    val target = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 9, null, 5, "old", null,
        java.sql.Date.valueOf("2024-01-10"), java.sql.Date.valueOf("2024-01-20")))),
      productSchema)
    val raw = Seq(payload(1, "10", 1, 1, 1), payload(3, "30", 1, 1, 1))
      .toDF("payload")
    val out = HcenterSales.upsertProduct(target, raw, col("payload"),
        mallSeq = 9, startDate = java.time.LocalDate.of(2024, 1, 1),
        endDate = java.time.LocalDate.of(2024, 2, 1))
      .orderBy("product_id").collect()
    assert(out.length == 2)
    val p1 = out(0)
    assert(p1.getAs[Int]("category_id3") == 10)  // source-first coalesce
    assert(p1.getAs[java.sql.Date]("first_payment_date").toString == "2024-01-01") // LEAST
    assert(p1.getAs[java.sql.Date]("last_payment_date").toString == "2024-02-01")  // GREATEST
    assert(out(1).getAs[Long]("product_id") == 3L) // inserted
  }

  test("sabangnet stage: regex PK gate, TRY_CAST junk, enum labels") {
    val raw = Seq(
      ("123456-0001", "880123", "size", "L", "", "1", "3", "2", "500", "2024-01-01 10:00:00"),
      ("badkey", "1", "size", "M", "", "1", "1", "1", "1", "2024-01-01 10:00:00"),
      ("654321-0002", "junk", "color", "red", "123456-0001", "2", "9", "x", "-100", "not a date")
    ).toDF("상품코드", "바코드", "옵션제목", "옵션상세명칭", "연결상품코드",
      "공급상태", "옵션구분", "EA", "단품추가금액", "등록일시")
    val mapping = Map("상품코드" -> "option_id", "바코드" -> "barcode",
      "옵션제목" -> "option_group", "옵션상세명칭" -> "option_name",
      "연결상품코드" -> "bundle_option_ids", "공급상태" -> "option_status",
      "옵션구분" -> "option_type", "EA" -> "option_quantity",
      "단품추가금액" -> "option_price", "등록일시" -> "register_dt")
    val staged = SabangnetProduct.stage(raw, mapping)
    val out = staged.orderBy("option_id").collect()
    assert(out.length == 2)                       // 'badkey' gated out
    assert(out(0).getAs[Long]("barcode") == 880123L)
    assert(out(1).isNullAt(out(1).fieldIndex("barcode")))      // junk -> null
    assert(out(1).isNullAt(out(1).fieldIndex("option_quantity")))
    assert(out(1).getAs[Int]("option_price") == -100)
    assert(out(1).isNullAt(out(1).fieldIndex("register_dt")))  // bad ts -> null
    val labeled = SabangnetProduct.withLabels(spark, staged)
      .orderBy("option_id").collect()
    assert(labeled(0).getAs[String]("status_label") == "on_sale")
    assert(labeled(1).getAs[String]("status_label") == "sold_out")
    assert(labeled(1).isNullAt(labeled(1).fieldIndex("type_label"))) // code 9 unmapped
  }
}
