package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.staging.SmartstoreOrder

class StagingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val parsed = {
    val path = getClass.getResource("/fixtures/smartstore_order_response.jsonl").getPath
    val raw = spark.read.textFile(path)
    SmartstoreOrder.parseResponse(spark, raw).cache()
  }

  test("parseResponse explodes contents across response batches") {
    // 5 product orders across 2 response lines (incl. one duplicate id)
    assert(parsed.count() == 5)
  }

  test("stageOrder dedups to one row per order and drops unpaid") {
    val orders = SmartstoreOrder.stageOrder(parsed, channelSeq = 55L)
      .orderBy("order_id").collect()
    // order 101 has null paymentDate → filtered; 100 has 2 product orders → 1 row
    assert(orders.map(_.getLong(0)).toSeq == Seq(100L, 102L))
    val o100 = orders(0)
    assert(o100.getAs[Int]("payment_location") == 0)   // PC → 0
    assert(o100.getAs[Timestamp]("payment_dt") != null)
  }

  test("stageProductOrder: PK dedup, enum recode, null-string cleanup, digit-key claim") {
    val po = SmartstoreOrder.stageProductOrder(parsed, 55L)
      .orderBy("product_order_id").collect()
    assert(po.map(_.getLong(0)).toSeq == Seq(9001L, 9002L, 9004L)) // 9003 unpaid, 9004 deduped
    val p9001 = po(0)
    assert(p9001.getAs[Int]("delivery_type") == 0)      // NORMAL
    assert(p9001.getAs[String]("inflow_path_add") == null) // 'null' string cleaned
    assert(p9001.getAs[String]("claim_type") == "RETURN")  // completedClaims."0"
    val p9002 = po(1)
    assert(p9002.getAs[Int]("delivery_type") == 1)      // TODAY
    assert(p9002.getAs[String]("claim_type") == null)   // claims null-safe
    val p9004 = po(2)
    assert(p9004.getAs[Int]("delivery_type") == 4)      // PRE_ORDER
    assert(p9004.getAs[Int]("supply_amount") == 73500)
  }

  test("stageDelivery maps nested shipping address and recodes method") {
    val d = SmartstoreOrder.stageDelivery(parsed, 55L)
      .orderBy("product_order_id").collect()
    assert(d.map(_.getLong(0)).toSeq == Seq(9001L, 9002L, 9004L))
    assert(d(0).getAs[String]("zip_code") == "06236")
    assert(d(2).getAs[Int]("delivery_method") == 2)     // FULFILLMENT
    assert(d(2).getAs[String]("invoice_no") == "T102")
  }

  test("stageOption + upsertOptions widens first/last payment window (D3)") {
    val staged = SmartstoreOrder.stageOption(parsed, 55L)
    // (200,1) and (201,2): 9003 (unpaid) excluded, (201,2) deduped to earliest
    assert(staged.count() == 2)
    // simulate an earlier load with narrower window and a null code
    val prior = Seq(
      (200L, 1L, 55L, null.asInstanceOf[String], "OMC-1", 0, "Widget", "Red",
        10000, 0, Timestamp.valueOf("2024-03-02 00:00:00"), Timestamp.valueOf("2024-03-02 00:00:00"))
    ).toDF("product_id", "option_id", "channel_seq", "seller_product_code",
      "seller_option_code", "product_type", "product_name", "option_name",
      "sales_price", "option_price", "first_payment_dt", "last_payment_dt")
    val merged = SmartstoreOrder.upsertOptions(prior, staged)
      .orderBy("product_id").collect()
    assert(merged.length == 2)
    val m200 = merged(0)
    // LEAST widened first_payment_dt to the (earlier) staged value
    assert(m200.getAs[Timestamp]("first_payment_dt")
      .before(Timestamp.valueOf("2024-03-02 00:00:00")))
    // GREATEST kept the (later) prior value
    assert(m200.getAs[Timestamp]("last_payment_dt") ==
      Timestamp.valueOf("2024-03-02 00:00:00"))
    // COALESCE(source, target) filled the null code from the staged batch
    assert(m200.getAs[String]("seller_product_code") == "SPC-200")
    // brand-new key inserted
    assert(merged(1).getAs[Long]("product_id") == 201L)
  }
}
