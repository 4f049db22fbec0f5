package graft.staging

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.MergeOps

/** L2 staging — seller-center aggregated sales (reference:
  * core/smartstore/hcenter/sales/models.sql:106-147):
  *
  * - nested payload paths (`product.identifier`,
  *   `product.category.identifier`, `visit.click`, `sales.paymentCount`) —
  *   P3 nested projection over a declared JSON schema;
  * - `SELECT DISTINCT` inner dedup, then SUM/MAX re-aggregation per
  *   (product_id, payment_date);
  * - a D3 coalescing upsert into the product dim: metadata columns
  *   `COALESCE(EXCLUDED.c, c)` source-first, validity window widened with
  *   `LEAST(first_payment_date)` / `GREATEST(last_payment_date)` — via
  *   [[MergeOps]] so the same strategy DSL drives parquet and JDBC loads.
  */
object HcenterSales {

  val payloadSchema: StructType = StructType(Seq(
    StructField("product", StructType(Seq(
      StructField("identifier", StringType),
      StructField("category", StructType(Seq(
        StructField("identifier", StringType))))))),
    StructField("visit", StructType(Seq(
      StructField("click", LongType)))),
    StructField("sales", StructType(Seq(
      StructField("paymentCount", LongType),
      StructField("paymentAmount", LongType))))))

  /** Flatten one payload row to the staged item columns. */
  private def items(raw: DataFrame, payloadCol: Column, mallSeq: Int,
                    paymentDate: LocalDate): DataFrame = {
    // single parse into a struct attribute — see HcenterCatalog (r15)
    val parsed = raw.select(from_json(payloadCol, payloadSchema).as("__p"))
    val p = col("__p")
    parsed.select(
        p.getField("product").getField("identifier").as("product_raw"),
        p.getField("product").getField("category").getField("identifier")
          .as("category_raw"),
        p.getField("visit").getField("click").as("click_count"),
        p.getField("sales").getField("paymentCount").as("payment_count"),
        p.getField("sales").getField("paymentAmount").as("payment_amount"))
      .select(
        expr("try_cast(product_raw AS BIGINT)").as("product_id"),
        lit(mallSeq).as("mall_seq"),
        expr("try_cast(category_raw AS INT)").as("category_id3"),
        col("click_count"), col("payment_count"), col("payment_amount"),
        lit(java.sql.Date.valueOf(paymentDate)).as("payment_date"))
  }

  /** AggregatedSales: DISTINCT items → grouped fact
    * (models.sql:106-128).
    */
  def stageSales(raw: DataFrame, payloadCol: Column, mallSeq: Int,
                 paymentDate: LocalDate): DataFrame =
    items(raw, payloadCol, mallSeq, paymentDate)
      .distinct()
      .groupBy(col("product_id"), col("payment_date"))
      .agg(
        max(col("mall_seq")).as("mall_seq"),
        max(col("category_id3")).as("category_id3"),
        sum(col("click_count")).as("click_count"),
        sum(col("payment_count")).as("payment_count"),
        sum(col("payment_amount")).as("payment_amount"))
      .select("product_id", "mall_seq", "category_id3", "click_count",
        "payment_count", "payment_amount", "payment_date")

  /** Product-dim upsert (models.sql:129-147): one row per product from the
    * batch (the reference's unordered `QUALIFY rn=1` is made deterministic
    * by ordering on the value columns — ties then mean identical rows),
    * then the coalescing MERGE.
    */
  def upsertProduct(target: DataFrame, raw: DataFrame, payloadCol: Column,
                    mallSeq: Int, startDate: LocalDate,
                    endDate: LocalDate): DataFrame = {
    val src = raw.withColumn("__p", from_json(payloadCol, payloadSchema))
      .select(
        expr("try_cast(__p.product.identifier AS BIGINT)").as("product_id"),
        lit(mallSeq).as("mall_seq"),
        lit(null).cast("int").as("category_id"),
        expr("try_cast(__p.product.category.identifier AS INT)").as("category_id3"),
        col("__p.product.identifier").as("product_name"),
        lit(null).cast("long").as("sales_price"),
        lit(java.sql.Date.valueOf(startDate)).as("first_payment_date"),
        lit(java.sql.Date.valueOf(endDate)).as("last_payment_date"))
    MergeOps.upsert(target, src, Seq("product_id"),
      Map("first_payment_date" -> MergeOps.Least,
          "last_payment_date" -> MergeOps.Greatest),
      default = MergeOps.SourceFirst,
      dedupOrder = Seq(col("category_id3").desc_nulls_last, col("product_name")))
  }
}
