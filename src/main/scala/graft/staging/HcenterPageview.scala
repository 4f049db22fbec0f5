package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L2 staging — seller-center pageview (reference:
  * core/smartstore/hcenter/pageview/models.sql).
  *
  * - `stageByDevice` (models.sql:12-27): device recode with an IN-list
  *   guard (unknown devices are FILTERED, not recoded to -1 — the CASE's
  *   -1 arm is unreachable under the WHERE; kept faithful).
  * - `stageByProduct` (models.sql:66-86): the URL-shape classifier —
  *   `/<shop>/products/<id>` extracts the trailing id, a bare `/<shop>`
  *   main page becomes the sentinel product 10, anything else drops
  *   (two REGEXP arms + an outer product_id IS NOT NULL filter).
  */
object HcenterPageview {

  val payloadSchema: StructType = StructType(Seq(
    StructField("measuredThrough", StructType(Seq(
      StructField("device", StringType),
      StructField("url", StringType)))),
    StructField("visit", StructType(Seq(
      StructField("pageClick", LongType),
      StructField("userClick", LongType),
      StructField("timeOnSite", LongType)))),
    StructField("ymd", StringType)))

  /** models.sql:16-20. */
  val deviceType: Seq[(String, Int)] = Seq("Pc" -> 0, "Mobile" -> 1, "All" -> 2)

  def stageByDevice(raw: DataFrame, payloadCol: Column,
                    mallSeq: Long): DataFrame = {
    // single parse into a struct attribute — see HcenterCatalog (r15)
    val parsed = raw.select(from_json(payloadCol, payloadSchema).as("__p"))
    val p = col("__p")
    parsed.select(
        lit(mallSeq).as("mall_seq"),
        p.getField("measuredThrough").getField("device").as("__device"),
        p.getField("visit").getField("pageClick").cast("int").as("page_click"),
        p.getField("visit").getField("userClick").cast("int").as("user_click"),
        p.getField("visit").getField("timeOnSite").as("time_on_site"),
        p.getField("ymd").cast("date").as("ymd"))
      .filter(col("__device").isin(deviceType.map(_._1): _*))
      .select(col("mall_seq"),
        graft.functions.F.recode(col("__device"), deviceType).cast("int")
          .as("device_type"),
        col("page_click"), col("user_click"), col("time_on_site"), col("ymd"))
  }

  def stageByProduct(raw: DataFrame, payloadCol: Column,
                     mallSeq: Long): DataFrame = {
    // single parse into a struct attribute — see HcenterCatalog (r15)
    val parsed = raw.select(from_json(payloadCol, payloadSchema).as("__p"))
    val p = col("__p")
    val url = p.getField("measuredThrough").getField("url")
    parsed.select(
        lit(mallSeq).as("mall_seq"),
        when(url.rlike("^/[^/]+/products/\\d+$"),
            regexp_extract(url, "(\\d+)$", 1).cast("bigint"))
          .when(url.rlike("^/[^/]+$"), lit(10L))
          .otherwise(lit(null).cast("bigint")).as("product_id"),
        p.getField("visit").getField("pageClick").as("page_click"),
        p.getField("visit").getField("userClick").as("user_click"),
        p.getField("visit").getField("timeOnSite").as("time_on_site"),
        p.getField("ymd").cast("date").as("ymd"))
      .filter(col("product_id").isNotNull)
  }
}
