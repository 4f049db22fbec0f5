package graft.staging

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.F

/** L2 staging — product-option spreadsheet download (reference:
  * core/sabangnet/admin/product/models.sql:110-140 `OptionDownload`):
  *
  * - the raw rows come from an operator-downloaded spreadsheet (feed
  *   [[graft.sources.Readers.excel]] output straight in, via a
  *   header→field `mapping` since vendor headers are localized);
  * - the primary key is gated by a REGEXP pattern (`^\d{6}-\d{4}$`) — rows
  *   with malformed option ids never enter the table;
  * - numeric/timestamp detail fields TRY_CAST from strings;
  * - `option_status` / `option_type` enum dims are inline literal tables
  *   (models.sql:127-140), broadcast-joinable for label resolution.
  */
object SabangnetProduct {

  val OptionIdPattern = "^[0-9]{6}-[0-9]{4}$"

  /** Stage raw all-string rows; `mapping` renames source headers to the
    * canonical field names (option_id, barcode, option_group, option_name,
    * bundle_option_ids, option_status, option_type, option_quantity,
    * option_price, register_dt).
    */
  def stage(raw: DataFrame, mapping: Map[String, String]): DataFrame = {
    val renamed = mapping.foldLeft(raw) { case (df, (src, dst)) =>
      df.withColumnRenamed(src, dst)
    }
    renamed
      .filter(col("option_id").rlike(OptionIdPattern))
      .select(
        col("option_id"),
        expr("try_cast(barcode AS BIGINT)").as("barcode"),
        col("option_group"), col("option_name"), col("bundle_option_ids"),
        expr("try_cast(option_status AS INT)").as("option_status"),
        expr("try_cast(option_type AS INT)").as("option_type"),
        expr("try_cast(option_quantity AS INT)").as("option_quantity"),
        expr("try_cast(option_price AS INT)").as("option_price"),
        expr("try_cast(register_dt AS TIMESTAMP_NTZ)").as("register_dt"))
  }

  /** Enum dim for option_status (models.sql:127-132). */
  def optionStatusDim(spark: SparkSession): DataFrame =
    F.inlineDim(spark, Seq("code", "name"),
      Seq(Seq(1, "on_sale"), Seq(2, "sold_out"), Seq(3, "unused")))

  /** Enum dim for option_type (models.sql:134-140). */
  def optionTypeDim(spark: SparkSession): DataFrame =
    F.inlineDim(spark, Seq("code", "name"),
      Seq(Seq(1, "set"), Seq(2, "collection"), Seq(3, "standard")))

  /** Staged options with status/type labels resolved via broadcast dims. */
  def withLabels(spark: SparkSession, staged: DataFrame): DataFrame =
    staged
      .join(broadcast(optionStatusDim(spark)
        .withColumnRenamed("code", "option_status")
        .withColumnRenamed("name", "status_label")), Seq("option_status"), "left")
      .join(broadcast(optionTypeDim(spark)
        .withColumnRenamed("code", "option_type")
        .withColumnRenamed("name", "type_label")), Seq("option_type"), "left")
}
