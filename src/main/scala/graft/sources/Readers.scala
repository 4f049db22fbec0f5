package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source layer (SURVEY §2.1 S1-S6): the scan primitives the reference
  * feeds its transformers from. Everything returns a DataFrame with either
  * a declared schema (staging contract) or inference (exploration).
  */
object Readers {

  /** S1 — inline row batch: the `UNNEST($rows)` primitive. Rows arrive as
    * JSON strings (the shape HTTP responses land in) and are parsed with a
    * declared schema — bad branches go null, never throw.
    */
  def rowBatch(spark: SparkSession, rows: Dataset[String],
               schema: StructType): DataFrame =
    spark.read.schema(schema).json(rows)

  /** S2 — CSV scan with declared schema (header row expected). Explicit
    * schema keeps the scan single-pass — `inferSchema` reads the file
    * twice, which at 100 TB is not a default anyone wants.
    */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S2b — exploratory CSV scan (schema inference, test scale only). */
  def csvInfer(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S3 — JSON lines scan with declared schema. */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S4 — Parquet scan. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S5/S6 (Excel / HTML scans) are driver-side concerns in this engine:
    * the reference parses xlsx/HTML bytes in Python (utils/excel.py,
    * transform.py:245-311) before they ever reach SQL. The Spark-side
    * contract is identical to S1 — parse driver-side to JSON/rows, then
    * `rowBatch` with the staging schema. No POI/jsoup is bundled here.
    */
}
