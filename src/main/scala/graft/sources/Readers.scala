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

  /** S4b — ORC scan (Spark's built-in columnar source: predicate
    * pushdown + column pruning, same as parquet) — the read side of
    * [[Sinks.export]]'s "orc" interchange with Hive/Trino consumers.
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Drift-tolerant parquet scan: read whatever schema the files carry,
    * then align to the DECLARED contract — missing columns become typed
    * nulls, extra columns drop, drifted types cast (Spark casts, so a
    * widened upstream int64→string still lands in a numeric target; an
    * incompatible drift fails at ANALYSIS, loudly, not row-by-row). The
    * generalization of the events reader's nanos/micros branch — the
    * reference is schema-flexible at every ingestion edge by construction
    * (`read_json_auto`, common/load.py:426; 209 TRY_CASTs), and a 100 TB
    * lake WILL contain files written by three generations of producers.
    * Column pruning still reaches the scan: alignSchema is a projection.
    */
  def parquetAligned(spark: SparkSession, path: String,
                     target: org.apache.spark.sql.types.StructType): DataFrame =
    graft.functions.F.alignSchema(spark.read.parquet(path), target)

  /** S5 — Excel scan: xlsx bytes parsed DRIVER-side (zip-of-XML, no POI —
    * see [[Xlsx]]; reference utils/excel.py:146-161) into an all-string
    * DataFrame keyed by the deduplicated header row. Staging projections
    * TRY_CAST the strings (P1 rule), identical to how API payloads flow
    * through `rowBatch`.
    */
  def excel(spark: SparkSession, bytes: Array[Byte],
            sheetName: Option[String] = None, header: Int = 1): DataFrame = {
    val (headers, rows) = Xlsx.toRows(bytes, sheetName, header)
    stringFrame(spark, headers, rows)
  }

  /** S6 — HTML table scan: table `tableIndex` of the page parsed DRIVER-side
    * (see [[Htmls]]; reference common/transform.py:245-311) into an
    * all-string DataFrame keyed by the header row.
    */
  def htmlTable(spark: SparkSession, html: String,
                tableIndex: Int = 0): DataFrame = {
    val (headers, rows) = Htmls.tableRows(html, tableIndex)
    stringFrame(spark, headers, rows)
  }

  /** S16 — Google Sheets value range: the `values: [[...]]` payload the
    * Sheets API returns (reference extensions/gsheets.py:44-394 — its
    * gspread fetch is L1/out of engine scope; THIS is the in-engine
    * transform: header-row keying, duplicate-header dedup, ragged-row
    * padding — the same contract as the Excel reader). The payload is a
    * JSON document: `{"values": [["h1","h2"], ["a","1"], …]}`.
    */
  def sheetValues(spark: SparkSession, payload: String,
                  header: Int = 1): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("values",
      ArrayType(ArrayType(StringType)))))
    import spark.implicits._
    val parsed = spark.read.schema(schema).json(Seq(payload).toDS())
      // collect-bound: single one-document JSON payload row
      .collect().headOption
      .flatMap(r => Option(r.getSeq[scala.collection.Seq[String]](0)))
      .getOrElse(throw new IllegalArgumentException(
        "payload has no 'values' array"))
      .map(_.toSeq)
    require(parsed.size >= header,
      s"sheet has ${parsed.size} rows, header row $header requested")
    stringFrame(spark, Xlsx.uniqueHeaders(parsed(header - 1)),
      parsed.drop(header))
  }

  private def stringFrame(spark: SparkSession, headers: Seq[String],
                          rows: Seq[Seq[String]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StringType, StructField}
    val schema = StructType(headers.map(StructField(_, StringType, nullable = true)))
    val data = rows.map(r => Row(r.padTo(headers.size, "").take(headers.size): _*))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }
}
