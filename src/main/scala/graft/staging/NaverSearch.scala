package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L2 staging — search-page section summary (reference:
  * core/naver/main/search/models.sql:1-27): the raw payload is an opaque
  * `sections JSON -- list[list[dict]]` column; the reference counts items
  * per (section position, subject) Python-side into the `summary` table.
  * Here the parse is engine-side: `from_json` with a declared
  * array-of-array-of-struct schema, `posexplode` for the section sequence,
  * inner `explode` for items, then a grouped count — one shuffle, all
  * codegen, no driver-side JSON handling.
  */
object NaverSearch {

  val sectionsSchema: ArrayType = ArrayType(ArrayType(StructType(Seq(
    StructField("section", StringType),
    StructField("subject", StringType)))))

  /** (query, seq, section, subject, item_count) summary rows.
    *
    * Malformed payloads FAIL by default (`from_json` returns null, and
    * exploding null would otherwise silently drop the whole page from the
    * counts — the reference's Python parse raises); pass
    * `onMalformed = "ignore"` to skip bad pages instead.
    */
  def stageSummary(raw: DataFrame, queryCol: Column, payloadCol: Column,
                   onMalformed: String = "fail"): DataFrame = {
    // FAILFAST makes the parser itself raise on malformed input — one
    // parse per row (a when/otherwise guard would evaluate from_json
    // twice); "ignore" parses PERMISSIVE, null parses explode to nothing
    val mode = onMalformed match {
      case "fail" => "FAILFAST"
      case "ignore" => "PERMISSIVE"
      case other => throw new IllegalArgumentException(s"onMalformed: $other")
    }
    val parsed = from_json(payloadCol, sectionsSchema, Map("mode" -> mode))
    raw
      .select(queryCol.as("query"),
        posexplode(parsed).as(Seq("seq", "items")))
      .select(col("query"), col("seq").cast("long").as("seq"),
        explode(col("items")).as("item"))
      .groupBy(col("query"), col("seq"),
        col("item.section").as("section"),
        col("item.subject").as("subject"))
      .agg(count(lit(1)).as("item_count"))
  }
}
