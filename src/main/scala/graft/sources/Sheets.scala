package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S16 write side — DataFrame → Google-Sheets `values: [[...]]` payload
  * (reference extensions/gsheets.py:79-103 `py2worksheet`, :286-300
  * `_match_table_header`). The gspread HTTP call itself is L1/out of
  * engine scope (same boundary as the read side, [[Readers.sheetValues]]);
  * THIS is the in-engine transform: type coercion to sheet-compatible
  * cells, header-order column selection, and sheet-header matching.
  *
  * Coercion contract (py2worksheet:87-97): DATE → the Sheets serial-day
  * number (days since 1899-12-30, the `toordinal() - 693594` form);
  * TIMESTAMP → serial days + seconds-of-day/86400 as a DOUBLE; numbers,
  * booleans and strings pass through; NULL stays null (gspread renders it
  * as an empty cell). The coercion runs DISTRIBUTED as a projection — only
  * the final payload assembly collects, because a Sheets API body is a
  * driver-side JSON document by contract (and bounded: the Sheets grid
  * caps at 10M cells, far below driver memory).
  */
object Sheets {

  /** Sheets epoch: serial day 0 is 1899-12-30 (gsheets.py:90 offset
    * 693594 = toordinal("1899-12-30")). */
  private val Epoch = "1899-12-30"

  /** Distributed coercion: every column projected to a sheet-compatible
    * type, in `expectedHeaders` order when given (columns absent from the
    * DataFrame are skipped, matching py2worksheet:101's `if column in
    * row`). Runs as a plain select — codegen, no UDFs, no collect.
    */
  def sheetCompatible(df: DataFrame,
                      expectedHeaders: Seq[String] = Nil): DataFrame = {
    val headers =
      if (expectedHeaders.nonEmpty) expectedHeaders.filter(df.columns.contains)
      else df.columns.toSeq
    val cols = headers.map { name =>
      val c = col(name)
      df.schema(name).dataType match {
        case DateType =>
          datediff(c, lit(Epoch)).cast("long").as(name)
        case TimestampType | TimestampNTZType =>
          (datediff(c.cast("date"), lit(Epoch)).cast("double") +
            (hour(c) * 3600 + minute(c) * 60 + second(c)).cast("double")
              / lit(86400.0)).as(name)
        case _: NumericType | BooleanType | StringType => c.as(name)
        case _ => c.cast("string").as(name)
      }
    }
    df.select(cols: _*)
  }

  /** DataFrame → rows-of-cells payload values (py2worksheet:99-103):
    * coerce, collect, optionally prepend the header row. Cell values are
    * the JSON-compatible primitives gspread serializes: Long/Double/
    * Boolean/String/null.
    */
  def toWorksheetValues(df: DataFrame, expectedHeaders: Seq[String] = Nil,
                        includeHeader: Boolean = false): Seq[Seq[Any]] = {
    val coerced = sheetCompatible(df, expectedHeaders)
    val headers: Seq[Any] = coerced.columns.toSeq
    // collect-bound: a worksheet payload is driver-sized by the Sheets API contract (cell-count cap upstream)
    val rows = coerced.collect().toSeq
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) null else r.get(i)))
    if (includeHeader) headers +: rows else rows
  }

  /** Reorder a header-first table to the worksheet's own header order
    * (gsheets.py:286-300 `_match_table_header`): every table column must
    * exist in the sheet header (ValueError contract), then each output row
    * is re-indexed through the sheet header's positions. Identity when the
    * orders already agree.
    */
  def matchTableHeader(table: Seq[Seq[Any]],
                       sheetHeader: Seq[String]): Seq[Seq[Any]] = {
    require(table.nonEmpty, "table must carry its header row")
    val tableHeader = table.head.map(_.toString)
    val missing = tableHeader.toSet -- sheetHeader.toSet
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Worksheet header mismatch: ${missing.toSeq.sorted.mkString(", ")}.")
    if (sheetHeader == tableHeader) table
    else {
      val reorder = tableHeader.map(sheetHeader.indexOf)
      table.map(row => reorder.map(i =>
        if (i >= 0 && i < row.size) row(i) else null))
    }
  }

  /** Assemble the `{"values": [[...]]}` JSON document — the exact payload
    * shape [[Readers.sheetValues]] parses, closing the round trip. Strings
    * are JSON-escaped; numbers/booleans/null render natively.
    */
  def valuesPayload(values: Seq[Seq[Any]]): String = {
    def cell(v: Any): String = v match {
      case null => "null"
      case b: Boolean => b.toString
      case n: Byte => n.toString
      case n: Short => n.toString
      case n: Int => n.toString
      case n: Long => n.toString
      case n: Float => n.toString
      case n: Double => n.toString
      case d: java.math.BigDecimal => d.toPlainString
      case s => "\"" + s.toString.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    }
    values.map(_.map(cell).mkString("[", ",", "]"))
      .mkString("{\"values\": [", ",", "]}")
  }
}
