package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Readers, Sinks}

class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("csv reads with declared schema, header, and null handling") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,name,amount\n1,alpha,10.5\n2,,20.0\n3,gamma,\n")
    val out = Readers.csv(spark, s"$dir/data.csv", schema).orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1L && out(0).getDouble(2) == 10.5)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(2))
  }

  test("json reads with declared schema; bad branches go null not fail") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.jsonl"),
      """{"id": 1, "name": "a", "amount": 5.0}
        |{"id": 2, "name": "b", "amount": "not-a-number"}
        |""".stripMargin)
    val out = Readers.json(spark, s"$dir/data.jsonl", schema).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(2) == 5.0)
  }

  test("rowBatch parses inline JSON rows (UNNEST($rows) primitive)") {
    val rows = Seq("""{"id": 7, "name": "x", "amount": 1.0}""").toDS()
    val out = Readers.rowBatch(spark, rows, schema).head()
    assert(out.getLong(0) == 7L)
  }

  /** Minimal but structurally-faithful xlsx: zip with workbook + rels +
    * sharedStrings (incl. a rich-text run) + two sheets, sparse cells,
    * inline strings, and numeric cells.
    */
  private def fixtureXlsx: Array[Byte] = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook><sheets>
        |<sheet name="Data" sheetId="1" r:id="rId1"/>
        |<sheet name="Other" sheetId="2" r:id="rId2"/>
        |</sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<Relationships>
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      "<sst><si><t>name</t></si><si><r><t>wid</t></r><r><t>get</t></r></si></sst>")
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>qty</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>42</v></c></row>
        |<row r="3"><c r="B3"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/sheet2.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
        |<row r="2"><c r="A2"><v>99</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    bos.toByteArray
  }

  test("excel: shared/rich/inline strings, sparse cells, sheet by name") {
    val out = Readers.excel(spark, fixtureXlsx).collect()
    assert(Readers.excel(spark, fixtureXlsx).columns.toSeq == Seq("name", "qty"))
    assert(out.length == 2)
    assert(out(0).getString(0) == "widget") // rich-text runs concatenated
    assert(out(0).getString(1) == "42")
    assert(out(1).getString(0) == "")       // sparse A3 -> empty
    assert(out(1).getString(1) == "7")
    val other = Readers.excel(spark, fixtureXlsx, Some("Other")).collect()
    assert(other.head.getString(0) == "99")
    intercept[IllegalArgumentException] {
      Readers.excel(spark, fixtureXlsx, Some("Nope"))
    }
  }

  test("htmlTable: markup stripped, entities unescaped, headers deduped") {
    val html =
      """<html><body><p>noise</p>
        |<table class="x">
        |  <tr><th>name</th><th> name </th><th></th></tr>
        |  <tr><td><b>Tom &amp; Co</b></td><td>1&nbsp;000</td><td>x</td></tr>
        |  <tr><td>B</td><td>2</td></tr>
        |</table></body></html>""".stripMargin
    val df = Readers.htmlTable(spark, html)
    assert(df.columns.toSeq == Seq("name", "name_1", "col2"))
    val out = df.collect()
    assert(out(0).getString(0) == "Tom & Co")
    assert(out(0).getString(1) == "1 000")
    assert(out(1).getString(2) == "")      // short row padded
  }

  test("htmlTable: nested table split out, outer rows after it kept") {
    val html =
      """<table>
        |  <tr><th>a</th><th>b</th></tr>
        |  <tr><td>1</td><td><table><tr><th>x</th></tr><tr><td>9</td></tr></table></td></tr>
        |  <tr><td>2</td><td>after-nested</td></tr>
        |</table>""".stripMargin
    val outer = Readers.htmlTable(spark, html, 0).collect()
    assert(outer.length == 2)
    assert(outer(1).getString(0) == "2" && outer(1).getString(1) == "after-nested")
    assert(!outer.exists(_.getString(0) == "9"), "nested rows stay out of outer grid")
    val inner = Readers.htmlTable(spark, html, 1).collect()
    assert(inner.head.getString(0) == "9")
  }

  test("excel: cells without r= refs take sequential positions") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    z.write(
      """<worksheet><sheetData>
        |<row><c t="inlineStr"><is><t>h1</t></is></c><c t="inlineStr"><is><t>h2</t></is></c></row>
        |<row><c><v>1</v></c><c><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin.getBytes("UTF-8"))
    z.closeEntry(); z.close()
    val out = Readers.excel(spark, bos.toByteArray).collect()
    assert(Readers.excel(spark, bos.toByteArray).columns.toSeq == Seq("h1", "h2"))
    assert(out.head.getString(0) == "1" && out.head.getString(1) == "2")
  }

  test("sheetValues: header keying, dup-header dedup, ragged-row padding") {
    val payload =
      """{"values": [["name", "amt", "name"],
        |            ["a", "10", "x"],
        |            ["b", "20"]]}""".stripMargin
    val df = Readers.sheetValues(spark, payload)
    assert(df.columns.toSeq == Seq("name", "amt", "name_1"))
    val rows = df.orderBy("name").collect()
    assert(rows(0).getString(0) == "a" && rows(0).getString(2) == "x")
    assert(rows(1).getString(0) == "b" && rows(1).getString(2) == "",
      "ragged row padded like the excel reader")
    intercept[IllegalArgumentException] {
      Readers.sheetValues(spark, """{"other": 1}""")
    }
  }

  test("sheets writer: py2worksheet coercion — date/timestamp serials, " +
      "header order, includeHeader") {
    val df = Seq(
      (1L, "a", java.sql.Date.valueOf("1899-12-31"),
        java.sql.Timestamp.valueOf("2020-01-02 06:00:00"), true),
      (2L, "b", java.sql.Date.valueOf("2020-01-01"),
        null.asInstanceOf[java.sql.Timestamp], false))
      .toDF("id", "name", "d", "ts", "flag")
    val values = graft.sources.Sheets.toWorksheetValues(df,
      expectedHeaders = Seq("d", "ts", "id", "flag", "ghost"),
      includeHeader = true)
    // absent "ghost" skipped (py2worksheet's `if column in row`)
    assert(values.head == Seq("d", "ts", "id", "flag"))
    val byId = values.tail.sortBy(_(2).asInstanceOf[Long])
    assert(byId(0)(0) == 1L, "1899-12-31 is serial day 1")
    // 2020-01-02 = serial 43832; 06:00 = +0.25
    assert(byId(0)(1) == 43832.25)
    assert(byId(0)(3) == true)
    assert(byId(1)(0) == 43831L && byId(1)(1) == null)
  }

  test("sheets writer: matchTableHeader reorders and rejects extras") {
    val table = Seq(Seq[Any]("b", "a"), Seq[Any](2L, 1L))
    val matched = graft.sources.Sheets.matchTableHeader(table, Seq("a", "b"))
    // faithful _match_table_header: each table column re-indexed through
    // the sheet header's position for that column name
    assert(matched == Seq(Seq("a", "b"), Seq(1L, 2L)))
    assert(graft.sources.Sheets.matchTableHeader(table, Seq("b", "a"))
      == table, "identity when orders agree")
    intercept[IllegalArgumentException] {
      graft.sources.Sheets.matchTableHeader(table, Seq("a"))
    }
  }

  test("sheets writer round-trips through the sheetValues reader") {
    val df = Seq((1L, "al\"pha", 10.5), (2L, "beta\nline", 20.0))
      .toDF("id", "name", "amount")
    val payload = graft.sources.Sheets.valuesPayload(
      graft.sources.Sheets.toWorksheetValues(df, includeHeader = true))
    val back = Readers.sheetValues(spark, payload)
    assert(back.columns.toSeq == Seq("id", "name", "amount"))
    val rows = back.orderBy("id").collect()
    assert(rows(0).getString(0) == "1" && rows(0).getString(1) == "al\"pha")
    assert(rows(1).getString(1) == "beta\nline" &&
      rows(1).getString(2) == "20.0")
  }

  test("ctas registers catalog table and temp view") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.ctas(df, "graft_ctas_tbl")
    assert(spark.table("graft_ctas_tbl").count() == 2)
    Sinks.ctas(df.filter(col("k") === 1), "graft_ctas_view", temp = true)
    assert(spark.table("graft_ctas_view").count() == 1)
    spark.sql("DROP TABLE graft_ctas_tbl")
  }

  test("copyTable projects, limits, and LIMIT 0 clones schema only") {
    val dir1 = Files.createTempDirectory("graft_cp1").toString
    val dir2 = Files.createTempDirectory("graft_cp2").toString
    val df = Tables.orders(spark, sf001)
    Sinks.copyTable(df, dir1, Seq("o_orderkey", "o_totalprice"), Some(10))
    val copied = spark.read.parquet(dir1)
    assert(copied.count() == 10)
    assert(copied.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
    Sinks.copyTable(df, dir2, limit = Some(0))
    val empty = spark.read.parquet(dir2)
    assert(empty.count() == 0)
    assert(empty.schema == df.schema)
  }

  test("parquetAligned tolerates schema drift against a declared contract") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    // producer generation 1: k int, extra column, v written as string
    Seq((1, "1.5", "junk"), (2, "2.5", "junk2")).toDF("k", "v", "extra")
      .write.mode("overwrite").parquet(dir)
    val target = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("added_later", StringType)))
    val out = graft.sources.Readers.parquetAligned(spark, dir, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = out.orderBy("k").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getDouble(1) == 1.5
      && rows(0).isNullAt(2))
  }
}
