package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable

import org.w3c.dom.{Document, Element}

/** S5 — xlsx scan without external dependencies (reference:
  * utils/excel.py:146-161 `excel2json`): an xlsx file is a zip of XML parts,
  * so the JDK's ZipInputStream + DOM parser cover the read path —
  * sharedStrings, sheet resolution by name, sparse cells placed by their
  * `r="C3"` reference, and rich-text runs concatenated.
  *
  * This is a DRIVER-side parse by design, like the reference's: spreadsheets
  * are operator-supplied inputs (vendor report downloads), bounded in size;
  * the distributed path starts at `Readers.rowBatch` / the DataFrame this
  * feeds. Values are returned as raw strings — staging projections TRY_CAST
  * them (the engine-wide P1 rule).
  */
object Xlsx {

  /** Parse one sheet (first sheet when `sheetName` is None) into a raw
    * string grid, rows padded to uniform width.
    */
  def grid(bytes: Array[Byte], sheetName: Option[String] = None): Seq[Seq[String]] = {
    val parts = readZip(bytes)
    val shared = parts.get("xl/sharedStrings.xml").map(sharedStrings).getOrElse(Vector.empty)
    val sheetPath = resolveSheet(parts, sheetName)
    val ws = parse(parts.getOrElse(sheetPath,
      throw new IllegalArgumentException(s"no worksheet part $sheetPath")))
    val rows = elems(ws.getDocumentElement, "row").map { r =>
      // `r="C3"` refs are optional per OOXML — refless cells take the next
      // sequential position after the previous cell
      var nextIdx = 0
      elems(r, "c").map { c =>
        val ref = c.getAttribute("r")
        val letters = ref.takeWhile(_.isLetter)
        val colIdx =
          if (letters.isEmpty) nextIdx
          else letters.foldLeft(0)((a, ch) => a * 26 + (ch.toUpper - 'A' + 1)) - 1
        nextIdx = colIdx + 1
        val t = c.getAttribute("t")
        val v =
          if (t == "inlineStr") elems(c, "is").flatMap(texts).mkString
          else elems(c, "v").map(_.getTextContent).mkString
        val value = if (t == "s") shared(v.trim.toInt) else v
        (colIdx max 0, value)
      }
    }
    val width = (rows.flatMap(_.map(_._1 + 1)) :+ 0).max
    rows.map { cells =>
      val arr = Array.fill(width)("")
      cells.foreach { case (i, v) => if (i < width) arr(i) = v }
      arr.toSeq
    }
  }

  /** Header-keyed rows (reference excel2json: row `header` is the header,
    * deduplicated; subsequent rows zip against it).
    */
  def toRows(bytes: Array[Byte], sheetName: Option[String] = None,
             header: Int = 1): (Seq[String], Seq[Seq[String]]) = {
    val g = grid(bytes, sheetName)
    require(g.size >= header, s"sheet has ${g.size} rows, header row $header requested")
    (uniqueHeaders(g(header - 1)), g.drop(header))
  }

  /** Reference `to_unique_headers`: blank headers become positional names,
    * duplicates get a numeric suffix.
    */
  def uniqueHeaders(raw: Seq[String]): Seq[String] = {
    // track every EMITTED name, not just base counts — headers like
    // [a, a, a_1] must yield [a, a_1, a_1_1], never a duplicate (the
    // suffix candidate itself can collide with a later raw header)
    val emitted = mutable.Set.empty[String]
    raw.zipWithIndex.map { case (h0, i) =>
      val base = if (h0.trim.isEmpty) s"col$i" else h0.trim
      var cand = base
      var n = 0
      while (emitted(cand)) { n += 1; cand = s"${base}_$n" }
      emitted += cand
      cand
    }
  }

  // ---- zip / xml plumbing -------------------------------------------------

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  private def parse(bytes: Array[Byte]): Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  private def elems(parent: Element, tag: String): Seq[Element] = {
    val nl = parent.getElementsByTagName(tag)
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
  }

  /** All `<t>` runs under an element, concatenated (rich-text cells split
    * one logical string across runs).
    */
  private def texts(e: Element): Seq[String] =
    elems(e, "t").map(_.getTextContent)

  private def sharedStrings(bytes: Array[Byte]): Vector[String] =
    elems(parse(bytes).getDocumentElement, "si").map(texts(_).mkString).toVector

  /** Map a sheet name to its worksheet zip path via workbook.xml +
    * workbook.xml.rels; default to the workbook's first sheet.
    */
  private def resolveSheet(parts: Map[String, Array[Byte]],
                           sheetName: Option[String]): String = {
    val fallback = "xl/worksheets/sheet1.xml"
    val wb = parts.get("xl/workbook.xml").map(parse).getOrElse(return fallback)
    val sheets = elems(wb.getDocumentElement, "sheet")
    if (sheets.isEmpty) return fallback
    val chosen = sheetName match {
      case Some(n) => sheets.find(_.getAttribute("name") == n)
        .getOrElse(throw new IllegalArgumentException(s"no sheet named $n"))
      case None => sheets.head
    }
    val rid = Option(chosen.getAttribute("r:id")).filter(_.nonEmpty)
      .getOrElse(chosen.getAttribute("id"))
    val rels = parts.get("xl/_rels/workbook.xml.rels").map(parse)
    rels.flatMap { d =>
      elems(d.getDocumentElement, "Relationship")
        .find(_.getAttribute("Id") == rid)
        .map(r => "xl/" + r.getAttribute("Target").stripPrefix("/xl/").stripPrefix("xl/"))
    }.getOrElse(fallback)
  }
}
