package graft.sources

/** S6 — HTML table scan (reference: common/transform.py:245-311
  * `HtmlTransformer` — scope selection + per-row field extraction). The
  * engine's contract is the tabular core of that pipeline: locate `<table>`
  * scopes, split rows/cells, strip markup, unescape entities. Like the
  * reference (and Xlsx), this parse is driver-side over operator-supplied
  * pages; the distributed path starts at the DataFrame it feeds.
  */
object Htmls {

  private val TableRe = "(?is)<table[^>]*>(.*?)</table>".r
  private val RowRe = "(?is)<tr[^>]*>(.*?)</tr>".r
  private val CellRe = "(?is)<t[dh][^>]*>(.*?)</t[dh]>".r
  private val TagRe = "(?s)<[^>]+>".r

  def unescape(s: String): String = s
    .replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  private def cellText(html: String): String =
    unescape(TagRe.replaceAllIn(html, "")).trim

  /** All tables on the page as raw string grids. */
  def tables(html: String): Seq[Seq[Seq[String]]] =
    TableRe.findAllMatchIn(html).map { t =>
      RowRe.findAllMatchIn(t.group(1)).map { r =>
        CellRe.findAllMatchIn(r.group(1)).map(c => cellText(c.group(1))).toSeq
      }.toSeq.filter(_.nonEmpty)
    }.toSeq

  /** Header-keyed rows of table `index` (first row = header, deduplicated
    * with the same rule as Xlsx).
    */
  def tableRows(html: String, index: Int = 0): (Seq[String], Seq[Seq[String]]) = {
    val ts = tables(html)
    require(index < ts.size, s"page has ${ts.size} tables, index $index requested")
    val t = ts(index)
    require(t.nonEmpty, "empty table")
    val headers = Xlsx.uniqueHeaders(t.head)
    val width = headers.size
    (headers, t.tail.map(r => r.padTo(width, "").take(width)))
  }
}
