package graft.sources

/** S6 — HTML table scan (reference: common/transform.py:245-311
  * `HtmlTransformer` — scope selection + per-row field extraction). The
  * engine's contract is the tabular core of that pipeline: locate `<table>`
  * scopes, split rows/cells, strip markup, unescape entities. Like the
  * reference (and Xlsx), this parse is driver-side over operator-supplied
  * pages; the distributed path starts at the DataFrame it feeds.
  */
object Htmls {

  private val OpenRe = "(?i)<table[^>]*>".r
  private val CloseRe = "(?i)</table\\s*>".r
  private val RowRe = "(?is)<tr[^>]*>(.*?)</tr>".r
  private val CellRe = "(?is)<t[dh][^>]*>(.*?)</t[dh]>".r
  private val TagRe = "(?s)<[^>]+>".r

  def unescape(s: String): String = s
    .replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  private def cellText(html: String): String =
    unescape(TagRe.replaceAllIn(html, "")).trim

  /** All tables on the page as raw string grids, in document order of their
    * opening tags — including tables NESTED inside another table's cell
    * (vendor pages routinely wrap the data table in a layout table). Open/
    * close tags are paired with a stack, so an outer table's rows after a
    * nested table are kept; a nested table's markup is blanked out of its
    * parent's body before row-splitting, so its rows appear only in its own
    * grid.
    */
  def tables(html: String): Seq[Seq[Seq[String]]] = {
    // (openEnd, closeStart) span of every table body, document order
    val events =
      (OpenRe.findAllMatchIn(html).map(m => (m.start, m.end, true)) ++
       CloseRe.findAllMatchIn(html).map(m => (m.start, m.end, false)))
        .toSeq.sortBy(_._1)
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val stack = scala.collection.mutable.Stack.empty[Int]
    events.foreach {
      case (_, end, true) => stack.push(end)
      case (start, _, false) => if (stack.nonEmpty) spans += ((stack.pop(), start))
    }
    val ordered = spans.sortBy(_._1).toSeq
    ordered.map { case (s, e) =>
      // blank nested table spans so their rows stay out of this grid
      val nested = ordered.filter(n => n._1 > s && n._2 < e)
      val body = nested.foldLeft(html.substring(s, e)) { case (b, (ns, ne)) =>
        val rs = ns - s; val re = ne - s
        b.substring(0, rs) + (" " * (re - rs)) + b.substring(re)
      }
      RowRe.findAllMatchIn(body).map { r =>
        CellRe.findAllMatchIn(r.group(1)).map(c => cellText(c.group(1))).toSeq
      }.toSeq.filter(_.nonEmpty)
    }
  }

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
