package graft

/** Scan-level plan audit: column pruning and parquet filter pushdown are
  * the two properties that decide whether a 100 TB scan reads terabytes
  * or gigabytes. PlanAuditSpec guards the exchange topology; this spec
  * guards the leaves — a regression here (a cast wrapping a filter
  * column, a `select(*)` before an aggregate) silently multiplies scan
  * cost without changing any result.
  */
class ScanAuditSpec extends SparkSpec {

  private def scanLines(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf001)
      .queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan parquet")).toSeq

  private def readSchema(scan: String): String =
    scan.split("ReadSchema: ").last.trim

  private def pushedFilters(scan: String): String =
    scan.split("PushedFilters: ").last.takeWhile(_ != ']').stripPrefix("[")

  test("q01: lineitem scan prunes to the 4 referenced columns") {
    val scan = scanLines("q01_agg_sum").find(_.contains("lineitem")).get
    val schema = readSchema(scan)
    assert(schema.count(_ == ':') <= 4,
      s"aggregate over 4 columns must not read more: $schema")
  }

  test("q12: every star-join scan is pruned (no full-width reads)") {
    val scans = scanLines("q12_star_join")
    assert(scans.nonEmpty)
    val wide = scans.filter(s => readSchema(s).count(_ == ':') > 6)
    assert(wide.isEmpty, s"full-width scans in star join:\n${wide.mkString("\n")}")
  }

  test("q177: raw-column datetime ranges reach PushedFilters") {
    val scan = scanLines("q177_datetime_predicate")
      .find(_.contains("orders")).get
    val pushed = pushedFilters(scan)
    assert(pushed.trim.nonEmpty,
      s"half-open ranges on the raw timestamp must push to parquet: $scan")
    assert(pushed.contains("o_orderdate"),
      s"pushed filters must constrain o_orderdate: [$pushed]")
  }
}
