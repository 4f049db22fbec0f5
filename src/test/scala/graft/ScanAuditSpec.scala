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

  test("q01: aggregation runs inside whole-stage codegen") {
    // AQE wraps codegen only as stages materialize — execute first, then
    // read the FINAL adaptive plan (the `*(n)` markers)
    val df = SparkEntry.queries("q01_agg_sum")(spark, sf001)
    df.collect()
    // the adaptive plan echoes its pre-codegen "Initial Plan" below the
    // final one — audit only the final section
    val plan = df.queryExecution.executedPlan.toString
      .split("Initial Plan").head
    val aggLines = plan.linesIterator
      .filter(_.contains("HashAggregate")).toSeq
    assert(aggLines.nonEmpty)
    assert(aggLines.forall(_.contains("*(")),
      s"aggregate fell out of whole-stage codegen:\n${aggLines.mkString("\n")}")
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

  // ---- incremental model runs: the ds_start/end_date params must reach
  // the SOURCE scans as pushed range filters. At 100 TB an incremental
  // mart that re-reads the full fact table instead of its date slice is
  // the single most expensive possible regression — these pin the three
  // heaviest incremental models' scan-level pruning the way q177 pins
  // raw scans. (A scan rendered with `...` truncation may cut the upper
  // bound off the string; the lower bound carrying the PARAM date is the
  // load-bearing assertion.)

  private def dateBoundedScans(name: String, table: String,
                               dateCol: String): Seq[String] =
    scanLines(name).filter(s => s.contains(s"$table.parquet") &&
      pushedFilters(s).contains(s"GreaterThanOrEqual($dateCol"))

  test("q125 (incremental): lineitem scans push the ds date range") {
    val bounded = dateBoundedScans("q125_coupang_sales_daily",
      "lineitem", "l_shipdate")
    assert(bounded.nonEmpty, "ds-range predicate must reach the fact scan")
    assert(bounded.exists(_.contains("l_shipdate,1996-01-0")),
      s"pushed lower bound must carry the ds_start_date param:\n$bounded")
  }

  test("q128 (incremental): orders scans push the ds range AND the widened fallback range") {
    val bounded = dateBoundedScans("q128_sabangnet_sales_daily",
      "orders", "o_orderdate")
    assert(bounded.exists(_.contains("o_orderdate,1996-02-01")),
      "the mart's own ds_start_date bound must push")
    // the CJ delivery fallback invokes dep models ±7d widened — that
    // widened slice must ALSO prune at the scan, not read the table
    assert(bounded.exists(_.contains("o_orderdate,1996-01-25")),
      "the ±7d widened dep-model invocation must push its own bounds")
  }

  test("q239 (incremental): orders scans push the ds range AND the widened CJ range") {
    val bounded = dateBoundedScans("q239_smartstore_sales_daily",
      "orders", "o_orderdate")
    assert(bounded.exists(_.contains("o_orderdate,1996-02-01")),
      "the mart's own ds_start_date bound must push")
    assert(bounded.exists(_.contains("o_orderdate,1996-01-25")),
      "the ±7d widened CJ invocation must push its own bounds")
  }

  test("q129 (incremental): insight source scan pushes the ds range") {
    val bounded = dateBoundedScans("q129_gads_insight_daily",
      "lineitem", "l_shipdate")
    assert(bounded.nonEmpty &&
      bounded.exists(_.contains("l_shipdate,1996-01-01")),
      "the insight daily's ds range must prune the source scan")
  }

  // ---- ORC parity (round-9 directive 8): Readers.orc was spec'd for
  // round-trip values only; the scan-level properties — plain predicates
  // reaching PushedFilters, projection reaching ReadSchema — must hold
  // for ORC exactly as the tests above pin them for parquet, or an
  // ORC-backed lake pays full-table reads the parquet path never would.

  private lazy val orcDocsDir: String =
    Fixtures.buildOnce(sf001, "orcaudit", "docs-v1") { root =>
      Tables.documents(spark, sf001)
        .select("doc_id", "source", "n_chars", "lang")
        .write.mode("overwrite").orc(root)
    }

  test("ORC scan: plain predicate reaches PushedFilters") {
    import org.apache.spark.sql.functions.col
    val df = graft.sources.Readers.orc(spark, orcDocsDir)
      .filter(col("doc_id") > 100L)
      .select("doc_id", "source")
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan orc"))
      .getOrElse(fail("no ORC FileScan in the plan"))
    val pushed = pushedFilters(scan)
    assert(pushed.contains("doc_id"),
      s"plain-column predicate must push to the ORC reader: [$pushed]")
    assert(df.count() > 0)
  }

  test("ORC scan: projection prunes ReadSchema to the referenced columns") {
    import org.apache.spark.sql.functions.{col, sum}
    val df = graft.sources.Readers.orc(spark, orcDocsDir)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("chars"))
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan orc"))
      .getOrElse(fail("no ORC FileScan in the plan"))
    val schema = readSchema(scan)
    assert(schema.count(_ == ':') <= 2,
      s"2-column aggregate must not read the 4-column ORC file: $schema")
  }
}
