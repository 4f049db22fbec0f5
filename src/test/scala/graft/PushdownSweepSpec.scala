package graft

/** Pushdown audit — the q47 bug class, pinned corpus-wide: a parquet scan
  * whose DataFilters stay OUT of PushedFilters evaluates its predicate
  * AFTER reading every row group. That is legitimate only when the
  * predicate is inherently derived (a cast, hash, regexp, or string
  * surgery over the stored column — row-group statistics cannot serve
  * those). A PLAIN-column comparison left unpushed is a scan bug: at
  * 100 TB it is the difference between skipping row groups and reading
  * the table.
  *
  * Triage note (round 5): the fixture's staging queries synthesize
  * domain columns from TPC-H keys (pmod/concat/regexp), so their filter
  * expressions are derived BY CONSTRUCTION — in production those are
  * stored columns and the plain predicates push. The audit therefore
  * allows unpushed filters that visibly contain a deriving expression
  * and fails on anything else. q47 keeps its derived-column date filter
  * deliberately (the contrast case); q177 is the pushdown-safe spelling.
  */
class PushdownSweepSpec extends SparkSpec {

  /** Expression fragments that make a predicate legitimately unpushable. */
  private val derived = Seq(
    "cast(", "pmod(", "concat(", "regexp_", "split(", "md5(", "size(",
    "FLOOR(", "floor(", "from_json(", "unix_date(", "date_trunc(",
    "RLIKE", "try_cast(", "exists(", "CASE WHEN", "coalesce(",
    "substring(", "length(", "lower(", "trim(", "lpad(", "conv(",
    "date_add(")

  test("every unpushed data filter is a derived expression, never a plain column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try fn(spark, sf001).queryExecution.executedPlan.toString
          catch { case _: Exception => "" }
        plan.linesIterator.filter(_.contains("FileScan parquet")).flatMap {
          line =>
            val data = line.split("DataFilters: ").last.takeWhile(_ != ']')
              .stripPrefix("[").trim
            val pushed = line.split("PushedFilters: ").last
              .takeWhile(_ != ']').stripPrefix("[").trim
            if (data.nonEmpty && pushed.isEmpty) Some(name -> data)
            else None
        }.toSeq.distinct
    }
    info(s"${offenders.size} unpushed-filter scans (all must be derived)")
    // q47 is the documented contrast case: its to_date()-derived filter
    // deliberately does NOT push (the cast arm hides past the plan
    // renderer's 100-char truncation); q177 is the pushdown-safe form
    val allowed = Set("q47_date_predicate")
    val plain = offenders.filterNot { case (n, f) =>
      allowed(n) || derived.exists(f.contains)
    }
    assert(plain.isEmpty,
      "plain-column predicates failed to push to parquet:\n" +
        plain.map { case (n, f) => s"  $n: $f" }.mkString("\n"))
  }
}
