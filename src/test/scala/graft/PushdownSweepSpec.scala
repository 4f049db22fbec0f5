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

  /** Expression fragments that make a predicate legitimately unpushable.
    * Matched PER PREDICATE (not against the whole scan line), so one
    * derived predicate can no longer vouch for a plain one sharing its
    * scan — the broad fragments (CASE WHEN, coalesce, length, size) only
    * excuse the predicate they actually appear in.
    */
  private val derived = Seq(
    "cast(", "pmod(", "concat(", "regexp_", "split(", "md5(", "size(",
    "FLOOR(", "floor(", "from_json(", "unix_date(", "date_trunc(",
    "RLIKE", "try_cast(", "exists(", "CASE WHEN", "coalesce(",
    "substring(", "length(", "lower(", "trim(", "lpad(", "conv(",
    "date_add(",
    // arithmetic-derived ids (q193/q194's `doc_id * 4` surrogate keys):
    // a predicate over a computed product can never push, and a plain
    // single-column predicate never renders with an infix `*`
    " * ")

  /** Split a rendered DataFilters list on TOP-LEVEL commas (depth-aware —
    * commas inside function calls stay put). The plan renderer truncates
    * the field at ~100 chars with a `...` marker; everything from the
    * marker on (and the predicate the cut landed in) is unjudgeable —
    * dropped and counted as inconclusive rather than matched against.
    */
  private def splitPredicates(s: String): (Seq[String], Int) = {
    val truncIdx = s.indexOf("...")
    val body = if (truncIdx >= 0) s.substring(0, truncIdx) else s
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += body.substring(start, i).trim; start = i + 1
        case _ =>
      }
      i += 1
    }
    val segs = (out.result() :+ body.substring(start).trim)
      .filter(_.nonEmpty)
    if (truncIdx >= 0 || depth != 0) (segs.dropRight(1), 1)
    else (segs, 0)
  }

  test("every unpushed data filter is a derived expression, never a plain column") {
    var inconclusive = 0
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
            if (data.nonEmpty && pushed.isEmpty) {
              val (preds, truncated) = splitPredicates(data)
              inconclusive += truncated
              preds.map(name -> _)
            } else Nil
        }.toSeq.distinct
    }
    info(s"${offenders.size} unpushed predicates " +
      s"($inconclusive truncated tails skipped)")
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
