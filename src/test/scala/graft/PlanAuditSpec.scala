package graft

class PlanAuditSpec extends SparkSpec {

  /** Queries whose plans legitimately contain a nested-loop/cartesian over a
    * BOUNDED side — each documented at its definition:
    * - q05: single-row broadcast threshold joined on a range predicate;
    * - q44: triangular self-join over the ≤32-row bucket-count table;
    * - q49: cross join of two single-row aggregates;
    * - q63: IVF assignment = corpus × broadcast(16 centroid rows) — the
    *   algorithm's n·k distance computations, compute not shuffle;
    * - q14: fact streams past broadcast(4 band rows) on a BETWEEN;
    * - q34: corpus streams past broadcast(5 query vectors) — the by-design
    *   exact baseline (the scale paths are q35/q63);
    * - q38: fact streams past the broadcast quarter-validity relation
    *   (tens of rows) on a BETWEEN — `Joins.temporalJoin`'s contract;
    * - q61: cross join with the broadcast single-row corpus count;
    * - q78: the MAX(batch) freshness probe — one-day slice streams past a
    *   broadcast SINGLE-ROW aggregate (the correlated scalar, A7 pattern);
    * - q94: the period-boundary struct — every output row carries the
    *   four MIN/MAX boundary dates from a broadcast SINGLE-ROW aggregate
    *   (the reference's `CROSS JOIN pivot_period`);
    * - q97: the sentinel sort key — a broadcast SINGLE-ROW MAX(sort_key)
    *   aggregate replaces the reference's global `MAX() OVER ()` window.
    */
  private val boundedNlAllowed = Set(
    "q05_scalar_subquery", "q44_global_rank", "q49_funnel", "q63_ann_ivf",
    "q14_band_join", "q34_ann_bruteforce", "q38_temporal_join", "q61_tfidf",
    "q78_stock_batch_probe", "q94_sales_target", "q97_option_master")

  test("no query plan contains an unbounded cartesian product") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf001).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (bnlj && !boundedNlAllowed(name)) Some(s"$name: unexpected BNLJ")
        else None
    }
    assert(failures.isEmpty, s"scale-unsafe plans:\n${failures.mkString("\n")}")
  }
}
