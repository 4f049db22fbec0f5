package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Pins the single-scan contract of the link-graph compositions (round-9
  * directive): q209/q214/q220/q225 derive BOTH the fixed-point input and the
  * domain-name lookup from ONE eagerly-checkpointed edge frame, so the
  * corpus-wide link-extraction regex scan runs exactly once per query. The
  * observable contract: the composed query's physical plan contains ZERO
  * file scans — every consumer reads the materialized checkpoint (the only
  * file scan happened inside the checkpoint job itself).
  */
class LinkGraphScanSpec extends SparkSpec {

  private val linkQueries =
    Seq("q209_link_pagerank", "q214_crawl_budget", "q220_hits",
      "q225_label_propagation")

  for (q <- linkQueries)
    test(s"$q plans no file scan after the shared edge checkpoint") {
      val df = SparkEntry.queries(q)(spark, sf001)
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.isEmpty,
        s"$q re-reads the corpus from file instead of the checkpointed " +
          s"edge frame: ${scans.map(_.nodeNamePrefix).mkString(", ")}")
      assert(df.count() > 0)
    }
}
