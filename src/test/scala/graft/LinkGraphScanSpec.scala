package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Pins the single-scan contract of the link-graph compositions (round-9
  * directive): q209/q214/q220/q225 derive BOTH the fixed-point input and the
  * domain-name lookup from ONE eagerly-checkpointed edge frame, so the
  * corpus-wide link-extraction regex scan runs exactly once per query. The
  * observable contract: the composed query's physical plan contains ZERO
  * file scans — every consumer reads the materialized checkpoint (the only
  * file scan happened inside the checkpoint job itself).
  *
  * The traversal recurses through AdaptiveSparkPlanExec/QueryStageExec:
  * `executedPlan` is an adaptive WRAPPER node under AQE, and a plain
  * TreeNode.collect on it inspects nothing (round-10 review find — the
  * first version of this spec passed vacuously).
  */
class LinkGraphScanSpec extends SparkSpec {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: QueryStageExec => q +: allNodes(q.plan)
    case n => n +: n.children.flatMap(allNodes)
  }

  private val linkQueries =
    Seq("q209_link_pagerank", "q214_crawl_budget", "q220_hits",
      "q225_label_propagation")

  for (q <- linkQueries)
    test(s"$q plans no file scan after the shared edge checkpoint") {
      val df = SparkEntry.queries(q)(spark, sf001)
      val nodes = allNodes(df.queryExecution.executedPlan)
      // sanity: the traversal actually saw the plan (a vacuous collect
      // over the adaptive wrapper would see exactly one node)
      assert(nodes.size > 1, s"$q: traversal saw only ${nodes.size} node")
      val scans = nodes.collect { case s: FileSourceScanExec => s }
      assert(scans.isEmpty,
        s"$q re-reads the corpus from file instead of the checkpointed " +
          s"edge frame: ${scans.map(_.nodeNamePrefix).mkString(", ")}")
      assert(df.count() > 0)
    }
}
