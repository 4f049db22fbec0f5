package graft

import org.apache.spark.sql.functions._
import graft.operators.Graphs

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side implementation of the SAME fixed-point
    * recurrence — a sequential cross-check for the distributed operator.
    */
  private def refRank(edgeList: Set[(Long, Long)], iters: Int,
                      scale: Long = 1000000000000L,
                      dn: Long = 85, dd: Long = 100): Map[Long, Long] = {
    val e = edgeList.filter(p => p._1 != p._2)
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    val n = nodes.size
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = ((dd - dn) * scale) / (dd * n)
    var rank = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(deg.contains).map(rank).sum
      val dangPer = dangling / n
      val contribs = e.toSeq.groupBy(_._2).map { case (dstN, es) =>
        dstN -> es.map { case (s, _) => rank(s) / deg(s) }.sum
      }
      rank = nodes.map(nd => nd ->
        (base + (dn * (contribs.getOrElse(nd, 0L) + dangPer)) / dd)).toMap
    }
    rank
  }

  test("pageRankFixedPoint matches the sequential reference exactly, " +
    "conserves mass, reruns bit-identically") {
    // 3 is a hub, 2 is dangling (link target only), (1,1) self-loop
    // must be dropped, the duplicate (0,1) edge must collapse
    val edgeList = Set((0L, 1L), (1L, 0L), (0L, 2L), (3L, 0L), (3L, 1L),
      (1L, 1L), (0L, 1L))
    val edges = edgeList.toSeq.toDF("src", "dst")
      .unionByName(Seq((0L, 1L)).toDF("src", "dst")) // duplicate row
    val out = Graphs.pageRankFixedPoint(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == refRank(edgeList, 4),
      s"distributed != sequential: $out vs ${refRank(edgeList, 4)}")
    // rank mass ≈ scale (floor-division leakage only)
    val total = out.values.sum
    assert(total <= 1000000000000L && total > 1000000000000L - 100000L,
      s"mass not conserved: $total")
    // node 3 has no inbound links: teleport + dangling share only → the
    // minimum; dangling node 2 still holds positive rank (it RECEIVES
    // a link; its own mass redistributes uniformly each round)
    assert(out(3L) == out.values.min && out(2L) > out(3L),
      s"rank order wrong: $out")
    // integer arithmetic: rerun is bit-identical
    val again = Graphs.pageRankFixedPoint(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == out)
  }

  test("pageRankFixedPoint: a sink-heavy graph concentrates rank where " +
    "links point") {
    // star: everyone links to 0
    val edges = (1L to 9L).map(i => (i, 0L)).toDF("src", "dst")
    val out = Graphs.pageRankFixedPoint(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 10)
    assert(out(0L) > 5 * out(1L), s"hub must dominate: $out")
    assert((1L to 9L).map(out).toSet.size == 1,
      "symmetric leaves rank equally")
  }
}
