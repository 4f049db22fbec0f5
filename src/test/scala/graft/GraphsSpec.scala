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

  /** Sequential fixed-point HITS mirror of Graphs.hitsFixedPoint. */
  private def refHits(edges: Set[(Long, Long)], iters: Int,
                      scale: Long = 1000000L)
      : Map[Long, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2)
    val nodes = (e.map(_._1) ++ e.map(_._2)).toSeq.sorted
    var h = nodes.map(_ -> scale / nodes.size).toMap
    var a = Map.empty[Long, Long]
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val tot = raw.values.sum
      nodes.map(i => i -> raw.getOrElse(i, 0L) * scale / tot).toMap
    }
    for (_ <- 1 to iters) {
      a = norm(e.groupBy(_._2).map { case (i, es) =>
        i -> es.toSeq.map(p => h(p._1)).sum })
      h = norm(e.groupBy(_._1).map { case (i, es) =>
        i -> es.toSeq.map(p => a(p._2)).sum })
    }
    nodes.map(i => i -> ((h(i), a(i)))).toMap
  }

  test("hitsFixedPoint matches the sequential reference exactly; " +
    "hubs and authorities separate") {
    // 0 links to everything (pure hub); 3 is linked by everything
    // (pure authority); 1,2 are both; (2,2) self-loop dropped
    val edgeList = Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 3L), (2L, 3L),
      (1L, 2L), (2L, 1L), (2L, 2L))
    val edges = edgeList.toSeq.toDF("src", "dst")
      .unionByName(Seq((0L, 1L)).toDF("src", "dst")) // duplicate row
    val out = Graphs.hitsFixedPoint(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out == refHits(edgeList, 4),
      s"distributed != sequential: $out vs ${refHits(edgeList, 4)}")
    // 0 is the best hub and no authority; 3 the best authority, no hub
    assert(out(0L)._1 == out.values.map(_._1).max && out(0L)._2 == 0L)
    assert(out(3L)._2 == out.values.map(_._2).max && out(3L)._1 == 0L)
    // each score vector sum-normalizes to ~scale (floor leakage only)
    val (hs, as2) = (out.values.map(_._1).sum, out.values.map(_._2).sum)
    assert(hs <= 1000000L && hs > 999900L, s"hub mass: $hs")
    assert(as2 <= 1000000L && as2 > 999900L, s"auth mass: $as2")
    // rerun is bit-identical (integer arithmetic, no RNG)
    val again = Graphs.hitsFixedPoint(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
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
