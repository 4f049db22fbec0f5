package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph operators for web-corpus curation.
  *
  * A crawl-scale pipeline ranks domains by link authority before
  * sampling (CommonCrawl-derived corpora gate on harmonic/PageRank
  * centrality — Penedo 2023 §2 uses URL+link signals the same way), so
  * the engine carries PageRank as a first-class batch operator next to
  * [[Dedup.connectedComponents]].
  *
  * Determinism contract: the iteration runs in FIXED-POINT BIGINT
  * arithmetic (ranks in `scale` units, damping as a rational
  * `dampNum/dampDen`, `DIV` floor division) — integer sums are exact
  * and order-invariant at any parallelism, so the result is
  * bit-identical run-to-run, partition-layout-independent, AND
  * replayable in an external SQL engine (the q197 oracle unrolls the
  * same iterations in DuckDB and matches value-for-value; float
  * PageRank could never hash-match across engines because `sum(double)`
  * is reduction-order-dependent).
  */
object Graphs {

  /** Fixed-point PageRank by power iteration.
    *
    * `edges`: (src, dst) long pairs; duplicates and self-loops are
    * dropped (an unweighted simple digraph — the standard formulation).
    * Every node appearing on either side participates. Dangling nodes
    * (out-degree 0) redistribute their mass uniformly each round, the
    * classic correction.
    *
    * Per iteration (all BIGINT, `div` = floor):
    * {{{
    *   contrib(j -> i) = rank(j) div deg(j)
    *   rank'(i) = base + (dampNum * (sum contribs(i) + dangPer)) div dampDen
    *   base     = ((dampDen - dampNum) * scale) div (dampDen * n)
    *   dangPer  = (sum of dangling ranks) div n
    * }}}
    *
    * Scale notes: each round is one join edges⋈ranks (shuffle on the
    * join key) + one hash aggregation on dst — the canonical
    * Pregel-free Spark PageRank shape; lineage is cut per round with an
    * eager localCheckpoint (same discipline as
    * [[Dedup.connectedComponents]] — on a real cluster swap in reliable
    * checkpointing). The dangling-mass term is a ONE-ROW aggregate per
    * round (bounded driver traffic, PlanAudit-exempt by size).
    *
    * Output: (id, rank_fp) — rank in `scale` fixed-point units;
    * `rank_fp / scale` is the conventional probability. Ranks of a
    * graph sum to ≈ scale (floor-division leakage only).
    */
  def pageRankFixedPoint(edges: DataFrame, iters: Int = 5,
                         dampNum: Long = 85, dampDen: Long = 100,
                         scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && dampNum >= 0 && dampNum <= dampDen,
      "damping must be a rational in [0, 1]")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val nd = nodes.join(
        e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint(true)
    val n = nd.count()
    require(n > 0, "pageRank needs at least one non-self-loop edge")
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    var ranks = nd.select(col("id"), lit(scale / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val withDeg = ranks.join(nd, "id")
      // one-row aggregate: the dangling mass this round
      val dangling = withDeg.filter(col("deg") === 0)
        .agg(coalesce(sum(col("rank")), lit(0L))).head().getLong(0)
      val dangPer = dangling / n
      val csum = withDeg.filter(col("deg") > 0)
        .select(col("id"), expr("rank DIV deg").as("c"))
        .join(e, col("id") === col("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("csum"))
      ranks = nd.select(col("id"))
        .join(csum, Seq("id"), "left")
        .select(col("id"),
          expr(s"$base + ($dampNum * (coalesce(csum, CAST(0 AS BIGINT)) " +
            s"+ $dangPer)) DIV $dampDen").as("rank"))
        .localCheckpoint(true)
    }
    ranks.select(col("id"), col("rank").as("rank_fp"))
  }
}
