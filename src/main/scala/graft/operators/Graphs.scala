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

  /** Run an eager per-round iteration body with shuffle partitions sized
    * to the materialized edge count (round-15, same rule as
    * [[Dedup.connectedComponents]]): ~2M pair rows (~32 MB, guide §2.2)
    * per partition, capped at the session's configured value — a
    * production-sized setting is never exceeded, while local tiny-graph
    * rounds stop paying 32 near-empty tasks per exchange. Restores the
    * session conf afterwards; only valid for loops whose rounds
    * MATERIALIZE inside `body` (pageRank/HITS one-row aggregates —
    * labelPropagation is lazy until the caller's action and must not be
    * sized here).
    */
  private def sizedRounds[T](spark: org.apache.spark.sql.SparkSession,
                             rows: Long)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val sessionParts = scala.util.Try(spark.conf.get(key).toInt)
      .getOrElse(-1)
    if (sessionParts <= 0) body
    else {
      val per = 2L << 20
      val parts = math.max(1L, math.min(sessionParts.toLong,
        (rows + per - 1) / per)).toInt
      spark.conf.set(key, parts)
      try body finally spark.conf.set(key, sessionParts)
    }
  }

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
    * Pregel-free Spark PageRank shape; lineage is cut per round with a
    * LAZY localCheckpoint (same discipline as
    * [[Dedup.connectedComponents]]: the round's own one-row dangling
    * aggregate is the materializing action, so no separate
    * checkpoint-only job runs — on a real cluster swap in reliable
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
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val nd = nodes.join(
        e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
      .localCheckpoint(false)
    val n = nd.count()
    require(n > 0, "pageRank needs at least one non-self-loop edge")
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    var ranks = nd.select(col("id"), lit(scale / n).as("rank"))
      .localCheckpoint(false)
    // sized on the node count already in hand — an extra e.count()
    // action measurably cost more than the sizing saved on small graphs
    sizedRounds(edges.sparkSession, n) {
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
          .localCheckpoint(false)
      }
    }
    // (the LAST round's lazy checkpoint materializes at the caller's
    // action, after the conf restore — that one round runs at session
    // partitions, which is correct at any scale)
    ranks.select(col("id"), col("rank").as("rank_fp"))
  }

  /** Fixed-point HITS (Kleinberg 1999): mutually-recursive hub and
    * authority scores over a digraph — the complementary centrality to
    * [[pageRankFixedPoint]] (a page can be a weak authority but a strong
    * hub, e.g. a link directory; crawl seeding wants both signals).
    *
    * Same determinism contract as PageRank: all-BIGINT iteration, so the
    * result is exact, order-invariant at any parallelism, and replayable
    * in an external SQL engine. Instead of HITS' usual L2 normalization
    * (a square root — not integer-exact), each half-step SUM-normalizes
    * to `scale` with floor division — same fixed point structure, exact
    * arithmetic:
    * {{{
    *   authRaw(i) = sum over j->i of hub(j);  auth(i) = authRaw(i) * scale div sum(authRaw)
    *   hubRaw(i)  = sum over i->j of auth(j); hub(i)  = hubRaw(i) * scale div sum(hubRaw)
    * }}}
    *
    * Overflow bound: `maxRaw * scale` must fit a long; raw sums are
    * bounded by `maxInDegree * scale`, so the default scale=10^6 is safe
    * to ~9.2e6 in-links on one node — the iteration measures each
    * round's max and fails loudly past the bound (lower `scale` for
    * denser graphs).
    *
    * Scale shape: per half-step one edges⋈scores join + one hash
    * aggregate (the PageRank shape exactly); the normalizer is a one-row
    * aggregate per half-step (bounded driver traffic). Output:
    * (id, hub_fp, auth_fp) in `scale` units.
    */
  def hitsFixedPoint(edges: DataFrame, iters: Int = 5,
                     scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(false)
    val n = nodes.count()
    require(n > 0, "hits needs at least one non-self-loop edge")
    require(scale >= n, "scale must be >= node count or ranks floor to 0")
    def normalize(raw: DataFrame, outName: String): DataFrame = {
      // one-row aggregate: the normalizer + the overflow sentinel
      val r = raw.agg(coalesce(sum(col("raw")), lit(0L)),
        coalesce(max(col("raw")), lit(0L))).head()
      val (tot, mx) = (r.getLong(0), r.getLong(1))
      require(mx <= Long.MaxValue / scale,
        s"hits fixed-point overflow (maxRaw=$mx, scale=$scale): lower scale")
      require(tot > 0, "hits mass vanished — scale too small for the graph")
      nodes.join(raw, Seq("id"), "left")
        .select(col("id"),
          expr(s"(coalesce(raw, CAST(0 AS BIGINT)) * $scale) DIV $tot")
            .as(outName))
        .localCheckpoint(false)
    }
    var hubs = nodes.select(col("id"), lit(scale / n).as("h"))
      .localCheckpoint(false)
    var auths: DataFrame = null
    sizedRounds(edges.sparkSession, n) {
      for (_ <- 1 to iters) {
        val aRaw = hubs.join(e, col("id") === col("src"))
          .groupBy(col("dst").as("id")).agg(sum(col("h")).as("raw"))
        auths = normalize(aRaw, "a")
        val hRaw = auths.join(e, col("id") === col("dst"))
          .groupBy(col("src").as("id")).agg(sum(col("a")).as("raw"))
        hubs = normalize(hRaw, "h")
      }
    }
    hubs.join(auths, "id")
      .select(col("id"), col("h").as("hub_fp"), col("a").as("auth_fp"))
  }

  /** Deterministic synchronous label propagation (Raghavan 2007) over
    * the UNDIRECTED graph — community detection for host-level corpus
    * curation (a near-free complement to PageRank: mirror farms and
    * template networks cluster into one community, which a sampler then
    * caps as a unit instead of per-domain).
    *
    * Determinism contract (the usual LPA is order-randomized): labels
    * start as the node id; every round EVERY node simultaneously adopts
    * the most frequent label among its neighbors PLUS ONE VOTE for its
    * own current label, ties broken by the SMALLEST label — pure integer
    * argmax, so the result is exact, partition-invariant, and replayable
    * in an external SQL engine (q225's oracle unrolls the same rounds in
    * DuckDB). The self-vote is the standard damping for synchronous
    * LPA's bipartite oscillation (a star graph flips hub/leaf labels
    * forever without it).
    *
    * Scale shape: per round one edges⋈labels equi-join (shuffle on the
    * join key), one (node, label) hash aggregate, and one per-node
    * window top-1 — all keyed by node id, no global stage anywhere;
    * lineage is cut per round with an eager localCheckpoint
    * ([[pageRankFixedPoint]]'s discipline — swap in reliable
    * checkpointing on a real cluster).
    *
    * Output: (id, community) — community = the converged label (a node
    * id; every member of a community reports the same one).
    */
  def labelPropagation(edges: DataFrame, iters: Int = 5): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    import org.apache.spark.sql.expressions.Window
    val dir = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    // symmetrize: neighbor = either endpoint of any incident edge
    val e = dir.union(dir.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("id")).distinct()
      .localCheckpoint(false)
    var labels = nodes.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(false)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("cnt").desc, col("lbl").asc)
    for (_ <- 1 to iters) {
      val neighborVotes = labels
        .join(e, col("id") === col("src"))
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      labels = neighborVotes
        .unionByName(labels.select(col("id"), col("lbl"),
          lit(1L).as("cnt")))
        .groupBy(col("id"), col("lbl"))
        .agg(sum(col("cnt")).as("cnt"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("id"), col("lbl"))
        .localCheckpoint(false)
    }
    labels.select(col("id"), col("lbl").as("community"))
  }
}
