package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`).
  *
  * - `bruteForceTopK`: exact cosine top-k. The query side is broadcast; the
  *   corpus side streams through map-side — one window shuffle on query id
  *   for the top-k. Baseline and verification oracle.
  * - `lshTopK`: the scale path — random-hyperplane LSH. Each vector gets a
  *   b-bit sign signature from fixed pseudo-random hyperplanes; candidates
  *   are pairs sharing a signature band, re-ranked exactly. Corpus never
  *   cross-joins: the join key is the (band, bucket) pair.
  *
  * All vector math is `functions.zip_with`/`aggregate` — codegen'd, no UDFs.
  */
object Similarity {

  /** Dot product of two array<double> columns — a native codegen'd
    * Expression (graft.plans.DotProduct); same ascending-index accumulation
    * order as the equivalent `aggregate(zip_with(...))` fold.
    */
  def dot(a: Column, b: Column): Column = graft.plans.VectorExpressions.dot(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm(a); val nb = norm(b)
    when(na === 0 || nb === 0, lit(0.0d)).otherwise(d / (na * nb))
  }

  /** Exact top-k by cosine for each query vector. `queries` is expected to be
    * small (it is broadcast); corpus is arbitrary size.
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                     queries: DataFrame, queryId: Column, queryVec: Column,
                     k: Int = 10): DataFrame = {
    val c = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cvec"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qvec"))
    val scored = c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("cvec"), col("qvec")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cos", round(col("cos"), 4))
  }

  /** Embedding-cosine near-duplicate pairs at scale: random-hyperplane LSH
    * bucket candidates → exact cosine verify. Output = band-colliding pairs
    * verified at the threshold, BOUNDED per bucket: buckets at or under
    * `maxBucket` keep exact all-pairs semantics; hotter buckets emit only
    * representative-star pairs (each member vs the bucket's smallest id —
    * see [[Dedup.boundedBucketPairs]] for the full contract). True
    * near-dups (cosine near 1) collide in some band with probability ~1,
    * and recall for a given cosine rises with `bands`. The plan is bucket
    * equi-join → pair dedup → id-join verify — no cross join at any corpus
    * size (contrast `cosinePairs`, the exact quadratic verification form).
    */
  def lshCosinePairs(corpus: DataFrame, idCol: Column, vecCol: Column,
                     threshold: Double, bits: Int = 64, bands: Int = 8,
                     dim: Int = 64, maxBucket: Int = 64,
                     materialize: Boolean = true): DataFrame = {
    val bandBits = bits / bands
    val base = corpus.select(idCol.as("id"), vecCol.as("vec"))
    // boundedBucketPairs consumes the banded frame three times (occupancy
    // stats + both join sides) — persist, or each consumer replays the
    // bits× literal-plane dot products per row
    val banded0 = base
      .select(col("id"),
        explode(array(bandBuckets(col("vec"), bands, bandBits, dim): _*))
          .as("bucket"))
    val banded = if (materialize) banded0.persist() else banded0
    // hot buckets (an embedding cluster of near-identical vectors — the
    // very thing near-dup detection targets) are bounded at `maxBucket`
    // via the representative-star reduce; see Dedup.boundedBucketPairs.
    val cand = Dedup.boundedBucketPairs(banded, Seq("bucket"), maxBucket,
        Seq(col("a.id").as("id_a"), col("b.id").as("id_b")))
      .distinct()
    cand
      .join(base.select(col("id").as("id_a"), col("vec").as("va")), "id_a")
      .join(base.select(col("id").as("id_b"), col("vec").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs: all (a,b) with cosine >=
    * threshold. Exact all-pairs form — the verification oracle for
    * LSH-based near-dup detection; quadratic, so test/bucket scale only
    * (the scale path is `lshCosinePairs` / `lshTopK`).
    */
  def cosinePairs(corpus: DataFrame, idCol: Column, vecCol: Column,
                  threshold: Double): DataFrame = {
    val base = corpus.select(idCol.as("id"), vecCol.as("vec"))
    base.alias("a").join(base.alias("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosine(col("a.vec"), col("b.vec")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Deterministic pseudo-random hyperplanes (splitmix64 → [-0.5, 0.5)),
    * materialized driver-side as literal arrays so signature evaluation is
    * `bits` dot products against constants — no per-row plane generation.
    * No Math.random — reproducible across runs.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def planes(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (p, i) =>
      (math.floorMod(mix64(p.toLong * 1000003L + i), 1000000L).toDouble / 1e6) - 0.5
    }

  /** Johnson–Lindenstrauss-style random projection: compress a `dim`-d
    * embedding to `outDims` components, each the dot product against a
    * fixed pseudo-random hyperplane from the SAME deterministic
    * splitmix64 family as [[lshSignature]] (the sign-bit signature is
    * exactly this projection, quantized to 1 bit — this keeps the full
    * magnitudes for approximate-distance pre-ranking at outDims/dim of
    * the memory and FLOPs). Components are snapshotted through
    * DECIMAL(18,6) so the output is engine-replayable.
    *
    * Map-only over constants (the planes are literals, the dot is the
    * codegen'd [[DotProduct]]): zero shuffle, linear in rows at any
    * corpus size.
    */
  def randomProject(df: DataFrame, idCol: Column, vecCol: Column,
                    outDims: Int = 16, dim: Int = 64): DataFrame = {
    require(outDims >= 1 && outDims <= dim,
      "need 1 <= outDims <= dim")
    val pl = planes(outDims, dim)
    val comps = (0 until outDims).map { p =>
      val planeArr = array(pl(p).map(lit).toSeq: _*)
      dot(vecCol, planeArr).cast("decimal(18,6)").cast("double")
    }
    df.select(idCol.as("id"), array(comps: _*).as("proj"))
  }

  /** b-bit random-hyperplane signature of a `dim`-dimensional vector:
    * bit p = sign of dot(vec, plane_p).
    */
  def lshSignature(vec: Column, bits: Int = 16, dim: Int = 64): Column =
    // fused codegen'd SignBits: ONE two-level loop over the plane matrix
    // instead of `bits` expression-tree dot products per row; per plane
    // the fold is the same ascending-index accumulation as DotProduct /
    // an external engine's list_dot_product, so signatures replay
    // bit-for-bit in a SQL oracle
    graft.plans.VectorExpressions.signBits(vec, planes(bits, dim))

  /** Per-band bucket columns: band b's bucket is its `bandBits` sign bits
    * (planes `b*bandBits until (b+1)*bandBits`) packed little-endian, then
    * disambiguated by band index. Unlike a single packed signature long,
    * `bands * bandBits` is not capped at 64 — the corpus-size-scaled path
    * needs wide bands. For `bands*bandBits = 64` the bucket values equal the
    * packed-signature extraction bit for bit.
    */
  private def bandBuckets(vec: Column, bands: Int, bandBits: Int,
                          dim: Int): Seq[Column] =
    bandPacked(vec, bands, bandBits, dim).zipWithIndex
      .map { case (p, b) => p * bands + b }

  /** The raw packed sign bits per band (before band-index encoding) —
    * the form multi-probe needs, since a Hamming-1 neighbor bucket is an
    * XOR on the PACKED value.
    */
  private def bandPacked(vec: Column, bands: Int, bandBits: Int,
                         dim: Int): Seq[Column] = {
    val pl = planes(bands * bandBits, dim)
    (0 until bands).map { b =>
      // band b = the fused sign-bit pack of ITS slice of the plane
      // family — values identical to the per-plane when/shift sum
      graft.plans.VectorExpressions.signBits(vec,
        pl.slice(b * bandBits, (b + 1) * bandBits))
    }
  }

  /** Band bits scaled to corpus size: with `n` vectors and ~2^bits buckets
    * per band, expected bucket occupancy is n / 2^bits — pin it near
    * `targetPerBucket` so within-bucket pairing stays linear as the corpus
    * grows (fixed 8-bit bands go quadratic past ~10^5 vectors).
    */
  def adaptiveBandBits(corpusSize: Long, targetPerBucket: Long = 64): Int = {
    val needed = math.ceil(
      math.log(math.max(corpusSize.toDouble / targetPerBucket, 1.0)) / math.log(2)).toInt
    math.min(math.max(needed, 8), 30)
  }

  /** LSH-bucketed ANN: signature → same-bucket candidate pairs → exact
    * cosine re-rank to top-k per query. `bits/bands` bits per band: 8-bit
    * bands (256 buckets) keep per-bucket pair counts near-linear; more
    * bands = higher recall, more candidates.
    *
    * Scale shape: candidate generation is ids-only (bucket join never
    * shuffles vectors); vectors are fetched by id join *after* pair dedup,
    * so the expensive cosine runs once per distinct candidate pair.
    *
    * Bucket occupancy is bounded: each query pairs with at most `maxBucket`
    * bucket-mates per band — the smallest ids, a deterministic truncation —
    * so a hot bucket of size m costs O(m·maxBucket) candidates, not O(m²).
    * (Unlike the pair operators' representative star, top-k needs every
    * member to KEEP candidates, so the bound caps the probe side only.)
    */
  def lshTopK(corpus: DataFrame, idCol: Column, vecCol: Column,
              k: Int = 10, bits: Int = 64, bands: Int = 8,
              dim: Int = 64, maxBucket: Int = 64,
              materialize: Boolean = true): DataFrame = {
    val bandBits = bits / bands
    val base = corpus.select(idCol.as("id"), vecCol.as("vec"))
    // consumed by the probe-rank window AND the candidate join — persist,
    // or both replay the bits× literal-plane dot products per row
    val banded0 = base
      .select(col("id"),
        explode(array(bandBuckets(col("vec"), bands, bandBits, dim): _*))
          .as("bucket"))
    val banded = if (materialize) banded0.persist() else banded0
    // probe-side rank within bucket: rows ≤ maxBucket of every bucket keep
    // all-pairs semantics (rn <= occupancy <= maxBucket covers the whole
    // bucket), hot buckets are truncated to their maxBucket smallest ids
    val wRank = Window.partitionBy(col("bucket")).orderBy(col("id"))
    val probeSide = banded.withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") <= maxBucket)
      .drop("__rn")
    val cand = banded.alias("a")
      .join(probeSide.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("query_id"), col("b.id").as("corpus_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    cand
      .join(base.select(col("id").as("query_id"), col("vec").as("qvec")), "query_id")
      .join(base.select(col("id").as("corpus_id"), col("vec").as("cvec")), "corpus_id")
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cos", round(col("cos"), 4))
  }

  /** Multi-probe LSH ANN (Lv et al. 2007, "Multi-Probe LSH"): each query
    * probes its own bucket PLUS the `probes` nearest neighbor buckets per
    * band — the buckets at Hamming distance 1 on the band's lowest sign
    * bits. A near-neighbor that fell just across one hyperplane lands in
    * exactly such a bucket, so recall rises WITHOUT adding bands — at 100
    * TB that trade matters: extra bands re-shuffle and re-store the whole
    * corpus index, extra probes only multiply the QUERY side's lookup
    * rows (|queries|·bands·(1+probes), corpus untouched).
    *
    * Same bounded-bucket discipline as [[lshTopK]]: the corpus side of
    * the candidate join is truncated to each bucket's `maxBucket`
    * smallest ids, candidates dedup before the exact cosine re-rank.
    * Output: (query_id, corpus_id, cos, rank) for each query in
    * `queries`, rank ≤ k.
    */
  def lshTopKMultiProbe(corpus: DataFrame, idCol: Column, vecCol: Column,
                        queries: DataFrame, qIdCol: Column, qVecCol: Column,
                        k: Int = 10, bits: Int = 64, bands: Int = 8,
                        dim: Int = 64, maxBucket: Int = 64,
                        probes: Int = 2,
                        materialize: Boolean = true): DataFrame = {
    val bandBits = bits / bands
    val nFlips = math.min(probes, bandBits)
    val base = corpus.select(idCol.as("id"), vecCol.as("vec"))
    val qBase = queries.select(qIdCol.as("qid"), qVecCol.as("qvec"))
    val banded0 = base.select(col("id"),
      explode(array(bandBuckets(col("vec"), bands, bandBits, dim): _*))
        .as("bucket"))
    val banded = if (materialize) banded0.persist() else banded0
    val wRank = Window.partitionBy(col("bucket")).orderBy(col("id"))
    val corpusSide = banded.withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") <= maxBucket).drop("__rn")
    // query probe set: own bucket + Hamming-1 flips of the packed bits
    val probeCols = bandPacked(col("qvec"), bands, bandBits, dim)
      .zipWithIndex.flatMap { case (packed, b) =>
        (packed * bands + b) +:
          (0 until nFlips).map(r =>
            packed.bitwiseXOR(lit(1L << r)) * bands + b)
      }
    val qBanded = qBase.select(col("qid"),
      explode(array(probeCols: _*)).as("bucket")).distinct()
    val cand = qBanded.join(corpusSide, "bucket")
      .filter(col("qid") =!= col("id"))
      .select(col("qid").as("query_id"), col("id").as("corpus_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    cand
      .join(qBase.select(col("qid").as("query_id"), col("qvec")), "query_id")
      .join(base.select(col("id").as("corpus_id"), col("vec").as("cvec")),
        "corpus_id")
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cos", round(col("cos"), 4))
  }

  /** IVF-style ANN: an inverted-file index over `nCentroids` centroids.
    * Seed centroids are the corpus vectors with the smallest ids
    * (deterministic), then `lloydIters` k-means (Lloyd) iterations refine
    * them: assign every vector to its nearest seed, recompute each centroid
    * as the element-wise mean of its members. Refined centroids are rounded
    * to 6 dp so the refinement replays bit-for-bit in an external SQL
    * oracle (mean-of-doubles last-ULP noise from summation order would
    * otherwise leak into assignment ranks). A centroid that captures no
    * members drops out (standard Lloyd degeneracy; the remaining lists
    * absorb its region). Every corpus vector is then assigned to its
    * nearest refined centroid (the inverted list); each query probes its
    * `nProbe` nearest centroids and re-ranks EXACTLY within those lists.
    *
    * Scale shape: each assignment pass is corpus × broadcast(nCentroids
    * rows) — a bounded broadcast nested loop that IS the IVF algorithm's
    * n·k distance computations (compute, not shuffle); the mean recompute
    * is one explode + two hash aggregates; list membership and candidate
    * generation are hash joins on centroid id; the exact re-rank touches
    * only probed-list vectors. Complements `lshTopK`: IVF adapts to data
    * distribution, LSH needs no training pass.
    *
    * The ranked-assignment table is persisted (it feeds both the inverted
    * lists and the probe sets); in a long-lived session pass
    * `materialize = false` and manage caching at the call site.
    */
  /** Shared Lloyd trainer over a ("id", "vec") frame: smallest-id seeds,
    * `lloydIters` cosine-assignment + 6dp-rounded-mean passes. Returns
    * (cid, cvec) — the deterministic, cross-engine-replayable centroids
    * [[ivfTopK]] and [[kmeansClusters]] both build on. The per-pass
    * assignment join is `base × broadcast(centroids)` — the bounded
    * broadcast nested loop that IS k-means' n·k distance computations.
    */
  private def lloydCentroids(base: DataFrame, nCentroids: Int,
                             lloydIters: Int): DataFrame = {
    val seed = base.filter(col("id") < nCentroids)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val wAsg = Window.partitionBy(col("id"))
      .orderBy(col("__sim").desc, col("cid"))
    (0 until lloydIters).foldLeft(seed) { (c, _) =>
      base.crossJoin(broadcast(c))
        .withColumn("__sim", cosine(col("vec"), col("cvec")))
        .withColumn("__cr", row_number().over(wAsg))
        .filter(col("__cr") === 1)
        .select(col("cid"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"),
          transform(col("pm"), s => round(s.getField("m"), 6)).as("cvec"))
    }
  }

  /** Deterministic k-means cluster assignment over an embedding column —
    * the clustering HALF of [[ivfTopK]] exposed as a first-class output,
    * because a curation pipeline wants the clusters themselves: SemDeDup
    * prunes within clusters, topic-balancing samples across them, and
    * cluster sizes are the drift signal a corpus monitor watches.
    * Output: (vec_id, cluster_id, sim) — every vector's nearest refined
    * centroid by cosine (4dp).
    */
  def kmeansClusters(df: DataFrame, idCol: Column, vecCol: Column,
                     k: Int = 16, lloydIters: Int = 1): DataFrame = {
    val base = df.select(idCol.as("id"), vecCol.as("vec"))
    val cents = lloydCentroids(base, k, lloydIters)
    val wAsg = Window.partitionBy(col("id"))
      .orderBy(col("__sim").desc, col("cid"))
    base.crossJoin(broadcast(cents))
      .withColumn("__sim", cosine(col("vec"), col("cvec")))
      .withColumn("__cr", row_number().over(wAsg))
      .filter(col("__cr") === 1)
      .select(col("id").as("vec_id"), col("cid").as("cluster_id"),
        round(col("__sim"), 4).as("sim"))
  }

  def ivfTopK(corpus: DataFrame, idCol: Column, vecCol: Column,
              k: Int = 10, nCentroids: Int = 16, nProbe: Int = 2,
              lloydIters: Int = 1, materialize: Boolean = true): DataFrame = {
    val base = corpus.select(idCol.as("id"), vecCol.as("vec"))
    val wAsg = Window.partitionBy(col("id")).orderBy(col("__sim").desc, col("cid"))
    def assign(cents: DataFrame, maxRank: Int): DataFrame =
      base.crossJoin(broadcast(cents))
        .withColumn("__sim", cosine(col("vec"), col("cvec")))
        .withColumn("__cr", row_number().over(wAsg))
        .filter(col("__cr") <= maxRank)
    val cents = lloydCentroids(base, nCentroids, lloydIters)
    // ONE final assignment pass: rank centroids per vector once, persist,
    // then slice — the inverted list is rank 1, the probe set rank <= nProbe
    val asg0 = assign(cents, nProbe).select(col("id"), col("cid"), col("__cr"))
    val asg = if (materialize) asg0.persist() else asg0
    val lists = asg.filter(col("__cr") === 1).select(col("id"), col("cid"))
    val probes = asg.select(col("id").as("query_id"), col("cid"))
    val cand = probes.join(lists, "cid")
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("corpus_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    cand
      .join(base.select(col("id").as("query_id"), col("vec").as("qvec")), "query_id")
      .join(base.select(col("id").as("corpus_id"), col("vec").as("cvec")), "corpus_id")
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cos", round(col("cos"), 4))
  }

  // ---- persisted IVF serving index --------------------------------------

  /** Catalog table name for an IVF index path (same hashing scheme as
    * the streaming dedup index tables).
    */
  def ivfIndexTableName(indexPath: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(indexPath.getBytes("UTF-8")).take(6)
      .map(b => f"$b%02x").mkString
    s"graft_ivf_idx_${h}_lists"
  }

  /** Register (idempotently) the inverted-list table over `indexPath` —
    * bucketed by `cid` so a probed search reads only the probed lists'
    * file buckets, partitioned by ingest `batch` so appends land as
    * idempotent partition overwrites. Pure DDL over the existing path:
    * a FRESH session (serving process restart) re-attaches to an index
    * built elsewhere without touching the data, and `MSCK REPAIR`
    * recovers the batch partitions already on disk.
    */
  private def ensureIvfListsTable(spark: org.apache.spark.sql.SparkSession,
                                  indexPath: String, buckets: Int): String = {
    val table = ivfIndexTableName(indexPath)
    if (!spark.catalog.tableExists(table)) {
      val path = s"$indexPath/lists"
      // pre-create the directory: table resolution lists the path, and a
      // first build would otherwise log a (harmless, retried) missing-
      // file error before the first insert creates it
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
      spark.sql(
        s"""CREATE TABLE $table (cid BIGINT, id BIGINT, vec ARRAY<DOUBLE>,
           |  batch BIGINT)
           |USING parquet OPTIONS (path '$path')
           |PARTITIONED BY (batch)
           |CLUSTERED BY (cid) SORTED BY (cid) INTO $buckets BUCKETS
           |""".stripMargin)
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(path)))
        spark.sql(s"MSCK REPAIR TABLE $table")
    }
    table
  }

  private def assignToCentroids(base: DataFrame, cents: DataFrame,
                                maxRank: Int): DataFrame = {
    val wAsg = Window.partitionBy(col("id"))
      .orderBy(col("__sim").desc, col("cid"))
    base.crossJoin(broadcast(cents))
      .withColumn("__sim", cosine(col("vec"), col("cvec")))
      .withColumn("__cr", row_number().over(wAsg))
      .filter(col("__cr") <= maxRank)
  }

  /** Build (or rebuild) a PERSISTED IVF index under `indexPath`: the
    * trained centroids as one small parquet (broadcast at query time)
    * plus the inverted lists as a cid-bucketed catalog table — the
    * billion-vector serving layout where a query's I/O is `nProbe`
    * lists' file buckets, never the corpus ([[ivfIndexSearch]] carries
    * the plan proof). Same deterministic Lloyd trainer as [[ivfTopK]]/
    * [[kmeansClusters]] (smallest-id seeds, 6dp-rounded means), so a
    * search over the persisted index reproduces the in-memory
    * operator's answer exactly — the equivalence the q198 oracle and
    * ScaleOpsSpec pin.
    */
  def buildIvfIndex(spark: org.apache.spark.sql.SparkSession,
                    corpus: DataFrame, idCol: Column, vecCol: Column,
                    indexPath: String, nCentroids: Int = 16,
                    lloydIters: Int = 1, buckets: Int = 16): Unit = {
    // a rebuild is a RETRAIN: prior lists (including append partitions
    // assigned against the OLD centroids) must not survive it
    val table = ivfIndexTableName(indexPath)
    if (spark.catalog.tableExists(table)) spark.sql(s"DROP TABLE $table")
    val listsDir = java.nio.file.Paths.get(s"$indexPath/lists")
    if (java.nio.file.Files.isDirectory(listsDir)) {
      val walk = java.nio.file.Files.walk(listsDir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }
    val base = corpus.select(idCol.as("id"), vecCol.as("vec"))
    val cents = lloydCentroids(base, nCentroids, lloydIters)
    cents.coalesce(1).write.mode("overwrite")
      .parquet(s"$indexPath/centroids")
    ensureIvfListsTable(spark, indexPath, buckets)
    val lists = assignToCentroids(base,
        spark.read.parquet(s"$indexPath/centroids"), 1)
      .select(col("cid"), col("id"), col("vec"))
    graft.sources.Sinks.overwriteBucketedPartition(spark, table, 0L, lists)
  }

  /** Append a batch of vectors to a persisted IVF index: assign against
    * the EXISTING centroids (no retrain — the serving contract; rebuild
    * with [[buildIvfIndex]] when the drift monitor says the centroids
    * moved) and land the rows as the next `batch` partition — an
    * idempotent partition overwrite, so a retried ingest converges.
    * Cost tracks the batch: one broadcast-centroid assignment pass plus
    * the bucketed write; the stored corpus is never read or shuffled.
    */
  def ivfIndexAppend(spark: org.apache.spark.sql.SparkSession,
                     batch: DataFrame, idCol: Column, vecCol: Column,
                     indexPath: String, buckets: Int = 16): Long = {
    val table = ensureIvfListsTable(spark, indexPath, buckets)
    val cents = spark.read.parquet(s"$indexPath/centroids")
    val next = spark.table(table).select(col("batch")).distinct()
      .agg(coalesce(max(col("batch")), lit(-1L))).head().getLong(0) + 1L
    val rows = assignToCentroids(
        batch.select(idCol.as("id"), vecCol.as("vec")), cents, 1)
      .select(col("cid"), col("id"), col("vec"))
    graft.sources.Sinks.overwriteBucketedPartition(spark, table, next, rows)
    next
  }

  /** Probed ANN search against a PERSISTED IVF index. Per query:
    * rank the broadcast centroids, keep the top `nProbe`; the union of
    * probed `cid`s (≤ nCentroids values — always a literal IN, which is
    * what lets the bucketed scan prune: `SelectedBucketsCount` shows
    * only the probed lists' buckets are read) gates the list scan; the
    * candidates join back to their probing queries ON `cid` — the scan's
    * own HashPartitioning(cid) satisfies the join, so the CORPUS SIDE
    * NEVER SHUFFLES — then exact cosine re-ranks and top-k cuts.
    * `excludeSelf` drops candidate == query id (corpus-as-queries
    * evaluation, [[ivfTopK]] parity).
    *
    * Output: (query_id, corpus_id, cos 4dp, rank ≤ k).
    */
  def ivfIndexSearch(spark: org.apache.spark.sql.SparkSession,
                     indexPath: String, queries: DataFrame,
                     qIdCol: Column, qVecCol: Column,
                     k: Int = 10, nProbe: Int = 2,
                     excludeSelf: Boolean = false,
                     buckets: Int = 16): DataFrame = {
    val table = ensureIvfListsTable(spark, indexPath, buckets)
    val cents = spark.read.parquet(s"$indexPath/centroids")
    val q = queries.select(qIdCol.as("id"), qVecCol.as("vec"))
    val probes = assignToCentroids(q, cents, nProbe)
      .select(col("id").as("query_id"), col("vec").as("qvec"), col("cid"))
    // ≤ nCentroids distinct values — bounded driver traffic by design
    // collect-bound: <= nCentroids distinct probed list ids
    val probedCids = probes.select("cid").distinct().collect()
      .map(_.getLong(0)).toIndexedSeq
    val lists = spark.table(table)
      .filter(col("cid").isInCollection(probedCids))
      .select(col("cid"), col("id").as("corpus_id"), col("vec").as("cvec"))
    val cand = lists.join(probes, "cid")
    val filtered =
      if (excludeSelf) cand.filter(col("query_id") =!= col("corpus_id"))
      else cand
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    filtered
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).as("cos"))
      // no dedup needed: every corpus vector lives in exactly ONE list
      // (rank-1 assignment), so a (query, corpus) pair arises once
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("cos", round(col("cos"), 4))
  }

  /** Product-quantization ANN (Jégou et al. 2011, "Product Quantization
    * for Nearest Neighbor Search"): vectors split into `mSub` subvectors;
    * each subspace trains its own `nCodes`-entry codebook (deterministic
    * smallest-id seeds + Lloyd with 6dp-rounded means — [[ivfTopK]]'s
    * recipe per subspace, L2 in the subspace); a corpus vector stores
    * only its per-subspace nearest-centroid CODES — mSub small ints
    * instead of dim doubles, the ~32× compression that keeps a
    * billion-vector index RAM-resident. Queries score by Asymmetric
    * Distance Computation: one (sub, code) → distance table per query
    * (mSub·nCodes entries against the RAW query subvectors), candidates
    * score as the sum of their codes' table entries.
    *
    * Cross-engine determinism: subspace L2 is assembled from dot
    * products (|a|² − 2a·b + |b|²) so both engines compute the identical
    * double; the ADC sum snapshots each term to DECIMAL(28,10) before
    * aggregating — decimal addition is associative, so the rank order
    * cannot depend on partial-aggregation order (a raw double sum
    * could ULP-flip ranks between runs, let alone engines).
    *
    * Scale shape: training and encoding are the bounded
    * broadcast-codebook assignment per subspace (mSub·nCodes rows
    * broadcast — compute, not shuffle); ADC is a hash join of the corpus
    * code table against the broadcast query distance tables plus one
    * grouped sum — the n·|queries|·mSub lookup volume IS the ADC
    * algorithm, with map-side partial sums collapsing it to
    * n·|queries| rows on the wire.
    *
    * Output: (query_id, corpus_id, adc, rank), rank ≤ k by ascending
    * ADC distance.
    */
  def pqTopK(corpus: DataFrame, idCol: Column, vecCol: Column,
             queries: DataFrame, qIdCol: Column, qVecCol: Column,
             k: Int = 10, mSub: Int = 8, nCodes: Int = 16,
             dim: Int = 64, lloydIters: Int = 1,
             materialize: Boolean = true): DataFrame = {
    require(dim % mSub == 0, s"dim $dim must divide into $mSub subspaces")
    val subDim = dim / mSub
    val base = corpus.select(idCol.as("id"), vecCol.as("vec"))
    val qBase = queries.select(qIdCol.as("qid"), qVecCol.as("qvec"))
    def subsOf(df: DataFrame, idName: String, vecName: String) =
      df.select(col(idName), explode(array((0 until mSub).map(s =>
          struct(lit(s).as("sub"),
            slice(col(vecName), s * subDim + 1, subDim).as("sv"))): _*))
        .as("u"))
        .select(col(idName), col("u.sub").as("sub"), col("u.sv").as("sv"))
    val cSubs0 = subsOf(base, "id", "vec")
    val cSubs = if (materialize) cSubs0.persist() else cSubs0
    // dot-assembled L2²: both engines produce the identical double
    def l2sq(a: Column, b: Column): Column =
      dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
    val seed = cSubs.filter(col("id") < nCodes)
      .select(col("sub"), col("id").cast("int").as("code"),
        col("sv").as("cv"))
    val wAsg = Window.partitionBy(col("id"), col("sub"))
      .orderBy(col("__d").asc, col("code"))
    def assign(books: DataFrame): DataFrame =
      cSubs.join(broadcast(books), "sub")
        .withColumn("__d", l2sq(col("sv"), col("cv")))
        .withColumn("__cr", row_number().over(wAsg))
        .filter(col("__cr") === 1)
    val books = (0 until lloydIters).foldLeft(seed) { (cb, _) =>
      assign(cb)
        .select(col("sub"), col("code"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("sub"), col("code"),
          transform(col("pm"), s => round(s.getField("m"), 6)).as("cv"))
    }
    val enc0 = assign(books).select(col("id"), col("sub"), col("code"))
    val enc = if (materialize) enc0.persist() else enc0
    val qTab = subsOf(qBase, "qid", "qvec")
      .join(broadcast(books), "sub")
      .select(col("qid"), col("sub"), col("code"),
        l2sq(col("sv"), col("cv")).cast("decimal(28,10)").as("d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adcd").asc, col("corpus_id").asc)
    enc.join(broadcast(qTab), Seq("sub", "code"))
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid").as("query_id"), col("id").as("corpus_id"))
      .agg(sum(col("d")).as("adcd"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"),
        col("adcd").cast("double").as("adc"), col("rank"))
  }

  /** IVF-PQ ANN — the [[ivfTopK]] × [[pqTopK]] composition that serves
    * billion-vector corpora (Jégou et al. 2011 §V; the FAISS `IVFx,PQy`
    * index): a coarse quantizer routes every vector to its nearest
    * centroid (cosine, the [[lloydCentroids]] trainer), the RESIDUAL
    * vector − centroid is PQ-encoded per subspace, and a query probes
    * only its `nProbe` nearest lists, scoring candidates by ADC against
    * per-(query, probed-centroid) residual distance tables. Coarse
    * routing bounds the candidates; residual PQ bounds the bytes — a
    * corpus vector costs `mSub` codes + one centroid id at rest.
    *
    * Same determinism armor as [[pqTopK]]: 6dp-rounded centroids and
    * codebooks, dot-assembled subspace L2, DECIMAL-snapshotted ADC
    * terms.
    *
    * Output: (query_id, corpus_id, adc, rank), rank ≤ k per query by
    * ascending ADC over the probed lists.
    */
  def ivfPqTopK(corpus: DataFrame, idCol: Column, vecCol: Column,
                queries: DataFrame, qIdCol: Column, qVecCol: Column,
                k: Int = 10, nCentroids: Int = 16, nProbe: Int = 2,
                mSub: Int = 8, nCodes: Int = 16, dim: Int = 64,
                lloydIters: Int = 1,
                materialize: Boolean = true): DataFrame = {
    require(dim % mSub == 0, s"dim $dim must divide into $mSub subspaces")
    val subDim = dim / mSub
    val base = corpus.select(idCol.as("id"), vecCol.as("vec"))
    val qBase = queries.select(qIdCol.as("qid"), qVecCol.as("qvec"))
    val cents = lloydCentroids(base, nCentroids, lloydIters)
    val wAsg = Window.partitionBy(col("id"))
      .orderBy(col("__sim").desc, col("cid"))
    // coarse routing + residuals
    val resid0 = base.crossJoin(broadcast(cents))
      .withColumn("__sim", cosine(col("vec"), col("cvec")))
      .withColumn("__cr", row_number().over(wAsg))
      .filter(col("__cr") === 1)
      .select(col("id"), col("cid"),
        zip_with(col("vec"), col("cvec"), (x, c) => x - c).as("rvec"))
    val resid = if (materialize) resid0.persist() else resid0
    def subsOf(df: DataFrame, vecName: String, extra: Seq[String]) =
      df.select((extra.map(col) :+
        explode(array((0 until mSub).map(s =>
          struct(lit(s).as("sub"),
            slice(col(vecName), s * subDim + 1, subDim).as("sv"))): _*))
          .as("u")): _*)
        .select((extra.map(col) :+ col("u.sub").as("sub") :+
          col("u.sv").as("sv")): _*)
    def l2sq(a: Column, b: Column): Column =
      dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)
    // residual PQ codebooks (trained corpus-wide, the standard shared-
    // codebook IVFPQ variant): seeds = residuals of the smallest ids
    val rSubs = subsOf(resid, "rvec", Seq("id"))
    val seed = rSubs.filter(col("id") < nCodes)
      .select(col("sub"), col("id").cast("int").as("code"),
        col("sv").as("cv"))
    val wCode = Window.partitionBy(col("id"), col("sub"))
      .orderBy(col("__d").asc, col("code"))
    def assignCodes(books: DataFrame): DataFrame =
      rSubs.join(broadcast(books), "sub")
        .withColumn("__d", l2sq(col("sv"), col("cv")))
        .withColumn("__cr", row_number().over(wCode))
        .filter(col("__cr") === 1)
    val books = (0 until lloydIters).foldLeft(seed) { (cb, _) =>
      assignCodes(cb)
        .select(col("sub"), col("code"),
          posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("sub"), col("code"),
          transform(col("pm"), s => round(s.getField("m"), 6)).as("cv"))
    }
    val enc0 = assignCodes(books)
      .join(resid.select(col("id"), col("cid")), "id")
      .select(col("id"), col("cid"), col("sub"), col("code"))
    val enc = if (materialize) enc0.persist() else enc0
    // query probes: nProbe nearest centroids; per probed list the query
    // residual (qvec − centroid) drives that list's distance table
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("__sim").desc, col("cid"))
    val qProbes = qBase.crossJoin(broadcast(cents))
      .withColumn("__sim", cosine(col("qvec"), col("cvec")))
      .withColumn("__cr", row_number().over(wProbe))
      .filter(col("__cr") <= nProbe)
      .select(col("qid"), col("cid"),
        zip_with(col("qvec"), col("cvec"), (x, c) => x - c).as("qres"))
    val qTab = subsOf(qProbes, "qres", Seq("qid", "cid"))
      .join(broadcast(books), "sub")
      .select(col("qid"), col("cid"), col("sub"), col("code"),
        l2sq(col("sv"), col("cv")).cast("decimal(28,10)").as("d"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adcd").asc, col("corpus_id").asc)
    enc.join(broadcast(qTab), Seq("cid", "sub", "code"))
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid").as("query_id"), col("id").as("corpus_id"))
      .agg(sum(col("d")).as("adcd"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"),
        col("adcd").cast("double").as("adc"), col("rank"))
  }

  /** `lshTopK` with band width scaled to the measured corpus size (one
    * count job — metadata-scale — against a quadratic within-bucket blowup
    * at fixed width). The declared benchmark query pins `bits` instead so
    * its oracle replays deterministically; use this form on corpora of
    * unknown size.
    */
  def lshTopKAuto(corpus: DataFrame, idCol: Column, vecCol: Column,
                  k: Int = 10, bands: Int = 8, dim: Int = 64,
                  targetPerBucket: Long = 64): DataFrame = {
    val n = corpus.count()
    val bandBits = adaptiveBandBits(n, targetPerBucket)
    lshTopK(corpus, idCol, vecCol, k, bits = bands * bandBits, bands, dim)
  }

  /** [[ivfTopK]] with the centroid count scaled to the measured corpus
    * (one count job): `nCentroids ≈ sqrt(n)` — the standard IVF sizing
    * rule (per-list occupancy ≈ sqrt(n), balancing assignment cost
    * n·nCentroids against probe cost nProbe·n/nCentroids) — clamped to
    * [4, maxCentroids]. The declared benchmark query pins `nCentroids`
    * so its oracle replays deterministically; use this form on corpora
    * of unknown size (a fixed 16 on a 10^9-vector corpus would make each
    * inverted list a 60M-vector scan).
    */
  def ivfTopKAuto(corpus: DataFrame, idCol: Column, vecCol: Column,
                  k: Int = 10, nProbe: Int = 2, lloydIters: Int = 1,
                  maxCentroids: Int = 65536): DataFrame = {
    val n = corpus.count()
    val nc = math.min(math.max(math.sqrt(n.toDouble).toInt, 4), maxCentroids)
    ivfTopK(corpus, idCol, vecCol, k, nCentroids = nc, nProbe, lloydIters)
  }

  /** ANN index quality evaluation: recall@k of an approximate top-k result
    * against the exact one, per query — the measurement loop every
    * production ANN deployment runs before trusting an index (tune
    * bits/bands/nprobe until sampled recall clears the bar, THEN point the
    * full query load at it). Takes the two result frames (columns
    * `query_id, corpus_id, rank`) rather than recomputing them, so it
    * composes with any exact/approx pair ([[bruteForceTopK]] vs
    * [[lshTopK]]/[[ivfTopK]]) and the exact side can be restricted to a
    * query SAMPLE — at corpus scale nobody brute-forces every query; the
    * sampled estimate is the operator's contract.
    *
    * Scale: two (query_id, corpus_id) equi-joins over frames bounded by
    * k rows per sampled query — negligible next to the searches themselves.
    *
    * Output: (query_id, n_exact, n_hits, recall), macro-averageable.
    */
  def annRecall(exact: DataFrame, approx: DataFrame, k: Int,
                materialize: Boolean = true): DataFrame = {
    // the exact side feeds BOTH the hit join and the denominator agg —
    // persist it (k rows per sampled query — tiny) or the expensive
    // brute-force search underneath replays once per consumer
    val e0 = exact.filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"))
    val e = if (materialize) e0.persist() else e0
    val a = approx.filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"))
    val hits = e.join(a, Seq("query_id", "corpus_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    e.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .na.fill(0L, Seq("n_hits"))
      .withColumn("recall", round(col("n_hits") / col("n_exact"), 4))
  }

  /** Symmetric per-vector int8 scalar quantization — the storage/transfer
    * compression step of a vector pipeline (4x smaller than float32, 8x
    * smaller than the double working form; dequantize ≈ q * scale). Each
    * vector is scaled by its own max-|x| so the full int8 range is used:
    * `q_i = floor(x_i * 127 / amax + 0.5)` ∈ [-127, 127], `scale =
    * amax / 127`. The rounding is spelled floor(v + 0.5) — not round() —
    * because half-up-on-doubles is the one form every engine executes
    * identically (banker's vs away-from-zero round() ties differ); with
    * identical IEEE inputs the quantized codes replay bit-for-bit in an
    * external SQL oracle. An all-zero vector quantizes to zeros with
    * scale 0.
    *
    * Pure per-row codegen'd expressions — no shuffle, no UDF; runs at
    * scan speed on any corpus size.
    *
    * Output: (vec_id, scale, qvec array<bigint>).
    */
  def quantizeInt8(df: DataFrame, idCol: Column, vecCol: Column): DataFrame = {
    val amax = array_max(transform(vecCol, x => abs(x)))
    df.select(idCol.as("vec_id"), amax.as("__amax"), vecCol.as("__v"))
      .select(col("vec_id"),
        (col("__amax") / 127.0d).as("scale"),
        when(col("__amax") === 0,
            transform(col("__v"), _ => lit(0L)))
          .otherwise(transform(col("__v"),
            x => floor(x * 127.0d / col("__amax") + 0.5d)))
          .as("qvec"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009): combine any number of
    * per-query rankings — BM25, dense ANN, quantized ANN, a recency
    * signal — into one, scoring each (query, doc) by
    * `Σ_lists 1/(c + rank)`. Rankings only contribute where the doc
    * appears, so the operator needs no score normalization across
    * heterogeneous signals (the reason RRF is the default hybrid-search
    * fuser).
    *
    * Each input is (query_id, id, rank); per-list contributions snapshot
    * to DECIMAL(18,10) before the sum (order-free cross-engine — the
    * engine-wide rule). One union + one (query, doc) aggregation + one
    * per-query rank window; k-bounded inputs keep every shuffle tiny.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10, c: Int = 60)
      : DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contrib = rankings.map(r =>
      r.select(col("query_id"), col("id"),
        round(lit(1.0) / (lit(c.toDouble) + col("rank").cast("double")), 10)
          .cast("decimal(18,10)").as("__c")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("id"))
    contrib.groupBy(col("query_id"), col("id"))
      .agg(count(lit(1)).as("n_lists"),
        sum(col("__c")).cast("double").as("rrf_score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Top-k retrieval over [[quantizeInt8]] codes — the memory-optimized
    * search path (int8 storage is 4× denser than float32, so 4× more of
    * the corpus fits in executor memory / page cache at 100 TB). The
    * inner product runs entirely in INTEGER space (`Σ qc·cc`, exact and
    * order-free in any engine — unlike a float dot product there is no
    * summation-order drift to manage); the two dequantization scales
    * multiply back in at the end: `score ≈ dot_int · cscale · qscale`.
    *
    * Same exact-baseline shape as [[bruteForceTopK]] (corpus streams
    * past the broadcast query batch — by-design bounded nested loop);
    * compose with the LSH/IVF bucketing for the candidate-pruned form.
    */
  def int8TopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
               queries: DataFrame, queryId: Column, queryVec: Column,
               k: Int = 10): DataFrame = {
    val c = quantizeInt8(corpus.select(corpusId.as("id"), corpusVec.as("v")),
        col("id"), col("v"))
      .select(col("vec_id").as("corpus_id"), col("scale").as("__cs"),
        col("qvec").as("__cq"))
    val q = quantizeInt8(queries.select(queryId.as("id"), queryVec.as("v")),
        col("id"), col("v"))
      .select(col("vec_id").as("query_id"), col("scale").as("__qs"),
        col("qvec").as("__qq"))
    val dotInt = aggregate(
      zip_with(col("__cq"), col("__qq"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"), dotInt.as("dot_int"),
        col("__cs"), col("__qs"))
      .withColumn("score",
        col("dot_int").cast("double") * col("__cs") * col("__qs"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), col("dot_int"),
        round(col("score"), 4).as("score"), col("rank"))
  }

  /** Two-stage binary-quantized retrieval: a 64-bit sign signature
    * (1 bit/plane from the deterministic [[lshSignature]] family — a 64×
    * memory cut vs float32×64 vectors) ranks the corpus by HAMMING
    * distance to each query's signature, and only the `shortlist`
    * closest candidates are reranked with the exact float cosine. The
    * standard memory/recall trade for serving at corpus sizes where
    * float vectors don't fit (binary stage = one `bit_count(xor)` per
    * pair — pure codegen'd long ops).
    *
    * Shape: stage 1 is [[bruteForceTopK]]'s by-design bounded nested
    * loop (corpus signatures stream past the BROADCAST query batch),
    * but over 8-byte longs instead of 512-byte vectors; stage 2 joins
    * the shortlist back to the float vectors by EQUI-join on both ids —
    * the expensive cosine runs on `|queries| × shortlist` rows only.
    *
    * Output: (query_id, corpus_id, hamming, cos, rank) — rank by exact
    * cosine within the shortlist, ties by corpus_id.
    */
  def binaryRerankTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                       queries: DataFrame, queryId: Column, queryVec: Column,
                       shortlist: Int = 50, k: Int = 10,
                       dim: Int = 64): DataFrame = {
    require(shortlist >= k, "shortlist must cover the final k")
    val c = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cvec"),
      lshSignature(corpusVec, bits = 64, dim = dim).as("__csig"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qvec"),
      lshSignature(queryVec, bits = 64, dim = dim).as("__qsig"))
    val wHam = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("corpus_id").asc)
    val short = c.drop("cvec")
      .join(broadcast(q.drop("qvec")),
        col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"),
        bit_count(col("__csig").bitwiseXOR(col("__qsig"))).cast("long")
          .as("hamming"))
      .withColumn("__hr", row_number().over(wHam))
      .filter(col("__hr") <= shortlist)
      .select(col("query_id"), col("corpus_id"), col("hamming"))
    val wCos = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    short
      .join(c.select(col("corpus_id"), col("cvec")), "corpus_id")
      .join(q.select(col("query_id"), col("qvec")), "query_id")
      .select(col("query_id"), col("corpus_id"), col("hamming"),
        cosine(col("cvec"), col("qvec")).as("cos"))
      .withColumn("rank", row_number().over(wCos).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("cos", round(col("cos"), 4))
  }

  /** Prototype-based data pruning (Sorscher et al. 2022, "Beyond neural
    * scaling laws"): cluster the embedding space ([[kmeansClusters]] —
    * deterministic seeds + one Lloyd pass, 6dp-snapshotted means), score
    * each example by its cosine to the assigned centroid (high = easy /
    * prototypical, low = hard), and keep the `keepNum/keepDen` HARDEST
    * fraction of each cluster — the abundant-data regime's pruning rule
    * (per-cluster, so no single dense cluster monopolizes the budget).
    *
    * The keep quota is exact integer arithmetic: ceil(n·num/den) per
    * cluster, rank by (4dp sim ASC, vec_id) — fully engine-replayable.
    *
    * Shape: the assignment is the corpus × broadcast(k centroids)
    * bounded pass (q63/q188's pattern); ranking is one window keyed by
    * cluster_id — distributed across clusters, no global stage.
    *
    * Output: (vec_id, cluster_id, sim, rank_in_cluster, keep).
    */
  def prototypePrune(df: DataFrame, idCol: Column, vecCol: Column,
                     k: Int = 16, keepNum: Int = 1, keepDen: Int = 2)
      : DataFrame = {
    require(keepNum >= 0 && keepDen > 0 && keepNum <= keepDen,
      "keep fraction must be a rational in [0, 1]")
    val asg = kmeansClusters(df, idCol, vecCol, k)
    val wRank = Window.partitionBy(col("cluster_id"))
      .orderBy(col("sim").asc, col("vec_id").asc)
    val wSize = Window.partitionBy(col("cluster_id"))
    asg
      .withColumn("rank_in_cluster", row_number().over(wRank).cast("long"))
      .withColumn("__n", count(lit(1)).over(wSize))
      .select(col("vec_id"), col("cluster_id"), col("sim"),
        col("rank_in_cluster"),
        // integer ceil: Spark's `/` on longs is a double divide
        (col("rank_in_cluster") <=
          expr(s"(__n * $keepNum + ${keepDen - 1}) DIV $keepDen"))
          .as("keep"))
  }
}
