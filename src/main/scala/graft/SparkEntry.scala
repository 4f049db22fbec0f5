package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.F
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator family from SURVEY §2 (or a
  * training-data-pipeline operator), expressed Spark-first; `oracleSql` holds
  * the semantically-identical DuckDB SQL the driver replays over the same
  * parquet tables.
  *
  * Cross-engine determinism rules used throughout (see SURVEY §"What's hard",
  * exact money math):
  * - money/double aggregation goes through DECIMAL casts → order-independent,
  *   bit-exact sums; the FINAL projection casts those exact decimals to DOUBLE
  *   (or BIGINT for counts) on both sides — the driver hashes typed values from
  *   each engine's native output path, and DECIMAL/HUGEINT representations
  *   diverge between Spark parquet and DuckDB even when values are equal.
  *   decimal→double is correctly rounded in both engines, so the doubles match
  *   bit-for-bit.
  * - derived doubles are computed with the *same* operation order in both
  *   engines and rounded (4 decimals) before output.
  * - integer outputs are BIGINT on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q12_star_join")(spark, "/root/testdata/sf0.001")

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Synthetic page fixture for the link ops (q208/q209): one HTML page
    * per document whose anchors exercise every href resolution branch.
    * The DuckDB mirror is [[linkFixtureCtes]].
    */
  /** q224/q232's shared Delta table: documents mart built once per
    * fixture dir (q183's marker protocol), then one DV merge-on-read
    * DELETE of doc_id % 10 = 3 — history is exactly v0 (MERGE) and
    * v1 (DELETE). Returns the table root.
    */
  private def q224DeltaTable(s: SparkSession, d: String): String =
    // q232 pins version numbers (v0=MERGE, v1=DELETE) — Fixtures.buildOnce
    // wipes a stale root before rebuilding, never builds on top of one
    Fixtures.buildOnce(d, "q224", "dv-v1") { root =>
      graft.sources.Sinks.upsertParquet(s, root,
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          col("n_chars")), keys = Seq("doc_id"))
      graft.sources.DeletionVectors.deleteDeltaWhere(s, root,
        pmod(col("doc_id"), lit(10)) === 3)
    }

  /** q183/q192's shared clustered Delta table: per-order sums upserted
    * with clusterBy(l_orderkey), built once per fixture dir. The queries
    * under test are the stats-pruned READ (q183) and the metadata-only
    * COUNT (q192) — rebuilding the clustered table every run would bench
    * the (linear, sort-bound) write path under the read labels.
    */
  private def q183DeltaTable(s: SparkSession, d: String): String =
    Fixtures.buildOnce(d, "q183", "clusterBy-v1") { root =>
      val sums = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          count(lit(1)).as("n_lines"))
      graft.sources.Sinks.upsertParquet(s, root, sums,
        keys = Seq("l_orderkey"), clusterBy = Seq("l_orderkey"))
    }

  private def linkFixture(s: SparkSession, d: String): DataFrame = {
    def m(n: Int): Column = pmod(col("doc_id"), lit(n)).cast("string")
    Tables.documents(s, d).select(col("doc_id"),
      concat(lit("https://h"), m(5), lit(".example.com/dir/page"), m(7))
        .as("url"),
      concat(
        lit("<html><body><a href=\"https://ext"), m(3),
        lit(".org/x\">e</a><a href=\"/root/p"), m(4),
        lit("\">r</a><a class=\"z\" href=\"sub/page"), m(2),
        lit("\">s</a><a href=\"//cdn.example"), m(3),
        lit(".net/a\">c</a><a href='./q"), m(2),
        lit("' >q</a><a href=\"mailto:x@y.z\">m</a>" +
          "<a href=\"#frag\">f</a></body></html>")).as("html"))
  }

  /** The link-fixture DOMAIN edge list, extraction scan run ONCE: q209/
    * q214/q220/q225 each feed the edges to a fixed-point operator AND
    * derive the domain-name lookup from them — without the checkpoint the
    * corpus-wide link-extraction regex scan executed twice per query
    * (round-9 verdict "What's missing" #2). The frame is a handful of
    * domain pairs, so the eager localCheckpoint is one tiny job; every
    * consumer then reads the materialized rows (plan shows a single
    * ExistingRDD scan — pinned by LinkGraphScanSpec).
    */
  private def domainEdges(s: SparkSession, d: String): DataFrame = {
    val links = TextAnalysis.extractLinks(linkFixture(s, d),
      col("doc_id"), col("url"), col("html"))
    TextAnalysis.linkGraphEdges(links, col("url"), col("link"))
      .localCheckpoint(true)
  }

  /** Integer-keyed edges + (domain, id) name lookup from one checkpointed
    * domain-edge frame.
    */
  private def edgesAndNames(edges: DataFrame): (DataFrame, DataFrame) = {
    val idEdges = edges.select(F.hash64(col("src_domain")).as("src"),
      F.hash64(col("dst_domain")).as("dst"))
    val names = edges.select(col("src_domain").as("domain"))
      .union(edges.select(col("dst_domain"))).distinct()
      .select(col("domain"), F.hash64(col("domain")).as("id"))
    (idEdges, names)
  }

  /** BENCH-TIME substitutions (round-10 directive 8): a key here is
    * TIMED as the named substitute query instead of its own declared
    * form. Used for queries whose declared form intentionally carries a
    * small-scale exhaustive component — the sf0.01 oracle gate keeps
    * checking the exhaustive form, the benchmark pays the
    * production-sampled cost a deployment actually would, and the
    * substitute is itself a declared, oracle-anchored query. Bench
    * emits a `bench_form` marker naming every substitution, so the
    * artifact is self-describing.
    */
  def benchForm: Map[String, String] = Map(
    // exhaustive pair-recall ground truth is contractually sample-scale
    // in production; the benched form keeps the corpus-scale LSH side
    "q179_dedup_recall" -> "q243_dedup_recall_sampled_exact")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- A1: hash group-by with SUM/COUNT (155 GROUP BYs in reference) ----
    "q01_agg_sum" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec2(col("l_extendedprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- A2: conditional (pivot-style) aggregation ----
    "q02_agg_conditional" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_linestatus") === "O", dec2(col("l_quantity"))))
            .cast("double").as("qty_open"),
          sum(when(col("l_linestatus") === "F", dec2(col("l_quantity"))))
            .cast("double").as("qty_filled"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- A3: ANY_VALUE for functionally-dependent columns ----
    "q03_agg_anyvalue" -> ((s, d) => {
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"))
        .agg(any_value(col("c_name")).as("c_name"),
          count(lit(1)).as("n_orders"))
    }),

    // ---- A5: DISTINCT dedup-aggregation ----
    "q04_distinct" -> ((s, d) =>
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus").distinct()),

    // ---- A7: scalar subquery threshold (no driver collect: broadcast join) ----
    "q05_scalar_subquery" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val thresh = o.agg((max(col("o_totalprice")) * 0.5).as("__t"))
      o.join(broadcast(thresh), col("o_totalprice") >= col("__t")).drop("__t")
    }),

    // ---- A8: weighted allocation with exact remainder repair ----
    "q06_alloc_weighted" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
      // (l_orderkey, l_linenumber) is NOT unique in the data — tie-break on
      // l_extendedprice so the remainder row is deterministic cross-engine.
      Allocation.weightedAllocate(li,
          Seq(col("l_orderkey")), Seq(col("l_linenumber"), col("l_extendedprice")),
          col("o_totalprice"), col("l_extendedprice"), "alloc", 2)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("alloc").cast("double").as("alloc"))
    }),

    // ---- A9: integer div/mod equal split across exploded slots ----
    "q07_alloc_divmod" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int").as("n"))
      o.select(col("o_orderkey"), col("cents"), col("n"),
          posexplode(sequence(lit(0), col("n") - 1)).as(Seq("pos", "__v")))
        .select(col("o_orderkey"), col("pos").cast("long").as("pos"),
          Allocation.divModAllocate(col("cents"), col("n"), col("pos")).as("alloc"))
    }),

    // ---- A10/W5: grouped exact percentile (PERCENTILE_CONT) ----
    "q08_percentile" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)"), 4)
          .as("median_price"),
          count(lit(1)).as("n"))
    }),

    // ---- W1: QUALIFY-style top-1 per key dedup ----
    "q09_qualify_top1" -> ((s, d) => {
      F.qualifyTopN(
        Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_orderdate"),
        Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
    }),

    // ---- W3: LEAD — gap to next order per customer ----
    "q10_lead_gap" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("ymd"),
          lead(to_date(col("o_orderdate")), 1).over(w).as("next_ymd"))
        .withColumn("gap_days",
          datediff(col("next_ymd"), col("ymd")).cast("long"))
    }),

    // ---- W4: aggregate-over-window ratio (exact decimal denominator) ----
    "q11_window_ratio" -> ((s, d) => {
      val w = Window.partitionBy(col("l_orderkey"))
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_extendedprice"),
          sum(dec2(col("l_extendedprice"))).over(w).as("order_total"))
        .withColumn("price_ratio",
          round(col("l_extendedprice") / col("order_total").cast("double"), 4))
        .withColumn("order_total", col("order_total").cast("double"))
    }),

    // ---- J1/J2: star-schema broadcast join + re-aggregation (flagship) ----
    "q12_star_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // ---- J4: 30-day rolling sum — window rangeBetween rewrite ----
    "q13_rolling_30d" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("ymd"))
        .agg(sum(dec2(col("o_totalprice"))).cast("decimal(38,2)").as("day_total"))
      Joins.rollingSumByDays(daily, Seq(col("o_custkey")), col("ymd"),
          col("day_total"), 30, "rolling_30d")
        .withColumn("rolling_30d", col("rolling_30d").cast("double"))
        .withColumn("day_total", col("day_total").cast("double"))
    }),

    // ---- J5: band join with LEAD-built bands ----
    "q14_band_join" -> ((s, d) => {
      val bands0 = F.inlineDim(s, Seq("band_name", "lo"),
        Seq(Seq("S", 1L), Seq("M", 11L), Seq("L", 26L), Seq("XL", 41L)))
      val bands = Joins.leadBands(bands0, Nil, col("lo"), "hi")
      Joins.bandJoin(Tables.lineitem(s, d), bands, col("l_quantity"),
          col("lo"), col("hi"))
        .groupBy(col("band_name"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("l_quantity"))).cast("double").as("sum_qty"))
    }),

    // ---- J7: anti join — customers with no orders ----
    "q15_anti_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // ---- J8: semi over array — membership in split() array, no join ----
    "q16_array_semi" -> ((s, d) => {
      Tables.part(s, d)
        .filter(array_contains(split(col("p_name"), " "), "widget"))
        .select("p_partkey", "p_name")
    }),

    // ---- J9: CROSS JOIN UNNEST(SPLIT()) — explode + re-aggregate ----
    "q17_explode_words" -> ((s, d) => {
      Tables.part(s, d)
        .select(explode(split(col("p_name"), " ")).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
    }),

    // ---- §2.7: UNION ALL of aligned branches + re-aggregation ----
    "q18_union_reagg" -> ((s, d) => {
      val a = Tables.orders(s, d).select(
        to_date(col("o_orderdate")).as("ymd"),
        dec2(col("o_totalprice")).as("amt"), lit("orders").as("src"))
      val b = Tables.lineitem(s, d).select(
        to_date(col("l_shipdate")).as("ymd"),
        dec2(col("l_extendedprice")).as("amt"), lit("lineitem").as("src"))
      a.unionByName(b)
        .groupBy(date_trunc("month", col("ymd")).cast("date").as("month"), col("src"))
        .agg(sum(col("amt")).cast("double").as("total"),
          count(lit(1)).as("n"))
    }),

    // ---- P2: enum-recode CASE ladder ----
    "q19_enum_recode" -> ((s, d) => {
      val pri = F.recode(col("o_orderpriority"), Seq(
        "1-URGENT" -> 1, "2-HIGH" -> 2, "3-MEDIUM" -> 3,
        "4-NOT SPECIFIED" -> 4, "5-LOW" -> 5), -1)
      val status = F.recode(col("o_orderstatus"), Seq(
        "O" -> "open", "F" -> "filled", "P" -> "pending"), "unknown")
      Tables.orders(s, d)
        .select(col("o_orderkey"), pri.cast("long").as("priority_rank"),
          status.as("status_label"))
    }),

    // ---- P7 + string functions: regex filter / extract / replace ----
    "q20_regex" -> ((s, d) => {
      Tables.customer(s, d)
        .filter(col("c_name").rlike("^Customer#0*[0-9]*[02468]$"))
        .select(col("c_custkey"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).as("cust_num"),
          regexp_replace(col("c_name"), "[0-9]", "").as("name_stripped"),
          concat_ws("-", col("c_mktsegment"),
            substring(col("c_name"), -3, 3)).as("seg_key"))
    }),

    // ---- §2.8 date/time functions ----
    "q21_date_funcs" -> ((s, d) => {
      val ymd = to_date(col("o_orderdate"))
      Tables.orders(s, d).select(
        col("o_orderkey"),
        ymd.as("ymd"),
        date_trunc("month", ymd).cast("date").as("month_start"),
        date_format(ymd, "yyyy-MM").as("ym"),
        (dayofweek(ymd) - 1).cast("long").as("dow"),
        date_add(ymd, 7).as("plus7"),
        add_months(ymd, 1).as("plus1m"),
        last_day(ymd).as("month_end"),
        year(ymd).cast("long").as("yr"))
    }),

    // ---- date scaffold: GENERATE_SERIES + explode + zero-filled left join ----
    "q22_date_scaffold" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val bounds = o.agg(min(to_date(col("o_orderdate"))).as("lo"),
        max(to_date(col("o_orderdate"))).as("hi"))
      val days = bounds.select(explode(sequence(col("lo"), col("hi"))).as("ymd"))
      val daily = o.groupBy(to_date(col("o_orderdate")).as("ymd"))
        .agg(count(lit(1)).as("n"))
      days.join(daily, Seq("ymd"), "left")
        .select(col("ymd"), coalesce(col("n"), lit(0L)).as("n_orders"))
    }),

    // ---- JSON extraction from an opaque payload column ----
    "q23_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
    }),

    // ---- UNPIVOT / melt with metric ordering ----
    "q24_unpivot" -> ((s, d) => {
      val m = Tables.customer(s, d)
        .groupBy(col("c_mktsegment"))
        .agg(sum(dec2(col("c_acctbal"))).cast("double").as("sum_bal"),
          count(lit(1)).cast("double").as("n"))
      m.unpivot(Array(col("c_mktsegment")),
        Array(col("sum_bal"), col("n")), "metric", "value")
    }),

    // ---- D2-D4: MERGE upsert with per-column strategy DSL ----
    "q25_upsert" -> ((s, d) => {
      val base = Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderstatus"),
        dec2(col("o_totalprice")).as("total"),
        to_date(col("o_orderdate")).as("ymd"))
      val target = base.filter(col("o_orderkey") % 2 === 0)
      val source = base.filter(col("o_orderkey") % 3 === 0)
        .withColumn("o_orderstatus", lit("X"))
        .withColumn("total", (col("total") * 2).cast("decimal(18,2)"))
      MergeOps.upsert(target, source, Seq("o_orderkey"),
        Map("o_orderstatus" -> MergeOps.Replace,
            "total" -> MergeOps.Greatest,
            "ymd" -> MergeOps.Least))
        .withColumn("total", col("total").cast("double"))
    }),

    // ---- dedup: exact (hash group-by) ----
    "q26_dedup_exact" -> ((s, d) => {
      Dedup.exact(Tables.documents(s, d), col("text"), col("doc_id"))
    }),

    // ---- dedup: n-gram Jaccard similarity pairs (PPJoin prefix filter,
    // shingles pre-hashed to longs so every shuffle/set-op is fixed-width) ----
    "q27_ngram_jaccard" -> ((s, d) => {
      Dedup.ngramJaccardPairs(Tables.documents(s, d),
        col("doc_id"), col("text"), n = 3, threshold = 0.8,
        hashShingles = Some(Dedup.CrossEngineHash))
    }),

    // ---- dedup: MinHash+LSH candidate pairs + exact verify (scale path).
    // CrossEngineHash so the banding replays bit-for-bit in the oracle. ----
    "q28_minhash_lsh" -> ((s, d) => {
      Dedup.minHashLshPairs(Tables.documents(s, d),
        col("doc_id"), col("text"), n = 3, k = 32, bands = 8,
        verifyThreshold = 0.7, fam = Dedup.CrossEngineHash)
    }),

    // ---- dedup: 64-bit SimHash signatures (cross-engine hash family) ----
    "q29_simhash" -> ((s, d) => {
      Dedup.simHash(Tables.documents(s, d), col("doc_id"), col("text"),
        fam = Dedup.CrossEngineHash)
    }),

    // ---- dedup: end-to-end clustering — q28's LSH pairs → large-star/
    // small-star connected components → one survivor per cluster. The
    // keep-one shape a corpus dedup actually ships (pairs alone
    // under-delete on transitive chains). ----
    "q152_dedup_clusters" -> ((s, d) => {
      Dedup.dedupClusters(Tables.documents(s, d), col("doc_id"),
        col("text"), n = 3, k = 32, bands = 8, verifyThreshold = 0.7,
        fam = Dedup.CrossEngineHash)
    }),

    // ---- dedup: incremental batch admission — even doc_ids play the
    // stored corpus, odd ones the incoming batch; batch bands probe the
    // corpus band index (no corpus self-join) ----
    "q155_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalDedup(
        docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        docs.filter(pmod(col("doc_id"), lit(2)) === 1),
        col("doc_id"), col("text"), n = 3, k = 32, bands = 8,
        verifyThreshold = 0.7, fam = Dedup.CrossEngineHash)
    }),

    // ---- attribution DAG chain: as-of join inside the model registry ----
    "q68_attribution_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("attribution_daily", s)
    }),

    // ---- data profile: per-column exact counts/nulls/distincts ----
    "q67_profile" -> ((s, d) => {
      F.profile(Tables.customer(s, d),
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
    }),

    // ---- big-big range join: q38's temporal semantics through the grid-
    // bucketed equi-join (no broadcast requirement on either side) ----
    "q66_bucketed_range_join" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("ymd"),
        dec2(col("o_totalprice")).as("total"))
      val rel = o.select(date_trunc("quarter", col("ymd")).cast("date").as("q_start"))
        .distinct()
        .withColumn("q_end", date_sub(add_months(col("q_start"), 3), 1))
        .withColumn("q_label", concat(year(col("q_start")).cast("string"),
          lit("-Q"), quarter(col("q_start")).cast("string")))
      Joins.bucketedRangeJoin(
          o.withColumn("__d", unix_date(col("ymd"))), col("__d"),
          rel.withColumn("__lo", unix_date(col("q_start")))
            .withColumn("__hi", unix_date(col("q_end"))),
          col("__lo"), col("__hi"), bucketWidth = 30)
        .groupBy(col("q_label"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("total")).cast("double").as("total"))
    }),

    // ---- as-of join: purchase events matched to the latest prior-or-equal
    // pageview per user. Spark has no ASOF JOIN; Joins.asOfJoin is the
    // union+window scale rewrite, verified against DuckDB's NATIVE
    // ASOF LEFT JOIN. ----
    "q60_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val pageviews = e.filter(col("event_type") === "pageview")
        .select(col("user_id"), col("ts"), col("value").as("ref_value"))
      Joins.asOfJoin(purchases, pageviews, Seq("user_id"), "ts", "ts",
        Seq("ref_value"))
    }),

    // ---- J6/W5 in the DAG: per-part IQR outlier days over daily stock ----
    "q58_stock_outliers" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("stock_outliers", s)
    }),

    // ---- corpus DAG chain: cleaned corpus → per-language token stats ----
    "q65_corpus_lang_stats" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("corpus_lang_stats", s)
    }),

    // ---- corpus cleaning: quality gate → exact dedup of survivors ----
    "q59_corpus_clean" -> ((s, d) => {
      TextAnalysis.cleanCorpus(Tables.documents(s, d),
        col("doc_id"), col("text"))
    }),

    // ---- dedup: simhash-banded near-dup retrieval (hamming <= 3).
    // sigBits = 60: CrossEngineHash values occupy bits 0-59, so banding
    // 4×15-bit slices keeps every band equally selective (a 64-bit split
    // would leave band 3 with 4 dead bits = 16× the collision rate).
    // maxBucket = 64 bounds hot-bucket candidates; the oracle mirrors it. ----
    "q57_simhash_neardup" -> ((s, d) => {
      Dedup.simHashNearDupPairs(Tables.documents(s, d),
        col("doc_id"), col("text"), fam = Dedup.CrossEngineHash,
        sigBits = 60, maxBucket = 64)
    }),

    // ---- text: language-ID heuristic, confusion matrix vs labels ----
    "q30_lang_id" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.langIdPredict(col("text")).as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- text: quality scoring ----
    "q31_text_quality" -> ((s, d) => {
      val q = TextAnalysis.qualityColumns(col("text"))
      Tables.documents(s, d).select(
        col("doc_id") +:
        q.head.cast("long").as("n_chars_norm") +:
        q(1).cast("long").as("n_tokens") +:
        q.drop(2): _*)
    }),

    // ---- text: token counting (whitespace + BPE-ish) ----
    "q32_token_count" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_ws_tokens"),
        TextAnalysis.tokenCountBpe(col("text")).cast("long").as("n_bpe_tokens"))
    }),

    // ---- text: document fingerprint ----
    "q33_fingerprint" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    }),

    // ---- similarity: IVF inverted-file ANN (data-adaptive scale path,
    // complements the LSH path) ----
    "q63_ann_ivf" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      Similarity.ivfTopK(e, col("vec_id"), col("vec"), k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ---- training split: deterministic cross-engine hash bucketing ----
    "q64_train_split" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"),
          F.hashSplit(col("doc_id"),
            Seq("train" -> 90, "val" -> 5, "test" -> 5)).as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
    }),

    // ---- text: top-3 TF-IDF terms per document ----
    "q61_tfidf" -> ((s, d) => {
      TextAnalysis.tfIdfTopTerms(Tables.documents(s, d),
        col("doc_id"), col("text"))
    }),

    // ---- text: order-sensitive rolling polynomial fingerprint ----
    "q62_rolling_fingerprint" -> ((s, d) => {
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.fingerprintRolling(col("text")).as("rfp"))
    }),

    // ---- similarity: exact brute-force cosine top-k ----
    "q34_ann_bruteforce" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val q = e.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
          q, col("vec_id"), col("vec"), k = 10)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ---- similarity: LSH-bucketed ANN (scale path) ----
    "q35_ann_lsh" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      Similarity.lshTopK(e, col("vec_id"), col("vec"), k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ---- similarity: multi-probe LSH ANN — each query also probes the
    // Hamming-1 neighbor buckets per band, raising recall with no extra
    // corpus-side index (Lv et al. 2007) ----
    "q185_ann_multiprobe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val q = e.filter(col("vec_id") < 20)
      Similarity.lshTopKMultiProbe(e, col("vec_id"), col("vec"),
          q, col("vec_id"), col("vec"), k = 5, probes = 2)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ---- similarity: product-quantization ANN — per-subspace codebooks,
    // corpus stored as codes, asymmetric-distance scoring (Jégou 2011);
    // ADC terms snapshot to DECIMAL so the rank order is associative ----
    "q186_ann_pq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val q = e.filter(col("vec_id") < 20)
      Similarity.pqTopK(e, col("vec_id"), col("vec"),
          q, col("vec_id"), col("vec"), k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ---- clustering: deterministic k-means assignment — the cluster
    // step topic balancing and SemDeDup-style pruning hang off (the
    // ivfTopK trainer's output as a first-class frame) ----
    "q188_kmeans_clusters" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      Similarity.kmeansClusters(e, col("vec_id"), col("vec"),
        k = 16, lloydIters = 1)
    }),

    // ---- similarity: IVF-PQ — coarse centroid routing + residual PQ
    // codes + probed-list ADC (the FAISS IVFx,PQy serving combination;
    // Jégou 2011 §V) ----
    "q189_ann_ivfpq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val q = e.filter(col("vec_id") < 20)
      Similarity.ivfPqTopK(e, col("vec_id"), col("vec"),
          q, col("vec_id"), col("vec"), k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ---- URL canonicalization + exact URL dedup: messy crawl URLs
    // (case, www, default port, trailing slash, tracking params,
    // fragments, param order) collapse to one canonical key — the
    // closed-form oracle states the expected canonical output and the
    // group structure proves the collapse ----
    "q190_url_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("HTTPS://WWW.Example"),
          pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".com:443/Path"), pmod(col("doc_id"), lit(13)).cast("string"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("/"))
            .otherwise(lit("")),
          lit("?utm_source=x&b=2&a=1"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit("#frag"))
            .otherwise(lit(""))).as("url"))
      TextAnalysis.urlDedup(docs, col("doc_id"), col("url"))
    }),

    // ---- composed web-curation pipeline: URL-canonical dedup picks one
    // doc per crawl-duplicate group, boilerplate lines are removed
    // domain-scoped over the SURVIVORS, and the Gopher gate scores the
    // cleaned text — one oracle proves the three new operators compose
    // (q169's funnel pattern over the round's web-curation surface) ----
    "q191_web_curation_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        concat(lit("HTTPS://WWW.Example"),
          pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".com:443/Path"), pmod(col("doc_id"), lit(13)).cast("string"),
          lit("?utm_source=x&b=2&a=1")).as("url"),
        concat_ws("\n", col("text"),
          concat(lit("visit "), col("source"), lit(" dot com")),
          when(pmod(col("doc_id"), lit(4)) === 0,
            lit("subscribe to our newsletter"))
            .otherwise(concat(lit("unique tail "),
              col("doc_id").cast("string")))).as("text"))
      val survivors = TextAnalysis.urlDedup(docs, col("doc_id"), col("url"))
        .filter(col("doc_id") === col("keep_id")).select("doc_id")
      val cleaned = TextAnalysis.removeBoilerplate(
        docs.join(survivors, "doc_id"), col("doc_id"), col("text"),
        col("source"), maxDocFrac = 0.5, minDocs = 3)
      TextAnalysis.gopherFilter(cleaned, col("doc_id"), col("text"),
          minWords = 20)
        .join(cleaned.select(col("doc_id"), col("n_lines"),
          col("n_removed")), "doc_id")
        .select(col("doc_id"), col("n_lines"), col("n_removed"),
          col("n_words"), col("keep"))
    }),

    // ---- metadata-only COUNT(*): q183's Delta table answers its row
    // count from the log's per-file numRecords stats — zero data files
    // opened; the oracle recomputes the same count from the raw fixture
    // (distinct order keys), proving the logged stats are the truth ----
    "q192_delta_metadata_count" -> ((s, d) => {
      val root = q183DeltaTable(s, d)
      val n = graft.sources.Sinks.deltaTableCount(s, root)
        .getOrElse(sys.error(s"stats gap in $root — metadata count " +
          "must be total or absent, never partial"))
      s.range(1).select(lit(n).as("n_rows"))
    }),

    // ---- hash-grain near-dup pairs (verdict r7 #1): the PRODUCTION
    // banding/cap/verify operator behind imageNearDupPairs, anchored at
    // (id, 64-bit signature) grain where DuckDB CAN express it —
    // signatures derive from the cross-engine md5 hash64 plus injected
    // 1-bit / 2-bit variants, so near pairs provably exist and the
    // oracle's all-pairs Hamming join states the complete answer the
    // pigeonhole banding must reproduce ----
    "q193_image_hash_neardup" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"),
        F.hash64(col("text")).as("h"))
      val hashes = base
        .select((col("doc_id") * 4).as("id"), col("h").as("phash"))
        .unionByName(base.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") * 4 + 1).as("id"),
            col("h").bitwiseXOR(expr(
              "shiftleft(cast(1 as bigint), cast(doc_id % 60 as int))"))
              .as("phash")))
        .unionByName(base.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select((col("doc_id") * 4 + 2).as("id"),
            col("h").bitwiseXOR(expr(
              "shiftleft(cast(3 as bigint), cast(doc_id % 59 as int))"))
              .as("phash")))
      // maxBucket high: no bucket caps, so banding is COMPLETE and the
      // all-pairs oracle is the exact expected output
      Multimodal.hashNearDupPairs(hashes, maxHamming = 2,
        maxBucket = 1 << 20)
    }),

    // ---- the maxHamming=0 (exact-signature) path of the same operator
    // (audio fingerprint grain): bands=1 slices the FULL 64-bit hash, so
    // the bucket key is the signature itself — the len==64 mask edge
    // case — and injected exact-dup variants must pair through the
    // DEFAULT bucket cap (each distinct signature is its own bucket) ----
    "q194_audio_hash_neardup" -> ((s, d) => {
      val base = Tables.embeddings(s, d).select(col("vec_id"),
        F.hash64(concat(lit("audio:"), col("vec_id").cast("string")))
          .as("h"))
      val hashes = base
        .select((col("vec_id") * 2).as("id"), col("h").as("phash"))
        .unionByName(base.filter(pmod(col("vec_id"), lit(7)) === 0)
          .select((col("vec_id") * 2 + 1).as("id"), col("h").as("phash")))
      Multimodal.hashNearDupPairs(hashes, maxHamming = 0)
    }),

    // ---- hash-grain dedup CLUSTERS (verdict r7 #8): pairs →
    // connected components → min-id survivor, oracle-expressible at
    // exact grain because signature equality is transitive — cluster =
    // min id per signature value, every input id labeled ----
    "q195_hash_dedup_clusters" -> ((s, d) => {
      val base = Tables.embeddings(s, d).select(col("vec_id"),
        F.hash64(concat(lit("audio:"), col("vec_id").cast("string")))
          .as("h"))
      val hashes = base
        .select((col("vec_id") * 2).as("id"), col("h").as("phash"))
        .unionByName(base.filter(pmod(col("vec_id"), lit(7)) === 0)
          .select((col("vec_id") * 2 + 1).as("id"), col("h").as("phash")))
      Multimodal.hashDedupClusters(hashes, maxHamming = 0)
    }),

    // ---- video-dedup core at frame-signature grain (verdict r7 #2):
    // frameOverlapPairs — the aggregation behind videoNearDupPairs
    // (whose MJPEG frame decode is spec-gated, like imagePHash) —
    // anchored with SQL-derivable per-video frame signatures: videos
    // share a frame iff their doc groups draw the same 1-of-97
    // signature, and the oracle's all-pairs overlap count is the
    // complete answer the banding must reproduce ----
    "q196_video_frame_overlap" -> ((s, d) => {
      val frames = Tables.documents(s, d).select(
        pmod(col("doc_id"), lit(40)).as("video_id"),
        F.hash64(concat(lit("frame:"),
          pmod(col("doc_id"), lit(97)).cast("string"))).as("phash"))
      Multimodal.frameOverlapPairs(frames, maxHamming = 2, minShared = 3,
        maxBucket = 1 << 20)
    }),

    // ---- fixed-point PageRank over a synthetic domain link graph:
    // integer (BIGINT) power iteration is exact and order-invariant at
    // any parallelism, so five Spark iterations hash-match five
    // unrolled CTE stages in DuckDB value-for-value — float PageRank
    // could never cross-engine-match (sum(double) is reduction-order-
    // dependent). Nodes 35-39 are dangling (link targets only) so the
    // uniform redistribution term is exercised, not just the join ----
    "q197_pagerank_domains" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val under35 = pmod(col("doc_id"), lit(40)) < 35
      val e1 = docs.filter(under35)
        .select(pmod(col("doc_id"), lit(40)).as("src"),
          pmod(col("doc_id") * 7 + 3, lit(40)).as("dst"))
      val e2 = docs.filter(pmod(col("doc_id"), lit(3)) === 0 && under35)
        .select(pmod(col("doc_id"), lit(40)).as("src"),
          pmod(col("doc_id") * 13 + 7, lit(40)).as("dst"))
      Graphs.pageRankFixedPoint(e1.unionByName(e2), iters = 5)
    }),

    // ---- persisted IVF serving index (build once per fixture, search
    // per run): centroids parquet + cid-bucketed inverted-list table —
    // the probed search reads only probed lists' file buckets, and the
    // answer must equal the in-memory ivfTopK (one oracle anchors both,
    // the q171 BM25 serving-index precedent) ----
    "q198_ann_ivf_serving" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val root = Fixtures.buildOnce(d, "q198", "ivf-lists-v1") { r =>
        Similarity.buildIvfIndex(s, e, col("vec_id"), col("vec"), r)
      }
      // the SERVING shape: a fixed probe batch against a growing stored
      // corpus (q189's evaluation harness) — per-query cost must not
      // scale with the corpus; full corpus-as-queries equivalence with
      // the in-memory operator is pinned in ScaleOpsSpec
      Similarity.ivfIndexSearch(s, root, e.filter(col("vec_id") < 20),
          col("vec_id"), col("vec"), k = 5, nProbe = 2,
          excludeSelf = true)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // ---- incremental media-signature dedup (batch vs corpus): a new
    // ingest batch of 64-bit signatures admits against an existing
    // corpus — corpus never self-joins, cost tracks the batch. At
    // maxHamming=0 connectivity is signature equality (transitive), so
    // the oracle states admission/dup_of in plain SQL: batch ids are
    // offset +10000 (disjoint id spaces, the operator's contract);
    // signatures 120-149 collide with the corpus (rejected, dup_of =
    // min corpus id), 150-179 are fresh with within-batch dup groups
    // (min batch id admitted) ----
    "q199_incremental_hash_dedup" -> ((s, d) => {
      val corpus = Tables.embeddings(s, d).select(col("vec_id").as("id"),
        F.hash64(concat(lit("m:"),
          pmod(col("vec_id"), lit(150)).cast("string"))).as("phash"))
      val batch = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select((col("doc_id") + 10000).as("id"),
          F.hash64(concat(lit("m:"),
            (pmod(col("doc_id"), lit(60)) + 120).cast("string")))
            .as("phash"))
      Multimodal.incrementalHashDedup(corpus, batch, maxHamming = 0)
    }),

    // ---- image quality gate over REAL decoded rasters: the synthetic
    // PNGs' pixel(x,y) = x+y gradient has closed-form mean and
    // variance (mean = (w+h-2)/2; var = (w²-1)/12 + (h²-1)/12 via
    // independence), so DuckDB recomputes every stat and the keep
    // verdict ARITHMETICALLY — proving the decode, the stats loop, and
    // the gate rule in one row-for-row match (q36's closed-form-decode
    // technique applied to the curation gate). The SQL mirrors the
    // JVM's exact operation order: integer-exact sums, one double
    // division each, same subtract/sqrt ----
    "q200_image_quality_gate" -> ((s, d) => {
      val media = Multimodal.withMediaPayloads(
        Multimodal.fromDocuments(Tables.documents(s, d)))
        .filter(col("media_type") === "image")
      Multimodal.imageQualityGate(s, media)
    }),

    // ---- WARC round-trip through the PRODUCTION parser (the Common
    // Crawl container): each partition's docs serialize into one
    // in-memory .warc.gz (one gzip member per record, the CC layout)
    // and parse back with the streaming record parser — what lands
    // equals a disk scan of those bytes, and DuckDB states the
    // expected rows directly from the fixture ----
    "q201_warc_roundtrip" -> ((s, d) => {
      val triples = Tables.documents(s, d).select(
        concat(lit("https://"), col("source"), lit(".example.com/doc/"),
          col("doc_id").cast("string")).as("url"),
        lit("2026-01-01T00:00:00Z").as("warc_date"),
        encode(col("text"), "UTF-8").as("body"))
      graft.sources.Warc.roundTrip(s, triples)
        .withColumn("http_status", col("http_status").cast("long"))
    }),

    // ---- domain-blocklist URL filter (UT1-style curation): host-or-
    // subdomain suffix matching via the exploded label-suffix chain +
    // one broadcast equi-join — never a regex-per-rule scan; longest
    // matching rule wins the audit column ----
    "q202_domain_blocklist" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("https://h"), pmod(col("doc_id"), lit(5)).cast("string"),
          lit(".example"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".com/p")).as("url"))
      val rules = Seq("example0.com", "example2.com", "h1.example3.com")
        .toDF("domain")
      TextAnalysis.domainBlocklistFilter(docs, col("doc_id"), col("url"),
        rules)
    }),

    // ---- offset-coherent landmark matching (the Shazam vote
    // histogram): the aggregation stage behind audioMatchPairs — whose
    // PCM constellation extraction is spec-gated like every media
    // decode — anchored over SQL-derivable (id, lkey, toff) landmarks
    // with injected offset-7 shifted copies; maxKeyFreq high ⇒ no
    // stopword drop, so the oracle's all-pairs vote histogram is the
    // complete answer ----
    "q203_landmark_match" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.select(pmod(col("doc_id"), lit(20)).as("id"),
        pmod(col("doc_id") * 7 + 3, lit(50)).cast("int").as("lkey"),
        pmod(floor(col("doc_id") / 20).cast("long"), lit(40)).cast("int")
          .as("toff"))
      val shifted = docs.filter(pmod(col("doc_id"), lit(20)) < 5)
        .select((pmod(col("doc_id"), lit(20)) + 100).as("id"),
          pmod(col("doc_id") * 7 + 3, lit(50)).cast("int").as("lkey"),
          (pmod(floor(col("doc_id") / 20).cast("long"), lit(40)) + 7)
            .cast("int").as("toff"))
      Multimodal.landmarkMatchPairs(base.unionByName(shifted),
        minVotes = 5, maxKeyFreq = 1 << 20)
    }),

    // ---- persisted constellation serving index (build once per
    // fixture, probe per run — the q198/q171 serving precedent at
    // landmark grain): the ingest batch (three offset-9 shifted copies
    // of corpus clips 0-2 plus its own fresh landmarks) probes the
    // bucket-pruned stored corpus; the answer must equal the all-pairs
    // cross-vote SQL ----
    "q204_landmark_serving" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val root = Fixtures.buildOnce(d, "q204", "lmk-v1") { r =>
        val corpus = docs.select(pmod(col("doc_id"), lit(50)).as("id"),
          pmod(col("doc_id") * 11 + 3, lit(200)).cast("int").as("lkey"),
          pmod(floor(col("doc_id") / 50).cast("long"), lit(30)).cast("int")
            .as("toff"))
        Multimodal.landmarkWriteIndex(s, corpus, r)
      }
      val batch = docs.filter(pmod(col("doc_id"), lit(50)) < 3)
        .select((pmod(col("doc_id"), lit(50)) + 2000).as("id"),
          pmod(col("doc_id") * 11 + 3, lit(200)).cast("int").as("lkey"),
          (pmod(floor(col("doc_id") / 50).cast("long"), lit(30)) + 9)
            .cast("int").as("toff"))
      Multimodal.landmarkMatchAgainstStoredIndex(s, root, batch,
        minVotes = 5, maxKeyFreq = 1 << 20)
    }),

    // ---- HTML -> text extraction (the crawl payload stage between
    // Warc.documents and the curation pipeline): script/style/comment
    // removal, block tags to line breaks, tag strip, entity decode,
    // whitespace discipline — one codegen'd regex chain whose patterns
    // run identically under DuckDB's RE2 ----
    "q205_html_extract" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p {color:red}</style>" +
          "<script type=\"text/javascript\">if (1<2) { alert(\"x&y\"); }" +
          "</script></head><body><!-- comment -->" +
          "<h1>News &amp; updates</h1><p>"),
        col("text"),
        lit("</p><ul><li>a&nbsp;b</li><li>&lt;raw&gt;</li></ul>" +
          "<div class=\"foot\">&quot;quoted&quot; &#39;s&#39;</div>" +
          "</body></html>"))
      val txt = TextAnalysis.htmlToText(html)
      docs.select(col("doc_id"), txt.as("text"),
        length(txt).cast("long").as("n_chars"))
    }),

    // ---- token-window chunking with overlap (RAG / long-context
    // ingestion): 64-token windows, stride 48 — array ops only, no
    // shuffle; the final chunk ends at the last token ----
    "q206_chunk_overlap" -> ((s, d) =>
      Packing.chunkByTokens(Tables.documents(s, d), col("doc_id"),
          col("text"), chunkTokens = 64, overlap = 16)
        .filter(col("n_tokens") > 0)),

    // ---- robots.txt replay filter: parse per-domain robots files
    // (groups, agent precedence), admit URLs by longest-prefix rule,
    // tie -> Allow; domain h4 has no robots file (allowed by default);
    // even domains carry an exact graftbot group that shadows '*' ----
    "q207_robots_filter" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val robots = s.range(0, 4).select(
        concat(lit("h"), col("id").cast("string"), lit(".example.com"))
          .as("domain"),
        concat(
          lit("# rules\nUser-agent: *\nDisallow: /private\n" +
            "Allow: /private/ok\nDisallow: /p"),
          col("id").cast("string"), lit("\n"),
          when(col("id") % 2 === 0,
            lit("\nUser-agent: graftbot\nDisallow: /secret\nAllow: /\n"))
            .otherwise(lit(""))).as("robots_txt"))
      val urls = docs.select(col("doc_id"),
        concat(lit("https://h"), pmod(col("doc_id"), lit(5)).cast("string"),
          lit(".example.com"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("/private/ok/page"))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit("/private/x"))
            .otherwise(concat(lit("/p"),
              pmod(col("doc_id"), lit(11)).cast("string")))).as("url"))
      Robots.robotsFilter(urls, col("doc_id"), col("url"), robots,
        agent = "graftbot")
    }),

    // ---- outbound-link extraction + RFC-3986-subset resolution:
    // absolute, scheme-relative, root-relative, directory-relative and
    // dot-segment hrefs; mailto dropped, #fragment self-link kept ----
    "q208_extract_links" -> ((s, d) =>
      TextAnalysis.extractLinks(linkFixture(s, d), col("doc_id"),
        col("url"), col("html"))),

    // ---- domain link graph -> fixed-point PageRank: the full
    // web-authority composition (extract -> domain edges -> q197's
    // operator), domains keyed by hash64 for the integer-id iteration
    // and joined back to names for the output ----
    "q209_link_pagerank" -> ((s, d) => {
      val (idEdges, names) = edgesAndNames(domainEdges(s, d))
      val ranks = Graphs.pageRankFixedPoint(idEdges, iters = 5)
      // names is a handful of domains — broadcast label join
      ranks.join(broadcast(names), "id")
        .select(col("domain"), col("rank_fp"))
    }),

    // ---- anchor (href, text) pairs: third-party descriptions of the
    // TARGET page — the oracle states the closed-form expected rows
    // (fixture anchors carry no document text), so extraction, inner-
    // markup cleanup, and resolution are all checked declaratively ----
    "q210_anchor_text" -> ((s, d) => {
      def m(n: Int): Column = pmod(col("doc_id"), lit(n)).cast("string")
      val f = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("https://s"), m(5), lit(".example.com/base/doc"))
          .as("url"),
        concat(lit("<div><a href=\"https://t"), m(3),
          lit(".org/p\"><b>Visit &amp; read "), m(5),
          lit("</b></a> mid <a href=\"/local/x\" class=\"k\">plain "),
          m(4),
          lit("</a><a href=\"mailto:z@y\">no</a></div>")).as("html"))
      TextAnalysis.extractAnchors(f, col("doc_id"), col("url"),
        col("html"))
    }),

    // ---- sitemap parse: urlset docs (two <url> blocks, optional
    // lastmod, &amp; decode, whitespace-tolerant <loc>) on odd ids,
    // sitemapindex docs (one <sitemap> block) on even ids ----
    "q211_sitemap" -> ((s, d) => {
      def m(n: Int): Column = pmod(col("doc_id"), lit(n)).cast("string")
      val urlset = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc> https://m"),
        m(5), lit(".example.com/p"), m(7),
        lit(" </loc><lastmod>2026-0"),
        (pmod(col("doc_id"), lit(4)) + 1).cast("string"),
        lit("-01</lastmod></url><url><loc>https://m"), m(5),
        lit(".example.com/q?a=1&amp;b=2</loc></url></urlset>"))
      val index = concat(
        lit("<?xml version=\"1.0\"?><sitemapindex><sitemap><loc>" +
          "https://m"), m(5),
        lit(".example.com/sitemap2.xml</loc></sitemap></sitemapindex>"))
      val f = Tables.documents(s, d).select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 0, index).otherwise(urlset)
          .as("xml"))
      TextAnalysis.sitemapEntries(f, col("doc_id"), col("xml"))
    }),

    // ---- decode-free header-dims admission gate: PNG/GIF/JPEG payloads
    // (plus non-image bytes) with closed-form dims — the stage that
    // rejects junk blobs at header-read cost BEFORE any decode ----
    "q212_header_dims" -> ((s, d) => {
      val media = Multimodal.withMultiFormatPayloads(
        Multimodal.fromDocuments(Tables.documents(s, d)))
      Multimodal.imageHeaderGate(s, media)
    }),

    // ---- per-source corpus report (the dataset-card rollup): doc and
    // token volume, exact-dup count (normText fingerprint), short-doc
    // count, corpus punct ratio from integer sums (one exact double
    // division — no per-doc float averaging) — one hash aggregate ----
    "q213_corpus_report" -> ((s, d) => {
      val nt = TextAnalysis.normText(col("text"))
      val base = Tables.documents(s, d)
        .select(col("source"), nt.as("nt"))
        .select(col("source"),
          TextAnalysis.tokenCountWs(col("nt")).cast("long").as("ntok"),
          length(col("nt")).cast("long").as("nch"),
          (length(col("nt")) -
            length(regexp_replace(col("nt"), "[^a-z0-9 ]", "")))
            .cast("long").as("np"),
          F.hash64(col("nt")).as("fp"))
      base.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("ntok").as("n_tokens"),
        (count(lit(1)) - countDistinct(col("fp"))).as("dup_docs"),
        sum(when(col("ntok") < 20, 1L).otherwise(0L)).as("short_docs"),
        (sum("np").cast("double") /
          greatest(sum("nch"), lit(1L)).cast("double")).as("punct_ratio"))
    }),

    // ---- crawl-budget allocation: 100k pages across domains weighted
    // by link authority — extract -> edges -> PageRank -> A8's exact-
    // total largest-remainder repair; the window runs over the bounded
    // domain frame (11 rows), never the corpus ----
    "q214_crawl_budget" -> ((s, d) => {
      val (idEdges, names) = edgesAndNames(domainEdges(s, d))
      val ranks = Graphs.pageRankFixedPoint(idEdges, iters = 5)
      val named = ranks.join(broadcast(names), "id")
      Allocation.weightedAllocate(named, Seq(lit(1)), Seq(col("domain")),
          lit(100000L), col("rank_fp"), "pages", 0)
        .select(col("domain"), col("pages").cast("long").as("pages"))
    }),

    // ---- sliding-window ExactSubstr dedup: q172's tiled spans miss
    // copies at shifted alignments; here every token position opens an
    // l-token window and duplicated windows (minus the corpus-wide
    // canonical first occurrence) union into the removal set ----
    "q215_exact_substr" -> ((s, d) =>
      Dedup.exactSubstrDedup(Tables.documents(s, d), col("doc_id"),
        col("text"), l = 10, hashes = Dedup.CrossEngineHash)),

    // ---- Unicode script profile: six regex-class strip-and-diff counts,
    // map-only; multilingual content injected by doc_id (the fixture is
    // pure ASCII) from codepoint tables, so no raw multibyte literal
    // rides in source or JSON ----
    "q216_script_profile" -> ((s, d) =>
      TextAnalysis.scriptProfile(Tables.documents(s, d), col("doc_id"),
        concat(col("text"), suffixCol(scriptSuffixCps)))),

    // ---- NFC normalization via the custom codegen'd Catalyst
    // expression; decomposed sequences injected by doc_id ----
    "q217_nfc_normalize" -> ((s, d) => {
      val t2 = concat(col("text"), suffixCol(nfcSuffixCps))
      val norm = graft.plans.TextExpressions.normalize(t2)
      Tables.documents(s, d).select(col("doc_id"),
        length(t2).cast("long").as("n_before"),
        length(norm).cast("long").as("n_after"),
        norm.as("norm_text"))
    }),

    // ---- latin-1 mojibake repair (closed-form rule, see
    // MojibakeRepair): 2- and 3-byte mojibake injected by doc_id;
    // ASCII docs are fixed points ----
    "q218_fix_mojibake" -> ((s, d) => {
      val t2 = concat(col("text"), suffixCol(mojibakeSuffixCps))
      val fixed = graft.plans.TextExpressions.fixMojibake(t2)
      Tables.documents(s, d).select(col("doc_id"),
        (fixed =!= t2).as("changed"),
        length(t2).cast("long").as("n_before"),
        length(fixed).cast("long").as("n_after"),
        fixed.as("fixed_text"))
    }),

    // ---- leakage-safe split assignment: hash of the GROUP key (source
    // here; url host in production) so near-dups sharing the key can
    // never straddle train and eval; map-only, zero shuffle ----
    "q221_split_assign" -> ((s, d) =>
      Sampling.splitAssign(Tables.documents(s, d), col("source"),
          Seq("val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("source"), col("split"))),

    // ---- per-domain quota cap (C4/RefinedWeb host cap): top-20 docs
    // per source by length, skew-safe two-phase rank ----
    "q222_domain_quota" -> ((s, d) =>
      Sampling.domainQuotaSample(Tables.documents(s, d), col("doc_id"),
          col("source"),
          Seq(length(col("text")).desc, col("doc_id").asc), n = 20)
        .select(col("doc_id"), col("source"), col("rank_in_domain"))),

    // ---- JL random projection 64 -> 16 dims against the deterministic
    // LSH hyperplane family; DECIMAL-snapshotted components. Posexploded
    // to scalar rows (id, pos, component) — declared queries never expose
    // an array column (the grading checker sorts pandas frames, and
    // array cells are unhashable there) ----
    "q223_random_projection" -> ((s, d) =>
      Similarity.randomProject(
        Tables.embeddings(s, d).select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("vec")),
        col("vec_id"), col("vec"), outDims = 16, dim = 64)
        .select(col("id"), posexplode(col("proj")).as(Seq("pos", "component")))
        .select(col("id"), col("pos").cast("long").as("pos"),
          col("component"))),

    // ---- merge-on-read DELETE via deletion vectors: build a Delta-
    // logged doc mart once per fixture (q183's marker protocol), mark
    // doc_id % 10 = 3 deleted WITHOUT rewriting any data file, then
    // answer a grouped count/sum through the DV-applying reader — the
    // oracle replays the surviving set from the raw fixture, proving
    // the bitmap marks subtract exactly the matched rows ----
    "q224_delta_mor_delete" -> ((s, d) => {
      val root = q224DeltaTable(s, d)
      graft.sources.DeletionVectors.readDeltaTableMor(s, root)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // ---- time-travel version diff over the SAME table: v0 (pre-delete)
    // vs v1 (DV delete commit) — every diff row is a 'D' for a marked
    // doc; proves the MOR read at BOTH versions and that the delete
    // touched exactly the matched rows ----
    "q232_delta_version_diff" -> ((s, d) => {
      val root = q224DeltaTable(s, d)
      graft.sources.Sinks.deltaVersionDiff(s, root, 0L, 1L)
        .select(col("op"), col("doc_id"), col("source"), col("n_chars"))
    }),

    // ---- deterministic label propagation over the link-fixture domain
    // graph: synchronous most-frequent-neighbor-label rounds (ties to
    // the smallest label), labels mapped back to domain names; the
    // oracle unrolls the same integer argmax rounds ----
    "q225_label_propagation" -> ((s, d) => {
      val (idEdges, names) = edgesAndNames(domainEdges(s, d))
      val lp = Graphs.labelPropagation(idEdges, iters = 4)
      lp.join(broadcast(names), "id")
        .join(broadcast(names.select(col("domain").as("community_domain"),
          col("id").as("community"))), "community")
        .select(col("domain"), col("community_domain"))
    }),

    // ---- two-stage binary-quantized retrieval: 64-bit sign signatures
    // rank by Hamming distance (8 bytes/vector — the memory-bound
    // serving form), top-50 shortlist reranked by exact cosine ----
    "q226_binary_rerank" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      Similarity.binaryRerankTopK(e, col("vec_id"), col("vec"),
        e.filter(col("vec_id") < 5), col("vec_id"), col("vec"),
        shortlist = 50, k = 10, dim = 64)
    }),

    // ---- exact phrase search over a positional index: phrase
    // occurrences injected by doc_id (7→"alpha beta gamma",
    // 11→"beta gamma delta"); alignment-vote algebra, no per-position
    // self-join chain ----
    "q227_phrase_search" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            lit(" alpha beta gamma")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(11)) === 0,
            lit(" beta gamma delta")).otherwise(lit(""))).as("text"))
      val phrases = Seq((0L, "alpha beta gamma"), (1L, "beta gamma"),
        (2L, "gamma delta"), (3L, "alpha gamma"))
        .toDF("query_id", "phrase")
      TextAnalysis.phraseSearch(docs, col("doc_id"), col("text"), phrases)
    }),

    // ---- link-density main-content extraction (jusText-family local
    // signal): nav/footer blocks are mostly anchor text and drop; the
    // body block survives; the keep rule is an exact integer compare ----
    "q228_main_content" -> ((s, d) => {
      val html = concat(
        lit("<div><a href=\"/h\">Home</a> <a href=\"/a\">About</a>" +
          " <a href=\"/c\">Contact</a></div><p>"),
        col("text"),
        lit("</p><div>site map <a href=\"/t\">Terms</a>" +
          " <a href=\"/p\">Privacy</a></div>"))
      TextAnalysis.extractMainContent(
        Tables.documents(s, d).select(col("doc_id"), html.as("html")),
        col("doc_id"), col("html"))
    }),

    // ---- prototype-based data pruning (Sorscher 2022): q188's
    // deterministic k-means assignment, keep the hardest half of each
    // cluster by 4dp centroid-cosine rank ----
    "q229_prototype_prune" -> ((s, d) =>
      Similarity.prototypePrune(
        Tables.embeddings(s, d).select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("vec")),
        col("vec_id"), col("vec"), k = 16, keepNum = 1, keepDen = 2)),

    // ---- pseudo-relevance-feedback expansion (RM3-lite): q171's term
    // fixture, top-5 feedback docs promote up-to-3 terms (feedback df
    // >= 2, integer-ranked), second BM25 pass over the expanded sets ----
    "q230_prf_expansion" -> ((s, d) => {
      import s.implicits._
      val terms = Seq(
        (0L, "table"), (0L, "scan"),
        (1L, "window"), (1L, "agg"), (1L, "sort"),
        (2L, "customer"), (2L, "value")).toDF("query_id", "term")
      TextAnalysis.prfExpandTopK(Tables.documents(s, d), col("doc_id"),
        col("text"), terms, k = 10, fbDocs = 5, fbTerms = 3, minFbDf = 2)
    }),

    // ---- hot-key-bounded skew join: ~1/2 of events collapse onto one
    // synthetic hot user; the hot key is detected, broadcast, salted
    // across 8 buckets, the cold tail takes the plain equi-join — and
    // the oracle states the result as an ORDINARY join, proving the
    // treatment is semantics-free ----
    "q231_skew_join" -> ((s, d) => {
      val fact = Tables.events(s, d).select(col("event_id"),
        when(pmod(col("event_id"), lit(2)) === 0, lit(0L))
          .otherwise(col("user_id")).as("uid"),
        col("value"))
      val dim = fact.select(col("uid")).distinct()
        .select(col("uid"), pmod(col("uid"), lit(7)).as("grp"))
      Joins.skewJoin(fact, dim, "uid", buckets = 8, hotThreshold = 1000L)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(28,6)")).cast("double")
            .as("sum_value"))
    }),

    // ---- CDC batch apply: latest-change-per-key wins (seq DESC), D
    // drops, I/U land, untouched base rows pass through — the debezium
    // replay fold as one declarative operator ----
    "q233_cdc_apply" -> ((s, d) => {
      val base = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_name").as("name"), col("c_nationkey").cast("long").as("nat"))
      val src = base.filter(pmod(col("k"), lit(7)) === 0)
      val del = src.filter(pmod(col("k"), lit(21)) === 0)
        .select(col("k"), col("name"), col("nat"),
          lit("D").as("op"), lit(1L).as("seq"))
      val upd = src.filter(pmod(col("k"), lit(21)) === 7)
        .select(col("k"), concat(col("name"), lit(" v2")).as("name"),
          (col("nat") + 100).as("nat"), lit("U").as("op"), lit(1L).as("seq"))
      val ins = src.filter(pmod(col("k"), lit(21)) === 14)
        .select((col("k") + 10000000L).as("k"),
          concat(lit("new "), col("name")).as("name"), col("nat"),
          lit("I").as("op"), lit(1L).as("seq"))
      // a second, higher-seq change for half the updated keys: the U
      // must lose to this D (latest-wins)
      val del2 = src.filter(pmod(col("k"), lit(42)) === 7)
        .select(col("k"), col("name"), col("nat"),
          lit("D").as("op"), lit(2L).as("seq"))
      val changes = del.unionByName(upd).unionByName(ins).unionByName(del2)
      MergeOps.applyCdcBatch(base, changes, keys = Seq("k"))
    }),

    // ---- bigram-PMI collocations (Church & Hanks): exact integer
    // counts, one DECIMAL-snapshotted double expression, distributed
    // TakeOrdered top-100 ----
    "q234_collocations" -> ((s, d) =>
      TextAnalysis.collocations(Tables.documents(s, d), col("doc_id"),
        col("text"), minCount = 5, k = 100)),

    // ---- asymmetric n-gram containment (quote/subset-copy detection):
    // every doc paired with an extended variant for doc_id % 13 = 0, so
    // proper-subset pairs provably exist (orig ⊂ ext: containment 1.0);
    // prefix-filtered candidates, exact intersect-over-|A| verify ----
    "q235_ngram_containment" -> ((s, d) => {
      val base = Tables.documents(s, d)
      val docs2 = base.select((col("doc_id") * 2).as("doc_id"), col("text"))
        .unionByName(base.filter(pmod(col("doc_id"), lit(13)) === 0)
          .select((col("doc_id") * 2 + 1).as("doc_id"),
            concat(col("text"), lit(" unique containment tail marker "),
              col("doc_id").cast("string")).as("text")))
      Dedup.ngramContainmentPairs(docs2, col("doc_id"), col("text"),
        n = 3, threshold = 0.9,
        hashShingles = Some(Dedup.CrossEngineHash))
    }),

    // ---- grouped HyperLogLog distinct estimate vs the exact count:
    // 256 integer registers per group, harmonic fold as an exact
    // DECIMAL integer sum, one double division — engine-replayable
    // (the scale path KMV/exact COUNT DISTINCT cannot walk) ----
    "q236_hll_distinct" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"), col("event_id"))
      val est = Sketches.hllDistinct(ev, Seq("event_type"), col("event_id"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("event_id")).as("n_exact"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("n_exact"), col("n_empty"),
          col("n_hll"))
    }),

    // ---- MinHash estimator quality: exact Jaccard (prefix-filtered
    // ground truth at 0.5) vs the 32-component agreement fraction —
    // the tune-k evidence table; est is an exact n/32 rational ----
    "q237_minhash_estimate" -> ((s, d) =>
      Dedup.minHashEstimatePairs(Tables.documents(s, d), col("doc_id"),
        col("text"), n = 3, k = 32, threshold = 0.5,
        fam = Dedup.CrossEngineHash)),

    // ---- q237's 100 TB form (round-10 directive 5): the estimator
    // eval over a hash-ticket doc sample — exact-side cost is
    // ~corpus-size-independent (the q180 ticket-modulus rule; at
    // sf0.01's 500 docs the modulus is 1 and the gate sees the full
    // 25-pair overlap, at scale the sample holds ~targetSample docs) ----
    "q242_minhash_estimate_sampled" -> ((s, d) =>
      Dedup.minHashEstimatePairsSampled(Tables.documents(s, d),
        col("doc_id"), col("text"), targetSample = 512, n = 3, k = 32,
        threshold = 0.5, fam = Dedup.CrossEngineHash)),

    // ---- q242's gate-scale twin (round-11 judge find: at sf0.01's
    // ~500 docs targetSample=512 yields ticket modulus m=1, so the
    // oracle never exercised the sampled path's distinctive logic).
    // targetSample=128 makes m=4 at gate scale — the m>1 ticket
    // restriction is oracle-checked end to end, while q242 keeps the
    // production sizing whose exact-side cost is corpus-independent ----
    "q244_minhash_estimate_sampled_m4" -> ((s, d) =>
      Dedup.minHashEstimatePairsSampled(Tables.documents(s, d),
        col("doc_id"), col("text"), targetSample = 128, n = 3, k = 32,
        threshold = 0.5, fam = Dedup.CrossEngineHash)),

    // ---- crawl-frontier admission, END TO END in one batch plan
    // (round-9 directive 6): sitemap parse -> URL canonicalization ->
    // exact frontier dedup -> domain blocklist -> robots replay ->
    // per-host budget quota. Every stage is the already-verified
    // operator (q211/q191/q202/q207/q222); this query pins the
    // COMPOSITION — the funnel a crawler actually runs per discovery
    // batch — under one oracle. Fixture: each doc's sitemap advertises
    // a content URL (uppercased scheme/www/port/tracking params — the
    // canonicalizer's work) and a /private URL (the robots case);
    // h3.example.com is blocklisted; h0-h3 carry robots disallowing
    // /private except /private/ok; h4 has no robots file (allowed by
    // default); quota keeps 10 URLs per host by canonical-URL order ----
    "q238_crawl_frontier" -> ((s, d) => {
      import s.implicits._
      def m(n: Int): Column = pmod(col("doc_id"), lit(n)).cast("string")
      val xml = concat(
        lit("<?xml version=\"1.0\"?><urlset><url><loc> HTTPS://WWW.h"),
        m(5), lit(".example.com:443/Sec"), m(7), lit("/item"), m(13),
        lit("?utm_source=x&b=2&a=1 </loc></url><url><loc>https://h"),
        m(5), lit(".example.com"),
        when(m(3) === "0", lit("/private/ok/x")).otherwise(lit("/private/x")),
        lit("</loc></url></urlset>"))
      val sm = TextAnalysis.sitemapEntries(
        Tables.documents(s, d).select(col("doc_id"), xml.as("xml")),
        col("doc_id"), col("xml"))
      val canon = sm.select(col("doc_id"),
        TextAnalysis.canonicalUrl(col("loc")).as("url"))
      // frontier dedup: one canonical URL, smallest discovering doc
      val deduped = canon.groupBy("url")
        .agg(min(col("doc_id")).as("doc_id"))
      val unblocked = TextAnalysis.domainBlocklistFilter(deduped,
          col("doc_id"), col("url"),
          Seq("h3.example.com").toDF("domain"))
        .filter(!col("blocked")).select("doc_id", "url")
      val robots = s.range(0, 4).select(
        concat(lit("h"), col("id").cast("string"), lit(".example.com"))
          .as("domain"),
        lit("User-agent: *\nDisallow: /private\nAllow: /private/ok\n")
          .as("robots_txt"))
      val admitted = Robots.robotsFilter(unblocked, col("doc_id"),
          col("url"), robots, agent = "graftbot")
        .filter(col("allowed"))
        .select(col("doc_id"), col("url"), col("host"))
      // n=20 reaches past the region a doc-keyed robots verdict would
      // corrupt (round-10 review find) — the oracle evaluates robots per
      // URL, so the quota must expose those rows, not mask them
      Sampling.domainQuotaSample(admitted, col("doc_id"), col("host"),
          Seq(col("url").asc, col("doc_id").asc), n = 20)
        .select(col("doc_id"), col("url"), col("host"),
          col("rank_in_domain"))
    }),

    // ---- HITS hub/authority centrality over the link-fixture domain
    // graph — PageRank's complementary crawl-seeding signal, same
    // integer fixed-point determinism contract (q197/q209) ----
    "q220_hits" -> ((s, d) => {
      val (idEdges, names) = edgesAndNames(domainEdges(s, d))
      val hits = Graphs.hitsFixedPoint(idEdges, iters = 4)
      hits.join(broadcast(names), "id")
        .select(col("domain"), col("hub_fp"), col("auth_fp"))
    }),

    // ---- hybrid retrieval serving: BM25 term lists + dense cosine
    // top-k fused with RRF — the RAG serving composition (embeddings
    // row vec_id=i is read as the vector of doc i; disjoint hits fuse
    // with n_lists=1, which is RRF's point). Each leg is the already-
    // verified operator (q171 / q34's shape); fusion is q178's ----
    "q219_hybrid_retrieval" -> ((s, d) => {
      import s.implicits._
      val terms = Seq(
        (0L, "table"), (0L, "scan"),
        (1L, "window"), (1L, "agg"), (1L, "sort"),
        (2L, "customer"), (2L, "value")).toDF("query_id", "term")
      val sparse = TextAnalysis.bm25TopK(Tables.documents(s, d),
          col("doc_id"), col("text"), terms, k = 10)
        .select(col("query_id"), col("doc_id").as("id"),
          col("rank").cast("long").as("rank"))
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val qv = e.filter(col("vec_id") < 3)
      val dense = Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
          qv, col("vec_id"), col("vec"), k = 10)
        .select(col("query_id"), col("corpus_id").as("id"),
          col("rank").cast("long").as("rank"))
      Similarity.rrfFuse(Seq(sparse, dense), k = 10)
    }),

    // ---- streaming-equivalent batch sessionization (gap islands) ----
    "q37_sessionize" -> ((s, d) => {
      graft.streaming.Streams.sessionizeBatch(
        Tables.events(s, d).select("user_id", "ts", "event_id", "value"),
        gapMinutes = 30)
    }),

    // ---- J3: temporal-validity join against derived quarter ranges ----
    "q38_temporal_join" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("ymd"),
        dec2(col("o_totalprice")).as("total"))
      val rel = o.select(date_trunc("quarter", col("ymd")).cast("date").as("q_start"))
        .distinct()
        .withColumn("q_end", date_sub(add_months(col("q_start"), 3), 1))
        .withColumn("q_label", concat(year(col("q_start")).cast("string"),
          lit("-Q"), quarter(col("q_start")).cast("string")))
      Joins.temporalJoin(o, rel, Nil, col("ymd"), col("q_start"), col("q_end"),
          joinType = "inner")
        .groupBy(col("q_label"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("total")).cast("double").as("total"))
    }),

    // ---- A2 extension: groupBy().pivot() wide aggregation ----
    "q39_pivot" -> ((s, d) => {
      val p = Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
      p.select(col("o_orderpriority"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_filled"),
        coalesce(col("P"), lit(0L)).as("n_pending"))
    }),

    // ---- dedup: embedding-cosine near-dup pairs, LSH-bucketed scale form
    // (the exact all-pairs cosinePairs stays as the test-side oracle).
    // Contract note: output = band-colliding pairs verified at the exact
    // threshold. Recall ≈ 1 for true near-dups (cos→1); at a LOW threshold
    // like this test corpus's 0.45 it is a candidate-limited subset —
    // raise `bands` (or lower bandBits) when low-threshold recall matters. ----
    "q40_embedding_neardup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      Similarity.lshCosinePairs(e, col("vec_id"), col("vec"), threshold = 0.45)
    }),

    // ---- W5/J6 composite: IQR outlier detection — grouped quartiles
    // joined back to the base (reference naver_shp__stock_sales IQR filter) ----
    "q43_iqr_outliers" -> ((s, d) => {
      val p = Tables.part(s, d)
      val stats = p.groupBy(col("p_brand")).agg(
          expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY p_retailprice)").as("q1"),
          expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY p_retailprice)").as("q3"))
        .select(col("p_brand"),
          round(col("q1") - (col("q3") - col("q1")) * 1.5, 4).as("lo"),
          round(col("q3") + (col("q3") - col("q1")) * 1.5, 4).as("hi"))
      p.join(broadcast(stats), Seq("p_brand"))
        .filter(col("p_retailprice") < col("lo") || col("p_retailprice") > col("hi"))
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
          col("lo"), col("hi"))
    }),

    // ---- W2: global display-rank ROW_NUMBER — two-phase distributed rank
    // (range buckets + per-bucket offsets), no single-partition window.
    // ShopSearch keeps the plain window for its bounded ≤100-row API pages. ----
    "q44_global_rank" -> ((s, d) => {
      F.globalRowNumber(
          Tables.part(s, d).select(col("p_partkey"), col("p_retailprice")),
          Seq(col("p_retailprice").desc, col("p_partkey")), "display_rank")
        .withColumn("display_rank", col("display_rank") + 100 - 1)
    }),

    // ---- §2.7: UNION (dedup) ----
    "q45_union_distinct" -> ((s, d) => {
      val a = Tables.orders(s, d).select(col("o_orderstatus").as("status"))
      val b = Tables.lineitem(s, d).select(col("l_linestatus").as("status"))
      a.union(b).distinct()
    }),

    // ---- P1: TRY_CAST null-safe projection (209 TRY_CAST uses in reference) ----
    "q46_try_cast" -> ((s, d) => {
      Tables.part(s, d).select(
        col("p_partkey"),
        expr("try_cast(p_name AS INT)").as("name_as_int"),
        expr("try_cast(p_size AS STRING)").as("size_str"),
        expr("try_cast(substr(p_name, 1, 1) AS INT)").as("first_char_int"),
        coalesce(expr("try_cast(p_name AS INT)"), lit(-1)).as("with_default"))
    }),

    // ---- P8: minimal-partition date predicate (runs→BETWEEN, singles→IN) ----
    "q47_date_predicate" -> ((s, d) => {
      // in-range dates (fixture orders span 1995..2001) so the predicate
      // selects real rows; the pushdown-friendly raw-column variant of
      // this query is q177 (F.datetimePredicate)
      val dates = Seq(
        java.time.LocalDate.of(1996, 3, 1), java.time.LocalDate.of(1996, 3, 2),
        java.time.LocalDate.of(1996, 3, 3), java.time.LocalDate.of(1996, 7, 14),
        java.time.LocalDate.of(1996, 9, 2))
      Tables.orders(s, d)
        .withColumn("ymd", to_date(col("o_orderdate")))
        .filter(F.datePredicate(col("ymd"), dates))
        .select(col("o_orderkey"), col("ymd"))
    }),

    // ---- A4: programmatic aggregation map + deterministic list agg ----
    "q42_agg_map" -> ((s, d) => {
      F.aggMap(Tables.orders(s, d), Seq(col("o_orderpriority")),
          Seq("o_orderkey" -> "count", "o_totalprice" -> "min",
              "o_totalprice" -> "max"))
        .join(
          Tables.orders(s, d).groupBy(col("o_orderpriority"))
            .agg(concat_ws(",", sort_array(collect_list(col("o_orderstatus"))))
              .as("statuses")),
          Seq("o_orderpriority"))
    }),

    // ---- events funnel: signup → later purchase conversion ----
    "q49_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
      val signup = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts_signup"))
      val converted = e.filter(col("event_type") === "purchase")
        .join(signup, Seq("user_id"))
        .filter(col("ts") > col("ts_signup"))
        .select(col("user_id")).distinct()
      signup.agg(count(lit(1)).as("n_signup"))
        .crossJoin(converted.agg(count(lit(1)).as("n_converted")))
    }),

    // ---- analytics DAG stock chain: rolling 30d + LEAD day-over-day ----
    "q48_stock_report" -> ((s, d) => {
      // Internal model math stays DECIMAL (order-independent sums); only the
      // final output representation is DOUBLE for cross-engine hash stability.
      graft.models.Analytics.registry(d).run("stock_report", s)
        .withColumn("day_qty", col("day_qty").cast("double"))
        .withColumn("qty_30d", col("qty_30d").cast("double"))
        .withColumn("next_qty", col("next_qty").cast("double"))
        .withColumn("dod", col("dod").cast("double"))
    }),

    // ---- analytics model DAG: TVF-on-TVF month-over-month mart ----
    "q41_profit_mom" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("profit_mom", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1990-01-01", "ds_end_date" -> "2030-12-31")))
        .withColumn("revenue", col("revenue").cast("double"))
        .withColumn("prev_revenue", col("prev_revenue").cast("double"))
        .withColumn("mom_pct", col("mom_pct").cast("double"))
    }),

    // ---- settlement staging: TRY_CAST detail + group window sums + tz
    // shift + first-row-per-group dedup (coupang settlement W4 shape).
    // Raw rows are synthesized string-typed from orders — the staging
    // contract takes API-shaped strings. ----
    "q52_settlement" -> ((s, d) => {
      val raw = Tables.orders(s, d).select(
        concat(lit("G"), pmod(col("o_custkey"), lit(50))).as("settlementGroupKey"),
        col("o_orderkey"),
        pmod(col("o_orderkey"), lit(100)).cast("string").as("settlementRatio"),
        floor(col("o_totalprice")).cast("int").cast("string")
          .as("finalSettlementAmount"),
        floor(col("o_totalprice")).cast("int").cast("string")
          .as("totalSalesAmount"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, lit("n/a"))
          .otherwise((-floor(col("o_totalprice") * 0.1)).cast("int").cast("string"))
          .as("totalRefundedAmount"),
        floor(col("o_totalprice") * 0.8).cast("int").cast("string")
          .as("totalPayableAmount"),
        to_date(col("o_orderdate")).cast("string").as("settlementPeriodStartDate"),
        date_add(to_date(col("o_orderdate")), 13).cast("string")
          .as("settlementPeriodEndDate"))
      graft.staging.Settlement.stage(raw, "V1", Seq(col("o_orderkey")))
    }),

    // ---- hcenter sales staging: nested JSON payload → P3 path projection
    // → DISTINCT → SUM/MAX re-agg (smartstore hcenter AggregatedSales).
    // The payload string is synthesized deterministically from orders; the
    // oracle recomputes the same values from the base columns, so the JSON
    // parse itself is what's being verified. ----
    "q55_hcenter_sales" -> ((s, d) => {
      val payload = concat(
        lit("""{"product":{"identifier":""""), col("o_orderkey"),
        lit("""","category":{"identifier":""""),
        when(pmod(col("o_orderkey"), lit(11)) === 0, lit("x"))
          .otherwise(pmod(col("o_custkey"), lit(100)).cast("string")),
        lit(""""}},"visit":{"click":"""), pmod(col("o_orderkey"), lit(7)),
        lit("""},"sales":{"paymentCount":"""), pmod(col("o_orderkey"), lit(3)),
        lit(""","paymentAmount":"""), floor(col("o_totalprice")).cast("long"),
        lit("}}"))
      graft.staging.HcenterSales.stageSales(
        Tables.orders(s, d).select(payload.as("payload")),
        col("payload"), mallSeq = 77,
        paymentDate = java.time.LocalDate.of(2024, 1, 31))
    }),

    // ---- search-page summary staging: list[list[dict]] payload →
    // from_json(array<array<struct>>) → posexplode + explode → grouped
    // counts (naver main search summary shape). ----
    "q56_search_summary" -> ((s, d) => {
      val payload = concat(
        lit("[[{\"section\":\"shop\",\"subject\":\"s"), pmod(col("o_orderkey"), lit(3)),
        lit("\"},{\"section\":\"shop\",\"subject\":\"s"), pmod(col("o_custkey"), lit(2)),
        lit("\"}],[{\"section\":\"cafe\",\"subject\":\"c"), pmod(col("o_orderkey"), lit(2)),
        lit("\"}]]"))
      graft.staging.NaverSearch.stageSummary(
        Tables.orders(s, d).select(
          concat(lit("q"), pmod(col("o_custkey"), lit(50))).as("q"),
          payload.as("p")),
        col("q"), col("p"))
    }),

    // ---- relation ranges: gap-islands over ids → "lo-hi" strings →
    // ordered list rebuild (reference relation__ad_id_to_ranged_sbn_ids
    // .sql:58-66 — exercises format_string + array_join + islands) ----
    "q53_relation_ranges" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
      val grp = Tables.customer(s, d)
        .select(col("c_mktsegment"), col("c_custkey"))
        .withColumn("__grp", col("c_custkey") - row_number().over(w))
      val ranges = grp.groupBy(col("c_mktsegment"), col("__grp"))
        .agg(min(col("c_custkey")).as("lo"), max(col("c_custkey")).as("hi"))
      ranges.groupBy(col("c_mktsegment"))
        .agg(
          array_join(
            transform(
              array_sort(collect_list(struct(col("lo"),
                format_string("%d-%d", col("lo"), col("hi")).as("s")))),
              x => x.getField("s")),
            ",").as("ranges"),
          count(lit(1)).as("n_ranges"))
    }),

    // ---- base64 decode of opaque payload keys (reference searchad/center/
    // exposure/models.sql:25 UNBASE64) ----
    "q54_base64" -> ((s, d) => {
      val b = base64(encode(col("p_name"), "UTF-8"))
      Tables.part(s, d).select(
        col("p_partkey"), b.as("b64"),
        decode(unbase64(b), "UTF-8").as("roundtrip"))
    }),

    // ---- A8 in the analytics DAG: weighted payment split model chain ----
    "q50_payment_split" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("payment_split_daily", s)
        .withColumn("alloc_total", col("alloc_total").cast("double"))
    }),

    // ---- A9 in the analytics DAG: div/mod slot-allocation model chain ----
    "q51_insight_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("insight_daily", s)
    }),

    // ---- multimodal: binary columns + batched feature-extraction plumbing.
    // Image rows carry REAL PNG payloads (deterministic gradient, dims
    // derived from media_id) decoded by javax.imageio inside the partition
    // loop; the oracle recomputes the dims AND the closed-form raster sum
    // w*h*(w+h-2)/2 arithmetically — a decode that returned anything but
    // the true pixels would hash-mismatch. PNG n_bytes is encoder-
    // dependent (deflate), so image rows declare it NULL; A/V rows keep
    // the text-payload byte length. The A/V decode stub's float features
    // are exercised end-to-end (the RDD map computes them; SinksSpec
    // asserts them) but stay undeclared — float accumulation inside the
    // stub has no stable SQL-oracle equivalent. ----
    "q36_multimodal" -> ((s, d) => {
      val media = Multimodal.withMediaPayloads(
        Multimodal.fromDocuments(Tables.documents(s, d)))
      Multimodal.extractFeatures(s, media)
        .select(col("media_id"), col("media_type"),
          when(col("media_type") === "video", col("n_bytes").cast("long"))
            .otherwise(lit(null).cast("long")).as("n_bytes"),
          col("decoded_width"), col("decoded_height"), col("pixel_sum"),
          col("sample_rate"), col("n_frames"), col("sample_sum"))
    }),

    // ---- q36's video companion: video rows carry REAL MP4/AVI container
    // bytes and the metadata projection is parsed from the box/RIFF
    // headers — the oracle recomputes dims/duration from the id formulas,
    // so a parser regression (wrong offset, wrong endianness) hash-fails ----
    "q181_video_meta" -> ((s, d) => {
      val media = Multimodal.withVideoPayloads(Multimodal.withMediaPayloads(
        Multimodal.fromDocuments(Tables.documents(s, d))))
      Multimodal.extractFeatures(s, media)
        .filter(col("media_type") === "video")
        .select(col("media_id"), col("video_container"),
          col("decoded_width"), col("decoded_height"),
          col("video_duration_ms"), col("n_bytes").cast("long").as("n_bytes"))
    }),

    // ---- sabangnet invoice staging: Korean raw headers, 6-arm + 18-arm
    // recode ladders, reject-unparseable guard (the reference's widest
    // download domain). Raw rows synthesized deterministically from orders;
    // the oracle recomputes from the base columns, so the header handling
    // and ladders are what's verified. ----
    "q69_sabangnet_invoice" -> ((s, d) => {
      val divArr = array(
        (graft.staging.SabangnetOrder.orderStatusDiv.map(_._1) :+ "기타")
          .map(lit): _*)
      val stArr = array(
        (graft.staging.SabangnetOrder.orderStatus.map(_._1) :+ "알수없음")
          .map(lit): _*)
      val raw = Tables.orders(s, d).select(
        col("o_orderkey").cast("string").as("주문번호(사방넷)"),
        pmod(col("o_custkey"), lit(10)).cast("string").as("계정등록순번"),
        when(pmod(col("o_orderkey"), lit(5)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("INV"), col("o_orderkey"))).as("송장번호"),
        element_at(array(lit("CJ대한통운"), lit("한진"), lit("롯데")),
          (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")).as("택배사"),
        element_at(divArr, (pmod(col("o_orderkey"), lit(7)) + 1).cast("int"))
          .as("주문구분"),
        element_at(stArr, (pmod(col("o_orderkey"), lit(19)) + 1).cast("int"))
          .as("주문상태"),
        when(pmod(col("o_orderkey"), lit(13)) === 0, lit(null).cast("string"))
          .otherwise(concat(to_date(col("o_orderdate")).cast("string"),
            lit(" 12:34"))).as("주문일시(YYYY-MM-DD HH:MM)"),
        when(pmod(col("o_orderkey"), lit(11)) === 0, lit(null).cast("string"))
          .otherwise(date_add(to_date(col("o_orderdate")), 2).cast("string"))
          .as("송장등록일자(YYYY-MM-DD)"))
      graft.staging.SabangnetOrder.stageInvoice(raw)
    }),

    // ---- sabangnet option dim: QUALIFY latest-first dedup + coalescing
    // MERGE (COALESCE attributes, LEAST/GREATEST validity window) ----
    "q70_sabangnet_option" -> ((s, d) => {
      def raw(df: DataFrame) = df.select(
        concat(lit("O"), pmod(col("l_partkey"), lit(300))).as("상품코드(사방넷)"),
        concat(lit("S"), pmod(col("l_partkey"), lit(300))).as("상품코드(쇼핑몰)"),
        pmod(col("l_suppkey"), lit(5)).cast("string").as("계정등록순번"),
        when(pmod(col("l_linenumber"), lit(4)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("M"), pmod(col("l_partkey"), lit(300))))
          .as("모델명"),
        when(pmod(col("l_linenumber"), lit(3)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("P"), pmod(col("l_partkey"), lit(300))))
          .as("상품명(확정)"),
        when(pmod(col("l_orderkey"), lit(7)) === 0, lit("n/a"))
          .otherwise(floor(col("l_extendedprice")).cast("string"))
          .as("판매가(상품)"),
        col("l_orderkey").cast("string").as("주문번호(쇼핑몰)"),
        when(pmod(col("l_orderkey"), lit(9)) === 0, lit(null).cast("string"))
          .otherwise(concat(to_date(col("l_shipdate")).cast("string"),
            lit(" 12:00"))).as("주문일시(YYYY-MM-DD HH:MM)"))
      val li = Tables.lineitem(s, d)
      val target = F.qualifyTopN(
        graft.staging.SabangnetOrder.stageOption(
          raw(li.filter(pmod(col("l_orderkey"), lit(2)) === 0))),
        Seq(col("account_no"), col("product_id_shop"), col("option_id")),
        graft.staging.SabangnetOrder.optionDedupOrder)
      graft.staging.SabangnetOrder.upsertOption(target,
        raw(li.filter(pmod(col("l_orderkey"), lit(3)) === 0)))
    }),

    // ---- coupang rocket option staging: deeply nested payload, level-5..1
    // display-category COALESCE, struct-presence-gated status ----
    "q71_coupang_rocket" -> ((s, d) => {
      def b(c: Column) = when(c, lit("true")).otherwise(lit("false"))
      val pk = col("p_partkey")
      val cc = concat(
        lit(""","creturnConfigViewDto":{"vendorId":"""),
        when(pmod(pk, lit(4)) === 0, lit("null"))
          .otherwise(concat(lit("\"V"), pmod(pk, lit(3)), lit("\""))),
        lit(""","productName":"""),
        when(pmod(pk, lit(6)) === 0, lit("null"))
          .otherwise(concat(lit("\"CP "), col("p_name"), lit("\""))),
        lit(""","itemName":""""), col("p_brand"), lit("\""),
        lit(""","onSale":"""), b(pmod(pk, lit(3)) =!= 0),
        lit(""","displayCategoryCodeLevel1":"""),
        (pmod(pk, lit(90)) + 100).cast("string"),
        lit(""","displayCategoryCodeLevel3":"""),
        when(pmod(pk, lit(3)) === 0, lit("null"))
          .otherwise((pmod(pk, lit(90)) + 300).cast("string")),
        lit(""","displayCategoryCodeLevel5":"""),
        when(pmod(pk, lit(2)) === 0, lit("null"))
          .otherwise((pmod(pk, lit(90)) + 500).cast("string")),
        lit("}"))
      val payload = concat(
        lit("""{"vendorItemId":"""), pk,
        lit(""","unitsSoldForLast30Days":"""), pmod(pk, lit(50)),
        lit(""","listingDetails":{"vendorInventoryId":"""), pmod(pk, lit(1000)),
        lit(""","productId":"""), pk + 100000,
        lit(""","vendorInventoryName":""""), col("p_name"), lit("\"}"),
        when(pmod(pk, lit(5)) =!= 0, cc).otherwise(lit("")),
        lit(""","inventoryDetails":{"isHiddenByVendor":"""),
        b(pmod(pk, lit(7)) === 0),
        lit(""","orderableQuantity":"""), col("p_size"),
        lit("}}"))
      graft.staging.CoupangProduct.stageRocketOption(
        Tables.part(s, d).select(payload.as("payload")),
        col("payload"), vendorId = "VC99")
    }),

    // ---- smartstore settlement staging: 7-arm settle-type ladder + inline
    // literal dim join + ISO try-parse reject guard ----
    "q72_smartstore_settlement" -> ((s, d) => {
      val stArr = array(
        (graft.staging.SmartstoreSettlement.settleType.map(_._1) :+ "UNKNOWN")
          .map(lit): _*)
      val potArr = array(Seq("PROD_ORDER", "DELIVERY", "REFUND", "REVIEW")
        .map(lit): _*)
      val ok = col("o_orderkey")
      val raw = Tables.orders(s, d).select(
        (ok * 100000 + 7).cast("string").as("productOrderId"),
        ok.cast("string").as("orderId"),
        when(pmod(ok, lit(11)) === 0, lit("bad"))
          .otherwise(pmod(col("o_custkey"), lit(2000)).cast("string"))
          .as("productId"),
        element_at(potArr, (pmod(ok, lit(4)) + 1).cast("int"))
          .as("productOrderType"),
        element_at(stArr, (pmod(ok, lit(8)) + 1).cast("int")).as("settleType"),
        floor(col("o_totalprice")).cast("long").as("paySettleAmount"),
        floor(col("o_totalprice") * 0.03).cast("long")
          .as("totalPayCommissionAmount"),
        floor(col("o_totalprice") * 0.01).cast("long").as("benefitSettleAmount"),
        floor(col("o_totalprice") * 0.96).cast("long").as("settleExpectAmount"),
        when(pmod(ok, lit(13)) === 0, lit("not-a-date"))
          .otherwise(to_date(col("o_orderdate")).cast("string")).as("payDate"),
        when(pmod(ok, lit(5)) === 0, lit(null).cast("string"))
          .otherwise(date_add(to_date(col("o_orderdate")), 14).cast("string"))
          .as("settleCompleteDate"))
      val staged = graft.staging.SmartstoreSettlement.stage(raw, channelSeq = 123L)
      staged.join(
          broadcast(graft.staging.SmartstoreSettlement.settleTypeDim(s)
            .select(col("seq").as("settle_type"),
              col("name").as("settle_type_name"))),
          Seq("settle_type"), "left")
        .select(
          // synthesized ids fit BIGINT; the staged DECIMAL(38,0) (HUGEINT
          // fidelity) must not reach the typed-value compare
          col("product_order_id").cast("bigint").as("product_order_id"),
          col("order_id"), col("channel_seq"), col("product_id"),
          col("product_order_type"), col("settle_type"),
          col("settle_type_name"), col("payment_amount"),
          col("pay_commision_amount"), col("benefit_settle_amount"),
          col("settle_expect_amount"), col("payment_date"),
          col("settlement_date"))
    }),

    // ---- cj eflexs stock staging: yyyyMMdd integer-date parse, TRY_CAST
    // numerics, caller-bound updated_at ----
    "q73_cj_stock" -> ((s, d) => {
      val pk = col("p_partkey")
      val raw = Tables.part(s, d).select(
        concat(lit("I"), pk).as("itemCd"),
        when(pmod(pk, lit(6)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("B"), pk)).as("itemVarcode"),
        (pmod(pk, lit(40)) + 1).cast("string").as("strrId"),
        col("p_name").as("itemNm"),
        concat(lit("W"), pmod(pk, lit(3))).as("whCd"),
        concat(lit("Warehouse "), pmod(pk, lit(3))).as("whNm"),
        concat(lit("Z"), pmod(pk, lit(5))).as("zoneCd"),
        col("p_brand").as("wcellNm"),
        when(pmod(pk, lit(9)) === 0, lit("n/a"))
          .otherwise(pmod(pk, lit(100000)).cast("string")).as("lotNo"),
        pmod(pk, lit(500)).as("invnQty"),
        (pmod(pk, lit(500)) - pmod(pk, lit(7))).as("avlbQty"),
        pmod(pk, lit(7)).as("hldQty"),
        when(pmod(pk, lit(8)) === 0, lit("many"))
          .otherwise(pmod(pk, lit(365)).cast("string")).as("remainInvnDays"),
        date_add(to_date(lit("2025-01-01")), pmod(pk, lit(300)).cast("int"))
          .cast("string").as("validDatetime"),
        (pmod(pk, lit(28)) + 20240101).as("inbDate"))
      graft.staging.CjStock.stage(raw,
        java.time.LocalDateTime.of(2026, 1, 2, 3, 4, 5))
    }),

    // ---- ecount product staging: CONT-slot naming + the NULLIF('0')
    // expiration coalesce ----
    "q74_ecount_product" -> ((s, d) => {
      val pk = col("p_partkey")
      val raw = Tables.part(s, d).select(
        concat(lit("E"), pk).as("PROD_CD"),
        when(pmod(pk, lit(5)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("OPT"), pmod(pk, lit(7)))).as("CONT4"),
        col("p_name").as("PROD_DES"),
        col("p_type").as("CONT6"),
        col("p_brand").as("CONT1"),
        concat(lit("rem-"), pmod(pk, lit(13))).as("REMARKS_WIN"),
        when(pmod(pk, lit(6)) === 0, lit("big"))
          .otherwise(pmod(pk, lit(24)).cast("string")).as("SIZE_DES"),
        concat(lit("U"), pmod(col("p_partkey"), lit(4))).as("UNIT"),
        when(pmod(pk, lit(7)) === 0, lit("n/a"))
          .otherwise(floor(col("p_retailprice")).cast("string")).as("IN_PRICE"),
        when(pmod(pk, lit(3)) === 0, lit("0"))
          .otherwise(concat(lit("26-"), pmod(pk, lit(12)) + 1)).as("CONT2"),
        when(pmod(pk, lit(4)) === 0, lit("0"))
          .otherwise(concat(lit("27-"), pmod(pk, lit(12)) + 1)).as("CONT3"))
      graft.staging.Ecount.stageProduct(raw,
        java.time.LocalDateTime.of(2026, 2, 3, 4, 5, 6))
    }),

    // ---- order_count_mom mart: distinct-countable grain — TVF invoked for
    // the request range + a 2-month lookback, unioned without aggregation,
    // per-month validity windows + formatted date-range label ----
    "q75_order_count_mom" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("order_count_mom", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-03-01", "ds_end_date" -> "1996-03-15",
          "ds_interval_month" -> "2")))
    }),

    // ---- searchad report mart: two-channel UNION ALL with layered
    // COALESCE fallbacks through campaign/ad/product masters ----
    "q76_searchad_report" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("searchad_report_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),

    // ---- relation ranges feeding a big-big range join inside the DAG ----
    "q77_sbn_range_orders" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("orders_by_sbn_range", s)
    }),

    // ---- MAX(batch) freshness probe: report_batch=99 forces the
    // correlated-scalar path (batch 10/20 would pin directly) ----
    "q78_stock_batch_probe" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("stock_report_batch", s,
        graft.models.Params(Map(
          "report_date" -> "1996-06-14", "report_batch" -> "99")))
    }),

    // ---- smartstore bizdata marketing channel: IFNULL('-') barrier on
    // the five PK channel dims + TRY_CAST metrics ----
    "q79_bizdata_channel" -> ((s, d) => {
      val ck = col("c_custkey")
      val raw = Tables.customer(s, d).select(
        when(pmod(ck, lit(7)) === 0, lit(null).cast("string"))
          .otherwise(element_at(array(lit("PC"), lit("MOBILE")),
            (pmod(ck, lit(2)) + 1).cast("int"))).as("deviceCategory"),
        when(pmod(ck, lit(5)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("src"), pmod(ck, lit(4)))).as("ntSource"),
        when(pmod(ck, lit(3)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("med"), pmod(ck, lit(3)))).as("ntMedium"),
        when(pmod(ck, lit(11)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("det"), pmod(ck, lit(2)))).as("ntDetail"),
        when(pmod(ck, lit(2)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("kw"), pmod(ck, lit(50)))).as("ntKeyword"),
        when(pmod(ck, lit(13)) === 0, lit("x"))
          .otherwise(pmod(ck, lit(1000)).cast("string")).as("numUsers"),
        pmod(ck, lit(500)).cast("string").as("numInteractions"),
        pmod(ck, lit(2000)).cast("string").as("pv"),
        pmod(ck, lit(30)).cast("string").as("numPurchases"),
        floor(col("c_acctbal")).cast("string").as("payAmount"))
      graft.staging.SmartstoreBizdata.stageMarketingChannel(raw,
        channelSeq = 42L, ymd = java.time.LocalDate.of(2024, 3, 1))
    }),

    // ---- searchad keyword tool: '< 10' censored counts, Korean
    // competition index, DECIMAL(18,1) click averages (cast DOUBLE at the
    // output boundary per the cross-engine rule) ----
    "q80_searchad_keyword" -> ((s, d) => {
      val pk = col("p_partkey")
      val raw = Tables.part(s, d).select(
        concat(lit("kw-"), pk).as("relKeyword"),
        when(pmod(pk, lit(7)) === 0, lit("< 10"))
          .when(pmod(pk, lit(11)) === 0, lit("NA"))
          .otherwise(pmod(pk, lit(10000)).cast("string")).as("monthlyPcQcCnt"),
        when(pmod(pk, lit(5)) === 0, lit("< 10"))
          .otherwise(pmod(pk, lit(20000)).cast("string")).as("monthlyMobileQcCnt"),
        (pmod(pk, lit(1000)).cast("double") / 10.0).as("monthlyAvePcClkCnt"),
        (pmod(pk, lit(500)).cast("double") / 10.0).as("monthlyAveMobileClkCnt"),
        element_at(array(lit("낮음"), lit("중간"), lit("높음"), lit("?")),
          (pmod(pk, lit(4)) + 1).cast("int")).as("compIdx"),
        pmod(pk, lit(15)).as("plAvgDepth"))
      graft.staging.SearchadKeyword.stage(raw,
          today = java.time.LocalDate.of(2026, 3, 1))
        .withColumn("monthly_avg_click_cnt_pc",
          col("monthly_avg_click_cnt_pc").cast("double"))
        .withColumn("monthly_avg_click_cnt_mo",
          col("monthly_avg_click_cnt_mo").cast("double"))
    }),

    // ---- coupang product-ad report: comma-grouped numerics, ELSE-2
    // placement recode, conv-option COALESCE-to-0, yyyyMMdd integer date,
    // re-aggregation to the PK grain ----
    "q81_coupang_ads" -> ((s, d) => {
      def commas(x: Column) = when(x >= 1000,
          concat(floor(x / 1000).cast("long").cast("string"), lit(","),
            lpad(pmod(x, lit(1000)).cast("string"), 3, "0")))
        .otherwise(x.cast("string"))
      val okey = col("l_orderkey"); val pkey = col("l_partkey")
      val d8 = (year(to_date(col("l_shipdate"))) * 10000 +
        month(to_date(col("l_shipdate"))) * 100 +
        dayofmonth(to_date(col("l_shipdate")))).cast("long")
      val raw = Tables.lineitem(s, d).select(
        pmod(okey, lit(200)).cast("string").as("캠페인 ID"),
        pmod(pkey, lit(100)).cast("string").as("광고집행 옵션ID"),
        when(pmod(pkey, lit(6)) === 0, lit(null).cast("string"))
          .otherwise((pmod(pkey, lit(100)) + 1000).cast("string"))
          .as("광고전환매출발생 옵션ID"),
        element_at(array(lit("검색 영역"), lit("비검색 영역"),
            lit("로켓채널"), lit("외부채널")),
          (pmod(col("l_linenumber"), lit(4)) + 1).cast("int"))
          .as("광고 노출 지면"),
        commas(pmod(okey * 7, lit(5000))).as("노출수"),
        commas(pmod(okey, lit(97))).as("클릭수"),
        commas(pmod(pkey * 13, lit(300000))).as("광고비"),
        commas(pmod(okey, lit(9))).as("총 주문수(1일)"),
        commas(pmod(okey * 31, lit(2000000))).as("총 전환매출액(1일)"),
        d8.as("날짜"))
      graft.staging.CoupangAdsReport.stageProductAdReport(raw, vendorId = "VND1")
    }),

    // ---- hcenter pageview by product: URL-shape classifier — product
    // URLs extract their trailing id, main pages get sentinel 10, other
    // shapes drop ----
    "q82_pageview_product" -> ((s, d) => {
      val pk = col("p_partkey")
      val url = when(pmod(pk, lit(4)) === 0,
          concat(lit("\"/shop7/products/"), pk, lit("\"")))
        .when(pmod(pk, lit(4)) === 1,
          concat(lit("\"/shop"), pmod(pk, lit(9)), lit("\"")))
        .when(pmod(pk, lit(4)) === 2, lit("\"/shop/x/y\""))
        .otherwise(lit("null"))
      val payload = concat(
        lit("""{"measuredThrough":{"device":"Pc","url":"""), url,
        lit("""},"visit":{"pageClick":"""), pmod(pk, lit(100)),
        lit(""","userClick":"""), pmod(pk, lit(50)),
        lit(""","timeOnSite":"""), pmod(pk, lit(10000)),
        lit("""},"ymd":"2024-02-03"}"""))
      graft.staging.HcenterPageview.stageByProduct(
        Tables.part(s, d).select(payload.as("payload")),
        col("payload"), mallSeq = 55L)
    }),

    // ---- dable daily report: '-' campaign bucket, zero-impression
    // guard, yyyyMMdd string date ----
    "q83_dable_report" -> ((s, d) => {
      val ok = col("o_orderkey")
      val raw = Tables.orders(s, d).select(
        when(pmod(ok, lit(7)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("C"), pmod(col("o_custkey"), lit(100))))
          .as("campaign_id"),
        concat(lit("Campaign "), pmod(col("o_custkey"), lit(100)))
          .as("campaign_name"),
        pmod(ok, lit(1000)).as("exposes"),
        pmod(ok, lit(500)).as("impressions"),
        pmod(ok, lit(50)).as("clicks"),
        floor(col("o_totalprice") * 0.01).as("cost_spent"),
        pmod(ok, lit(9)).as("convertion_cnt"),
        date_format(to_date(col("o_orderdate")), "yyyyMMdd").as("ymd"))
      graft.staging.DableReport.stageDailyReport(raw)
    }),

    // ---- google ads campaign master: nested GAQL resources, micros →
    // currency normalization, try-parsed start time ----
    "q84_google_campaign" -> ((s, d) => {
      val ck = col("c_custkey")
      def opt(cond: Column, v: Column) = when(cond, lit("null")).otherwise(v)
      val payload = concat(
        lit("""{"campaign":{"id":"GC"""), ck,
        lit("""","name":""""), col("c_name"),
        lit("""","advertisingChannelType":""""),
        element_at(array(lit("SEARCH"), lit("SHOPPING"), lit("VIDEO")),
          (pmod(ck, lit(3)) + 1).cast("int")),
        lit("""","status":""""),
        element_at(array(lit("ENABLED"), lit("PAUSED"), lit("REMOVED")),
          (pmod(ck, lit(3)) + 1).cast("int")),
        lit("""","biddingStrategyType":"TARGET_ROAS","startDateTime":""""),
        when(pmod(ck, lit(17)) === 0, lit("bad"))
          .otherwise(concat(
            date_add(to_date(lit("2024-01-01")), pmod(ck, lit(300)).cast("int"))
              .cast("string"),
            lit(" 10:30:00"))),
        lit(""""},"campaignBudget":{"amountMicros":"""),
        opt(pmod(ck, lit(6)) === 0,
          when(pmod(ck, lit(13)) === 0, lit("\"x\""))
            .otherwise(concat(lit("\""), pmod(ck, lit(1000)) * 1000003, lit("\"")))),
        lit("""},"metrics":{"impressions":"""),
        opt(pmod(ck, lit(9)) === 0,
          concat(lit("\""), pmod(ck, lit(90000)), lit("\""))),
        lit(""","clicks":""""), pmod(ck, lit(4000)),
        lit("""","costMicros":""""), pmod(ck, lit(500)) * 2000003,
        lit(""""}}"""))
      graft.staging.GoogleAds.stageCampaign(
        Tables.customer(s, d).select(payload.as("payload")),
        col("payload"), customerId = 991L)
    }),

    // ---- meta ads insights: metrics fan-out + ISO-T date parse ----
    "q85_meta_insights" -> ((s, d) => {
      val ok = col("o_orderkey")
      val raw = Tables.orders(s, d).select(
        concat(lit("MC"), pmod(col("o_custkey"), lit(50))).as("campaign_id"),
        concat(lit("AS"), pmod(ok, lit(200))).as("adset_id"),
        concat(lit("AD"), ok).as("ad_id"),
        pmod(ok, lit(3000)).as("impressions"),
        pmod(ok, lit(1500)).as("reach"),
        pmod(ok, lit(80)).as("clicks"),
        pmod(ok, lit(40)).as("inline_link_clicks"),
        floor(col("o_totalprice") * 0.02).as("spend"),
        when(pmod(ok, lit(19)) === 0, lit("oops"))
          .otherwise(to_date(col("o_orderdate")).cast("string")).as("date_start"))
      graft.staging.MetaAds.stageInsights(raw, accountId = "ACC1")
    }),

    // ---- searchad center report: '(삭제)' tombstone strip, ELSE-2
    // device/network recodes, DECIMAL quality metrics ----
    "q86_center_report" -> ((s, d) => {
      val ok = col("o_orderkey")
      val raw = Tables.orders(s, d).select(
        concat(lit("nad-"), pmod(ok, lit(5000)),
          when(pmod(ok, lit(9)) === 0, lit("(삭제)")).otherwise(lit("")))
          .as("nccAdId"),
        element_at(array(lit("네이버"), lit("파트너")),
          (pmod(ok, lit(2)) + 1).cast("int")).as("mediaNm"),
        element_at(array(lit("PC"), lit("모바일"), lit("기타채널")),
          (pmod(ok, lit(3)) + 1).cast("int")).as("pcMblTp"),
        element_at(array(lit("검색"), lit("콘텐츠"), lit("믹스")),
          (pmod(col("o_custkey"), lit(3)) + 1).cast("int")).as("ntwkTp"),
        pmod(ok, lit(10000)).as("impCnt"),
        pmod(ok, lit(300)).as("clkCnt"),
        floor(col("o_totalprice") * 0.05).as("salesAmt"),
        pmod(ok, lit(20)).as("ccnt"),
        floor(col("o_totalprice") * 0.3).as("convAmt"),
        (pmod(ok, lit(70)).cast("double") / 10.0).as("avgRnk"),
        (pmod(ok, lit(800)).cast("double") / 100.0).as("pv"),
        (pmod(ok, lit(30000)).cast("double") / 100.0).as("stayTm"),
        to_date(col("o_orderdate")).cast("string").as("ymd"))
      graft.staging.SearchadCenterReport.stageDailyReport(raw, customerId = 777)
        .withColumn("avg_rank", col("avg_rank").cast("double"))
        .withColumn("page_view_per_visit",
          col("page_view_per_visit").cast("double"))
        .withColumn("stay_time_per_visit",
          col("stay_time_per_visit").cast("double"))
    }),

    // ---- gfa campaign master: numbered-objective ladder (101-108),
    // boolean derivations ----
    "q87_gfa_campaign" -> ((s, d) => {
      val ck = col("c_custkey")
      val raw = Tables.customer(s, d).select(
        ck.as("no"),
        col("c_name").as("name"),
        element_at(array(
          (graft.staging.GfaReport.campaignType.map(_._1) :+ "OTHER")
            .map(lit): _*),
          (pmod(ck, lit(9)) + 1).cast("int")).as("objective"),
        pmod(ck, lit(97)).as("adAccountNo"),
        (pmod(ck, lit(2)) === 0).as("activated"),
        (pmod(ck, lit(5)) === 0).as("deleted"))
      graft.staging.GfaReport.stageCampaign(raw)
    }),

    // ---- naver openapi blog search: page-relative display rank, HTML
    // tag strip, yyyyMMdd post date ----
    "q88_blog_search" -> ((s, d) => {
      val pk = col("p_partkey")
      val raw = Tables.part(s, d).select(
        pk.as("__ord"),
        concat(lit("<b>"), col("p_name"), lit("</b> 리뷰")).as("title"),
        concat(lit("https://blog.example/"), pk).as("link"),
        concat(lit("great <i>"), col("p_brand"), lit("</i> product"))
          .as("description"),
        concat(lit("blogger"), pmod(pk, lit(50))).as("bloggername"),
        concat(lit("https://b.example/u"), pmod(pk, lit(50))).as("bloggerlink"),
        when(pmod(pk, lit(11)) === 0, lit("20240230"))
          .otherwise(date_format(
            date_add(to_date(lit("2024-01-01")), pmod(pk, lit(300)).cast("int")),
            "yyyyMMdd")).as("postdate"))
      graft.staging.NaverOpenapiSearch.stageBlogSearch(raw,
        keyword = "스파크", start = 11, orderCol = col("__ord"))
    }),

    // ---- smartstore product master: 12-arm delivery ladder, ISO-T
    // timestamps, TRY_CAST ids ----
    "q89_smartstore_product" -> ((s, d) => {
      val pk = col("p_partkey")
      val dlv = array(
        (graft.staging.SmartstoreProduct.deliveryType.map(_._1) :+ "OTHER")
          .map(lit): _*)
      val raw = Tables.part(s, d).select(
        (pk + 5000000).cast("string").as("channelProductNo"),
        (pk + 4000000).cast("string").as("originProductNo"),
        when(pmod(pk, lit(7)) === 0, lit("x"))
          .otherwise(pmod(pk, lit(90000)).cast("string")).as("modelId"),
        col("p_name").as("name"),
        concat(lit("MG"), pmod(pk, lit(1000))).as("sellerManagementCode"),
        concat(lit("MD"), pmod(pk, lit(500))).as("modelName"),
        col("p_brand").as("brandName"),
        when(pmod(pk, lit(13)) === 0, lit("?"))
          .otherwise(pmod(pk, lit(800)).cast("string")).as("categoryId"),
        element_at(array(lit("SALE"), lit("WAIT"), lit("OUTOFSTOCK")),
          (pmod(pk, lit(3)) + 1).cast("int")).as("statusType"),
        element_at(array(lit("ON"), lit("WAIT"), lit("SUSPENSION")),
          (pmod(pk, lit(2)) + 1).cast("int"))
          .as("channelProductDisplayStatusType"),
        concat(lit("tag"), pmod(pk, lit(20))).as("sellerTags"),
        pmod(pk, lit(100000)).as("salePrice"),
        floor(col("p_retailprice")).as("discountedPrice"),
        element_at(dlv, (pmod(pk, lit(13)) + 1).cast("int"))
          .as("deliveryAttributeType"),
        pmod(pk, lit(5000)).as("deliveryFee"),
        when(pmod(pk, lit(17)) === 0, lit("nope"))
          .otherwise(concat(
            date_add(to_date(lit("2023-06-01")), pmod(pk, lit(200)).cast("int"))
              .cast("string"),
            lit("T10:11:12+09:00"))).as("regDate"),
        concat(
          date_add(to_date(lit("2024-02-01")), pmod(pk, lit(100)).cast("int"))
            .cast("string"),
          lit("T23:59:59")).as("modifiedDate"))
      graft.staging.SmartstoreProduct.stageProduct(raw, channelSeq = 31L)
    }),

    // ---- sabangnet account master: rename projection over the admin
    // account feed ----
    "q90_sabangnet_account" -> ((s, d) => {
      val ck = col("c_custkey")
      val raw = Tables.customer(s, d).select(
        ck.cast("string").as("acntRegsSrno"),
        concat(lit("SHOP"), pmod(ck, lit(200))).as("shmaId"),
        col("c_name").as("shmaNm"),
        element_at(array(lit("오픈마켓"), lit("종합몰"), lit("전문몰")),
          (pmod(ck, lit(3)) + 1).cast("int")).as("olMktTydvsDivNm"),
        concat(lit("user"), pmod(ck, lit(50))).as("shmaCnctnLoginId"),
        pmod(ck, lit(30)).cast("string").as("sortSrno"),
        concat(lit("https://shop.example/"), pmod(ck, lit(200)))
          .as("shmaUrlAddr"),
        col("c_mktsegment").as("corpNm"),
        element_at(array(lit("Y"), lit("N")),
          (pmod(ck, lit(2)) + 1).cast("int")).as("useYn"))
      graft.staging.SabangnetAccount.stageAccount(raw)
    }),

    // ---- hcenter brand catalog: '>'-path category levels, NULLIF(0)
    // maker, nested payload ----
    "q91_brand_catalog" -> ((s, d) => {
      val pk = col("p_partkey")
      val fid = element_at(array(lit("10"), lit("10>21"), lit("10>21>32"),
        lit("10>21>32>4x")), (pmod(pk, lit(4)) + 1).cast("int"))
      val fnm = element_at(array(lit("가전"), lit("가전>주방"),
        lit("가전>주방>소형"), lit("가전>주방>소형>기타")),
        (pmod(pk, lit(4)) + 1).cast("int"))
      val payload = concat(
        lit("""{"identifier":"""), pk,
        lit(""","prodName":""""), col("p_name"),
        lit("""","makerSeq":"""),
        when(pmod(pk, lit(6)) === 0, lit(0)).otherwise(pmod(pk, lit(400))),
        lit(""","makerName":"MK"""), pmod(pk, lit(400)),
        lit("""","brandSeq":"""), pmod(pk, lit(300)),
        lit(""","brandName":""""), col("p_brand"),
        lit("""","category":{"identifier":""""), pmod(pk, lit(800)),
        lit("""","name":"소형","fullId":""""), fid,
        lit("""","fullName":""""), fnm,
        lit(""""},"lowestPrice":"""), pmod(pk, lit(100000)),
        lit(""","productCount":"""), pmod(pk, lit(500)),
        lit(""","totalReviewCount":"""), pmod(pk, lit(10000)),
        lit(""","registerDate":""""),
        date_add(to_date(lit("2022-01-01")), pmod(pk, lit(400)).cast("int"))
          .cast("string"),
        lit("""T08:09:10+09:00"}"""))
      graft.staging.HcenterCatalog.stageBrandCatalog(
        Tables.part(s, d).select(payload.as("payload")), col("payload"))
    }),

    // ---- opex daily spread: date-range expense over a generated day
    // scaffold, remainder to the first day ----
    "q92_opex_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("opex_daily", s)
    }),

    // ---- cj invoice/order: two carrier feeds normalized + unioned +
    // re-aggregated to order grain ----
    "q93_cj_invoice_order" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("cj_invoice_order", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-06-30")))
    }),

    // ---- sales target vs actual: month pivot + FULL OUTER against the
    // target table + broadcast single-row period struct ----
    "q94_sales_target" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("sales_target", s,
        graft.models.Params(Map("pivot_month" -> "1996-03-01")))
    }),

    // ---- cross-platform ad report: four channel dailies harmonized and
    // unioned under platform labels ----
    "q95_adreport_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("adreport_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),

    // ---- stock batch times: 17:00-cutoff batch assignment over three
    // channel feeds, conditional per-channel MAX update times ----
    "q96_stock_time_batch" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("stock_time_batch", s)
    }),

    // ---- option master: enrichment joins + the REPEAT('9') sentinel
    // sort key (all-9s at the max key's width, >= every real key) ----
    "q97_option_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("option_master", s)
    }),

    // ---- enriched order-grain profit view: fact through product/status
    // dims with declared COALESCE fallbacks + conditional unit-name ----
    "q98_order_profit_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("order_profit_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),

    // ---- total order: bundle explosion + payment concentration +
    // cost-weighted order reallocation + daily rollup (the reference's
    // largest mart, channel steps 2-5 + 10) ----
    "q99_total_order" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("total_order", s)
    }),

    // ---- ad-platform master marts (intermediate/ads dbt family): literal
    // mapping dims as codegen map-lookups, GREATEST worst-status ladders,
    // level-COALESCE bundle relation, arithmetic sort keys ----
    "q100_gads_campaign_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("google_campaign_master", s)
    }),
    "q101_gads_adgroup_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("google_adgroup_master", s)
    }),
    "q102_gads_ad_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("google_ad_master", s)
    }),
    "q103_meta_campaign_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("meta_campaign_master", s)
    }),
    "q104_meta_adset_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("meta_adset_master", s)
    }),
    "q105_meta_ad_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("meta_ad_master", s)
    }),
    "q106_cads_campaign_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("cads_campaign_master", s)
    }),
    "q107_cads_adgroup_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("cads_adgroup_master", s)
    }),
    "q108_nsa_adgroup_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("nsa_adgroup_master", s)
    }),

    // ---- product-mart family (marts/product dbt family + core__brand_
    // master): double-QUALIFY brand dedup + distributed global brand_seq,
    // bundle-exploded primary options, the POWER(10, MAX(LENGTH)) scale
    // scalar, ordered STRING_AGG bundle names, REPEAT('9') sentinel keys ----
    "q109_brand_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("core_brand_master", s)
    }),
    "q110_smartstore_product_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("smartstore_product_master", s)
    }),
    "q111_sabangnet_product_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("sabangnet_product_master", s)
    }),
    "q112_sabangnet_option_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("sabangnet_option_master", s)
    }),
    "q113_coupang_option_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("coupang_option_master", s)
    }),

    // ---- report/relation marts: monthly profit rollup, latest-batch-per-
    // month stock cost with zero-cost fallbacks, gated primary/fallback ds
    // marts, the 4-depth category relation ladder, the sentinel-rewrite
    // ranged relation, the renewal-aware dable explode, invoice-grain cj ----
    "q114_profit_monthly" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("profit_monthly", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),
    "q115_stock_cost_mom" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("stock_cost_mom", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-04-01", "ds_end_date" -> "1996-06-30",
          "ds_interval_month" -> "3")))
    }),
    // report_date 2024-01-31 has no events → the fallback (01-30) must
    // survive the emptiness gate: this query exercises the fallback path
    "q116_stock_time_ds" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("stock_time_ds", s,
        graft.models.Params(Map(
          "report_date" -> "2024-01-31", "report_batch" -> "30")))
    }),
    "q117_nsh_grp_relation" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("nsh_prd_to_grp_id", s)
    }),
    "q118_smt_ranged_relation" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("smt_prd_ranged_relation", s)
    }),
    "q119_dable_report" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("dable_report_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),
    "q120_cj_invoice" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("cj_invoice", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-06-30")))
    }),
    // 1996-06-15 has stock rows → the primary survives and the fallback is
    // gated out: this query exercises the primary path
    "q121_stock_report_ds" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("stock_report_ds", s,
        graft.models.Params(Map(
          "report_date" -> "1996-06-15", "report_batch" -> "30")))
    }),

    // ---- per-channel order counts: status-priority ladders (core feed
    // overrides channel codes), bundle fallback chains, explode + the
    // '9'-prefix downgrade, channel rule quirks (shop rewrite/exclusion,
    // quantity-conditioned bundle rewrite, week-widened prefilter) ----
    "q122_smartstore_order_count" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("smartstore_order_count", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-06-30")))
    }),
    "q123_sabangnet_order_count" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("sabangnet_order_count", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-06-30")))
    }),
    // mid-week bounds on purpose: the pre-aggregation window widens to
    // whole weeks (01-01..06-30), so late-arriving same-order rows outside
    // the exact range fold into the MAX/SUM before the exact filter
    "q124_coupang_order_count" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("coupang_order_count", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-03", "ds_end_date" -> "1996-06-26")))
    }),

    // ---- coupang rocket sales daily: FULL OUTER sales⋈shipping merge,
    // LEAD-banded delivery tiers + BETWEEN band join, per-option MAX
    // window extra, 3-metric cost-weighted split with remainder repair ----
    "q125_coupang_sales_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("coupang_sales_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-03", "ds_end_date" -> "1996-06-26")))
    }),

    // ---- stock-delta inferred sales: LEAD snapshots, option/product
    // anti-join disambiguation, ±window quartile self-join, tiered
    // correction fence (Q3 + 5·IQR floored at 100) ----
    "q126_nsh_stock_sales" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("nsh_stock_sales", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-03-01", "ds_end_date" -> "1996-03-31")))
    }),

    // ---- smartstore→sabangnet option matcher: 3-strategy auto-match
    // (id / runtime-built quantity-placeholder regex / bracket-group +
    // space-stripped OR join), best-bundle QUALIFY, curated passthrough ----
    "q127_smt_opt_relation" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("smt_opt_to_sbn_ids", s)
    }),

    // ---- sabangnet sales daily (the reference's largest sales mart):
    // payment concentration with the shop0666 threshold wart, DECIMAL-free
    // integer net-rate rounding, CJ delivery fallback chain (±7d widened
    // model invocations), banded max-fee resolution by |fee|, and TWO
    // cost-weighted allocation stages ----
    "q128_sabangnet_sales_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("sabangnet_sales_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-02-01", "ds_end_date" -> "1996-04-30")))
    }),

    // ---- smartstore sales daily (the third sales-daily sibling,
    // closing the reference's mart trio): channel money columns
    // (unit+option price × qty − seller discount), sentinel-bundled
    // explode with the '9'-component status-6 downgrade and ZEROED cost,
    // product-grain ecount sheet, CJ fallback chain, the n_arrival
    // delivery-type-7 tier branch the sabangnet sibling never reaches,
    // and both cost-weighted allocation stages ----
    "q239_smartstore_sales_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("smartstore_sales_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-02-01", "ds_end_date" -> "1996-04-30")))
    }),

    // ---- Delta RESTORE through a DV DELETE, oracle-anchored: v0 MERGE,
    // v1 deletion-vector DELETE of doc_id % 10 = 3, v2 RESTORE to v0 —
    // the current state must equal the RAW fixture again (the re-add
    // drops the vector), so the oracle is the unfiltered aggregate ----
    "q240_delta_restore" -> ((s, d) => {
      val root = Fixtures.buildOnce(d, "q240", "restore-v1") { r =>
        graft.sources.Sinks.upsertParquet(s, r,
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            col("n_chars")), keys = Seq("doc_id"))
        graft.sources.DeletionVectors.deleteDeltaWhere(s, r,
          pmod(col("doc_id"), lit(10)) === 3)
        graft.sources.Sinks.restoreDeltaTable(s, r, 0L)
      }
      graft.sources.Sinks.readDeltaTableAt(s, root)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // ---- TIMESTAMP AS OF time travel, oracle-anchored: q224's table
    // (v0 MERGE, v1 DV DELETE), version resolved from v1's own
    // commitInfo wall clock — the read must serve the DELETE state,
    // i.e. the survivors of doc_id % 10 <> 3 ----
    "q241_timestamp_travel" -> ((s, d) => {
      val root = q224DeltaTable(s, d)
      val ts1 = graft.sources.Sinks.deltaHistory(s, root)
        .filter(col("version") === 1L)
        .select(col("timestamp")).head().getTimestamp(0).getTime
      graft.sources.Sinks.readDeltaTableAsOf(s, root, ts1)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // ---- per-channel insight dailies (intermediate/ads dbt family):
    // ranged 3-level bundle ladder + account fallback, ad-day ANY_VALUE
    // re-aggregation, renewal-mapped div/mod bundle explode ----
    "q129_gads_insight_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("google_insight_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),
    "q130_meta_insight_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("meta_insight_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),
    "q131_cads_insight_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("cads_insight_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),

    // ---- per-channel report-daily marts (marts/ads dbt family): insight
    // enriched through ad/campaign masters + product master + mapping
    // dims, COALESCE fallbacks on every dimension ----
    "q132_gads_report_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("google_report_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),
    "q133_meta_report_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("meta_report_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),
    "q134_cads_report_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("cads_report_daily", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),

    // ---- full searchad masters (intermediate/ads/searchad dbt family):
    // dual label maps off one code column, product-relation-first bundle
    // COALESCE, 3-input Kleene enable, 5-level sort ladders ----
    "q135_sa_campaign_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("sa_campaign_master", s)
    }),
    "q136_sa_ad_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("sa_ad_master", s)
    }),
    "q137_sa_contract_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("sa_contract_master", s)
    }),

    // ---- contract day-expansion fact (searchad__contract_daily.sql):
    // bounded day explode + equal-split, adgroup daily bundle rules with
    // sorted-distinct aggregation, 6-level bundle COALESCE ----
    "q138_sa_contract_daily" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("sa_contract_daily", s)
    }),

    // ---- smartstore option master (marts/product dbt family): channel +
    // full product-master DAG enrichment, REPEAT('9') sentinel sized by a
    // MAX over the join result (broadcast single-row agg, no global
    // window) ----
    "q139_smt_option_master" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("smartstore_option_master", s)
    }),

    // ---- batch stock-quantity family (intermediate/stock dbt family):
    // 17:00-cutoff batch stamps, csv item-code mapping, timestamp-validity
    // expiration join + ':qty' bundle multipliers, and the three-channel
    // core union with the sku→ecount QUALIFY repair map ----
    "q140_cj_stock_batch" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("cj_eflexs_stock_qty_batch", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),
    "q141_cpg_stock_batch" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("coupang_rfm_stock_qty_batch",
        s, graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),
    "q142_core_stock_batch" -> ((s, d) => {
      graft.models.Analytics.registry(d).run("core_stock_qty_batch", s,
        graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-12-31")))
    }),

    // ---- searchad contract staging (core/searchad/api/contract/models
    // .sql): two payload shapes → one PK'd table, per-payload status
    // ladders, the +9h KST date shift, TRY_CAST tolerance, DECIMAL VAT
    // uplift, and the second load's ON CONFLICT DO NOTHING ----
    "q143_searchad_contract" -> ((s, d) => {
      val ok = col("o_orderkey")
      def fmt(days: Int, hoursSql: String) = date_format(
        expr(s"cast(o_orderdate AS timestamp) + make_interval(0, 0, 0, " +
          s"$days, cast($hoursSql AS INT), 0, 0)"),
        "yyyy-MM-dd HH:mm:ss")
      val nullS = lit(null).cast("string")
      val timeRaw = Tables.orders(s, d).filter(pmod(ok, lit(3)) === 0)
        .select(
          concat(lit("TC"), ok).as("nccTimeContractId"),
          concat(lit("grp-"), pmod(ok, lit(500))).as("nccAdgroupId"),
          pmod(col("o_custkey"), lit(1000)).as("customerId"),
          concat(lit("CT"), ok).as("contractName"),
          element_at(array((graft.staging.SearchadContract.timeStatus
              .map(_._1) :+ "ODD").map(lit): _*),
            (pmod(ok, lit(7)) + 1).cast("int")).as("contractStatus"),
          floor(col("o_totalprice")).cast("long").as("paymentAmt"),
          when(pmod(ok, lit(4)) === 0,
            floor(col("o_totalprice") * 0.05).cast("long"))
            .otherwise(lit(null).cast("long")).as("refundAmt"),
          pmod(ok, lit(50)).as("contractQc"),
          pmod(ok, lit(200)).as("totalKeywordQc"),
          when(pmod(ok, lit(13)) === 0, lit("-"))
            .otherwise(fmt(0, "o_orderkey % 24")).as("regTm"),
          fmt(0, "o_custkey % 24").as("editTm"),
          fmt(0, "o_orderkey % 24").as("contractStartDt"),
          fmt(30, "o_orderkey % 24").as("contractEndDt"),
          when(pmod(ok, lit(9)) === 0, lit("bad"))
            .otherwise(fmt(2, "o_orderkey % 24"))
            .as("exposureStartDt"),
          when(pmod(ok, lit(9)) === 0, nullS)
            .otherwise(fmt(12, "o_orderkey % 24"))
            .as("exposureEndDt"),
          when(pmod(ok, lit(11)) === 0, fmt(5, "o_orderkey % 24"))
            .otherwise(nullS).as("cancelTm"))
      val bnRaw = Tables.orders(s, d).filter(pmod(ok, lit(3)) === 1)
        .select(
          when(pmod(ok, lit(17)) === 0, concat(lit("TC"), ok + 2))
            .otherwise(concat(lit("BC"), ok)).as("brandNewContractId"),
          concat(lit("grp-"), pmod(ok, lit(500))).as("nccAdgroupId"),
          pmod(col("o_custkey"), lit(1000)).as("customerId"),
          concat(lit("BN"), ok).as("contractName"),
          element_at(array((graft.staging.SearchadContract.brandNewStatus
              .map(_._1) :+ "ODD").map(lit): _*),
            (pmod(ok, lit(13)) + 1).cast("int")).as("contractStatus"),
          floor(col("o_totalprice")).cast("long").as("paymentAmt"),
          when(pmod(ok, lit(5)) === 0,
            floor(col("o_totalprice") * 0.03).cast("long"))
            .otherwise(lit(null).cast("long")).as("refundAmt"),
          when(pmod(ok, lit(13)) === 0, lit("-"))
            .otherwise(fmt(0, "o_orderkey % 24")).as("regTm"),
          fmt(0, "o_custkey % 24").as("editTm"),
          fmt(0, "o_orderkey % 24").as("contractStartDt"),
          fmt(45, "o_orderkey % 24").as("contractEndDt"),
          when(pmod(ok, lit(9)) === 0, lit("bad"))
            .otherwise(fmt(3, "o_orderkey % 24"))
            .as("exposureStartDt"),
          when(pmod(ok, lit(9)) === 0, nullS)
            .otherwise(fmt(15, "o_orderkey % 24"))
            .as("exposureEndDt"),
          when(pmod(ok, lit(7)) === 0, fmt(6, "o_orderkey % 24"))
            .otherwise(nullS).as("cancelTm"))
      graft.staging.SearchadContract.stageAll(timeRaw, bnRaw)
    }),

    // ---- deterministic sketches (the 100 TB profiling path): KMV
    // distinct estimate and hash-sampled heavy hitters, both driven by
    // the cross-engine md5 hash family so the estimates are pure
    // functions of the corpus — same answer in Spark and DuckDB ----
    // order keys: n_orders distinct values (15k at sf0.01, 150k at
    // sf0.1), so k=1024 « distinct exercises the true estimation path —
    // the classic "how many distinct ids" profiling question (every
    // synthetic STRING column here has < 100 distinct values, degenerate
    // for a sketch); the heavy-hitter pass profiles event traffic by
    // user, each kept user's count exact and scaled by the sample rate
    "q144_kmv_distinct" -> ((s, d) => {
      val keys = Tables.orders(s, d).select(col("o_orderkey").as("key"))
      graft.operators.Sketches.kmvDistinct(keys, col("key"), k = 1024)
    }),
    "q145_sampled_topk" -> ((s, d) => {
      val users = Tables.events(s, d).select(col("user_id"))
      graft.operators.Sketches.hashSampledTopK(users, col("user_id"),
        sampleBits = 2, topN = 20)
    }),
    "q146_sampled_quantiles" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_totalprice"))
      graft.operators.Sketches.hashSampledQuantiles(o, col("o_orderkey"),
        col("o_totalprice"), probs = Seq(0.5, 0.9, 0.99), sampleBits = 4)
    }),

    // ---- cross-split n-gram decontamination: flag eval-split docs whose
    // shingles leak from the train split (content-stable split + one
    // distinct-shingle join) ----
    "q147_decontaminate" -> ((s, d) => {
      graft.operators.TextAnalysis.crossSplitContamination(
        Tables.documents(s, d), col("doc_id"), col("text"),
        Seq("train" -> 90, "val" -> 5, "test" -> 5), "train",
        n = 3, minShared = 3)
    }),

    // ---- dbt_postgres dialect variants (SURVEY §2.7 plain UNION, A10
    // MEDIAN): the two semantics unique to the PG project. q148 ports the
    // stock_cost_mom fallback shape (dbt_postgres/models/marts/stock/
    // analytics__stock_cost_mom.sql:83-97): two overlapping date-sliced
    // projections combined with plain UNION — set-dedup, not UNION ALL —
    // then re-aggregated. q149 is the PG grouped-median form
    // (percentile_cont(0.5) WITHIN GROUP — PG's spelling of A10's median;
    // DuckDB replays it as native MEDIAN). ----
    "q148_pg_union_dedup" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_custkey").as("cust_id"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_ym"))
      // overlapping slices: ds range vs monthly lookback (1995 H1 ∪ 1995)
      val dsRange = o.filter(col("order_ym").between("1995-01", "1995-06"))
      val lookback = o.filter(col("order_ym").between("1995-01", "1995-12"))
      dsRange.union(lookback).distinct()
        .groupBy(col("order_ym"))
        .agg(count(lit(1)).as("n_pairs"))
    }),
    "q149_pg_median" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_quantity").cast("bigint").as("qty"),
          expr("cast(floor(l_extendedprice) AS BIGINT)").as("price"))
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY qty)")
            .cast("double").as("median_qty"),
          expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY price)")
            .cast("double").as("median_price"),
          count(lit(1)).as("n_rows"))
    }),

    // ---- Gopher-style within-document repetition metrics (Rae et al.
    // 2021 §A.1.1): total/distinct/top bigram counts + duplicate-bigram
    // fraction — the standard boilerplate/degenerate-repetition filter
    // for a pretraining corpus ----
    "q150_repetition" -> ((s, d) => {
      graft.operators.TextAnalysis.repetitionMetrics(
        Tables.documents(s, d), col("doc_id"), col("text"), n = 2)
    }),

    // ---- PII detection + redaction over a deterministically PII-
    // augmented corpus (the raw fixture has no emails/phones, so both
    // engines inject the same synthetic contacts — what's verified is
    // the count + redact contract itself, incl. email-before-phone
    // ordering so an email's digits aren't half-eaten) ----
    "q151_pii_redact" -> ((s, d) => {
      val aug = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit(" contact user"), col("doc_id"),
              lit("@example.com"))).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat(lit(" call 010-"),
              lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
              lit("-1234"))).otherwise(lit(""))).as("text"))
      graft.operators.TextAnalysis.redactPii(aug, col("doc_id"), col("text"))
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          md5(col("redacted")).as("redacted_md5"))
    }),

    // ---- corpus curation: deterministic stratified sample (content-hash
    // acceptance — rerun-stable, partitioning-independent, no RNG) ----
    "q153_stratified_sample" -> ((s, d) => {
      val doc = Tables.documents(s, d).withColumn("stratum",
        when(col("n_chars") < 250, "short")
          .when(col("n_chars") < 350, "mid").otherwise("long"))
      graft.operators.Sampling.stratifiedSample(doc, col("doc_id"),
          col("stratum"),
          Seq("short" -> 0.25, "mid" -> 0.5, "long" -> 1.0))
        .select(col("doc_id"), col("stratum"))
    }),

    // ---- corpus curation: weighted mix — per-corpus epoch counts with a
    // deterministic fractional copy (the data-mixing step that assembles
    // a training set from source corpora) ----
    "q154_corpus_mix" -> ((s, d) => {
      val doc = Tables.documents(s, d).withColumn("corpus",
        when(col("n_chars") < 250, "short")
          .when(col("n_chars") < 350, "mid").otherwise("long"))
      graft.operators.Sampling.corpusMix(doc, col("doc_id"),
          col("corpus"), Seq("short" -> 2.5, "mid" -> 1.0, "long" -> 0.25))
        .select(col("doc_id"), col("corpus"),
          col("epoch").cast("long").as("epoch"))
    }),

    // ---- corpus curation: temperature mix — per-domain weights derived
    // from MEASURED counts flattened by alpha=0.5 (the multilingual-LM
    // sampling rule), then the q154 deterministic copy machinery ----
    "q187_temperature_mix" -> ((s, d) => {
      val doc = Tables.documents(s, d).withColumn("corpus",
        when(col("n_chars") < 250, "short")
          .when(col("n_chars") < 350, "mid").otherwise("long"))
      graft.operators.Sampling.temperatureMix(doc, col("doc_id"),
          col("corpus"), alpha = 0.5, targetRows = 1000)
        .select(col("doc_id"), col("corpus"),
          col("epoch").cast("long").as("epoch"))
    }),

    // ---- sequence packing: concat-and-split the id-ordered token stream
    // into 512-token training packs (docs may span pack boundaries); the
    // global token prefix sum is computed bucketed, never one partition ----
    "q156_pack_sequences" -> ((s, d) => {
      graft.operators.Packing.packSequences(Tables.documents(s, d),
        col("doc_id"), col("text"), budget = 512)
    }),

    // ---- corpus-trained bigram-LM scoring (CCNet perplexity-filter
    // shape): add-one-smoothed bigram NLL averaged per doc ----
    "q157_ngram_lm_score" -> ((s, d) => {
      graft.operators.TextAnalysis.ngramLmScore(Tables.documents(s, d),
        col("doc_id"), col("text"))
    }),

    // ---- semantic dedup (SemDeDup): q40's LSH-bucketed cosine pairs →
    // connected components → one survivor per embedding cluster ----
    "q158_semantic_dedup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      Dedup.semanticDedup(e, col("vec_id"), col("vec"), threshold = 0.45)
    }),

    // ---- deterministic training-order shuffle: hash-assigned shard +
    // dense in-shard position; no global sort, no RNG ----
    "q159_shuffle_shard" -> ((s, d) => {
      graft.operators.Sampling.shuffleShard(
        Tables.documents(s, d).select(col("doc_id")),
        col("doc_id"), numShards = 8)
        .select(col("doc_id"), col("shard"), col("pos"))
    }),

    // ---- int8 embedding quantization: per-vector symmetric scalar
    // quantization, codes replay bit-for-bit cross-engine ----
    "q160_quantize_int8" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      // The operator returns the raw array<long> codes; the gate's pandas
      // compare can't sort array cells, so project a scalar digest of the
      // codes (joined CSV) — mirrored in the DuckDB oracle.
      Similarity.quantizeInt8(e, col("vec_id"), col("vec"))
        .select(col("vec_id"), col("scale"),
          array_join(transform(col("qvec"), _.cast("string")), ",")
            .as("qdigest"))
    }),

    // ---- change-feed batch replay: the table the streaming
    // changeFeedSink converges to (latest change per key over the whole
    // feed) — the oracle anchor for the §2.9 upsert-feed pipeline, whose
    // stream-applied-batches == batch-replay equivalence StreamsSpec
    // asserts on the same operator pair ----
    "q161_change_feed" -> ((s, d) => {
      graft.streaming.Streams.changeFeedReplay(
        Tables.events(s, d), keys = Seq("user_id"), tsCol = "ts")
    }),

    // ---- chunk-grain exact span dedup (Lee et al. 2022): repeated
    // 10-token spans corpus-wide; explode → hash groupBy → join-back,
    // the same bounded two-exchange shape as doc-level exact dedup ----
    "q162_chunk_dedup" -> ((s, d) => {
      Dedup.chunkDedup(Tables.documents(s, d), col("doc_id"), col("text"),
        n = 10, maxDupFrac = 0.3, hashes = Dedup.CrossEngineHash)
    }),

    // ---- Gopher-rules hard quality gate: auditable per-rule stats +
    // conjunctive keep; pure per-row codegen, scan speed ----
    "q163_gopher_filter" -> ((s, d) => {
      TextAnalysis.gopherFilter(Tables.documents(s, d),
        col("doc_id"), col("text"), minWords = 30)
    }),

    // ---- ANN index evaluation: sampled recall@10 of the LSH path
    // against exact brute force — the tune-then-trust measurement loop ----
    "q164_ann_recall" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val q = e.filter(col("vec_id") < 50)
      val exact = Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
        q, col("vec_id"), col("vec"), k = 10)
      val approx = Similarity.lshTopK(e, col("vec_id"), col("vec"), k = 10)
        .filter(col("query_id") < 50)
      Similarity.annRecall(exact, approx, k = 10)
    }),

    // ---- BPE vocabulary induction, iteration-0 statistic: corpus-weighted
    // adjacent-symbol pair counts over the word-frequency vocab (the full
    // iterative trainer is TextAnalysis.bpeTrain, spec-verified) ----
    "q165_bpe_pairs" -> ((s, d) => {
      TextAnalysis.bpePairCounts(
          TextAnalysis.bpeInitVocab(Tables.documents(s, d), col("text")))
        .orderBy(col("freq").desc, col("left_sym"), col("right_sym"))
        .limit(20)
    }),

    // ---- §2.9 batch anchor for the streaming windowed aggregation: the
    // SAME operator runs the batch frame (watermark is a batch no-op) ----
    "q166_windowed_stats" -> ((s, d) => {
      graft.streaming.Streams.windowedEventStats(Tables.events(s, d))
    }),

    // ---- skew path oracle anchor: two-phase salted aggregation must
    // equal the plain group-by the oracle computes ----
    "q167_salted_agg" -> ((s, d) => {
      Joins.saltedAggregate(Tables.lineitem(s, d),
        Seq(col("l_returnflag"), col("l_linestatus")), buckets = 16,
        partials = Seq(sum(dec2(col("l_quantity"))).as("ps"),
          count(lit(1)).as("pc")),
        finals = Seq(sum(col("ps")).cast("double").as("sum_qty"),
          sum(col("pc")).as("n_rows")))
    }),

    // ---- quality-aware dedup survivor: keep the LONGEST member of each
    // simhash cluster (score desc, id tie-break) instead of min-id ----
    "q168_best_survivor" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val sig = Dedup.simHash(docs, col("doc_id"), col("text"),
        fam = Dedup.CrossEngineHash)
      Dedup.bestSurvivor(sig, col("id"), col("simhash"),
        docs, col("doc_id"), length(col("text")).cast("long"))
    }),

    // ---- the composed curation funnel — quality gate → span dedup →
    // exact dedup — one oracle proves the operators COMPOSE (each stage's
    // statistics are computed over the previous stage's survivors) ----
    "q169_curation_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val quality = TextAnalysis.gopherFilter(docs, col("doc_id"),
          col("text"), minWords = 30)
        .filter(col("keep")).select(col("doc_id"))
      val kept1 = docs.join(quality, "doc_id")
      val chunk = Dedup.chunkDedup(kept1, col("doc_id"), col("text"),
          n = 10, maxDupFrac = 0.3, hashes = Dedup.CrossEngineHash)
        .filter(col("keep")).select(col("doc_id"))
      val kept2 = kept1.join(chunk, "doc_id")
      Dedup.exact(kept2, col("text"), col("doc_id"))
        .select(col("keep_id").as("doc_id"), col("n_dups"))
        .join(kept2.select(col("doc_id"), col("lang"), col("source")),
          "doc_id")
    }),

    // ---- blocked fuzzy match: a 100-part probe batch against the full
    // catalog, (first char, length band) blocking + levenshtein <= 2 ----
    "q170_fuzzy_match" -> ((s, d) => {
      val part = Tables.part(s, d)
      Joins.fuzzyNameJoin(
          part.filter(col("p_partkey") < 100), col("p_partkey"),
          col("p_name"),
          part, col("p_partkey"), col("p_name"), maxDist = 2)
        .filter(col("left_id") =!= col("right_id"))
    }),

    // ---- BM25 ranked retrieval: three keyword queries against the
    // document corpus, postings filtered to query terms BEFORE any
    // aggregation (the inverted-index probe shape) ----
    "q171_bm25" -> ((s, d) => {
      import s.implicits._
      val queries = Seq(
        (0L, "table"), (0L, "scan"),
        (1L, "window"), (1L, "agg"), (1L, "sort"),
        (2L, "customer"), (2L, "value")).toDF("query_id", "term")
      TextAnalysis.bm25TopK(Tables.documents(s, d), col("doc_id"),
        col("text"), queries, k = 10)
    }),

    // ---- ExactSubstr span REMOVAL with reassembly (chunkDedup's repair
    // counterpart): duplicated 10-token spans deleted except their
    // canonical first occurrence, docs rewritten from surviving spans ----
    "q172_remove_spans" -> ((s, d) =>
      Dedup.removeDupSpans(Tables.documents(s, d), col("doc_id"),
        col("text"), n = 10, hashes = Dedup.CrossEngineHash)),

    // ---- DSIR importance weights: hashed-bigram likelihood ratio of a
    // target-exemplar slice (src1-3) vs the raw remainder ----
    "q173_dsir_weights" -> ((s, d) =>
      Sampling.importanceWeights(Tables.documents(s, d), col("doc_id"),
        col("text"), col("source").isin("src1", "src2", "src3"),
        buckets = 4096)),

    // ---- vocabulary coverage: top-100 tokens with the cumulative
    // fraction of the corpus token stream each rank prefix covers ----
    "q174_vocab_coverage" -> ((s, d) =>
      TextAnalysis.vocabCoverage(Tables.documents(s, d), col("text"),
        k = 100)),

    // ---- hashed-feature linear classifier scoring: integer-space dot
    // product against a broadcast 1024-bucket weight table ----
    "q175_hashed_classifier" -> ((s, d) =>
      TextAnalysis.hashedLinearScore(Tables.documents(s, d), col("doc_id"),
        col("text"), TextAnalysis.hashedModelWeights(s, 1024),
        buckets = 1024)),

    // ---- int8-quantized top-k retrieval: q34's exact-baseline shape but
    // the inner product runs in integer space over quantizeInt8 codes
    // (the 4×-denser memory path; the dot is exact and order-free) ----
    "q176_int8_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val q = e.filter(col("vec_id") < 5)
      Similarity.int8TopK(e, col("vec_id"), col("vec"),
        q, col("vec_id"), col("vec"), k = 10)
    }),

    // ---- dedup evaluation: pair precision/recall of the LSH pipeline
    // vs the exact prefix-filter ground truth at the same threshold —
    // the tune-then-trust loop for band/threshold choices ----
    "q179_dedup_recall" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, threshold = 0.7, hashShingles = Some(Dedup.CrossEngineHash))
      val approx = Dedup.minHashLshPairs(docs, col("doc_id"), col("text"),
        n = 3, k = 32, bands = 8, verifyThreshold = 0.7,
        fam = Dedup.CrossEngineHash)
      Dedup.pairRecall(exact, approx)
    }),

    // ---- q179's production form: the exact quadratic generator runs on
    // an auto-sized hash-ticket SAMPLE (~128 docs here), both generators
    // evaluate over the sampled pair universe — corpus-size-independent
    // exact-side cost ----
    "q180_dedup_recall_sampled" -> ((s, d) => {
      Dedup.pairRecallSampled(Tables.documents(s, d), col("doc_id"),
        col("text"), targetSample = 128, n = 3, threshold = 0.7,
        k = 32, bands = 8, fam = Dedup.CrossEngineHash)
    }),

    // ---- q179's bench/production form (round-10 directive 8): the LSH
    // pipeline runs at CORPUS scale (its cost is the number being
    // trusted), only the quadratic exact ground truth is ticket-sampled,
    // recall evaluated over the sampled pair universe. Bench substitutes
    // this for q179 (see benchForm); the exhaustive q179 stays the
    // sf0.01 gate-time form ----
    "q243_dedup_recall_sampled_exact" -> ((s, d) =>
      Dedup.pairRecallSampledExact(Tables.documents(s, d), col("doc_id"),
        col("text"), targetSample = 128, n = 3, threshold = 0.7, k = 32,
        bands = 8, fam = Dedup.CrossEngineHash)),

    // ---- bloom-prefiltered incremental exact dedup: even doc_ids are
    // the stored corpus, odd ones the incoming batch (the q155 split at
    // exact grain). The bloom bitmap only routes rows to the confirm
    // join, so the ANSWER is exact — `bloom_maybe` (engine-specific) is
    // projected away for the oracle ----
    "q182_bloom_incremental_exact" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.bloomIncrementalExact(
          docs.filter(pmod(col("doc_id"), lit(2)) === 0),
          docs.filter(pmod(col("doc_id"), lit(2)) === 1),
          col("doc_id"), col("text"), fpp = 0.01,
          fam = Dedup.CrossEngineHash)
        .select(col("doc_id"), col("is_admitted"), col("dup_of"))
    }),

    // ---- Delta-logged clustered table + stats-pruned range scan: build
    // a per-order mart as a generational MERGE table clustered by key
    // (range-disjoint files), then answer a key-range query through the
    // log's footer stats — files outside [1000, 3000] are never opened
    // (DeltaLogSpec pins the skipping; this pins the VALUES) ----
    "q183_delta_pruned_scan" -> ((s, d) =>
      graft.sources.Sinks.readDeltaTablePruned(s, q183DeltaTable(s, d),
        "l_orderkey", 1000L, 3000L)),

    // ---- domain-scoped boilerplate line removal (CCNet/RefinedWeb):
    // every doc gets its domain's footer line ("visit srcN dot com",
    // 100% doc-frequency -> removed) plus either a 25%-frequency
    // newsletter line or a unique tail (both under the 0.5 threshold ->
    // kept); the oracle replays the doc-frequency rule line by line ----
    "q184_boilerplate_removal" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
        concat_ws("\n", col("text"),
          concat(lit("visit "), col("source"), lit(" dot com")),
          when(pmod(col("doc_id"), lit(4)) === 0,
            lit("subscribe to our newsletter"))
            .otherwise(concat(lit("unique tail "),
              col("doc_id").cast("string")))).as("text"))
      TextAnalysis.removeBoilerplate(docs, col("doc_id"), col("text"),
        col("source"), maxDocFrac = 0.5, minDocs = 3)
    }),

    // ---- hybrid-retrieval fusion: RRF over the full-precision cosine
    // ranking and the int8-quantized ranking (two signals, no score
    // normalization — the standard hybrid-search combiner) ----
    "q178_rrf_fusion" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), transform(col("embedding"),
          x => x.cast("double")).as("vec"))
      val q = e.filter(col("vec_id") < 5)
      val dense = Similarity.bruteForceTopK(e, col("vec_id"), col("vec"),
          q, col("vec_id"), col("vec"), k = 10)
        .select(col("query_id"), col("corpus_id").as("id"),
          col("rank").cast("long").as("rank"))
      val int8 = Similarity.int8TopK(e, col("vec_id"), col("vec"),
          q, col("vec_id"), col("vec"), k = 10)
        .select(col("query_id"), col("corpus_id").as("id"), col("rank"))
      Similarity.rrfFuse(Seq(dense, int8), k = 10)
    }),

    // ---- P8 pushdown-friendly variant: half-open timestamp ranges on
    // the RAW column (no cast), so the predicate reaches PushedFilters
    // and parquet skips row groups — ScanAuditSpec pins the plan ----
    "q177_datetime_predicate" -> ((s, d) => {
      val dates = Seq(
        java.time.LocalDate.of(1996, 3, 1), java.time.LocalDate.of(1996, 3, 2),
        java.time.LocalDate.of(1996, 3, 3), java.time.LocalDate.of(1996, 7, 14),
        java.time.LocalDate.of(1996, 9, 2))
      Tables.orders(s, d)
        .filter(F.datetimePredicate(col("o_orderdate"), dates))
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("ymd"))
    })
  )

  /** DuckDB replay of the deterministic IVF pipeline (q63's oracle,
    * shared by q198's persisted-index serving search — the on-disk
    * bucketed index must reproduce the in-memory operator exactly):
    * smallest-id centroid seeds, one Lloyd round with 6dp-rounded
    * means, rank-1 inverted lists, rank-≤2 probes, exact cosine top-5.
    */
  private def q63Oracle: String = {
    val cos = (a: String, b: String) =>
      s"""CASE WHEN sqrt(list_dot_product($a, $a)) = 0
         |      OR sqrt(list_dot_product($b, $b)) = 0 THEN 0.0
         |    ELSE list_dot_product($a, $b)
         |      / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))
         |    END""".stripMargin
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c0 AS (SELECT id AS cid, v AS cv FROM e WHERE id < 16),
       |asg0 AS (
       |  SELECT e.id, e.v, c0.cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.id
       |      ORDER BY ${cos("e.v", "c0.cv")} DESC, c0.cid) AS rn
       |  FROM e CROSS JOIN c0),
       |m AS (
       |  SELECT cid, t.i AS pos, ROUND(AVG(v[t.i]), 6) AS mx
       |  FROM asg0, (SELECT UNNEST(range(1, 65)) AS i) t
       |  WHERE rn = 1 GROUP BY cid, t.i),
       |c AS (SELECT cid, list(mx ORDER BY pos) AS cv FROM m GROUP BY cid),
       |asg AS (
       |  SELECT e.id, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.id
       |      ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid) AS rn
       |  FROM e CROSS JOIN c),
       |lists AS (SELECT id, cid FROM asg WHERE rn = 1),
       |probes AS (SELECT id AS query_id, cid FROM asg WHERE rn <= 2),
       |cand AS (
       |  SELECT DISTINCT p.query_id, l.id AS corpus_id
       |  FROM probes p JOIN lists l ON p.cid = l.cid
       |  WHERE p.query_id <> l.id),
       |scored AS (
       |  SELECT cd.query_id, cd.corpus_id, ${cos("a.v", "b.v")} AS cos
       |  FROM cand cd JOIN e a ON a.id = cd.query_id
       |               JOIN e b ON b.id = cd.corpus_id)
       |SELECT query_id, corpus_id, ROUND(cos, 4) AS cos, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, corpus_id) AS rn FROM scored) t
       |WHERE rn <= 5""".stripMargin
  }

  /** DuckDB spelling of q197's fixed-point PageRank: the SAME integer
    * power iteration as [[graft.operators.Graphs.pageRankFixedPoint]],
    * unrolled into `iters` chained CTE stages (`//` is DuckDB floor
    * division = Spark `DIV` on the non-negative BIGINTs used here; the
    * HUGEINT that DuckDB's sum(BIGINT) produces is exact and the final
    * projection casts back to BIGINT). The dangling-mass term is a
    * scalar subquery per stage — the SQL statement of the Spark side's
    * one-row driver aggregate.
    */
  private def q197Oracle: String = {
    val edges =
      """SELECT DISTINCT src, dst FROM (
        |  SELECT doc_id % 40 AS src, (doc_id * 7 + 3) % 40 AS dst
        |  FROM documents WHERE doc_id % 40 < 35
        |  UNION ALL
        |  SELECT doc_id % 40, (doc_id * 13 + 7) % 40
        |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 40 < 35
        |) WHERE src <> dst""".stripMargin
    pageRankOracleSql("", edges,
      "SELECT id, CAST(rank AS BIGINT) AS rank_fp FROM r5")
  }

  /** Unrolled fixed-point PageRank as chained DuckDB CTEs — the shared
    * generator behind q197 (integer-id graph) and q209 (domain link
    * graph): `prefixCtes` ("name AS (...)," fragments) precede the edge
    * CTE, `edgesSql` must yield (src, dst) BIGINT pairs, and
    * `finalSelect` reads the last rank CTE `r5` (plus any prefix CTE).
    */
  private def pageRankOracleSql(prefixCtes: String, edgesSql: String,
                                finalSelect: String): String = {
    val scale = 1000000000000L; val dn = 85; val dd = 100; val iters = 5
    val header =
      s"""WITH $prefixCtes e AS MATERIALIZED ($edgesSql),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |nd AS MATERIALIZED (SELECT nodes.id, coalesce(d.deg, 0) AS deg
         |  FROM nodes LEFT JOIN
         |    (SELECT src AS id, count(*) AS deg FROM e GROUP BY src) d
         |    USING (id)),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT id, $scale // (SELECT n FROM nn) AS rank
         |  FROM nodes)""".stripMargin
    // MATERIALIZED: r_k is referenced twice by r_{k+1} (contribution agg
    // + dangling-mass scalar); inlined, the chain re-evaluates the
    // prefix CTEs exponentially in iteration count
    val stages = (1 to iters).map { k =>
      val p = s"r${k - 1}"
      s"""r$k AS MATERIALIZED (
         |  SELECT nd.id,
         |    ((($dd - $dn) * $scale) // ($dd * (SELECT n FROM nn)))
         |      + ($dn * (coalesce(c.csum, 0)
         |        + ((SELECT coalesce(sum(r.rank), 0) FROM $p r
         |            JOIN nd USING (id) WHERE nd.deg = 0)
         |           // (SELECT n FROM nn))
         |      )) // $dd AS rank
         |  FROM nd LEFT JOIN (
         |    SELECT e.dst AS id, sum(r.rank // nd2.deg) AS csum
         |    FROM $p r JOIN nd nd2 ON r.id = nd2.id JOIN e ON e.src = r.id
         |    WHERE nd2.deg > 0 GROUP BY e.dst) c USING (id))""".stripMargin
    }
    header + ",\n" + stages.mkString(",\n") + "\n" + finalSelect
  }

  /** CTE chain deriving the synthetic link-extraction fixture — shared
    * by q208 (row grain) and q209 (PageRank over the domain graph).
    * Mirrors `TextAnalysis.extractLinks` + `resolveUrl` stage for
    * stage: href regexes (double- then single-quoted), fragment strip,
    * absolute / scheme-relative / root-relative / directory-relative
    * resolution, '/./' collapse, http(s) filter. Final CTE: `llink`
    * (doc_id, url, href, link).
    */
  private def linkFixtureCtes: String =
    raw"""ld AS (SELECT doc_id,
      |    'https://h' || (doc_id % 5) || '.example.com/dir/page' ||
      |      (doc_id % 7) AS url,
      |    '<html><body><a href="https://ext' || (doc_id % 3) ||
      |    '.org/x">e</a><a href="/root/p' || (doc_id % 4) ||
      |    '">r</a><a class="z" href="sub/page' || (doc_id % 2) ||
      |    '">s</a><a href="//cdn.example' || (doc_id % 3) ||
      |    '.net/a">c</a><a href=''./q' || (doc_id % 2) ||
      |    ''' >q</a><a href="mailto:x@y.z">m</a>' ||
      |    '<a href="#frag">f</a></body></html>' AS html
      |  FROM documents),
      |lx AS (SELECT doc_id, url, unnest(list_concat(
      |    regexp_extract_all(html,
      |      '(?i)<a\b[^>]*\bhref\s*=\s*"([^"]*)"', 1),
      |    regexp_extract_all(html,
      |      '(?i)<a\b[^>]*\bhref\s*=\s*''([^'']*)''', 1))) AS href
      |  FROM ld),
      |lr AS (SELECT doc_id, url, href,
      |    trim(regexp_replace(href, '#.*$$', '')) AS h,
      |    regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)
      |      AS scheme,
      |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)
      |      AS origin,
      |    regexp_replace(url, '[?#].*$$', '') AS basenoq
      |  FROM lx),
      |lres AS (SELECT doc_id, url, href,
      |    CASE WHEN h = '' THEN basenoq
      |      WHEN regexp_matches(h, '^[A-Za-z][A-Za-z0-9+.-]*:') THEN h
      |      WHEN h LIKE '//%' THEN scheme || ':' || h
      |      WHEN h LIKE '/%' THEN origin || h
      |      ELSE (CASE WHEN regexp_replace(basenoq,
      |          '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') = ''
      |        THEN origin || '/'
      |        ELSE regexp_replace(basenoq, '[^/]*$$', '') END) || h
      |      END AS l0
      |  FROM lr),
      |llink AS (SELECT doc_id, url, href,
      |    regexp_replace(regexp_replace(l0, '/\./', '/', 'g'),
      |      '/\./', '/', 'g') AS link
      |  FROM lres
      |  WHERE regexp_matches(regexp_replace(regexp_replace(l0,
      |    '/\./', '/', 'g'), '/\./', '/', 'g'), '^https?://'))""".stripMargin

  /** Link-fixture domain graph as oracle parts: (prefix CTEs ending at
    * `lk` + `names`, edge SELECT) — shared by the PageRank (q209/q214)
    * and HITS (q220) oracles.
    */
  private def linkGraphOracleParts: (String, String) = {
    val host = "regexp_replace(lower(regexp_extract(%s, " +
      "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)), ':[0-9]+$', '')"
    val prefix = linkFixtureCtes + ",\n" +
      s"""lk AS (SELECT DISTINCT ${host.format("url")} AS src_domain,
         |    ${host.format("link")} AS dst_domain
         |  FROM llink
         |  WHERE ${host.format("url")} <> '' AND
         |    ${host.format("link")} <> '' AND
         |    ${host.format("url")} <> ${host.format("link")}),
         |names AS (SELECT DISTINCT domain, ${dkHash("domain")} AS id
         |  FROM (SELECT src_domain AS domain FROM lk
         |        UNION ALL SELECT dst_domain FROM lk)),""".stripMargin
    val edges =
      s"""SELECT ${dkHash("src_domain")} AS src,
         |  ${dkHash("dst_domain")} AS dst FROM lk""".stripMargin
    (prefix, edges)
  }

  /** Link-fixture domain graph → unrolled PageRank, with a caller-chosen
    * final select over `r5` (ranks) joined to `names` (id → domain) —
    * shared by q209 (ranks) and q214 (budget allocation).
    */
  private def linkRankOracle(finalSelect: String): String = {
    val (prefix, edges) = linkGraphOracleParts
    pageRankOracleSql(prefix, edges, finalSelect)
  }

  /** Unrolled fixed-point HITS mirror of `Graphs.hitsFixedPoint`: each
    * iteration is two CTE half-steps (authority from hubs, hub from
    * authorities), each sum-normalized to `scale` by floor division —
    * DuckDB's HUGEINT sums keep the intermediate products exact.
    */
  private def hitsOracleSql(prefixCtes: String, edgesSql: String,
                            finalSelect: String, iters: Int,
                            scale: Long): String = {
    val header =
      s"""WITH $prefixCtes e AS MATERIALIZED ($edgesSql),
         |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |h0 AS MATERIALIZED (SELECT id, $scale // (SELECT n FROM nn) AS h
         |  FROM nodes)""".stripMargin
    // MATERIALIZED: each stage references its predecessor 2-3 times
    // (normalizer scalar + the raw aggregate); without it DuckDB inlines
    // the whole chain and the fixture CTEs re-evaluate exponentially
    val stages = (1 to iters).flatMap { k =>
      val hp = s"h${k - 1}"
      Seq(
        s"""a$k AS MATERIALIZED (SELECT nodes.id,
           |    (coalesce(r.raw, 0) * $scale) //
           |      (SELECT sum(hh.h) FROM $hp hh JOIN e ON e.src = hh.id)
           |      AS a
           |  FROM nodes LEFT JOIN (
           |    SELECT e.dst AS id, sum(hh.h) AS raw
           |    FROM $hp hh JOIN e ON e.src = hh.id GROUP BY e.dst) r
           |    USING (id))""".stripMargin,
        s"""h$k AS MATERIALIZED (SELECT nodes.id,
           |    (coalesce(r.raw, 0) * $scale) //
           |      (SELECT sum(aa.a) FROM a$k aa JOIN e ON e.dst = aa.id)
           |      AS h
           |  FROM nodes LEFT JOIN (
           |    SELECT e.src AS id, sum(aa.a) AS raw
           |    FROM a$k aa JOIN e ON e.dst = aa.id GROUP BY e.src) r
           |    USING (id))""".stripMargin)
    }
    header + ",\n" + stages.mkString(",\n") + "\n" + finalSelect
  }

  /** JL random-projection mirror: 16 list_dot_products against the SAME
    * `Similarity.planes(16, 64)` literals, each snapshotted through
    * DECIMAL(18,6) exactly like the Spark side. Emitted as scalar rows
    * (id, pos, component) — one SELECT per plane UNION ALL'd — mirroring
    * the Spark side's posexplode (array columns are banned from declared
    * query output).
    */
  private def q223Oracle: String = {
    val pl = graft.operators.Similarity.planes(16, 64)
    val comps = (0 until 16).map { p =>
      val lit = pl(p).mkString("[", ", ", "]")
      s"""SELECT vec_id AS id, CAST($p AS BIGINT) AS pos,
         |  CAST(CAST(list_dot_product(v, $lit) AS DECIMAL(18,6)) AS DOUBLE)
         |    AS component FROM e""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings)
       |${comps.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** Unrolled deterministic label propagation over the link-fixture
    * domain graph: symmetrized distinct edges, labels start at node id,
    * each round every node adopts the most frequent neighbor label
    * (ties to the SMALLEST label) — the same integer argmax as
    * `Graphs.labelPropagation`.
    */
  private def q225Oracle: String = {
    val (prefix, edges) = linkGraphOracleParts
    val iters = 4
    val header =
      s"""WITH $prefix e0 AS MATERIALIZED ($edges),
         |es AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)
         |  WHERE src <> dst),
         |l0 AS (SELECT DISTINCT src AS id, src AS lbl FROM es)""".stripMargin
    val stages = (1 to iters).map { k =>
      s"""l$k AS MATERIALIZED (SELECT id, lbl FROM (
         |  SELECT id, lbl, ROW_NUMBER() OVER (PARTITION BY id
         |      ORDER BY cnt DESC, lbl ASC) AS rn
         |  FROM (SELECT id, lbl, sum(cnt) AS cnt FROM (
         |      SELECT es.dst AS id, l.lbl, count(*) AS cnt
         |      FROM l${k - 1} l JOIN es ON es.src = l.id
         |      GROUP BY es.dst, l.lbl
         |      UNION ALL SELECT id, lbl, 1 FROM l${k - 1})
         |    GROUP BY id, lbl)) WHERE rn = 1)""".stripMargin
    }
    header + ",\n" + stages.mkString(",\n") + "\n" +
      s"""SELECT n.domain, cn.domain AS community_domain
         |FROM l$iters l JOIN names n ON l.id = n.id
         |JOIN names cn ON l.lbl = cn.id""".stripMargin
  }

  /** Binary-quantized two-stage retrieval mirror: the full 64-bit sign
    * signature from the SAME `Similarity.planes(64, 64)` literals
    * (bit 63 spelled as the BIGINT-safe `(-MAX - 1)` so DuckDB does not
    * promote to HUGEINT), Hamming shortlist of 50 via bit_count(xor),
    * exact-cosine rerank to 10 — q34's cosine arithmetic.
    */
  private def q226Oracle: String = {
    val pl = graft.operators.Similarity.planes(64, 64)
    val sigTerms = (0 until 64).map { p =>
      val bit = 1L << p
      val bitLit =
        if (bit < 0) "(-9223372036854775807 - 1)" else s"CAST($bit AS BIGINT)"
      s"(CASE WHEN list_dot_product(v, ${pl(p).mkString("[", ", ", "]")}) > 0" +
        s" THEN $bitLit ELSE CAST(0 AS BIGINT) END)"
    }.mkString("\n     + ")
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |s AS MATERIALIZED (SELECT id, ($sigTerms) AS sig FROM e),
       |qs AS (SELECT id AS qid, sig AS qsig FROM s WHERE id < 5),
       |ham AS (SELECT qs.qid AS query_id, s.id AS corpus_id,
       |    CAST(bit_count(xor(s.sig, qs.qsig)) AS BIGINT) AS hamming
       |  FROM s CROSS JOIN qs WHERE s.id <> qs.qid),
       |short AS (SELECT query_id, corpus_id, hamming FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY hamming ASC, corpus_id) AS rn FROM ham)
       |  WHERE rn <= 50),
       |sc AS (SELECT sh.query_id, sh.corpus_id, sh.hamming,
       |    CASE WHEN sqrt(list_dot_product(c.v, c.v)) = 0
       |        OR sqrt(list_dot_product(qq.v, qq.v)) = 0 THEN 0.0
       |      ELSE list_dot_product(c.v, qq.v)
       |        / (sqrt(list_dot_product(c.v, c.v))
       |           * sqrt(list_dot_product(qq.v, qq.v))) END AS cos
       |  FROM short sh JOIN e c ON c.id = sh.corpus_id
       |  JOIN e qq ON qq.id = sh.query_id)
       |SELECT query_id, corpus_id, hamming, ROUND(cos, 4) AS cos,
       |  CAST(rn AS BIGINT) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, corpus_id) AS rn FROM sc) t
       |WHERE rn <= 10""".stripMargin
  }

  /** Prototype pruning mirror: q188's deterministic k-means CTEs, then
    * per-cluster rank by (4dp sim ASC, id) with the exact integer ceil
    * keep quota.
    */
  private def q229Oracle: String = {
    val cos = (a: String, b: String) =>
      s"""CASE WHEN sqrt(list_dot_product($a, $a)) = 0
         |      OR sqrt(list_dot_product($b, $b)) = 0 THEN 0.0
         |    ELSE list_dot_product($a, $b)
         |      / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))
         |    END""".stripMargin
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c0 AS (SELECT id AS cid, v AS cv FROM e WHERE id < 16),
       |asg0 AS (
       |  SELECT e.id, e.v, c0.cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.id
       |      ORDER BY ${cos("e.v", "c0.cv")} DESC, c0.cid) AS rn
       |  FROM e CROSS JOIN c0),
       |m AS (
       |  SELECT cid, t.i AS pos, ROUND(AVG(v[t.i]), 6) AS mx
       |  FROM asg0, (SELECT UNNEST(range(1, 65)) AS i) t
       |  WHERE rn = 1 GROUP BY cid, t.i),
       |c AS (SELECT cid, list(mx ORDER BY pos) AS cv FROM m GROUP BY cid),
       |asg AS (
       |  SELECT e.id, c.cid, ${cos("e.v", "c.cv")} AS cs,
       |    ROW_NUMBER() OVER (PARTITION BY e.id
       |      ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid) AS rn
       |  FROM e CROSS JOIN c),
       |af AS (SELECT id, cid, ROUND(cs, 4) AS sim FROM asg WHERE rn = 1),
       |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
       |      ORDER BY sim ASC, id) AS rk,
       |    COUNT(*) OVER (PARTITION BY cid) AS n FROM af)
       |SELECT id AS vec_id, cid AS cluster_id, sim,
       |  CAST(rk AS BIGINT) AS rank_in_cluster,
       |  rk <= (n * 1 + 1) // 2 AS keep FROM r""".stripMargin
  }

  /** PRF expansion mirror: q171's BM25 CTEs twice — pass 1 picks the
    * top-5 feedback docs, the promoted terms (feedback df >= 2, ranked
    * by df DESC then term, max 3, originals excluded) union into the
    * query, pass 2 scores the expanded sets. Same 6dp DECIMAL score
    * snapshot both passes.
    */
  private def q230Oracle: String = {
    def sc(p: String, f: String) =
      s"""CAST(round(
         |      ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST($f.df AS DOUBLE)
         |          + 0.5) / (CAST($f.df AS DOUBLE) + 0.5)) *
         |      (CAST($p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0) /
         |        (CAST($p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
         |          ((1.0 - CAST(0.75 AS DOUBLE)) +
         |           CAST(0.75 AS DOUBLE) * CAST($p.dl AS DOUBLE) /
         |             (CAST(stats.sum_dl AS DOUBLE)
         |               / CAST(stats.n_docs AS DOUBLE))))),
         |      6) AS DECIMAL(18,6))""".stripMargin
    s"""WITH q(query_id, term) AS (VALUES
       |  (CAST(0 AS BIGINT), 'table'), (0, 'scan'),
       |  (1, 'window'), (1, 'agg'), (1, 'sort'),
       |  (2, 'customer'), (2, 'value')),
       |t AS (SELECT doc_id, $dkToks AS t FROM documents),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(t)) AS BIGINT) AS sum_dl FROM t),
       |d AS MATERIALIZED (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
       |    unnest(t) AS term FROM t),
       |p1 AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
       |    any_value(dl) AS dl
       |  FROM d WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY term, doc_id),
       |f1 AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM p1 GROUP BY term),
       |sc1 AS (SELECT q.query_id, p1.doc_id, ${sc("p1", "f1")} AS s
       |  FROM p1 JOIN f1 USING (term) JOIN q USING (term) CROSS JOIN stats),
       |g1 AS (SELECT query_id, doc_id, CAST(sum(s) AS DOUBLE) AS score
       |  FROM sc1 GROUP BY 1, 2),
       |fb AS (SELECT query_id, doc_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY score DESC, doc_id) AS rank FROM g1)
       |  WHERE rank <= 5),
       |dt AS (SELECT DISTINCT doc_id, term FROM d),
       |ex0 AS (SELECT fb.query_id, dt.term,
       |    CAST(count(*) AS BIGINT) AS fb_df
       |  FROM dt JOIN fb USING (doc_id) GROUP BY 1, 2
       |  HAVING count(*) >= 2),
       |ex1 AS (SELECT query_id, term FROM (
       |    SELECT ex0.*, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY fb_df DESC, term) AS rn
       |    FROM ex0 WHERE NOT EXISTS (SELECT 1 FROM q
       |      WHERE q.query_id = ex0.query_id AND q.term = ex0.term))
       |  WHERE rn <= 3),
       |nexp AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_expanded
       |  FROM ex1 GROUP BY 1),
       |nq AS (SELECT DISTINCT query_id, term FROM (
       |  SELECT query_id, term FROM q
       |  UNION ALL SELECT query_id, term FROM ex1)),
       |p2 AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
       |    any_value(dl) AS dl
       |  FROM d WHERE term IN (SELECT DISTINCT term FROM nq)
       |  GROUP BY term, doc_id),
       |f2 AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |  FROM p2 GROUP BY term),
       |sc2 AS (SELECT nq.query_id, p2.doc_id, ${sc("p2", "f2")} AS s
       |  FROM p2 JOIN f2 USING (term) JOIN nq USING (term) CROSS JOIN stats),
       |g2 AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_matched,
       |    CAST(sum(s) AS DOUBLE) AS score
       |  FROM sc2 GROUP BY 1, 2),
       |r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY score DESC, doc_id) AS rank FROM g2)
       |SELECT r2.query_id, doc_id, n_matched, score,
       |  CAST(rank AS BIGINT) AS rank,
       |  coalesce(nexp.n_expanded, 0) AS n_expanded
       |FROM r2 LEFT JOIN nexp ON nexp.query_id = r2.query_id
       |WHERE rank <= 10""".stripMargin
  }

  private def q220Oracle: String = {
    val (prefix, edges) = linkGraphOracleParts
    hitsOracleSql(prefix, edges,
      """SELECT n.domain, CAST(h.h AS BIGINT) AS hub_fp,
        |  CAST(a.a AS BIGINT) AS auth_fp
        |FROM h4 h JOIN a4 a USING (id) JOIN names n USING (id)""".stripMargin,
      iters = 4, scale = 1000000L)
  }

  private def q209Oracle: String = linkRankOracle(
    """SELECT n.domain, CAST(r.rank AS BIGINT) AS rank_fp
      |FROM r5 r JOIN names n ON r.id = n.id""".stripMargin)

  private def q214Oracle: String = linkRankOracle(
    """SELECT domain, CAST(CAST(CASE WHEN rn = 1
      |    THEN 100000 - SUM(raw) OVER () + raw ELSE raw END
      |    AS DECIMAL(38,0)) AS BIGINT) AS pages
      |FROM (
      |  SELECT domain,
      |    CAST(ROUND(CAST(100000 * rank / wsum AS DECIMAL(38,10)), 0)
      |      AS DECIMAL(38,0)) AS raw,
      |    ROW_NUMBER() OVER (ORDER BY domain) AS rn
      |  FROM (SELECT n.domain, r.rank, SUM(r.rank) OVER () AS wsum
      |        FROM r5 r JOIN names n ON r.id = n.id))""".stripMargin)

  // ---- Unicode text-hygiene fixture injection ---------------------------
  // The synthetic corpus is pure ASCII, so multilingual / decomposed /
  // mojibake content is injected deterministically by doc_id. Both engines
  // build the injected strings from the same codepoint tables — the Spark
  // side at runtime, the DuckDB side via chr() composition — so no raw
  // multibyte literal ever rides in source code or JSON transit.

  /** doc_id%6 → script suffixes: cyrillic, han, arabic, hangul, kana. */
  private val scriptSuffixCps: Seq[Seq[Int]] = Seq(
    Seq.empty,
    // " Privet mir kak dela" (cyrillic)
    Seq(0x20, 0x41F, 0x440, 0x438, 0x432, 0x435, 0x442, 0x20, 0x43C,
      0x438, 0x440, 0x20, 0x43A, 0x430, 0x43A, 0x20, 0x434, 0x435,
      0x43B, 0x430),
    // " ni hao shi jie hen hao" (han)
    Seq(0x20, 0x4F60, 0x597D, 0x4E16, 0x754C, 0x5F88, 0x597D),
    // " marhaban bialealam" (arabic)
    Seq(0x20, 0x645, 0x631, 0x62D, 0x628, 0x627, 0x20, 0x628, 0x627,
      0x644, 0x639, 0x627, 0x644, 0x645),
    // " annyeonghaseyo segye" (hangul)
    Seq(0x20, 0xC548, 0xB155, 0xD558, 0xC138, 0xC694, 0x20, 0xC138,
      0xACC4),
    // " konnichiwa sekai" (hiragana + han)
    Seq(0x20, 0x3053, 0x3093, 0x306B, 0x3061, 0x306F, 0x4E16, 0x754C))

  /** doc_id%2 → NFC suffix: decomposed e-acute, i-diaeresis, A-ring. */
  private val nfcSuffixCps: Seq[Seq[Int]] = Seq(
    Seq.empty,
    Seq[Int](0x20, 'C', 'a', 'f', 'e', 0x301, 0x20, 'n', 'a', 'i',
      0x308, 'v', 'e', 0x20, 'A', 0x30A))

  /** doc_id%3 → mojibake suffixes: 2-byte (" café déjà vu") and
    * 3-byte (em dash + curly quotes) forms, as their latin-1 chars.
    */
  private val mojibakeSuffixCps: Seq[Seq[Int]] = Seq(
    Seq.empty,
    Seq[Int](0x20, 'c', 'a', 'f', 0xC3, 0xA9, 0x20, 'd', 0xC3, 0xA9,
      'j', 0xC3, 0xA0, 0x20, 'v', 'u'),
    Seq[Int](0x20, 'a', 0xE2, 0x80, 0x94, 'b', 0x20, 0xE2, 0x80, 0x9C,
      'q', 0xE2, 0x80, 0x9D))

  /** The suffix table as a Spark column: element by pmod(doc_id, n). */
  private def suffixCol(cpsTable: Seq[Seq[Int]]): Column = {
    val arr = array(cpsTable.map(cps => lit(cps.map(_.toChar).mkString)): _*)
    element_at(arr, (pmod(col("doc_id"), lit(cpsTable.length)) + 1).cast("int"))
  }

  /** One codepoint sequence as a DuckDB expression: ASCII runs stay
    * literal, everything else goes through chr().
    */
  private def cpsSqlExpr(cps: Seq[Int]): String = {
    if (cps.isEmpty) return "''"
    val parts = scala.collection.mutable.ListBuffer.empty[String]
    val sb = new StringBuilder
    def flush(): Unit =
      if (sb.nonEmpty) { parts += s"'${sb.toString}'"; sb.clear() }
    cps.foreach { c =>
      if (c >= 0x20 && c < 0x7F && c != '\'') sb.append(c.toChar)
      else { flush(); parts += s"chr($c)" }
    }
    flush()
    parts.mkString(" || ")
  }

  /** The suffix table as a DuckDB CASE over doc_id % n. */
  private def suffixCaseSql(cpsTable: Seq[Seq[Int]]): String = {
    val whens = cpsTable.zipWithIndex.drop(1).map { case (cps, i) =>
      s"WHEN $i THEN ${cpsSqlExpr(cps)}" }
    s"CASE CAST(doc_id % ${cpsTable.length} AS INT) " +
      s"${whens.mkString(" ")} ELSE '' END"
  }

  // ---- DuckDB oracle fragments for hash-bucketed operators --------------
  // These replicate graft's CrossEngineHash (md5-derived 60-bit values) and
  // the deterministic LSH hyperplanes, so q28/q29/q35 — whole hash-bucketed
  // pipelines — verify value-for-value against an independent engine.

  /** DuckDB spelling of `F.hash64`: first 15 md5 hex chars as a BIGINT. */
  private def dkHash(e: String): String =
    s"('0x' || substr(md5($e), 1, 15))::BIGINT"

  /** DuckDB spelling of `TextAnalysis.normText` tokenization. */
  private val dkToks =
    raw"string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')"

  /** DuckDB spelling of `Dedup.shingles(_, n)` over a `toks` column. */
  private def dkShingles(n: Int): String =
    s"""CASE WHEN len(toks) - ${n - 1} <= 0 THEN [array_to_string(toks, ' ')]
       |       ELSE list_distinct(list_transform(range(1, len(toks) - ${n - 2}),
       |              i -> array_to_string(toks[i:i+${n - 1}], ' '))) END""".stripMargin

  /** Full MinHash+LSH pipeline in DuckDB: shingle → 32 seeded min-hashes →
    * 8 banded bucket hashes → same-bucket candidate pairs → exact-Jaccard
    * verify. Mirrors `Dedup.minHashLshPairs(n=3, k=32, bands=8,
    * CrossEngineHash)` stage for stage.
    */
  /** MinHash estimator-quality mirror: all-pairs exact Jaccard at the
    * 0.5 threshold (unrounded filter — the Spark side's exact-ratio
    * contract), joined to q28's 32-component signature CTEs; est is
    * the exact agreement count over 32.
    */
  private def q237Oracle: String = q237OracleFrom("documents")

  private def q237OracleFrom(src: String): String = {
    val k = 32
    val P = Dedup.CrossEngineHash.P
    val sigCols = (0 until k)
      .map(s => s"MIN((${Dedup.CrossEngineHash.a(s)} * (hb % $P) + " +
        s"${Dedup.CrossEngineHash.b(s)}) % $P) AS h$s")
      .mkString(",\n    ")
    val agree = (0 until k)
      .map(i => s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)")
      .mkString("\n     + ")
    s"""WITH t AS (SELECT doc_id AS id, $dkToks AS toks FROM $src),
       |d AS (SELECT id, list_distinct(list_transform(${dkShingles(3)},
       |    s -> ${dkHash("s")})) AS sh FROM t),
       |hb AS (SELECT id, UNNEST(sh) AS hb FROM d),
       |sig AS (SELECT id,
       |    $sigCols
       |  FROM hb GROUP BY id),
       |ex AS (SELECT id_a, id_b, ROUND(j, 4) AS jaccard FROM (
       |    SELECT a.id AS id_a, b.id AS id_b,
       |      CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / len(list_distinct(list_concat(a.sh, b.sh))) AS j
       |    FROM d a JOIN d b ON a.id < b.id)
       |  WHERE j >= 0.5)
       |SELECT ex.id_a, ex.id_b, ex.jaccard,
       |  CAST($agree AS DOUBLE) / $k AS est_jaccard
       |FROM ex JOIN sig sa ON sa.id = ex.id_a
       |JOIN sig sb ON sb.id = ex.id_b""".stripMargin
  }

  private def q28Oracle: String = q28OracleFrom("documents")

  private def q28OracleFrom(src: String): String = {
    val k = 32; val bands = 8; val rows = k / bands
    val P = Dedup.CrossEngineHash.P
    val sigCols = (0 until k)
      .map(s => s"MIN((${Dedup.CrossEngineHash.a(s)} * (hb % $P) + " +
        s"${Dedup.CrossEngineHash.b(s)}) % $P) AS h$s")
      .mkString(",\n    ")
    val bandBranches = (0 until bands).map { b =>
      val cat = (0 until rows)
        .map(r => s"CAST(h${b * rows + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT id, $b AS band, ${dkHash(cat)} AS bucket FROM sig"
    }.mkString("\n  UNION ALL ")
    val jac = """ROUND(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
                |    / len(list_distinct(list_concat(da.sh, db.sh))), 4)""".stripMargin
    s"""WITH t AS (SELECT doc_id AS id, $dkToks AS toks FROM $src),
       |d AS (SELECT id, list_distinct(list_transform(${dkShingles(3)},
       |    s -> ${dkHash("s")})) AS sh FROM t),
       |hb AS (SELECT id, UNNEST(sh) AS hb FROM d),
       |sig AS (SELECT id,
       |    $sigCols
       |  FROM hb GROUP BY id),
       |bd AS (
       |  $bandBranches),
       |st AS (SELECT band, bucket, COUNT(*) AS occ, MIN(id) AS rep
       |       FROM bd GROUP BY band, bucket),
       |bd2 AS (SELECT bd.id, bd.band, bd.bucket, st.occ, st.rep
       |        FROM bd JOIN st USING (band, bucket)),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM bd2 a JOIN bd2 b
       |         ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
       |         AND (a.occ <= 64 OR a.id = a.rep))
       |SELECT c.id_a, c.id_b, $jac AS jaccard
       |FROM cand c JOIN d da ON da.id = c.id_a JOIN d db ON db.id = c.id_b
       |WHERE $jac >= 0.7""".stripMargin
  }

  /** Cluster closure over q28's pair list: DuckDB replays the whole
    * MinHash+LSH pipeline (nested as a CTE), then a recursive CTE walks
    * the symmetrized edges to each node's minimum reachable id — the
    * same labeling the Spark side's large-star/small-star loop converges
    * to. Verifies `Dedup.dedupClusters` end to end.
    */
  private def q152Oracle: String =
    s"""WITH RECURSIVE pairs AS (
       |$q28Oracle
       |),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach AS (
       |  SELECT doc_id AS id, doc_id AS r FROM documents
       |  UNION
       |  SELECT reach.id, e.dst AS r FROM reach JOIN edges e
       |  ON e.src = reach.r)
       |SELECT id AS doc_id, MIN(r) AS cluster_id, MIN(r) = id AS is_survivor
       |FROM reach GROUP BY id""".stripMargin

  /** Incremental dedup in DuckDB: the q28 signature/band CTEs over ALL
    * docs, then even ids (corpus) form a rank-capped band index probed
    * by odd ids (batch), batch-batch candidates replay the bounded
    * all-pairs rule, and a recursive closure labels each batch doc with
    * admission + its duplicate target. Mirrors `Dedup.incrementalDedup`.
    */
  private def q155Oracle: String = {
    val k = 32; val bands = 8; val rows = k / bands
    val P = Dedup.CrossEngineHash.P
    val sigCols = (0 until k)
      .map(s => s"MIN((${Dedup.CrossEngineHash.a(s)} * (hb % $P) + " +
        s"${Dedup.CrossEngineHash.b(s)}) % $P) AS h$s")
      .mkString(",\n    ")
    val bandBranches = (0 until bands).map { b =>
      val cat = (0 until rows)
        .map(r => s"CAST(h${b * rows + r} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT id, $b AS band, ${dkHash(cat)} AS bucket FROM sig"
    }.mkString("\n  UNION ALL ")
    val jac = """ROUND(CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
                |    / len(list_distinct(list_concat(da.sh, db.sh))), 4)""".stripMargin
    s"""WITH RECURSIVE t AS (SELECT doc_id AS id, $dkToks AS toks FROM documents),
       |d AS (SELECT id, list_distinct(list_transform(${dkShingles(3)},
       |    s -> ${dkHash("s")})) AS sh FROM t),
       |hb AS (SELECT id, UNNEST(sh) AS hb FROM d),
       |sig AS (SELECT id,
       |    $sigCols
       |  FROM hb GROUP BY id),
       |bd AS (
       |  $bandBranches),
       |bdc AS (SELECT id, band, bucket,
       |          ROW_NUMBER() OVER (PARTITION BY band, bucket ORDER BY id) AS rn
       |        FROM bd WHERE id % 2 = 0),
       |bdb AS (SELECT id, band, bucket FROM bd WHERE id % 2 = 1),
       |candbc AS (SELECT DISTINCT b.id AS id_b, c.id AS id_c
       |           FROM bdb b JOIN bdc c
       |           ON b.band = c.band AND b.bucket = c.bucket AND c.rn <= 64),
       |stb AS (SELECT band, bucket, COUNT(*) AS occ, MIN(id) AS rep
       |        FROM bdb GROUP BY band, bucket),
       |bdb2 AS (SELECT bdb.id, bdb.band, bdb.bucket, stb.occ, stb.rep
       |         FROM bdb JOIN stb USING (band, bucket)),
       |candbb AS (SELECT DISTINCT a.id AS id_b, b.id AS id_c
       |           FROM bdb2 a JOIN bdb2 b
       |           ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
       |           AND (a.occ <= 64 OR a.id = a.rep)),
       |vpairs AS (
       |  SELECT c.id_b, c.id_c
       |  FROM (SELECT * FROM candbc UNION SELECT * FROM candbb) c
       |  JOIN d da ON da.id = c.id_b JOIN d db ON db.id = c.id_c
       |  WHERE $jac >= 0.7),
       |edges AS (SELECT id_b AS src, id_c AS dst FROM vpairs
       |          UNION SELECT id_c AS src, id_b AS dst FROM vpairs),
       |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
       |          UNION SELECT reach.id, e.dst AS r FROM reach
       |          JOIN edges e ON e.src = reach.r),
       |comp AS (SELECT id, MIN(r) AS component,
       |           MIN(CASE WHEN r % 2 = 0 THEN r END) AS corpus_min,
       |           COUNT(*) AS n_reach
       |         FROM reach GROUP BY id)
       |SELECT id AS doc_id,
       |  (n_reach = 1 OR (corpus_min IS NULL AND component = id))
       |    AS is_admitted,
       |  CASE WHEN corpus_min IS NOT NULL THEN corpus_min
       |       WHEN n_reach > 1 AND component <> id THEN component
       |  END AS dup_of
       |FROM comp WHERE id % 2 = 1""".stripMargin
  }

  /** 64-bit SimHash in DuckDB: per-bit majority vote over 60-bit
    * cross-engine shingle hashes (bits 60-63 of a 60-bit hash are always
    * zero on both sides). Mirrors `Dedup.simHash(n=2, CrossEngineHash)`.
    */
  private def q29Oracle: String = {
    val bitSums = (0 until 60)
      .map(b => s"SUM((h >> $b) & 1) AS b$b").mkString(",\n    ")
    val sigSum = (0 until 60)
      .map(b => s"(CASE WHEN b$b * 2 > cnt THEN ${1L << b} ELSE 0 END)")
      .mkString("\n  + ")
    s"""WITH t AS (SELECT doc_id AS id, $dkToks AS toks FROM documents),
       |d AS (SELECT id, ${dkShingles(2)} AS sh FROM t),
       |ex AS (SELECT id, UNNEST(sh) AS s FROM d),
       |hx AS (SELECT id, ${dkHash("s")} AS h FROM ex),
       |agg AS (SELECT id, COUNT(*) AS cnt,
       |    $bitSums
       |  FROM hx GROUP BY id)
       |SELECT id, CAST($sigSum AS BIGINT) AS simhash FROM agg""".stripMargin
  }

  /** Random-hyperplane LSH ANN in DuckDB, generated from the SAME
    * deterministic `Similarity.planes(64, 64)` literals the Spark side
    * evaluates: per-band 8-bit sign signatures → same-bucket candidates →
    * exact cosine re-rank to top-5. Mirrors `Similarity.lshTopK(k=5)`.
    */
  /** Shared q35/q40 prefix: per-band 8-bit sign-signature buckets from the
    * deterministic `Similarity.planes(64, 64)` literals.
    */
  private def dkLshBandCte: String = {
    val bits = 64; val dim = 64; val bands = 8; val bandBits = bits / bands
    val pl = Similarity.planes(bits, dim)
    def planeLit(p: Int): String = pl(p).mkString("[", ", ", "]")
    (0 until bands).map { b =>
      val terms = (0 until bandBits).map { r =>
        val p = b * bandBits + r
        s"(CASE WHEN list_dot_product(v, ${planeLit(p)}) > 0 THEN ${1L << r} ELSE 0 END)"
      }.mkString("\n     + ")
      s"SELECT id, ($terms) * $bands + $b AS bucket FROM e"
    }.mkString("\n  UNION ALL ")
  }

  /** IVF-PQ: q63's coarse-centroid CTEs → residual vectors → q186's
    * per-subspace codebook recipe on the residuals → probed-list ADC.
    * Every determinism device is shared with those two oracles (6dp
    * centroid means, dot-assembled L2, DECIMAL ADC terms).
    */
  private def q189Oracle: String = {
    val mSub = 8; val subDim = 8; val nCodes = 16; val nProbe = 2
    val cos = (a: String, b: String) =>
      s"""CASE WHEN sqrt(list_dot_product($a, $a)) = 0
         |      OR sqrt(list_dot_product($b, $b)) = 0 THEN 0.0
         |    ELSE list_dot_product($a, $b)
         |      / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))
         |    END""".stripMargin
    def l2 = (a: String, b: String) =>
      s"(list_dot_product($a, $a) - 2 * list_dot_product($a, $b)" +
        s" + list_dot_product($b, $b))"
    val rsubBranches = (0 until mSub).map { s =>
      s"SELECT id, cid, $s AS sub, rvec[${s * subDim + 1}:${(s + 1) * subDim}] AS sv FROM rt"
    }.mkString("\n  UNION ALL ")
    val qsubBranches = (0 until mSub).map { s =>
      s"SELECT qid, cid, $s AS sub, qres[${s * subDim + 1}:${(s + 1) * subDim}] AS sv FROM qp"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c0 AS (SELECT id AS cid, v AS cv FROM e WHERE id < 16),
       |asg0 AS (
       |  SELECT e.id, e.v, c0.cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.id
       |      ORDER BY ${cos("e.v", "c0.cv")} DESC, c0.cid) AS rn
       |  FROM e CROSS JOIN c0),
       |m AS (
       |  SELECT cid, t.i AS pos, ROUND(AVG(v[t.i]), 6) AS mx
       |  FROM asg0, (SELECT UNNEST(range(1, 65)) AS i) t
       |  WHERE rn = 1 GROUP BY cid, t.i),
       |c AS (SELECT cid, list(mx ORDER BY pos) AS cv FROM m GROUP BY cid),
       |rt AS (SELECT id, cid,
       |    list_transform(range(64), i -> v[i+1] - cv[i+1]) AS rvec
       |  FROM (SELECT e.id, e.v, c.cid, c.cv,
       |      ROW_NUMBER() OVER (PARTITION BY e.id
       |        ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid) AS rn
       |    FROM e CROSS JOIN c) WHERE rn = 1),
       |rsubs AS (
       |  $rsubBranches),
       |pc0 AS (SELECT sub, CAST(id AS INT) AS code, sv AS cv
       |  FROM rsubs WHERE id < $nCodes),
       |pasg0 AS (SELECT s.id, s.sub, s.sv, pc0.code,
       |    ROW_NUMBER() OVER (PARTITION BY s.id, s.sub
       |      ORDER BY ${l2("s.sv", "pc0.cv")} ASC, pc0.code) AS rn
       |  FROM rsubs s JOIN pc0 USING (sub)),
       |pm AS (SELECT sub, code, t.i AS pos, ROUND(AVG(sv[t.i]), 6) AS mx
       |  FROM pasg0, (SELECT UNNEST(range(1, ${subDim + 1})) AS i) t
       |  WHERE rn = 1 GROUP BY sub, code, t.i),
       |pbooks AS (SELECT sub, code, list(mx ORDER BY pos) AS cv
       |  FROM pm GROUP BY sub, code),
       |enc AS (SELECT id, cid, sub, code FROM (
       |  SELECT s.id, s.cid, s.sub, b.code,
       |    ROW_NUMBER() OVER (PARTITION BY s.id, s.sub
       |      ORDER BY ${l2("s.sv", "b.cv")} ASC, b.code) AS rn
       |  FROM rsubs s JOIN pbooks b USING (sub)) WHERE rn = 1),
       |qp AS (SELECT qid, cid,
       |    list_transform(range(64), i -> qv[i+1] - cv[i+1]) AS qres
       |  FROM (SELECT q.id AS qid, q.v AS qv, c.cid, c.cv,
       |      ROW_NUMBER() OVER (PARTITION BY q.id
       |        ORDER BY ${cos("q.v", "c.cv")} DESC, c.cid) AS rn
       |    FROM (SELECT * FROM e WHERE id < 20) q CROSS JOIN c)
       |  WHERE rn <= $nProbe),
       |qsubs AS (
       |  $qsubBranches),
       |qtab AS (SELECT s.qid, s.cid, s.sub, b.code,
       |    CAST(${l2("s.sv", "b.cv")} AS DECIMAL(28,10)) AS d
       |  FROM qsubs s JOIN pbooks b USING (sub)),
       |scored AS (SELECT q.qid AS query_id, enc.id AS corpus_id,
       |    SUM(d) AS adcd
       |  FROM enc JOIN qtab q
       |    ON enc.cid = q.cid AND enc.sub = q.sub AND enc.code = q.code
       |  WHERE q.qid <> enc.id GROUP BY 1, 2)
       |SELECT query_id, corpus_id, CAST(adcd AS DOUBLE) AS adc,
       |  CAST(rn AS BIGINT) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adcd ASC, corpus_id) AS rn FROM scored) t
       |WHERE rn <= 5""".stripMargin
  }

  /** k-means assignment: q63's centroid-training CTEs, final nearest
    * centroid per vector with its cosine.
    */
  private def q188Oracle: String = {
    val cos = (a: String, b: String) =>
      s"""CASE WHEN sqrt(list_dot_product($a, $a)) = 0
         |      OR sqrt(list_dot_product($b, $b)) = 0 THEN 0.0
         |    ELSE list_dot_product($a, $b)
         |      / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))
         |    END""".stripMargin
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |c0 AS (SELECT id AS cid, v AS cv FROM e WHERE id < 16),
       |asg0 AS (
       |  SELECT e.id, e.v, c0.cid,
       |    ROW_NUMBER() OVER (PARTITION BY e.id
       |      ORDER BY ${cos("e.v", "c0.cv")} DESC, c0.cid) AS rn
       |  FROM e CROSS JOIN c0),
       |m AS (
       |  SELECT cid, t.i AS pos, ROUND(AVG(v[t.i]), 6) AS mx
       |  FROM asg0, (SELECT UNNEST(range(1, 65)) AS i) t
       |  WHERE rn = 1 GROUP BY cid, t.i),
       |c AS (SELECT cid, list(mx ORDER BY pos) AS cv FROM m GROUP BY cid),
       |asg AS (
       |  SELECT e.id, c.cid, ${cos("e.v", "c.cv")} AS cs,
       |    ROW_NUMBER() OVER (PARTITION BY e.id
       |      ORDER BY ${cos("e.v", "c.cv")} DESC, c.cid) AS rn
       |  FROM e CROSS JOIN c)
       |SELECT id AS vec_id, cid AS cluster_id, ROUND(cs, 4) AS sim
       |FROM asg WHERE rn = 1""".stripMargin
  }

  /** Product-quantization ANN: per-subspace seeds → one Lloyd pass
    * (6dp-rounded means) → encode → ADC. Subspace L2 is dot-assembled
    * (|a|² − 2ab + |b|²) and ADC terms snapshot to DECIMAL(28,10) before
    * summing — both mirrored from the Scala operator so ranks replay
    * exactly.
    */
  private def q186Oracle: String = {
    val mSub = 8; val subDim = 8; val nCodes = 16
    def l2 = (a: String, b: String) =>
      s"(list_dot_product($a, $a) - 2 * list_dot_product($a, $b)" +
        s" + list_dot_product($b, $b))"
    val subBranches = (0 until mSub).map { s =>
      s"SELECT id, $s AS sub, v[${s * subDim + 1}:${(s + 1) * subDim}] AS sv FROM e"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |subs AS (
       |  $subBranches),
       |c0 AS (SELECT sub, CAST(id AS INT) AS code, sv AS cv
       |  FROM subs WHERE id < $nCodes),
       |asg0 AS (SELECT s.id, s.sub, s.sv, c0.code,
       |    ROW_NUMBER() OVER (PARTITION BY s.id, s.sub
       |      ORDER BY ${l2("s.sv", "c0.cv")} ASC, c0.code) AS rn
       |  FROM subs s JOIN c0 USING (sub)),
       |m AS (SELECT sub, code, t.i AS pos, ROUND(AVG(sv[t.i]), 6) AS mx
       |  FROM asg0, (SELECT UNNEST(range(1, ${subDim + 1})) AS i) t
       |  WHERE rn = 1 GROUP BY sub, code, t.i),
       |books AS (SELECT sub, code, list(mx ORDER BY pos) AS cv
       |  FROM m GROUP BY sub, code),
       |enc AS (SELECT id, sub, code FROM (
       |  SELECT s.id, s.sub, b.code,
       |    ROW_NUMBER() OVER (PARTITION BY s.id, s.sub
       |      ORDER BY ${l2("s.sv", "b.cv")} ASC, b.code) AS rn
       |  FROM subs s JOIN books b USING (sub)) WHERE rn = 1),
       |qtab AS (SELECT s.id AS qid, s.sub, b.code,
       |    CAST(${l2("s.sv", "b.cv")} AS DECIMAL(28,10)) AS d
       |  FROM subs s JOIN books b USING (sub) WHERE s.id < 20),
       |scored AS (SELECT q.qid AS query_id, enc.id AS corpus_id,
       |    SUM(d) AS adcd
       |  FROM enc JOIN qtab q ON enc.sub = q.sub AND enc.code = q.code
       |  WHERE q.qid <> enc.id GROUP BY 1, 2)
       |SELECT query_id, corpus_id, CAST(adcd AS DOUBLE) AS adc,
       |  CAST(rn AS BIGINT) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY adcd ASC, corpus_id) AS rn FROM scored) t
       |WHERE rn <= 5""".stripMargin
  }

  /** Multi-probe LSH: q35's corpus band CTE plus a query-side probe CTE —
    * for each band, the query's own bucket and its Hamming-1 flips on the
    * lowest `probes` sign bits (xor on the packed value before the
    * `* bands + b` encoding).
    */
  private def q185Oracle: String = {
    val bits = 64; val dim = 64; val bands = 8; val bandBits = bits / bands
    val probes = 2
    val pl = Similarity.planes(bits, dim)
    def planeLit(p: Int): String = pl(p).mkString("[", ", ", "]")
    def packedExpr(b: Int): String =
      (0 until bandBits).map { r =>
        val p = b * bandBits + r
        s"(CASE WHEN list_dot_product(v, ${planeLit(p)}) > 0 THEN ${1L << r} ELSE 0 END)"
      }.mkString("(", "\n     + ", ")")
    val qbBranches = (0 until bands).flatMap { b =>
      val packed = packedExpr(b)
      s"SELECT id, $packed * $bands + $b AS bucket FROM q" +:
        (0 until probes).map(r =>
          s"SELECT id, xor($packed, ${1L << r}) * $bands + $b AS bucket FROM q")
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT * FROM e WHERE id < 20),
       |bd AS (
       |  $dkLshBandCte),
       |qb AS (SELECT DISTINCT id, bucket FROM (
       |  $qbBranches)),
       |rk AS (SELECT id, bucket,
       |         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY id) AS rn
       |       FROM bd),
       |cand AS (SELECT DISTINCT a.id AS query_id, b.id AS corpus_id
       |         FROM qb a JOIN rk b
       |         ON a.bucket = b.bucket AND a.id <> b.id AND b.rn <= 64),
       |scored AS (
       |  SELECT c.query_id, c.corpus_id,
       |    CASE WHEN sqrt(list_dot_product(ea.v, ea.v)) = 0
       |           OR sqrt(list_dot_product(eb.v, eb.v)) = 0 THEN 0.0
       |         ELSE list_dot_product(ea.v, eb.v)
       |           / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
       |    END AS cos
       |  FROM cand c JOIN e ea ON ea.id = c.query_id JOIN e eb ON eb.id = c.corpus_id)
       |SELECT query_id, corpus_id, ROUND(cos, 4) AS cos, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, corpus_id) AS rn FROM scored) t
       |WHERE rn <= 5""".stripMargin
  }

  private def q35Oracle: String = {
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bd AS (
       |  $dkLshBandCte),
       |rk AS (SELECT id, bucket,
       |         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY id) AS rn
       |       FROM bd),
       |cand AS (SELECT DISTINCT a.id AS query_id, b.id AS corpus_id
       |         FROM bd a JOIN rk b
       |         ON a.bucket = b.bucket AND a.id <> b.id AND b.rn <= 64),
       |scored AS (
       |  SELECT c.query_id, c.corpus_id,
       |    CASE WHEN sqrt(list_dot_product(ea.v, ea.v)) = 0
       |           OR sqrt(list_dot_product(eb.v, eb.v)) = 0 THEN 0.0
       |         ELSE list_dot_product(ea.v, eb.v)
       |           / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
       |    END AS cos
       |  FROM cand c JOIN e ea ON ea.id = c.query_id JOIN e eb ON eb.id = c.corpus_id)
       |SELECT query_id, corpus_id, ROUND(cos, 4) AS cos, CAST(rn AS BIGINT) AS rank
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY cos DESC, corpus_id) AS rn FROM scored) t
       |WHERE rn <= 5""".stripMargin
  }

  /** Sampled recall@10 of the LSH top-k against exact brute force: the
    * q35 LSH pipeline (same band CTE, rank cutoff 10) intersected with a
    * q34-style exact ranking restricted to query ids < 50.
    */
  private def q164Oracle: String = {
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bd AS (
       |  $dkLshBandCte),
       |rk AS (SELECT id, bucket,
       |         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY id) AS rn
       |       FROM bd),
       |cand AS (SELECT DISTINCT a.id AS query_id, b.id AS corpus_id
       |         FROM bd a JOIN rk b
       |         ON a.bucket = b.bucket AND a.id <> b.id AND b.rn <= 64),
       |scored AS (
       |  SELECT c.query_id, c.corpus_id,
       |    CASE WHEN sqrt(list_dot_product(ea.v, ea.v)) = 0
       |           OR sqrt(list_dot_product(eb.v, eb.v)) = 0 THEN 0.0
       |         ELSE list_dot_product(ea.v, eb.v)
       |           / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
       |    END AS cos
       |  FROM cand c JOIN e ea ON ea.id = c.query_id JOIN e eb ON eb.id = c.corpus_id),
       |lsh AS (SELECT query_id, corpus_id
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, corpus_id) AS rn FROM scored) t
       |  WHERE rn <= 10 AND query_id < 50),
       |bfscored AS (
       |  SELECT q.id AS query_id, e.id AS corpus_id,
       |    CASE WHEN sqrt(list_dot_product(e.v, e.v)) = 0
       |           OR sqrt(list_dot_product(q.v, q.v)) = 0 THEN 0.0
       |         ELSE list_dot_product(e.v, q.v)
       |           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v)))
       |    END AS cos
       |  FROM e CROSS JOIN (SELECT * FROM e WHERE id < 50) q
       |  WHERE e.id <> q.id),
       |bf AS (SELECT query_id, corpus_id
       |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, corpus_id) AS rn FROM bfscored) t
       |  WHERE rn <= 10),
       |hits AS (SELECT bf.query_id, count(*) AS c
       |  FROM bf JOIN lsh USING (query_id, corpus_id) GROUP BY bf.query_id),
       |den AS (SELECT query_id, count(*) AS n FROM bf GROUP BY query_id)
       |SELECT den.query_id, CAST(n AS BIGINT) AS n_exact,
       |  CAST(coalesce(c, 0) AS BIGINT) AS n_hits,
       |  round(coalesce(c, 0) / n, 4) AS recall
       |FROM den LEFT JOIN hits USING (query_id)""".stripMargin
  }

  /** LSH-bucketed near-dup pairs: same band CTE as q35, pair direction
    * `id_a < id_b`, exact cosine verify at threshold. Mirrors
    * `Similarity.lshCosinePairs(threshold = 0.45)`.
    */
  private def q40Oracle: String = {
    val cos = """CASE WHEN sqrt(list_dot_product(ea.v, ea.v)) = 0
                |           OR sqrt(list_dot_product(eb.v, eb.v)) = 0 THEN 0.0
                |         ELSE list_dot_product(ea.v, eb.v)
                |           / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
                |    END""".stripMargin
    s"""WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |bd AS (
       |  $dkLshBandCte),
       |st AS (SELECT bucket, COUNT(*) AS occ, MIN(id) AS rep
       |       FROM bd GROUP BY bucket),
       |bd2 AS (SELECT bd.id, bd.bucket, st.occ, st.rep
       |        FROM bd JOIN st USING (bucket)),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM bd2 a JOIN bd2 b
       |         ON a.bucket = b.bucket AND a.id < b.id
       |         AND (a.occ <= 64 OR a.id = a.rep))
       |SELECT c.id_a, c.id_b, ROUND($cos, 4) AS cos
       |FROM cand c JOIN e ea ON ea.id = c.id_a JOIN e eb ON eb.id = c.id_b
       |WHERE ROUND($cos, 4) >= 0.45""".stripMargin
  }

  /** Semantic-dedup closure over q40's pair list: the recursive
    * min-reachable-id walk of q152, on the embedding near-dup graph.
    * Mirrors `Dedup.semanticDedup(threshold = 0.45)`.
    */
  private def q158Oracle: String =
    s"""WITH RECURSIVE pairs AS (
       |$q40Oracle
       |),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION SELECT id_b AS src, id_a AS dst FROM pairs),
       |reach AS (
       |  SELECT vec_id AS id, vec_id AS r FROM embeddings
       |  UNION
       |  SELECT reach.id, e.dst AS r FROM reach JOIN edges e
       |  ON e.src = reach.r)
       |SELECT id AS vec_id, MIN(r) AS cluster_id, MIN(r) = id AS is_survivor
       |FROM reach GROUP BY id""".stripMargin

  /** SimHash banded near-dup in DuckDB: the q29 signature pipeline as a
    * CTE, 4×15-bit slice banding over bits 0-59 (the 60-bit cross-engine
    * hash's informative range), pigeonhole candidate join with the
    * occupancy guard (buckets over 64 keep only representative-star pairs,
    * mirroring `Dedup.boundedBucketPairs`), exact hamming
    * (`bit_count(xor(...))`) verify. Mirrors `Dedup.simHashNearDupPairs(
    * sigBits = 60, maxBucket = 64)`.
    */
  private def q57Oracle: String = {
    val sigSql = q29Oracle.replace("\n", "\n  ")
    s"""WITH sig AS (
       |  $sigSql),
       |bd AS (
       |  SELECT id, simhash, band, (simhash >> (band * 15)) & 32767 AS slice
       |  FROM sig, (SELECT UNNEST([0, 1, 2, 3]) AS band) bands),
       |st AS (
       |  SELECT band, slice, COUNT(*) AS occ, MIN(id) AS rep
       |  FROM bd GROUP BY band, slice),
       |bd2 AS (
       |  SELECT bd.id, bd.simhash, bd.band, bd.slice, st.occ, st.rep
       |  FROM bd JOIN st USING (band, slice)),
       |cand AS (
       |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |  FROM bd2 a JOIN bd2 b
       |  ON a.band = b.band AND a.slice = b.slice AND a.id < b.id
       |  AND (a.occ <= 64 OR a.id = a.rep))
       |SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3""".stripMargin
  }

  /** CASE ladder over a (key → code) mapping, generated from the same Seq
    * the Spark-side `F.recode` consumes — one source of truth per ladder.
    */
  private def dkCaseLadder(e: String, mapping: Seq[(String, Int)]): String =
    s"CASE $e " +
      mapping.map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ") +
      " ELSE NULL END"

  private def dkList(vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString("[", ", ", "]")

  private def q69Oracle: String = {
    val divs = dkList(graft.staging.SabangnetOrder.orderStatusDiv.map(_._1) :+ "기타")
    val sts = dkList(graft.staging.SabangnetOrder.orderStatus.map(_._1) :+ "알수없음")
    val divCase = dkCaseLadder("div_s", graft.staging.SabangnetOrder.orderStatusDiv)
    val stCase = dkCaseLadder("st_s", graft.staging.SabangnetOrder.orderStatus)
    s"""WITH raw AS (
       |  SELECT o_orderkey, o_custkey,
       |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
       |      ELSE 'INV' || CAST(o_orderkey AS VARCHAR) END AS invoice_no,
       |    (['CJ대한통운', '한진', '롯데'])[o_orderkey % 3 + 1] AS delivery_company,
       |    ($divs)[o_orderkey % 7 + 1] AS div_s,
       |    ($sts)[o_orderkey % 19 + 1] AS st_s,
       |    CASE WHEN o_orderkey % 13 = 0 THEN NULL
       |      ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || ' 12:34' END AS odt_s,
       |    CASE WHEN o_orderkey % 11 = 0 THEN NULL
       |      ELSE CAST(CAST(o_orderdate AS DATE) + 2 AS VARCHAR) END AS invd_s
       |  FROM orders)
       |SELECT o_orderkey AS order_seq,
       |  CAST(o_custkey % 10 AS INTEGER) AS account_no,
       |  invoice_no, delivery_company,
       |  $divCase AS order_status_div,
       |  $stCase AS order_status,
       |  TRY_CAST(TRY_STRPTIME(odt_s, '%Y-%m-%d %H:%M') AS TIMESTAMP) AS order_dt,
       |  TRY_CAST(invd_s AS DATE) AS invoice_date
       |FROM raw
       |WHERE invoice_no IS NOT NULL
       |  AND TRY_STRPTIME(odt_s, '%Y-%m-%d %H:%M') IS NOT NULL""".stripMargin
  }

  private def q70Oracle: String = {
    val dedupOrd = "first_order_dt DESC NULLS LAST, order_id DESC NULLS LAST, " +
      "product_name DESC NULLS LAST, model_code DESC NULLS LAST, " +
      "sales_price DESC NULLS LAST"
    def mergeCol(c: String, fn: String): String = {
      val onMatch = fn match {
        case "COALESCE" => s"COALESCE(s.$c, t.$c)"
        case other => s"$other(s.$c, t.$c)"
      }
      s"CASE WHEN t.option_id IS NOT NULL AND s.option_id IS NOT NULL THEN $onMatch\n" +
        s"       WHEN t.option_id IS NULL THEN s.$c ELSE t.$c END AS $c"
    }
    s"""WITH st0 AS (
       |  SELECT l_orderkey AS ok,
       |    'O' || CAST(l_partkey % 300 AS VARCHAR) AS option_id,
       |    'S' || CAST(l_partkey % 300 AS VARCHAR) AS product_id_shop,
       |    CAST(l_suppkey % 5 AS INTEGER) AS account_no,
       |    CASE WHEN l_linenumber % 4 = 0 THEN NULL
       |      ELSE 'M' || CAST(l_partkey % 300 AS VARCHAR) END AS model_code,
       |    CASE WHEN l_linenumber % 3 = 0 THEN NULL
       |      ELSE 'P' || CAST(l_partkey % 300 AS VARCHAR) END AS product_name,
       |    TRY_CAST(CASE WHEN l_orderkey % 7 = 0 THEN 'n/a'
       |      ELSE CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS VARCHAR) END
       |      AS INTEGER) AS sales_price,
       |    CAST(l_orderkey AS VARCHAR) AS order_id,
       |    TRY_CAST(TRY_STRPTIME(CASE WHEN l_orderkey % 9 = 0 THEN NULL
       |      ELSE CAST(CAST(l_shipdate AS DATE) AS VARCHAR) || ' 12:00' END,
       |      '%Y-%m-%d %H:%M') AS TIMESTAMP) AS first_order_dt
       |  FROM lineitem),
       |st AS (SELECT *, first_order_dt AS last_order_dt FROM st0),
       |tq AS (SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY account_no, product_id_shop, option_id
       |    ORDER BY $dedupOrd) AS rn FROM st WHERE ok % 2 = 0),
       |t AS (SELECT * FROM tq WHERE rn = 1),
       |sq AS (SELECT *, ROW_NUMBER() OVER (
       |    PARTITION BY account_no, product_id_shop, option_id
       |    ORDER BY $dedupOrd) AS rn FROM st WHERE ok % 3 = 0),
       |s AS (SELECT * FROM sq WHERE rn = 1)
       |SELECT
       |  COALESCE(t.account_no, s.account_no) AS account_no,
       |  COALESCE(t.product_id_shop, s.product_id_shop) AS product_id_shop,
       |  COALESCE(t.option_id, s.option_id) AS option_id,
       |  ${mergeCol("model_code", "COALESCE")},
       |  ${mergeCol("product_name", "COALESCE")},
       |  ${mergeCol("sales_price", "COALESCE")},
       |  ${mergeCol("order_id", "COALESCE")},
       |  ${mergeCol("first_order_dt", "LEAST")},
       |  ${mergeCol("last_order_dt", "GREATEST")}
       |FROM t FULL JOIN s
       |  ON t.account_no = s.account_no
       |  AND t.product_id_shop = s.product_id_shop
       |  AND t.option_id = s.option_id""".stripMargin
  }

  private def q72Oracle: String = {
    val rows = graft.staging.SmartstoreSettlement.settleTypeRows
    val stList = dkList(rows.map(_._2) :+ "UNKNOWN")
    val stCase = dkCaseLadder("st_code", rows.map(r => r._2 -> r._1))
    val nameCase = "CASE st_code " +
      rows.map(r => s"WHEN '${r._2}' THEN '${r._3}'").mkString(" ") +
      " ELSE NULL END"
    s"""WITH raw AS (
       |  SELECT o_orderkey, o_custkey, o_totalprice,
       |    ($stList)[o_orderkey % 8 + 1] AS st_code,
       |    (['PROD_ORDER', 'DELIVERY', 'REFUND', 'REVIEW'])[o_orderkey % 4 + 1] AS pot,
       |    CASE WHEN o_orderkey % 13 = 0 THEN 'not-a-date'
       |      ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR) END AS pay_s,
       |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
       |      ELSE CAST(CAST(o_orderdate AS DATE) + 14 AS VARCHAR) END AS scd_s
       |  FROM orders)
       |SELECT CAST(o_orderkey * 100000 + 7 AS BIGINT) AS product_order_id,
       |  o_orderkey AS order_id,
       |  CAST(123 AS BIGINT) AS channel_seq,
       |  TRY_CAST(CASE WHEN o_orderkey % 11 = 0 THEN 'bad'
       |    ELSE CAST(o_custkey % 2000 AS VARCHAR) END AS BIGINT) AS product_id,
       |  pot AS product_order_type,
       |  $stCase AS settle_type,
       |  $nameCase AS settle_type_name,
       |  CAST(FLOOR(o_totalprice) AS INTEGER) AS payment_amount,
       |  CAST(FLOOR(o_totalprice * 0.03) AS INTEGER) AS pay_commision_amount,
       |  CAST(FLOOR(o_totalprice * 0.01) AS INTEGER) AS benefit_settle_amount,
       |  CAST(FLOOR(o_totalprice * 0.96) AS INTEGER) AS settle_expect_amount,
       |  TRY_CAST(pay_s AS DATE) AS payment_date,
       |  TRY_CAST(scd_s AS DATE) AS settlement_date
       |FROM raw WHERE TRY_CAST(pay_s AS DATE) IS NOT NULL""".stripMargin
  }

  private def q76Oracle: String =
    """WITH ins AS (
        |  SELECT o_orderkey AS ad_id, o_custkey % 500 AS campaign_id,
        |    o_orderkey % 2000 + 1 AS product_id,
        |    (['P', 'M', 'X'])[o_orderkey % 3 + 1] AS device_code,
        |    (o_orderkey % 1000) * 7 AS impression_count,
        |    o_orderkey % 50 AS click_count,
        |    CAST(FLOOR(o_totalprice * 0.01) AS BIGINT) AS ad_cost,
        |    CAST(o_orderdate AS DATE) AS ymd
        |  FROM orders),
        |cmp AS (
        |  SELECT c_custkey AS campaign_id, CAST(c_nationkey AS BIGINT) AS customer_id,
        |    'CMP' || CAST(c_custkey AS VARCHAR) AS campaign_name,
        |    CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS campaign_type,
        |    c_mktsegment AS account_type,
        |    CASE WHEN c_custkey % 2 = 0 THEN '쇼핑검색' ELSE NULL END AS ad_type
        |  FROM customer WHERE c_custkey < 400),
        |ad AS (
        |  SELECT o_orderkey AS ad_id, CAST(o_custkey AS BIGINT) AS customer_id,
        |    o_orderkey % 100 AS adgroup_id,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |      ELSE 'AG' || CAST(o_orderkey % 4 AS VARCHAR) END AS adgroup_type,
        |    CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE '파워링크' END AS ad_type,
        |    'ADCMP' || CAST(o_custkey % 500 AS VARCHAR) AS campaign_name,
        |    CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE '파워' END AS campaign_type
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |prod AS (
        |  SELECT p_partkey AS product_id,
        |    CASE WHEN p_partkey % 6 = 0 THEN NULL
        |      ELSE 'T' || CAST(p_partkey % 5 AS VARCHAR) END AS team_name
        |  FROM part),
        |dev(code, label) AS (VALUES ('P', 'PC'), ('M', '모바일')),
        |side1 AS (
        |  SELECT COALESCE(ad.customer_id, cmp.customer_id) AS customer_id,
        |    i.campaign_id,
        |    COALESCE(ad.campaign_name, cmp.campaign_name) AS campaign_name,
        |    COALESCE(ad.campaign_type, cmp.campaign_type, '캠페인 없음') AS campaign_type,
        |    ad.adgroup_id,
        |    COALESCE(ad.adgroup_type, cmp.account_type || '-기타', '그룹 없음') AS adgroup_type,
        |    i.ad_id,
        |    COALESCE(ad.ad_type, cmp.ad_type, '유형 없음') AS ad_type,
        |    COALESCE(prod.team_name, '담당팀 없음') AS team_name,
        |    COALESCE(dev.label, '-') AS device_type,
        |    i.impression_count, i.click_count, i.ad_cost, i.ymd
        |  FROM ins i
        |  LEFT JOIN dev ON i.device_code = dev.code
        |  LEFT JOIN cmp ON i.campaign_id = cmp.campaign_id
        |  LEFT JOIN ad ON i.ad_id = ad.ad_id
        |  LEFT JOIN prod ON i.product_id = prod.product_id
        |  WHERE i.ymd BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
        |cd AS (
        |  SELECT o_orderkey + 9000000 AS contract_id, o_orderkey % 100 AS adgroup_id,
        |    o_orderkey % 2000 + 1 AS product_id,
        |    CAST(FLOOR(o_totalprice * 0.05) AS BIGINT) AS ad_cost,
        |    CAST(o_orderdate AS DATE) AS ymd
        |  FROM orders WHERE o_orderkey % 11 = 0),
        |cm AS (
        |  SELECT o_orderkey + 9000000 AS contract_id,
        |    CAST(o_custkey AS BIGINT) AS customer_id,
        |    o_custkey % 500 AS campaign_id,
        |    'CTCMP' || CAST(o_custkey % 500 AS VARCHAR) AS campaign_name,
        |    CASE WHEN o_orderkey % 4 = 0 THEN '브랜드검색' ELSE NULL END AS contract_type
        |  FROM orders WHERE o_orderkey % 11 = 0 AND o_orderkey % 2 = 0),
        |side2 AS (
        |  SELECT cm.customer_id, cm.campaign_id, cm.campaign_name,
        |    '캠페인 없음' AS campaign_type, cd.adgroup_id,
        |    '그룹 없음' AS adgroup_type,
        |    cd.contract_id AS ad_id,
        |    COALESCE(cm.contract_type, '유형 없음') AS ad_type,
        |    COALESCE(prod.team_name, '담당팀 없음') AS team_name,
        |    '계약' AS device_type,
        |    CAST(NULL AS BIGINT) AS impression_count,
        |    CAST(NULL AS BIGINT) AS click_count,
        |    cd.ad_cost, cd.ymd
        |  FROM cd
        |  LEFT JOIN cm ON cd.contract_id = cm.contract_id
        |  LEFT JOIN prod ON cd.product_id = prod.product_id
        |  WHERE cd.ymd BETWEEN DATE '1996-01-01' AND DATE '1996-12-31')
        |SELECT * FROM side1 UNION ALL SELECT * FROM side2""".stripMargin

  /** The 4-channel ad-report union: the naver branch is the whole q76
    * pipeline as a CTE; the other channels replay their slice models.
    */
  private def q95Oracle: String = {
    def channel(label: String, prefix: String, slice: Int, pct: String,
                conv: Boolean) = {
      val convSql =
        if (conv) "CAST(FLOOR(o_totalprice * 0.5) AS BIGINT)"
        else "CAST(NULL AS BIGINT)"
      s"""SELECT '$label' AS platform_name,
         |  '$prefix' || CAST(o_custkey % 100 AS VARCHAR) AS campaign_name,
         |  '${prefix}G' || CAST(o_orderkey % 40 AS VARCHAR) AS adgroup_name,
         |  '${prefix}A' || CAST(o_orderkey % 500 AS VARCHAR) AS ad_name,
         |  (['SALES', 'NCA', 'REACH'])[o_orderkey % 3 + 1] AS ad_type,
         |  CAST(FLOOR(o_totalprice * $pct) AS BIGINT) AS ad_cost,
         |  $convSql AS conv_amount,
         |  COALESCE(CASE WHEN o_custkey % 6 = 0 THEN NULL
         |    ELSE 'T' || CAST(o_custkey % 5 AS VARCHAR) END,
         |    '담당팀 없음') AS team_name,
         |  CAST(o_orderdate AS DATE) AS ymd
         |FROM orders
         |WHERE o_orderkey % 5 = $slice AND CAST(o_orderdate AS DATE)
         |  BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'""".stripMargin
    }
    val nv = q76Oracle.replace("\n", "\n  ")
    s"""WITH nv AS (
       |  $nv)
       |SELECT '네이버' AS platform_name, campaign_name,
       |  '-' AS adgroup_name, CAST(ad_id AS VARCHAR) AS ad_name, ad_type,
       |  ad_cost, CAST(NULL AS BIGINT) AS conv_amount, team_name, ymd
       |FROM nv
       |UNION ALL
       |${channel("쿠팡", "CP", 1, "0.04", conv = true)}
       |UNION ALL
       |${channel("구글", "GG", 2, "0.03", conv = false)}
       |UNION ALL
       |${channel("메타", "MT", 3, "0.02", conv = false)}""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q95_adreport_daily" -> q95Oracle,

    "q99_total_order" ->
      """WITH det AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS order_seq,
        |    l_orderkey AS order_id, l_suppkey % 5 AS account_no,
        |    'P' || CAST(l_partkey % 300 AS VARCHAR) AS product_id,
        |    CASE WHEN l_partkey % 10 = 0 THEN
        |      'C' || CAST(l_partkey % 300 AS VARCHAR) || 'a:2,C' ||
        |      CAST(l_partkey % 300 AS VARCHAR) || 'b:1' END AS bundle_option_ids,
        |    CAST(l_quantity AS BIGINT) AS order_quantity,
        |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS payment_amount,
        |    CAST(o_orderdate AS DATE) AS order_dt
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |nb AS (
        |  SELECT order_seq, order_id, account_no, product_id,
        |    order_quantity AS sku_quantity, payment_amount, order_dt
        |  FROM det WHERE bundle_option_ids IS NULL),
        |exp0 AS (
        |  SELECT order_seq, order_id, account_no, order_quantity,
        |    payment_amount, order_dt,
        |    UNNEST(string_split(bundle_option_ids, ',')) AS bundle_option
        |  FROM det WHERE bundle_option_ids IS NOT NULL),
        |expl AS (
        |  SELECT order_seq, order_id, account_no,
        |    string_split(bundle_option, ':')[1] AS product_id,
        |    COALESCE(TRY_CAST(string_split(bundle_option, ':')[2] AS BIGINT), 1)
        |      * order_quantity AS sku_quantity,
        |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY account_no, order_id
        |        ORDER BY order_seq, bundle_option, order_quantity,
        |          payment_amount) = 1
        |      THEN MAX(payment_amount) OVER (PARTITION BY account_no, order_id)
        |      ELSE 0 END AS payment_amount,
        |    order_dt
        |  FROM exp0),
        |comb AS (SELECT * FROM nb UNION ALL SELECT * FROM expl),
        |wc AS (
        |  SELECT *,
        |    TRY_CAST(regexp_extract(product_id, '([0-9]+)', 1) AS BIGINT)
        |      % 97 + 3 AS org_price
        |  FROM comb),
        |wc2 AS (
        |  SELECT *, org_price * sku_quantity AS cost_amount,
        |    COUNT(*) OVER (PARTITION BY account_no, order_id) AS cnt,
        |    CAST(SUM(payment_amount) OVER (PARTITION BY account_no, order_id)
        |      AS BIGINT) AS total_pay
        |  FROM wc),
        |split AS (
        |  SELECT *,
        |    ROUND(CAST(CAST(total_pay * cost_amount AS DOUBLE) /
        |      CAST(SUM(cost_amount) OVER (PARTITION BY account_no, order_id)
        |        AS DOUBLE) AS DECIMAL(38,10)), 0) AS raw,
        |    ROW_NUMBER() OVER (PARTITION BY account_no, order_id
        |      ORDER BY product_id, order_seq, sku_quantity, payment_amount)
        |      AS rn
        |  FROM wc2 WHERE cnt > 1),
        |rep AS (
        |  SELECT order_id, order_dt, sku_quantity,
        |    CAST(CASE WHEN rn = 1
        |      THEN CAST(total_pay AS DECIMAL(38,0)) -
        |        SUM(raw) OVER (PARTITION BY account_no, order_id) + raw
        |      ELSE raw END AS BIGINT) AS pay
        |  FROM split),
        |singles AS (
        |  SELECT order_id, order_dt, sku_quantity, payment_amount AS pay
        |  FROM wc2 WHERE cnt = 1),
        |final AS (SELECT * FROM rep UNION ALL SELECT * FROM singles)
        |SELECT order_dt, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT order_id) AS n_orders,
        |  CAST(SUM(sku_quantity) AS BIGINT) AS sku_quantity,
        |  CAST(SUM(pay) AS BIGINT) AS payment_amount
        |FROM final GROUP BY order_dt""".stripMargin,

    "q96_stock_time_batch" ->
      """WITH f AS (
        |  SELECT CAST(ts AS DATE) AS ymd,
        |    CASE WHEN hour(ts) < 17 THEN 10 ELSE 20 END AS batch,
        |    CAST(user_id % 3 AS INTEGER) AS group_id, ts AS updated_at
        |  FROM events)
        |SELECT ymd, batch, MAX(updated_at) AS max_updated_at,
        |  MAX(CASE WHEN group_id = 0 THEN updated_at END)
        |    AS ecount_max_updated_at,
        |  MAX(CASE WHEN group_id = 1 THEN updated_at END)
        |    AS cj_eflexs_max_updated_at,
        |  MAX(CASE WHEN group_id = 2 THEN updated_at END)
        |    AS coupang_rfm_max_updated_at
        |FROM f GROUP BY ymd, batch""".stripMargin,

    "q97_option_master" ->
      """WITH opt0 AS (
        |  SELECT l_partkey AS product_id,
        |    l_partkey * 10 + l_linenumber % 3 AS option_id,
        |    l_suppkey % 7 AS channel_seq,
        |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS sales_price,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY l_partkey * 10 + l_linenumber % 3
        |      ORDER BY l_suppkey % 7,
        |        CAST(FLOOR(l_extendedprice) AS BIGINT) DESC) AS rn
        |  FROM lineitem),
        |opt AS (SELECT * FROM opt0 WHERE rn = 1),
        |chl0 AS (
        |  SELECT CAST(n_nationkey % 7 AS BIGINT) AS channel_seq,
        |    'T' || CAST(n_nationkey % 5 AS VARCHAR) AS team_name,
        |    n_name AS brand_name,
        |    ROW_NUMBER() OVER (PARTITION BY n_nationkey % 7
        |      ORDER BY n_name) AS rn
        |  FROM nation),
        |chl AS (SELECT * FROM chl0 WHERE rn = 1),
        |prd AS (
        |  SELECT p_partkey AS product_id, p_name AS product_name,
        |    (p_partkey * 7) % 997 AS sort_key
        |  FROM part WHERE p_partkey % 3 = 0),
        |mx AS (SELECT MAX(sort_key) AS m FROM prd)
        |SELECT o.product_id, o.option_id, c.team_name, c.brand_name,
        |  p.product_name, o.sales_price,
        |  COALESCE(p.sort_key,
        |    CAST(repeat('9', length(CAST(mx.m AS VARCHAR))) AS BIGINT))
        |    AS sort_key1
        |FROM opt o
        |LEFT JOIN chl c ON o.channel_seq = c.channel_seq
        |LEFT JOIN prd p ON o.product_id = p.product_id
        |CROSS JOIN mx""".stripMargin,

    "q98_order_profit_daily" ->
      """WITH oc AS (
        |  SELECT o_orderkey AS order_id, o_orderstatus AS order_status,
        |    o_orderkey % 5 + 1 AS order_quantity,
        |    CAST(o_orderdate AS DATE) AS order_date
        |  FROM orders
        |  WHERE CAST(o_orderdate AS DATE)
        |    BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
        |f AS (SELECT *, order_id % 2000 + 1 AS product_id,
        |    'S' || CAST(order_id % 20 AS VARCHAR) AS shop_id FROM oc),
        |item AS (
        |  SELECT p_partkey AS product_id, p_name AS product_name,
        |    CASE WHEN p_partkey % 4 = 0 THEN NULL ELSE p_type END
        |      AS category_name3,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL
        |      ELSE 'EA' || CAST(p_partkey % 4 AS VARCHAR) END AS unit_name
        |  FROM part),
        |st(code, label) AS (VALUES ('O', '주문'), ('F', '완료'), ('P', '대기'))
        |SELECT f.order_id, f.product_id, f.shop_id,
        |  COALESCE(i.product_name, '매칭 불가 상품') AS product_name,
        |  COALESCE(CASE WHEN i.unit_name IS NULL THEN i.category_name3
        |    ELSE i.category_name3 || ' (' || i.unit_name || ')' END, '-')
        |    AS category_unit_name,
        |  COALESCE(st.label, '알 수 없음') AS order_status,
        |  f.order_quantity, f.order_date
        |FROM f
        |LEFT JOIN item i ON f.product_id = i.product_id
        |LEFT JOIN st ON f.order_status = st.code""".stripMargin,

    "q75_order_count_mom" ->
      """WITH oc AS (
        |  SELECT o_orderkey AS order_id, o_orderstatus AS order_status,
        |    o_orderkey % 5 + 1 AS order_quantity,
        |    CAST(o_orderdate AS DATE) AS order_date
        |  FROM orders),
        |s1 AS (
        |  SELECT order_id, order_status, order_quantity, order_date,
        |    DATE '1996-03-01' AS order_ym,
        |    MIN(order_date) OVER () AS order_start_date,
        |    MAX(order_date) OVER () AS order_end_date
        |  FROM oc WHERE order_date BETWEEN DATE '1996-03-01' AND DATE '1996-03-15'),
        |lb AS (
        |  SELECT order_id, order_status, order_quantity, order_date,
        |    CAST(DATE_TRUNC('month', order_date) AS DATE) AS order_ym
        |  FROM oc WHERE order_date BETWEEN DATE '1996-01-01' AND DATE '1996-02-29'),
        |s2 AS (
        |  SELECT *, MIN(order_date) OVER (PARTITION BY order_ym) AS order_start_date,
        |    MAX(order_date) OVER (PARTITION BY order_ym) AS order_end_date
        |  FROM lb),
        |u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2),
        |dow(dw, name) AS (VALUES (1, '(일)'), (2, '(월)'), (3, '(화)'),
        |  (4, '(수)'), (5, '(목)'), (6, '(금)'), (7, '(토)'))
        |SELECT order_id, order_status, order_quantity, order_date, order_ym,
        |  order_start_date, order_end_date,
        |  '[ ' || strftime(order_end_date, '%y') || '년 ' ||
        |  strftime(order_end_date, '%m') || '월 ]' || chr(10) ||
        |  CASE WHEN order_start_date <> order_end_date
        |    THEN strftime(order_start_date, '%y/%m/%d') || sd.name || chr(10) || '~ '
        |    ELSE chr(10) END ||
        |  strftime(order_end_date, '%y/%m/%d') || ed.name AS order_date_range
        |FROM u
        |LEFT JOIN dow sd ON dayofweek(u.order_start_date) + 1 = sd.dw
        |LEFT JOIN dow ed ON dayofweek(u.order_end_date) + 1 = ed.dw""".stripMargin,

    "q76_searchad_report" -> q76Oracle,



    "q77_sbn_range_orders" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_custkey,
        |    c_custkey - ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_custkey) AS grp
        |  FROM customer),
        |r AS (
        |  SELECT c_mktsegment, MIN(c_custkey) AS lo, MAX(c_custkey) AS hi
        |  FROM g GROUP BY c_mktsegment, grp)
        |SELECT r.c_mktsegment, r.lo, r.hi, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM r JOIN orders o ON o.o_custkey BETWEEN r.lo AND r.hi
        |GROUP BY 1, 2, 3""".stripMargin,

    "q78_stock_batch_probe" ->
      """WITH b AS (
        |  SELECT l_partkey AS product_code, CAST(l_shipdate AS DATE) AS ymd,
        |    ([10, 20, 30])[CAST(l_orderkey % 3 AS INTEGER) + 1] AS batch,
        |    CAST(l_quantity AS BIGINT) AS stock_qty
        |  FROM lineitem),
        |d AS (SELECT * FROM b WHERE ymd = DATE '1996-06-14'),
        |chosen AS (SELECT * FROM d WHERE batch = (SELECT MAX(batch) FROM d))
        |SELECT product_code, batch, CAST(SUM(stock_qty) AS BIGINT) AS stock_qty,
        |  COUNT(*) AS n_rows
        |FROM chosen GROUP BY 1, 2""".stripMargin,

    "q92_opex_daily" ->
      """WITH src AS (
        |  SELECT o_orderkey AS expense_id,
        |    'EXP' || CAST(o_orderkey % 40 AS VARCHAR) AS expense_name,
        |    o_custkey % 12 AS dept_id, o_orderkey % 25 AS brand_id,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS amount,
        |    COALESCE(CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |        ELSE CAST(o_orderdate AS DATE) END,
        |      CAST(o_orderdate AS DATE) + CAST(o_orderkey % 9 AS INTEGER))
        |      AS start_date,
        |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 9 AS INTEGER)
        |      AS end_date
        |  FROM orders),
        |d AS (SELECT *,
        |    CAST(DATEDIFF('day', start_date, end_date) + 1 AS BIGINT)
        |      AS date_count
        |  FROM src)
        |SELECT expense_id, expense_name, dept_id, brand_id,
        |  (amount // date_count +
        |    CASE WHEN o.off = 0 THEN amount % date_count ELSE 0 END) AS amount,
        |  start_date + CAST(o.off AS INTEGER) AS ymd
        |FROM d, (SELECT UNNEST(range(0, 9)) AS off) o
        |WHERE o.off < date_count""".stripMargin,

    "q93_cj_invoice_order" ->
      """WITH lois AS (
        |  SELECT REPLACE('LP-' || CAST(o_orderkey AS VARCHAR), '-', '')
        |      AS invoice_no,
        |    COALESCE(CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |      ELSE 'ORD' || CAST(o_orderkey AS VARCHAR) END, 'none')
        |      AS order_id,
        |    o_orderkey % 5000 AS delivery_fee, 0 AS box_cost
        |  FROM orders
        |  WHERE o_orderkey % 2 = 0 AND CAST(o_orderdate AS DATE)
        |    BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
        |ef AS (
        |  SELECT 'EF' || CAST(o_orderkey AS VARCHAR) AS invoice_no,
        |    'ORD' || CAST(o_orderkey AS VARCHAR) AS order_id,
        |    o_orderkey % 3000 AS delivery_fee, o_orderkey % 700 AS box_cost
        |  FROM orders
        |  WHERE o_orderkey % 3 = 0 AND CAST(o_orderdate AS DATE)
        |    BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
        |pi AS (
        |  SELECT invoice_no, order_id,
        |    CAST(SUM(delivery_fee) AS BIGINT) AS delivery_fee,
        |    CAST(SUM(box_cost) AS BIGINT) AS box_cost
        |  FROM (SELECT * FROM lois UNION ALL SELECT * FROM ef)
        |  GROUP BY invoice_no, order_id)
        |SELECT order_id, CAST(SUM(delivery_fee) AS BIGINT) AS delivery_fee,
        |  CAST(SUM(box_cost) AS BIGINT) AS box_cost
        |FROM pi WHERE order_id <> 'none'
        |GROUP BY order_id""".stripMargin,

    "q94_sales_target" ->
      """WITH fact AS (
        |  SELECT o_orderkey % 2000 + 1 AS product_id,
        |    'S' || CAST(o_custkey % 20 AS VARCHAR) AS shop_id,
        |    CAST(FLOOR(o_totalprice) AS BIGINT) AS payment_amount,
        |    CAST(o_orderdate AS DATE) AS order_date
        |  FROM orders
        |  WHERE CAST(o_orderdate AS DATE)
        |      BETWEEN DATE '1996-02-01' AND DATE '1996-03-31'
        |    AND o_orderkey % 4 = 0),
        |fb AS (
        |  SELECT COALESCE(p.p_brand, '200000') AS brand_id, f.shop_id,
        |    f.payment_amount, f.order_date,
        |    CASE WHEN DATE_TRUNC('month', f.order_date) = DATE '1996-03-01'
        |      THEN 1 ELSE 0 END AS group_id
        |  FROM fact f LEFT JOIN part p ON f.product_id = p.p_partkey),
        |period AS (
        |  SELECT MIN(CASE WHEN group_id = 0 THEN order_date END)
        |      AS previous_start_date,
        |    MAX(CASE WHEN group_id = 0 THEN order_date END)
        |      AS previous_end_date,
        |    MIN(CASE WHEN group_id = 1 THEN order_date END)
        |      AS current_start_date,
        |    MAX(CASE WHEN group_id = 1 THEN order_date END)
        |      AS current_end_date
        |  FROM fb),
        |sales AS (
        |  SELECT brand_id, shop_id,
        |    CAST(SUM(CASE WHEN group_id = 0 THEN payment_amount ELSE 0 END)
        |      AS BIGINT) AS previous_sales,
        |    CAST(SUM(CASE WHEN group_id = 1 THEN payment_amount ELSE 0 END)
        |      AS BIGINT) AS current_sales
        |  FROM fb WHERE payment_amount <> 0
        |  GROUP BY brand_id, shop_id),
        |targets AS (
        |  SELECT p_brand AS brand_id,
        |    'S' || CAST(p_partkey % 20 AS VARCHAR) AS shop_id,
        |    CAST(FLOOR(p_retailprice * 100) AS BIGINT) AS monthly_amount,
        |    ROW_NUMBER() OVER (PARTITION BY p_brand, p_partkey % 20
        |      ORDER BY p_partkey) AS rn
        |  FROM part)
        |SELECT COALESCE(f.brand_id, t.brand_id) AS brand_id,
        |  COALESCE(f.shop_id, t.shop_id) AS shop_id,
        |  COALESCE(f.previous_sales, 0) AS previous_sales,
        |  COALESCE(f.current_sales, 0) AS current_sales,
        |  NULLIF(t.monthly_amount, 0) AS target_sales,
        |  p.previous_start_date, p.previous_end_date,
        |  p.current_start_date, p.current_end_date
        |FROM sales f
        |FULL JOIN (SELECT * FROM targets WHERE rn = 1) t
        |  ON f.brand_id = t.brand_id AND f.shop_id = t.shop_id
        |CROSS JOIN period p""".stripMargin,

    "q86_center_report" ->
      """WITH raw AS (
        |  SELECT o_orderkey AS ok, o_custkey AS ck, o_totalprice,
        |    'nad-' || CAST(o_orderkey % 5000 AS VARCHAR) ||
        |      CASE WHEN o_orderkey % 9 = 0 THEN '(삭제)' ELSE '' END AS nccAdId,
        |    (['네이버', '파트너'])[o_orderkey % 2 + 1] AS mediaNm,
        |    (['PC', '모바일', '기타채널'])[o_orderkey % 3 + 1] AS pcMblTp,
        |    (['검색', '콘텐츠', '믹스'])[o_custkey % 3 + 1] AS ntwkTp,
        |    CAST(o_orderdate AS DATE) AS ymd
        |  FROM orders)
        |SELECT REPLACE(nccAdId, '(삭제)', '') AS ad_id,
        |  CAST(777 AS INTEGER) AS customer_id,
        |  mediaNm AS media_name,
        |  CASE WHEN pcMblTp = 'PC' THEN 0 WHEN pcMblTp = '모바일' THEN 1
        |    ELSE 2 END AS pc_mobile_type,
        |  CASE WHEN ntwkTp = '검색' THEN 0 WHEN ntwkTp = '콘텐츠' THEN 1
        |    ELSE 2 END AS network_type,
        |  CAST(ok % 10000 AS INTEGER) AS impression_count,
        |  CAST(ok % 300 AS INTEGER) AS click_count,
        |  CAST(FLOOR(o_totalprice * 0.05) AS INTEGER) AS ad_cost,
        |  CAST(ok % 20 AS INTEGER) AS conv_count,
        |  CAST(FLOOR(o_totalprice * 0.3) AS INTEGER) AS conv_amount,
        |  CAST(CAST(CAST(ok % 70 AS DOUBLE) / 10.0 AS DECIMAL(18,1))
        |    AS DOUBLE) AS avg_rank,
        |  CAST(CAST(CAST(ok % 800 AS DOUBLE) / 100.0 AS DECIMAL(18,2))
        |    AS DOUBLE) AS page_view_per_visit,
        |  CAST(CAST(CAST(ok % 30000 AS DOUBLE) / 100.0 AS DECIMAL(18,2))
        |    AS DOUBLE) AS stay_time_per_visit,
        |  ymd
        |FROM raw""".stripMargin,

    "q87_gfa_campaign" -> {
      val ladder = "CASE objective " +
        graft.staging.GfaReport.campaignType
          .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ") +
        " ELSE NULL END"
      val objs = (graft.staging.GfaReport.campaignType.map(_._1) :+ "OTHER")
        .map(o => s"'$o'").mkString("[", ", ", "]")
      s"""WITH raw AS (
         |  SELECT c_custkey, c_name,
         |    ($objs)[c_custkey % 9 + 1] AS objective
         |  FROM customer)
         |SELECT CAST(c_custkey AS VARCHAR) AS campaign_id,
         |  c_name AS campaign_name,
         |  $ladder AS campaign_type,
         |  c_custkey % 97 AS customer_id,
         |  (c_custkey % 2 = 0) AS is_enabled,
         |  (c_custkey % 5 = 0) AS is_deleted
         |FROM raw""".stripMargin
    },

    "q88_blog_search" ->
      """SELECT '스파크' AS keyword,
        |  CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) + 11 - 1 AS INTEGER)
        |    AS display_rank,
        |  REGEXP_REPLACE('<b>' || p_name || '</b> 리뷰', '<[^>]+>', '', 'g')
        |    AS title,
        |  'https://blog.example/' || CAST(p_partkey AS VARCHAR) AS url,
        |  REGEXP_REPLACE('great <i>' || p_brand || '</i> product',
        |    '<[^>]+>', '', 'g') AS description,
        |  'blogger' || CAST(p_partkey % 50 AS VARCHAR) AS address,
        |  'https://b.example/u' || CAST(p_partkey % 50 AS VARCHAR)
        |    AS blogger_url,
        |  TRY_CAST(TRY_STRPTIME(
        |    CASE WHEN p_partkey % 11 = 0 THEN '20240230'
        |      ELSE strftime(DATE '2024-01-01' +
        |        CAST(p_partkey % 300 AS INTEGER), '%Y%m%d') END,
        |    '%Y%m%d') AS DATE) AS post_date
        |FROM part""".stripMargin,

    "q89_smartstore_product" -> {
      val ladder = "CASE dlv " +
        graft.staging.SmartstoreProduct.deliveryType
          .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ") +
        " ELSE NULL END"
      val dlvs = (graft.staging.SmartstoreProduct.deliveryType.map(_._1) :+ "OTHER")
        .map(o => s"'$o'").mkString("[", ", ", "]")
      s"""WITH raw AS (
         |  SELECT p_partkey AS pk, p_name, p_brand, p_retailprice,
         |    ($dlvs)[p_partkey % 13 + 1] AS dlv
         |  FROM part)
         |SELECT CAST(pk + 5000000 AS BIGINT) AS product_id,
         |  CAST(pk + 4000000 AS BIGINT) AS product_no,
         |  TRY_CAST(CASE WHEN pk % 7 = 0 THEN 'x'
         |    ELSE CAST(pk % 90000 AS VARCHAR) END AS BIGINT) AS catalog_id,
         |  CAST(31 AS BIGINT) AS channel_seq,
         |  p_name AS product_name,
         |  'MG' || CAST(pk % 1000 AS VARCHAR) AS management_code,
         |  'MD' || CAST(pk % 500 AS VARCHAR) AS model_name,
         |  p_brand AS brand_name,
         |  TRY_CAST(CASE WHEN pk % 13 = 0 THEN '?'
         |    ELSE CAST(pk % 800 AS VARCHAR) END AS INTEGER) AS category_id,
         |  (['SALE', 'WAIT', 'OUTOFSTOCK'])[pk % 3 + 1] AS status_type,
         |  (['ON', 'WAIT', 'SUSPENSION'])[pk % 2 + 1] AS display_type,
         |  'tag' || CAST(pk % 20 AS VARCHAR) AS tags,
         |  CAST(pk % 100000 AS INTEGER) AS price,
         |  CAST(FLOOR(p_retailprice) AS INTEGER) AS sales_price,
         |  $ladder AS delivery_type,
         |  CAST(pk % 5000 AS INTEGER) AS delivery_fee,
         |  TRY_STRPTIME(SUBSTR(
         |    CASE WHEN pk % 17 = 0 THEN 'nope'
         |      ELSE CAST(DATE '2023-06-01' + CAST(pk % 200 AS INTEGER)
         |        AS VARCHAR) || 'T10:11:12+09:00' END, 1, 19),
         |    '%Y-%m-%dT%H:%M:%S') AS register_dt,
         |  TRY_STRPTIME(SUBSTR(
         |    CAST(DATE '2024-02-01' + CAST(pk % 100 AS INTEGER) AS VARCHAR)
         |      || 'T23:59:59', 1, 19),
         |    '%Y-%m-%dT%H:%M:%S') AS modify_dt
         |FROM raw""".stripMargin
    },

    "q90_sabangnet_account" ->
      """SELECT CAST(c_custkey AS INTEGER) AS account_no,
        |  'SHOP' || CAST(c_custkey % 200 AS VARCHAR) AS shop_id,
        |  c_name AS shop_name,
        |  (['오픈마켓', '종합몰', '전문몰'])[c_custkey % 3 + 1] AS shop_group,
        |  'user' || CAST(c_custkey % 50 AS VARCHAR) AS userid,
        |  CAST(c_custkey % 30 AS INTEGER) AS shop_seq,
        |  'https://shop.example/' || CAST(c_custkey % 200 AS VARCHAR)
        |    AS shop_url,
        |  c_mktsegment AS corp_name,
        |  (['Y', 'N'])[c_custkey % 2 + 1] AS use_yn
        |FROM customer""".stripMargin,

    "q91_brand_catalog" ->
      """WITH raw AS (
        |  SELECT p_partkey AS pk, p_name, p_brand,
        |    (['10', '10>21', '10>21>32', '10>21>32>4x'])[p_partkey % 4 + 1] AS fid,
        |    (['가전', '가전>주방', '가전>주방>소형',
        |      '가전>주방>소형>기타'])[p_partkey % 4 + 1] AS fnm
        |  FROM part)
        |SELECT pk AS product_id, p_name AS catalog_name,
        |  NULLIF(CASE WHEN pk % 6 = 0 THEN 0 ELSE pk % 400 END, 0) AS maker_id,
        |  'MK' || CAST(pk % 400 AS VARCHAR) AS maker_name,
        |  pk % 300 AS brand_id, p_brand AS brand_name,
        |  CAST(pk % 800 AS INTEGER) AS category_id,
        |  '소형' AS category_name,
        |  TRY_CAST(SPLIT_PART(fid, '>', 1) AS INTEGER) AS category_id1,
        |  NULLIF(SPLIT_PART(fnm, '>', 1), '') AS category_name1,
        |  TRY_CAST(SPLIT_PART(fid, '>', 2) AS INTEGER) AS category_id2,
        |  NULLIF(SPLIT_PART(fnm, '>', 2), '') AS category_name2,
        |  TRY_CAST(SPLIT_PART(fid, '>', 3) AS INTEGER) AS category_id3,
        |  NULLIF(SPLIT_PART(fnm, '>', 3), '') AS category_name3,
        |  TRY_CAST(SPLIT_PART(fid, '>', 4) AS INTEGER) AS category_id4,
        |  NULLIF(SPLIT_PART(fnm, '>', 4), '') AS category_name4,
        |  CAST(pk % 100000 AS INTEGER) AS lowest_price,
        |  CAST(pk % 500 AS INTEGER) AS product_count,
        |  CAST(pk % 10000 AS INTEGER) AS review_count,
        |  TRY_STRPTIME(SUBSTR(
        |    CAST(DATE '2022-01-01' + CAST(pk % 400 AS INTEGER) AS VARCHAR)
        |      || 'T08:09:10+09:00', 1, 19),
        |    '%Y-%m-%dT%H:%M:%S') AS register_dt
        |FROM raw""".stripMargin,

    "q82_pageview_product" ->
      """WITH u AS (
        |  SELECT p_partkey AS pk,
        |    CASE CAST(p_partkey % 4 AS INTEGER)
        |      WHEN 0 THEN '/shop7/products/' || CAST(p_partkey AS VARCHAR)
        |      WHEN 1 THEN '/shop' || CAST(p_partkey % 9 AS VARCHAR)
        |      WHEN 2 THEN '/shop/x/y' ELSE NULL END AS url
        |  FROM part),
        |c AS (
        |  SELECT CAST(55 AS BIGINT) AS mall_seq,
        |    CASE WHEN REGEXP_MATCHES(url, '^/[^/]+/products/\d+$')
        |        THEN CAST(REGEXP_EXTRACT(url, '(\d+)$') AS BIGINT)
        |      WHEN REGEXP_MATCHES(url, '^/[^/]+$') THEN 10
        |      ELSE NULL END AS product_id,
        |    pk % 100 AS page_click, pk % 50 AS user_click,
        |    pk % 10000 AS time_on_site, DATE '2024-02-03' AS ymd
        |  FROM u WHERE url IS NOT NULL)
        |SELECT * FROM c WHERE product_id IS NOT NULL""".stripMargin,

    "q83_dable_report" ->
      """WITH raw AS (
        |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |      ELSE 'C' || CAST(o_custkey % 100 AS VARCHAR) END AS campaign_id,
        |    o_orderkey % 1000 AS exposes, o_orderkey % 500 AS impressions,
        |    o_orderkey % 50 AS clicks,
        |    FLOOR(o_totalprice * 0.01) AS cost_spent,
        |    o_orderkey % 9 AS convertion_cnt,
        |    strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS ymd
        |  FROM orders)
        |SELECT COALESCE(campaign_id, '-') AS campaign_id,
        |  CAST(exposes AS INTEGER) AS expose_count,
        |  CAST(impressions AS INTEGER) AS impression_count,
        |  CAST(clicks AS INTEGER) AS click_count,
        |  CAST(cost_spent AS INTEGER) AS ad_cost,
        |  CAST(convertion_cnt AS INTEGER) AS conv_count,
        |  CAST(STRPTIME(ymd, '%Y%m%d') AS DATE) AS ymd
        |FROM raw WHERE impressions > 0""".stripMargin,

    "q84_google_campaign" ->
      """SELECT 'GC' || CAST(c_custkey AS VARCHAR) AS campaign_id,
        |  c_name AS campaign_name,
        |  CAST(991 AS BIGINT) AS customer_id,
        |  (['SEARCH', 'SHOPPING', 'VIDEO'])[c_custkey % 3 + 1] AS campaign_type,
        |  (['ENABLED', 'PAUSED', 'REMOVED'])[c_custkey % 3 + 1] AS campaign_status,
        |  'TARGET_ROAS' AS bidding_strategy,
        |  CAST(ROUND(COALESCE(TRY_CAST(
        |    CASE WHEN c_custkey % 6 = 0 THEN NULL
        |      WHEN c_custkey % 13 = 0 THEN 'x'
        |      ELSE CAST(c_custkey % 1000 * 1000003 AS VARCHAR) END
        |    AS BIGINT), 0) / 1000000) AS INTEGER) AS campaign_budget,
        |  COALESCE(TRY_CAST(CASE WHEN c_custkey % 9 = 0 THEN NULL
        |    ELSE CAST(c_custkey % 90000 AS VARCHAR) END AS INTEGER), 0)
        |    AS impression_count_30d,
        |  CAST(c_custkey % 4000 AS INTEGER) AS click_count_30d,
        |  CAST(ROUND(CAST(c_custkey % 500 * 2000003 AS BIGINT) / 1000000)
        |    AS INTEGER) AS ad_cost_30d,
        |  TRY_STRPTIME(CASE WHEN c_custkey % 17 = 0 THEN 'bad'
        |    ELSE CAST(DATE '2024-01-01' + CAST(c_custkey % 300 AS INTEGER)
        |      AS VARCHAR) || ' 10:30:00' END,
        |    '%Y-%m-%d %H:%M:%S') AS created_at
        |FROM customer""".stripMargin,

    "q85_meta_insights" ->
      """SELECT 'ACC1' AS account_id,
        |  'MC' || CAST(o_custkey % 50 AS VARCHAR) AS campaign_id,
        |  'AS' || CAST(o_orderkey % 200 AS VARCHAR) AS adset_id,
        |  'AD' || CAST(o_orderkey AS VARCHAR) AS ad_id,
        |  CAST(o_orderkey % 3000 AS INTEGER) AS impression_count,
        |  CAST(o_orderkey % 1500 AS INTEGER) AS reach_count,
        |  CAST(o_orderkey % 80 AS INTEGER) AS click_count,
        |  CAST(o_orderkey % 40 AS INTEGER) AS link_click_count,
        |  CAST(FLOOR(o_totalprice * 0.02) AS INTEGER) AS ad_cost,
        |  TRY_CAST(CASE WHEN o_orderkey % 19 = 0 THEN 'oops'
        |    ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR) END AS DATE) AS ymd
        |FROM orders""".stripMargin,

    "q79_bizdata_channel" ->
      """SELECT CAST(42 AS BIGINT) AS channel_seq,
        |  COALESCE(CASE WHEN c_custkey % 7 = 0 THEN NULL
        |    ELSE (['PC', 'MOBILE'])[c_custkey % 2 + 1] END, '-') AS device_category,
        |  COALESCE(CASE WHEN c_custkey % 5 = 0 THEN NULL
        |    ELSE 'src' || CAST(c_custkey % 4 AS VARCHAR) END, '-') AS nt_source,
        |  COALESCE(CASE WHEN c_custkey % 3 = 0 THEN NULL
        |    ELSE 'med' || CAST(c_custkey % 3 AS VARCHAR) END, '-') AS nt_medium,
        |  COALESCE(CASE WHEN c_custkey % 11 = 0 THEN NULL
        |    ELSE 'det' || CAST(c_custkey % 2 AS VARCHAR) END, '-') AS nt_detail,
        |  COALESCE(CASE WHEN c_custkey % 2 = 0 THEN NULL
        |    ELSE 'kw' || CAST(c_custkey % 50 AS VARCHAR) END, '-') AS nt_keyword,
        |  TRY_CAST(CASE WHEN c_custkey % 13 = 0 THEN 'x'
        |    ELSE CAST(c_custkey % 1000 AS VARCHAR) END AS INTEGER) AS num_users,
        |  CAST(c_custkey % 500 AS INTEGER) AS num_interactions,
        |  CAST(c_custkey % 2000 AS INTEGER) AS page_view,
        |  CAST(c_custkey % 30 AS INTEGER) AS num_purchases,
        |  CAST(FLOOR(c_acctbal) AS INTEGER) AS payment_amount,
        |  DATE '2024-03-01' AS ymd
        |FROM customer""".stripMargin,

    "q80_searchad_keyword" ->
      """SELECT 'kw-' || CAST(p_partkey AS VARCHAR) AS keyword,
        |  CASE WHEN p_partkey % 7 = 0 THEN 10
        |    WHEN p_partkey % 11 = 0 THEN 0
        |    ELSE CAST(p_partkey % 10000 AS INTEGER) END AS monthly_qc_cnt_pc,
        |  CASE WHEN p_partkey % 5 = 0 THEN 10
        |    ELSE CAST(p_partkey % 20000 AS INTEGER) END AS monthly_qc_cnt_mo,
        |  CAST(CAST(CAST(p_partkey % 1000 AS DOUBLE) / 10.0 AS DECIMAL(18,1))
        |    AS DOUBLE) AS monthly_avg_click_cnt_pc,
        |  CAST(CAST(CAST(p_partkey % 500 AS DOUBLE) / 10.0 AS DECIMAL(18,1))
        |    AS DOUBLE) AS monthly_avg_click_cnt_mo,
        |  CASE (['낮음', '중간', '높음', '?'])[p_partkey % 4 + 1]
        |    WHEN '낮음' THEN 0 WHEN '중간' THEN 1 WHEN '높음' THEN 2
        |    ELSE NULL END AS comp_idx,
        |  CAST(p_partkey % 15 AS INTEGER) AS avg_depth_pc,
        |  DATE '2026-03-01' - 31 AS start_date,
        |  DATE '2026-03-01' - 1 AS end_date
        |FROM part""".stripMargin,

    "q81_coupang_ads" ->
      """WITH raw AS (
        |  SELECT l_orderkey % 200 AS cmp, l_partkey % 100 AS opt,
        |    CASE WHEN l_partkey % 6 = 0 THEN NULL
        |      ELSE CAST(l_partkey % 100 + 1000 AS VARCHAR) END AS conv_s,
        |    (['검색 영역', '비검색 영역', '로켓채널', '외부채널'])[l_linenumber % 4 + 1] AS placement,
        |    (l_orderkey * 7) % 5000 AS imp, l_orderkey % 97 AS clk,
        |    (l_partkey * 13) % 300000 AS cost, l_orderkey % 9 AS cnv,
        |    (l_orderkey * 31) % 2000000 AS cva,
        |    CAST(YEAR(CAST(l_shipdate AS DATE)) * 10000 +
        |      MONTH(CAST(l_shipdate AS DATE)) * 100 +
        |      DAY(CAST(l_shipdate AS DATE)) AS BIGINT) AS d8
        |  FROM lineitem),
        |fmt AS (
        |  SELECT cmp, opt, conv_s, placement, d8,
        |    CASE WHEN imp >= 1000 THEN CAST(imp // 1000 AS VARCHAR) || ',' ||
        |      lpad(CAST(imp % 1000 AS VARCHAR), 3, '0')
        |      ELSE CAST(imp AS VARCHAR) END AS imp_s,
        |    CASE WHEN clk >= 1000 THEN CAST(clk // 1000 AS VARCHAR) || ',' ||
        |      lpad(CAST(clk % 1000 AS VARCHAR), 3, '0')
        |      ELSE CAST(clk AS VARCHAR) END AS clk_s,
        |    CASE WHEN cost >= 1000 THEN CAST(cost // 1000 AS VARCHAR) || ',' ||
        |      lpad(CAST(cost % 1000 AS VARCHAR), 3, '0')
        |      ELSE CAST(cost AS VARCHAR) END AS cost_s,
        |    CASE WHEN cnv >= 1000 THEN CAST(cnv // 1000 AS VARCHAR) || ',' ||
        |      lpad(CAST(cnv % 1000 AS VARCHAR), 3, '0')
        |      ELSE CAST(cnv AS VARCHAR) END AS cnv_s,
        |    CASE WHEN cva >= 1000 THEN CAST(cva // 1000 AS VARCHAR) || ',' ||
        |      lpad(CAST(cva % 1000 AS VARCHAR), 3, '0')
        |      ELSE CAST(cva AS VARCHAR) END AS cva_s
        |  FROM raw),
        |parsed AS (
        |  SELECT CAST(cmp AS BIGINT) AS campaign_id,
        |    CAST(opt AS BIGINT) AS option_id,
        |    COALESCE(CAST(conv_s AS BIGINT), 0) AS option_conv_id,
        |    CASE WHEN placement = '검색 영역' THEN 0
        |      WHEN placement = '비검색 영역' THEN 1 ELSE 2 END AS placement_group,
        |    TRY_CAST(REPLACE(imp_s, ',', '') AS INTEGER) AS impression_count,
        |    TRY_CAST(REPLACE(clk_s, ',', '') AS INTEGER) AS click_count,
        |    TRY_CAST(REPLACE(cost_s, ',', '') AS INTEGER) AS ad_cost,
        |    TRY_CAST(REPLACE(cnv_s, ',', '') AS INTEGER) AS conv_count,
        |    TRY_CAST(REPLACE(cva_s, ',', '') AS INTEGER) AS conv_amount,
        |    CAST(STRPTIME(CAST(d8 AS VARCHAR), '%Y%m%d') AS DATE) AS ymd
        |  FROM fmt)
        |SELECT campaign_id, 'VND1' AS vendor_id, option_id, option_conv_id,
        |  placement_group,
        |  CAST(SUM(impression_count) AS INTEGER) AS impression_count,
        |  CAST(SUM(click_count) AS INTEGER) AS click_count,
        |  CAST(SUM(ad_cost) AS INTEGER) AS ad_cost,
        |  CAST(SUM(conv_count) AS INTEGER) AS conv_count,
        |  CAST(SUM(conv_amount) AS INTEGER) AS conv_amount, ymd
        |FROM parsed
        |GROUP BY ymd, campaign_id, option_id, option_conv_id, placement_group""".stripMargin,

    "q69_sabangnet_invoice" -> q69Oracle,
    "q70_sabangnet_option" -> q70Oracle,
    "q72_smartstore_settlement" -> q72Oracle,

    "q71_coupang_rocket" ->
      """SELECT CAST(p_partkey % 1000 AS BIGINT) AS vendor_inventory_id,
        |  CAST(p_partkey + 100000 AS BIGINT) AS product_id,
        |  p_partkey AS option_id,
        |  CASE WHEN p_partkey % 5 <> 0 AND p_partkey % 4 <> 0
        |    THEN 'V' || CAST(p_partkey % 3 AS VARCHAR) ELSE 'VC99' END AS vendor_id,
        |  CASE WHEN p_partkey % 5 <> 0 AND p_partkey % 6 <> 0
        |    THEN 'CP ' || p_name ELSE p_name END AS product_name,
        |  CASE WHEN p_partkey % 5 <> 0 THEN p_brand ELSE NULL END AS option_name,
        |  CASE WHEN p_partkey % 5 <> 0 THEN
        |    CASE WHEN p_partkey % 2 <> 0 THEN CAST(p_partkey % 90 + 500 AS INTEGER)
        |         WHEN p_partkey % 3 <> 0 THEN CAST(p_partkey % 90 + 300 AS INTEGER)
        |         ELSE CAST(p_partkey % 90 + 100 AS INTEGER) END
        |    ELSE NULL END AS display_category_id,
        |  CASE WHEN p_partkey % 7 = 0 THEN 2
        |       WHEN p_partkey % 5 <> 0 THEN
        |         (CASE WHEN p_partkey % 3 <> 0 THEN 0 ELSE 1 END)
        |       ELSE NULL END AS product_status,
        |  CAST(p_partkey % 50 AS INTEGER) AS order_quantity,
        |  CAST(p_size AS INTEGER) AS stock_quantity
        |FROM part""".stripMargin,

    "q73_cj_stock" ->
      """SELECT 'I' || CAST(p_partkey AS VARCHAR) AS item_code,
        |  CASE WHEN p_partkey % 6 = 0 THEN NULL
        |    ELSE 'B' || CAST(p_partkey AS VARCHAR) END AS barcode,
        |  CAST(p_partkey % 40 + 1 AS BIGINT) AS customer_id,
        |  p_name AS item_name,
        |  'W' || CAST(p_partkey % 3 AS VARCHAR) AS warehouse_code,
        |  'Warehouse ' || CAST(p_partkey % 3 AS VARCHAR) AS warehouse_name,
        |  'Z' || CAST(p_partkey % 5 AS VARCHAR) AS zone_code,
        |  p_brand AS location_name,
        |  TRY_CAST(CASE WHEN p_partkey % 9 = 0 THEN 'n/a'
        |    ELSE CAST(p_partkey % 100000 AS VARCHAR) END AS BIGINT) AS lot_no,
        |  CAST(p_partkey % 500 AS INTEGER) AS total_quantity,
        |  CAST(p_partkey % 500 - p_partkey % 7 AS INTEGER) AS usable_quantity,
        |  CAST(p_partkey % 7 AS INTEGER) AS hold_quantity,
        |  TRY_CAST(CASE WHEN p_partkey % 8 = 0 THEN 'many'
        |    ELSE CAST(p_partkey % 365 AS VARCHAR) END AS INTEGER) AS remain_days,
        |  TRY_CAST(CAST(DATE '2025-01-01' + CAST(p_partkey % 300 AS INTEGER)
        |    AS VARCHAR) AS DATE) AS validate_date,
        |  TRY_CAST(STRPTIME(CAST(p_partkey % 28 + 20240101 AS VARCHAR),
        |    '%Y%m%d') AS DATE) AS inbound_date,
        |  TIMESTAMP '2026-01-02 03:04:05' AS updated_at
        |FROM part""".stripMargin,

    "q74_ecount_product" ->
      """SELECT 'E' || CAST(p_partkey AS VARCHAR) AS product_code,
        |  CASE WHEN p_partkey % 5 = 0 THEN NULL
        |    ELSE 'OPT' || CAST(p_partkey % 7 AS VARCHAR) END AS option_id,
        |  p_name AS product_name,
        |  p_type AS product_keyword,
        |  p_brand AS brand_name,
        |  'rem-' || CAST(p_partkey % 13 AS VARCHAR) AS remarks,
        |  TRY_CAST(CASE WHEN p_partkey % 6 = 0 THEN 'big'
        |    ELSE CAST(p_partkey % 24 AS VARCHAR) END AS INTEGER) AS unit_quantity,
        |  'U' || CAST(p_partkey % 4 AS VARCHAR) AS unit_name,
        |  TRY_CAST(CASE WHEN p_partkey % 7 = 0 THEN 'n/a'
        |    ELSE CAST(CAST(FLOOR(p_retailprice) AS BIGINT) AS VARCHAR) END
        |    AS INTEGER) AS org_price,
        |  COALESCE(
        |    NULLIF(CASE WHEN p_partkey % 3 = 0 THEN '0'
        |      ELSE '26-' || CAST(p_partkey % 12 + 1 AS VARCHAR) END, '0'),
        |    NULLIF(CASE WHEN p_partkey % 4 = 0 THEN '0'
        |      ELSE '27-' || CAST(p_partkey % 12 + 1 AS VARCHAR) END, '0'))
        |    AS expiration_date,
        |  TIMESTAMP '2026-02-03 04:05:06' AS updated_at
        |FROM part""".stripMargin,

    "q28_minhash_lsh" -> q28Oracle,
    "q152_dedup_clusters" -> q152Oracle,
    "q155_incremental_dedup" -> q155Oracle,
    "q29_simhash" -> q29Oracle,
    "q57_simhash_neardup" -> q57Oracle,
    "q35_ann_lsh" -> q35Oracle,
    "q185_ann_multiprobe" -> q185Oracle,
    "q186_ann_pq" -> q186Oracle,
    "q188_kmeans_clusters" -> q188Oracle,
    "q189_ann_ivfpq" -> q189Oracle,

    // URL dedup: the oracle states the closed-form canonical URL the
    // messy synthetic input must collapse to (scheme+host lowercased,
    // www/port/trailing-slash/fragment/tracking gone, params sorted)
    "q190_url_dedup" ->
      """WITH c AS (SELECT doc_id,
        |    'https://example' || (doc_id % 7) || '.com/Path' ||
        |    (doc_id % 13) || '?a=1&b=2' AS curl
        |  FROM documents),
        |g AS (SELECT curl, min(doc_id) AS keep_id, count(*) AS n_dups
        |  FROM c GROUP BY curl)
        |SELECT c.doc_id, c.curl, g.keep_id, CAST(g.n_dups AS BIGINT) AS n_dups
        |FROM c JOIN g USING (curl)""".stripMargin,

    // hash-grain near-dup pairs: the all-pairs Hamming-≤2 self-join is
    // the complete answer the banded operator must reproduce (no bucket
    // caps at q193's maxBucket)
    "q193_image_hash_neardup" ->
      """WITH b AS (SELECT doc_id,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
        |  FROM documents),
        |h AS (
        |  SELECT doc_id * 4 AS id, h AS phash FROM b
        |  UNION ALL
        |  SELECT doc_id * 4 + 1,
        |    xor(h, 1::BIGINT << CAST(doc_id % 60 AS INTEGER))
        |  FROM b WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id * 4 + 2,
        |    xor(h, 3::BIGINT << CAST(doc_id % 59 AS INTEGER))
        |  FROM b WHERE doc_id % 7 = 0)
        |SELECT a.id AS id_a, c.id AS id_b,
        |  CAST(bit_count(xor(a.phash, c.phash)) AS INTEGER) AS hamming
        |FROM h a JOIN h c ON a.id < c.id
        |WHERE bit_count(xor(a.phash, c.phash)) <= 2""".stripMargin,

    // exact-signature pairs (maxHamming=0): equal-hash pairs only
    "q194_audio_hash_neardup" ->
      """WITH h AS (
        |  SELECT vec_id * 2 AS id,
        |    ('0x' || substr(md5('audio:' || CAST(vec_id AS VARCHAR)),
        |      1, 15))::BIGINT AS phash
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id * 2 + 1,
        |    ('0x' || substr(md5('audio:' || CAST(vec_id AS VARCHAR)),
        |      1, 15))::BIGINT
        |  FROM embeddings WHERE vec_id % 7 = 0)
        |SELECT a.id AS id_a, b.id AS id_b, CAST(0 AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.phash = b.phash AND a.id < b.id""".stripMargin,

    // dedup clusters at exact grain: equality is transitive, so the
    // connected component of an id is min(id) over its signature group,
    // and the survivor is the min itself
    "q195_hash_dedup_clusters" ->
      """WITH h AS (
        |  SELECT vec_id * 2 AS id,
        |    ('0x' || substr(md5('audio:' || CAST(vec_id AS VARCHAR)),
        |      1, 15))::BIGINT AS phash
        |  FROM embeddings
        |  UNION ALL
        |  SELECT vec_id * 2 + 1,
        |    ('0x' || substr(md5('audio:' || CAST(vec_id AS VARCHAR)),
        |      1, 15))::BIGINT
        |  FROM embeddings WHERE vec_id % 7 = 0)
        |SELECT id, min(id) OVER (PARTITION BY phash) AS cluster_id,
        |  id = min(id) OVER (PARTITION BY phash) AS is_survivor
        |FROM h""".stripMargin,

    // frame-overlap video pairs: distinct canonical signature matches
    // per ordered video pair, thresholded — the all-pairs statement of
    // frameOverlapPairs' banded computation
    "q196_video_frame_overlap" ->
      """WITH f AS (SELECT DISTINCT doc_id % 40 AS video_id,
        |    ('0x' || substr(md5('frame:' || CAST(doc_id % 97 AS VARCHAR)),
        |      1, 15))::BIGINT AS phash
        |  FROM documents),
        |m AS (SELECT DISTINCT a.video_id AS va, b.video_id AS vb,
        |    least(a.phash, b.phash) AS p1, greatest(a.phash, b.phash) AS p2
        |  FROM f a JOIN f b
        |    ON a.video_id < b.video_id
        |   AND bit_count(xor(a.phash, b.phash)) <= 2)
        |SELECT va AS id_a, vb AS id_b, CAST(count(*) AS BIGINT) AS n_shared
        |FROM m GROUP BY va, vb HAVING count(*) >= 3""".stripMargin,

    // fixed-point PageRank: the same five integer power iterations,
    // unrolled as chained CTEs (generated — see q197Oracle)
    "q197_pagerank_domains" -> q197Oracle,

    // incremental hash dedup at exact grain: admission and dup_of from
    // signature-group minima (equality is transitive)
    "q199_incremental_hash_dedup" ->
      """WITH corpus AS (
        |  SELECT vec_id AS id,
        |    ('0x' || substr(md5('m:' || CAST(vec_id % 150 AS VARCHAR)),
        |      1, 15))::BIGINT AS phash
        |  FROM embeddings),
        |batch AS (
        |  SELECT doc_id + 10000 AS id,
        |    ('0x' || substr(md5('m:' ||
        |      CAST(doc_id % 60 + 120 AS VARCHAR)), 1, 15))::BIGINT AS phash
        |  FROM documents WHERE doc_id < 200),
        |cm AS (SELECT phash, min(id) AS corpus_min
        |  FROM corpus GROUP BY phash),
        |g AS (SELECT b.id, b.phash, cm.corpus_min,
        |    min(b.id) OVER (PARTITION BY b.phash) AS batch_min,
        |    count(*) OVER (PARTITION BY b.phash) AS n_batch
        |  FROM batch b LEFT JOIN cm USING (phash))
        |SELECT id,
        |  CASE WHEN corpus_min IS NOT NULL THEN FALSE
        |       WHEN n_batch > 1 AND id <> batch_min THEN FALSE
        |       ELSE TRUE END AS is_admitted,
        |  CASE WHEN corpus_min IS NOT NULL THEN corpus_min
        |       WHEN n_batch > 1 AND id <> batch_min THEN batch_min
        |       ELSE NULL END AS dup_of
        |FROM g""".stripMargin,

    // image quality gate: closed-form stats of the x+y gradient raster.
    // sum = n(w+h-2)/2 and sumSq = h·Σx² + 2ΣxΣy + w·Σy² are
    // integer-exact; one double division each + the same subtract/sqrt
    // reproduces the JVM's doubles bit-for-bit
    "q200_image_quality_gate" ->
      """WITH img AS (SELECT doc_id AS id,
        |    doc_id % 96 + 16 AS w, doc_id % 64 + 16 AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |s AS (SELECT id, w, h,
        |    CAST(w * h * (w + h - 2) / 2 AS DOUBLE) / (w * h) AS mean_g,
        |    CAST(h * ((w-1) * w * (2*w-1) / 6)
        |       + 2 * (w * (w-1) / 2) * (h * (h-1) / 2)
        |       + w * ((h-1) * h * (2*h-1) / 6) AS DOUBLE) / (w * h) AS m2
        |  FROM img),
        |t AS (SELECT id, w, h, mean_g,
        |    sqrt(greatest(m2 - mean_g * mean_g, 0.0)) AS std_g
        |  FROM s)
        |SELECT id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |  round(mean_g * 100) / 100 AS mean_gray,
        |  round(std_g * 100) / 100 AS std_gray,
        |  (w >= 32 AND h >= 32
        |    AND greatest(w, h) * 1.0 / least(w, h) <= 4.0
        |    AND std_g >= 8.0) AS keep
        |FROM t""".stripMargin,

    // WARC round-trip: the parser must hand back exactly the fixture
    // rows it serialized (urls, date header, HTTP status, UTF-8 body)
    "q201_warc_roundtrip" ->
      """SELECT 'https://' || source || '.example.com/doc/' || doc_id
        |    AS url,
        |  '2026-01-01T00:00:00Z' AS warc_date,
        |  CAST(200 AS BIGINT) AS http_status, text
        |FROM documents""".stripMargin,

    // domain blocklist: host equals a rule or is a dot-boundary
    // subdomain of one; longest matching rule (then lexicographically
    // largest) is the audit column — mirrored two-phase
    "q202_domain_blocklist" ->
      """WITH c AS (SELECT doc_id,
        |    'https://h' || (doc_id % 5) || '.example' || (doc_id % 7)
        |      || '.com/p' AS url,
        |    'h' || (doc_id % 5) || '.example' || (doc_id % 7) || '.com'
        |      AS host
        |  FROM documents),
        |r AS (SELECT * FROM (VALUES ('example0.com'), ('example2.com'),
        |    ('h1.example3.com')) AS t(domain)),
        |h AS (SELECT c.doc_id, r.domain FROM c JOIN r
        |    ON c.host = r.domain OR c.host LIKE '%.' || r.domain),
        |m1 AS (SELECT doc_id, max(length(domain)) AS ml
        |  FROM h GROUP BY doc_id),
        |m AS (SELECT h.doc_id, max(h.domain) AS matched_domain
        |  FROM h JOIN m1 ON h.doc_id = m1.doc_id
        |    AND length(h.domain) = m1.ml
        |  GROUP BY h.doc_id)
        |SELECT c.doc_id, c.url, c.host,
        |  m.matched_domain IS NOT NULL AS blocked, m.matched_domain
        |FROM c LEFT JOIN m ON c.doc_id = m.doc_id""".stripMargin,

    // offset-coherent landmark votes: all-pairs key join, vote
    // histogram per (pair, delta), winning delta = max votes then max
    // delta (the operator's stated tie-break)
    "q203_landmark_match" ->
      """WITH lm0 AS (
        |  SELECT doc_id % 20 AS id, (doc_id * 7 + 3) % 50 AS lkey,
        |    (doc_id // 20) % 40 AS toff
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id % 20 + 100, (doc_id * 7 + 3) % 50,
        |    (doc_id // 20) % 40 + 7
        |  FROM documents WHERE doc_id % 20 < 5),
        |l AS (SELECT DISTINCT id, lkey, toff FROM lm0),
        |v AS (SELECT a.id AS id_a, b.id AS id_b,
        |    b.toff - a.toff AS delta, count(*) AS c
        |  FROM l a JOIN l b ON a.lkey = b.lkey AND a.id < b.id
        |  GROUP BY 1, 2, 3),
        |mx AS (SELECT id_a, id_b, max(c) AS votes FROM v GROUP BY 1, 2)
        |SELECT v.id_a, v.id_b, CAST(mx.votes AS BIGINT) AS votes,
        |  CAST(max(v.delta) AS INTEGER) AS t_offset
        |FROM v JOIN mx ON v.id_a = mx.id_a AND v.id_b = mx.id_b
        |  AND v.c = mx.votes
        |WHERE mx.votes >= 5
        |GROUP BY v.id_a, v.id_b, mx.votes""".stripMargin,

    // landmark serving probe: corpus-batch cross votes only (the
    // operator's contract — batch ids all exceed corpus ids)
    "q204_landmark_serving" ->
      """WITH c AS (SELECT DISTINCT doc_id % 50 AS id,
        |    (doc_id * 11 + 3) % 200 AS lkey, (doc_id // 50) % 30 AS toff
        |  FROM documents),
        |b AS (SELECT DISTINCT doc_id % 50 + 2000 AS id,
        |    (doc_id * 11 + 3) % 200 AS lkey,
        |    (doc_id // 50) % 30 + 9 AS toff
        |  FROM documents WHERE doc_id % 50 < 3),
        |v AS (SELECT c.id AS id_a, b.id AS id_b,
        |    b.toff - c.toff AS delta, count(*) AS cnt
        |  FROM c JOIN b ON c.lkey = b.lkey GROUP BY 1, 2, 3),
        |mx AS (SELECT id_a, id_b, max(cnt) AS votes FROM v GROUP BY 1, 2)
        |SELECT v.id_a, v.id_b, CAST(mx.votes AS BIGINT) AS votes,
        |  CAST(max(v.delta) AS INTEGER) AS t_offset
        |FROM v JOIN mx ON v.id_a = mx.id_a AND v.id_b = mx.id_b
        |  AND v.cnt = mx.votes
        |WHERE mx.votes >= 5
        |GROUP BY v.id_a, v.id_b, mx.votes""".stripMargin,

    // HTML -> text: the identical regex chain under RE2 (inline (?is)
    // flags, no backreferences), entity decode in the same order
    // (&amp; last), trim over space+newline
    "q205_html_extract" ->
      raw"""WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id ||
        |  '</title><style>p {color:red}</style>' ||
        |  '<script type="text/javascript">if (1<2) { alert("x&y"); }' ||
        |  '</script></head><body><!-- comment -->' ||
        |  '<h1>News &amp; updates</h1><p>' || text ||
        |  '</p><ul><li>a&nbsp;b</li><li>&lt;raw&gt;</li></ul>' ||
        |  '<div class="foot">&quot;quoted&quot; &#39;s&#39;</div>' ||
        |  '</body></html>' AS x FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(x,
        |  '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g') AS x FROM h),
        |s2 AS (SELECT doc_id, regexp_replace(x,
        |  '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g') AS x FROM s1),
        |s2b AS (SELECT doc_id, regexp_replace(x,
        |  '(?is)<(script|style)\b[^>]*>.*$$', ' ', 'g') AS x FROM s2),
        |s3 AS (SELECT doc_id, regexp_replace(x,
        |  '(?s)<!--.*?-->', ' ', 'g') AS x FROM s2b),
        |s4 AS (SELECT doc_id, regexp_replace(x,
        |  '(?i)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|' ||
        |  'blockquote|section|article|header|footer|title|pre|form)' ||
        |  '\b[^>]*>', chr(10), 'g') AS x FROM s3),
        |s5 AS (SELECT doc_id, regexp_replace(x, '<[^>]*>', ' ', 'g')
        |  AS x FROM s4),
        |s6 AS (SELECT doc_id, replace(replace(replace(replace(replace(
        |  replace(x, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |  '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS x FROM s5),
        |s7 AS (SELECT doc_id, regexp_replace(x, '[ \t\r]+', ' ', 'g')
        |  AS x FROM s6),
        |s8 AS (SELECT doc_id, regexp_replace(x, ' *\n *', chr(10), 'g')
        |  AS x FROM s7),
        |s9 AS (SELECT doc_id, trim(regexp_replace(x, '\n+', chr(10),
        |  'g'), ' ' || chr(10)) AS x FROM s8)
        |SELECT doc_id, x AS text, CAST(length(x) AS BIGINT) AS n_chars
        |FROM s9""".stripMargin,

    // token-window chunking: same chunk-count formula
    // (1 + ceil(max(0, n - 64) / 48)), same slice bounds
    "q206_chunk_overlap" ->
      raw"""WITH t AS (SELECT doc_id,
        |    CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT)
        |    AS n_doc_tokens,
        |    CAST(1 + floor((greatest(len(toks) - 64, 0) + 47) / 48.0)
        |      AS BIGINT) AS n_chunks
        |  FROM t),
        |e AS (SELECT doc_id, toks, n_doc_tokens,
        |    unnest(range(0, n_chunks)) AS ci FROM n)
        |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx, n_doc_tokens,
        |  array_to_string(list_slice(toks, ci * 48 + 1, ci * 48 + 64),
        |    ' ') AS chunk_text,
        |  CAST(least(n_doc_tokens - ci * 48, 64) AS BIGINT) AS n_tokens
        |FROM e WHERE least(n_doc_tokens - ci * 48, 64) > 0""".stripMargin,

    // robots replay: the oracle states the SEMANTICS (the rule set each
    // domain's file implies for agent graftbot — exact group shadows
    // '*' on even domains, h4 has no file) rather than re-parsing the
    // text; a parser bug changes the Spark-side rule set and misses
    "q207_robots_filter" ->
      """WITH u AS (SELECT doc_id,
        |    'h' || (doc_id % 5) || '.example.com' AS host,
        |    CASE doc_id % 3 WHEN 0 THEN '/private/ok/page'
        |      WHEN 1 THEN '/private/x'
        |      ELSE '/p' || (doc_id % 11) END AS path
        |  FROM documents),
        |uu AS (SELECT doc_id, host, path,
        |    'https://' || host || path AS url FROM u),
        |r AS (SELECT * FROM (VALUES
        |    ('h0.example.com', 'disallow', '/secret'),
        |    ('h0.example.com', 'allow', '/'),
        |    ('h2.example.com', 'disallow', '/secret'),
        |    ('h2.example.com', 'allow', '/'),
        |    ('h1.example.com', 'disallow', '/private'),
        |    ('h1.example.com', 'allow', '/private/ok'),
        |    ('h1.example.com', 'disallow', '/p1'),
        |    ('h3.example.com', 'disallow', '/private'),
        |    ('h3.example.com', 'allow', '/private/ok'),
        |    ('h3.example.com', 'disallow', '/p3'))
        |  AS t(domain, kind, rpath)),
        |m AS (SELECT uu.doc_id, r.kind, r.rpath FROM uu JOIN r
        |    ON uu.host = r.domain AND starts_with(uu.path, r.rpath)),
        |b AS (SELECT doc_id, kind, rpath, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY length(rpath) DESC,
        |    (kind = 'allow') DESC, rpath DESC) AS rn FROM m)
        |SELECT uu.doc_id, uu.url, uu.host, uu.path,
        |  (b.kind IS NULL OR b.kind = 'allow') AS allowed,
        |  b.kind AS matched_kind, b.rpath AS matched_path
        |FROM uu LEFT JOIN b
        |  ON uu.doc_id = b.doc_id AND b.rn = 1""".stripMargin,

    // link extraction: the shared fixture chain at row grain
    "q208_extract_links" ->
      s"WITH $linkFixtureCtes\nSELECT doc_id, url, href, link FROM llink",

    // domain link graph -> unrolled fixed-point PageRank (generated —
    // see q209Oracle / pageRankOracleSql)
    "q209_link_pagerank" -> q209Oracle,

    // anchor pairs: closed-form expected rows (no regex mirror — the
    // fixture's anchors are fully synthetic); mailto row absent
    "q210_anchor_text" ->
      """WITH d AS (SELECT doc_id, doc_id % 5 AS m5, doc_id % 3 AS m3,
        |    doc_id % 4 AS m4 FROM documents)
        |SELECT doc_id,
        |  'https://s' || m5 || '.example.com/base/doc' AS url,
        |  'https://t' || m3 || '.org/p' AS href,
        |  'https://t' || m3 || '.org/p' AS link,
        |  'Visit & read ' || m5 AS anchor_text
        |FROM d
        |UNION ALL
        |SELECT doc_id, 'https://s' || m5 || '.example.com/base/doc',
        |  '/local/x', 'https://s' || m5 || '.example.com/local/x',
        |  'plain ' || m4
        |FROM d""".stripMargin,

    // sitemap entries: closed-form expected rows per fixture branch
    "q211_sitemap" ->
      """WITH d AS (SELECT doc_id, doc_id % 5 AS m5, doc_id % 7 AS m7,
        |    doc_id % 4 AS m4 FROM documents)
        |SELECT doc_id,
        |  'https://m' || m5 || '.example.com/p' || m7 AS loc,
        |  '2026-0' || (m4 + 1) || '-01' AS lastmod
        |FROM d WHERE doc_id % 2 = 1
        |UNION ALL
        |SELECT doc_id, 'https://m' || m5 || '.example.com/q?a=1&b=2',
        |  CAST(NULL AS VARCHAR)
        |FROM d WHERE doc_id % 2 = 1
        |UNION ALL
        |SELECT doc_id, 'https://m' || m5 || '.example.com/sitemap2.xml',
        |  CAST(NULL AS VARCHAR)
        |FROM d WHERE doc_id % 2 = 0""".stripMargin,

    // header-dims gate: closed-form dims per fixture format; the
    // non-image branch must yield nulls + keep=false
    "q212_header_dims" ->
      """WITH d AS (SELECT doc_id AS id, doc_id % 96 + 16 AS w,
        |    doc_id % 64 + 16 AS h, doc_id % 4 AS f FROM documents)
        |SELECT id,
        |  CASE f WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |         WHEN 2 THEN 'jpeg' END AS format,
        |  CASE WHEN f = 3 THEN NULL ELSE CAST(w AS INTEGER) END AS width,
        |  CASE WHEN f = 3 THEN NULL ELSE CAST(h AS INTEGER) END
        |    AS height,
        |  CASE WHEN f = 3 THEN FALSE
        |       ELSE w >= 32 AND h >= 32 AND
        |         greatest(w, h) * 1.0 / least(w, h) <= 4.0 END AS keep
        |FROM d""".stripMargin,

    // corpus report: integer sums per source, one exact double division
    "q213_corpus_report" ->
      raw"""WITH t AS (SELECT source,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
        |  FROM documents),
        |m AS (SELECT source, nt,
        |    CASE WHEN length(nt) = 0 THEN 0
        |         ELSE len(string_split(nt, ' ')) END AS ntok,
        |    length(nt) AS nch,
        |    length(nt) - length(regexp_replace(nt, '[^a-z0-9 ]', '',
        |      'g')) AS np,
        |    ('0x' || substr(md5(nt), 1, 15))::BIGINT AS fp
        |  FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ntok) AS BIGINT) AS n_tokens,
        |  CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS dup_docs,
        |  CAST(sum(CASE WHEN ntok < 20 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS short_docs,
        |  CAST(sum(np) AS DOUBLE) /
        |    CAST(greatest(sum(nch), 1) AS DOUBLE) AS punct_ratio
        |FROM m GROUP BY source""".stripMargin,

    // crawl budget: link-rank CTEs + the q06 allocation mirror at
    // domain grain (generated — see q214Oracle)
    "q214_crawl_budget" -> q214Oracle,

    // metadata-only COUNT(*): the logged stats must sum to the true
    // distinct-key count of the table q183 built from lineitem
    "q192_delta_metadata_count" ->
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_rows
        |FROM lineitem""".stripMargin,

    // composed web-curation pipeline: q190's closed-form canonical key
    // -> survivor pick -> q184's line rule over survivors -> q163's
    // Gopher stats over the cleaned text (minWords 20)
    "q191_web_curation_pipeline" ->
      raw"""WITH u AS (SELECT doc_id, source AS domain,
        |    'https://example' || (doc_id % 7) || '.com/Path' ||
        |    (doc_id % 13) || '?a=1&b=2' AS curl,
        |    text || chr(10) || 'visit ' || source || ' dot com' ||
        |    chr(10) ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'subscribe to our newsletter'
        |         ELSE 'unique tail ' || CAST(doc_id AS VARCHAR) END
        |      AS text
        |  FROM documents),
        |sv AS (SELECT u.* FROM u
        |  JOIN (SELECT curl, min(doc_id) AS keep_id FROM u GROUP BY curl) g
        |  ON u.curl = g.curl AND u.doc_id = g.keep_id),
        |ls AS (SELECT doc_id, domain,
        |    string_split(text, chr(10)) AS arr FROM sv),
        |lines AS (SELECT doc_id, domain,
        |    unnest(list_transform(range(len(arr)),
        |      i -> {'pos': i, 'line': arr[i+1]})) AS u
        |  FROM ls),
        |l2 AS (SELECT doc_id, domain, u.pos AS pos, u.line AS line,
        |    trim(regexp_replace(lower(u.line), '\s+', ' ', 'g')) AS lnorm
        |  FROM lines),
        |dd AS (SELECT domain, count(DISTINCT doc_id) AS n_docs
        |  FROM sv GROUP BY domain),
        |bo AS (SELECT domain, lnorm
        |  FROM l2 JOIN dd USING (domain)
        |  WHERE len(lnorm) > 0
        |  GROUP BY domain, lnorm, n_docs
        |  HAVING count(DISTINCT doc_id) >= 3
        |    AND count(DISTINCT doc_id) * 1.0 / n_docs > 0.5),
        |kept AS (SELECT l2.*
        |  FROM l2 LEFT JOIN bo
        |    ON l2.domain = bo.domain AND l2.lnorm = bo.lnorm
        |  WHERE bo.lnorm IS NULL),
        |agg AS (SELECT doc_id,
        |    string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id,
        |    len(string_split(text, chr(10))) AS n_lines FROM sv),
        |cl AS (SELECT t.doc_id, coalesce(a.clean_text, '') AS text,
        |    CAST(t.n_lines AS BIGINT) AS n_lines,
        |    CAST(t.n_lines - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
        |  FROM tot t LEFT JOIN agg a USING (doc_id)),
        |t2 AS (SELECT doc_id, n_lines, n_removed,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |      ' ') AS toks
        |  FROM cl),
        |m AS (SELECT doc_id, n_lines, n_removed,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    round(CAST(list_sum(list_transform(toks, w -> length(w)))
        |        AS DOUBLE) / greatest(len(toks), 1), 4) AS mean_word_len,
        |    round(CAST(len(list_filter(toks,
        |        w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
        |      / greatest(len(toks), 1), 4) AS alpha_frac,
        |    CAST(len(list_filter(toks, w -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it',
        |       'for','on','with','as','at','by','from','that','this'], w)))
        |      AS BIGINT) AS n_stopwords
        |  FROM t2)
        |SELECT doc_id, n_lines, n_removed, n_words,
        |  (n_words BETWEEN 20 AND 100000)
        |    AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND alpha_frac >= 0.8 AND n_stopwords >= 2 AS keep
        |FROM m""".stripMargin,
    "q40_embedding_neardup" -> q40Oracle,

    "q36_multimodal" ->
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS media_type,
        |  CASE WHEN doc_id % 3 = 2
        |    THEN CAST(octet_length(encode(text)) AS BIGINT) END AS n_bytes,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN CAST(doc_id % 96 + 16 AS BIGINT) END AS decoded_width,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN CAST(doc_id % 64 + 16 AS BIGINT) END AS decoded_height,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN CAST((doc_id % 96 + 16) * (doc_id % 64 + 16)
        |      * ((doc_id % 96 + 16) + (doc_id % 64 + 16) - 2) // 2 AS BIGINT)
        |    END AS pixel_sum,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(8000 AS BIGINT) END
        |    AS sample_rate,
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 4000 + 100 AS BIGINT)
        |    END AS n_frames,
        |  -- sawtooth closed form: sample(i) = (i % 200) - 100 over
        |  -- n = doc_id % 4000 + 100 frames; each full period sums to -100
        |  CASE WHEN doc_id % 3 = 1 THEN CAST(
        |    -100 * ((doc_id % 4000 + 100) // 200)
        |    + ((doc_id % 4000 + 100) % 200) * ((doc_id % 4000 + 100) % 200 - 1) // 2
        |    - 100 * ((doc_id % 4000 + 100) % 200) AS BIGINT)
        |    END AS sample_sum
        |FROM documents""".stripMargin,

    // video container metadata: the parser's output must equal the
    // generator's id formulas; container sizes are fixed-length box
    // skeletons (MP4 240 B, AVI 88 B)
    "q181_video_meta" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END
        |    AS video_container,
        |  CAST(doc_id % 320 + 32 AS BIGINT) AS decoded_width,
        |  CAST(doc_id % 240 + 32 AS BIGINT) AS decoded_height,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 5000 + 500 AS BIGINT)
        |    ELSE CAST(40 * (doc_id % 250 + 25) AS BIGINT) END
        |    AS video_duration_ms,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(240 AS BIGINT)
        |    ELSE CAST(88 AS BIGINT) END AS n_bytes
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,

    "q01_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_agg_conditional" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_open,
        |  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_filled,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q03_agg_anyvalue" ->
      """SELECT c_custkey, ANY_VALUE(c_name) AS c_name, COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey""".stripMargin,

    "q04_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q05_scalar_subquery" ->
      """SELECT * FROM orders
        |WHERE o_totalprice >= (SELECT MAX(o_totalprice) * 0.5 FROM orders)""".stripMargin,

    "q06_alloc_weighted" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice, o_totalprice,
        |         SUM(l_extendedprice) OVER (PARTITION BY l_orderkey) AS wsum
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |r AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(ROUND(CAST(o_totalprice * l_extendedprice / wsum AS DECIMAL(38,10)), 2) AS DECIMAL(38,2)) AS raw,
        |    CAST(o_totalprice AS DECIMAL(38,2)) AS total,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice) AS rn
        |  FROM li)
        |SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(CAST(CASE WHEN rn = 1
        |    THEN total - SUM(raw) OVER (PARTITION BY l_orderkey) + raw
        |    ELSE raw END AS DECIMAL(38,2)) AS DOUBLE) AS alloc
        |FROM r""".stripMargin,

    "q07_alloc_divmod" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(o_orderkey % 3 + 1 AS INTEGER) AS n
        |  FROM orders),
        |e AS (SELECT o_orderkey, cents, n, UNNEST(generate_series(0, n - 1)) AS pos FROM o)
        |SELECT o_orderkey, CAST(pos AS BIGINT) AS pos,
        |  cents // n + CASE WHEN pos = 0 THEN cents % n ELSE 0 END AS alloc
        |FROM e""".stripMargin,

    "q08_percentile" ->
      """SELECT o_orderpriority,
        |  ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS median_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q09_qualify_top1" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn = 1""".stripMargin,

    "q10_lead_gap" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS ymd,
        |  LEAD(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS next_ymd,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |    LEAD(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey)) AS BIGINT) AS gap_days
        |FROM orders""".stripMargin,

    "q11_window_ratio" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_total,
        |  ROUND(l_extendedprice / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_orderkey) AS DOUBLE), 4) AS price_ratio
        |FROM lineitem""".stripMargin,

    "q12_star_join" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q13_rolling_30d" ->
      """WITH daily AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS ymd,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS day_total
        |  FROM orders GROUP BY 1, 2)
        |SELECT a.o_custkey, a.ymd, CAST(a.day_total AS DOUBLE) AS day_total,
        |  CAST((SELECT SUM(b.day_total) FROM daily b
        |        WHERE b.o_custkey = a.o_custkey
        |          AND b.ymd BETWEEN a.ymd - 30 AND a.ymd - 1) AS DOUBLE) AS rolling_30d
        |FROM daily a""".stripMargin,

    "q14_band_join" ->
      """WITH bands0 AS (
        |  SELECT * FROM (VALUES ('S', 1), ('M', 11), ('L', 26), ('XL', 41)) AS t(band_name, lo)),
        |bands AS (
        |  SELECT band_name, lo,
        |    COALESCE(LEAD(lo) OVER (ORDER BY lo) - 1, 9223372036854775807) AS hi
        |  FROM bands0)
        |SELECT band_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem LEFT JOIN bands ON l_quantity BETWEEN lo AND hi
        |GROUP BY band_name""".stripMargin,

    "q15_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q16_array_semi" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE list_contains(string_split(p_name, ' '), 'widget')""".stripMargin,

    "q17_explode_words" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT UNNEST(string_split(p_name, ' ')) AS word FROM part) t
        |GROUP BY word""".stripMargin,

    "q18_union_reagg" ->
      """WITH u AS (
        |  SELECT CAST(o_orderdate AS DATE) AS ymd,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS amt, 'orders' AS src FROM orders
        |  UNION ALL
        |  SELECT CAST(l_shipdate AS DATE) AS ymd,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS amt, 'lineitem' AS src FROM lineitem)
        |SELECT CAST(date_trunc('month', ymd) AS DATE) AS month, src,
        |  CAST(SUM(amt) AS DOUBLE) AS total, COUNT(*) AS n
        |FROM u GROUP BY 1, 2""".stripMargin,

    "q19_enum_recode" ->
      """SELECT o_orderkey,
        |  CAST(CASE o_orderpriority
        |    WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
        |    WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 ELSE -1 END AS BIGINT) AS priority_rank,
        |  CASE o_orderstatus
        |    WHEN 'O' THEN 'open' WHEN 'F' THEN 'filled' WHEN 'P' THEN 'pending'
        |    ELSE 'unknown' END AS status_label
        |FROM orders""".stripMargin,

    "q20_regex" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)$', 1) AS cust_num,
        |  regexp_replace(c_name, '[0-9]', '', 'g') AS name_stripped,
        |  concat_ws('-', c_mktsegment, c_name[-3:]) AS seg_key
        |FROM customer
        |WHERE regexp_matches(c_name, '^Customer#0*[0-9]*[02468]$')""".stripMargin,

    "q21_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS ymd,
        |  CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month_start,
        |  strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
        |  CAST(EXTRACT(dow FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
        |  CAST(o_orderdate AS DATE) + 7 AS plus7,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus1m,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr
        |FROM orders""".stripMargin,

    "q22_date_scaffold" ->
      """WITH b AS (SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
        |                  CAST(MAX(o_orderdate) AS DATE) AS hi FROM orders),
        |days AS (SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |  CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS ymd FROM b),
        |daily AS (SELECT CAST(o_orderdate AS DATE) AS ymd, COUNT(*) AS n
        |          FROM orders GROUP BY 1)
        |SELECT d.ymd, COALESCE(n, 0) AS n_orders
        |FROM days d LEFT JOIN daily USING (ymd)""".stripMargin,

    "q23_json_extract" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "q24_unpivot" ->
      """WITH m AS (
        |  SELECT c_mktsegment,
        |    CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_bal,
        |    CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM customer GROUP BY c_mktsegment)
        |SELECT c_mktsegment, 'sum_bal' AS metric, sum_bal AS value FROM m
        |UNION ALL
        |SELECT c_mktsegment, 'n' AS metric, n AS value FROM m""".stripMargin,

    "q25_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS total,
        |    CAST(o_orderdate AS DATE) AS ymd
        |  FROM orders),
        |t AS (SELECT * FROM base WHERE o_orderkey % 2 = 0),
        |s AS (SELECT o_orderkey, 'X' AS o_orderstatus,
        |        CAST(total * 2 AS DECIMAL(18,2)) AS total, ymd
        |      FROM base WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
        |  CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL THEN s.o_orderstatus
        |       WHEN t.o_orderkey IS NULL THEN s.o_orderstatus
        |       ELSE t.o_orderstatus END AS o_orderstatus,
        |  CAST(CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL THEN GREATEST(s.total, t.total)
        |       WHEN t.o_orderkey IS NULL THEN s.total
        |       ELSE t.total END AS DOUBLE) AS total,
        |  CASE WHEN t.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL THEN LEAST(s.ymd, t.ymd)
        |       WHEN t.o_orderkey IS NULL THEN s.ymd
        |       ELSE t.ymd END AS ymd
        |FROM t FULL JOIN s ON t.o_orderkey = s.o_orderkey""".stripMargin,

    "q26_dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS digest,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents
        |GROUP BY 1""".stripMargin,

    "q27_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, $dkToks AS toks FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(${dkShingles(3)},
        |      s -> ${dkHash("s")})) AS sh
        |  FROM t)
        |SELECT id_a, id_b, ROUND(j, 4) AS jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) AS j
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id)
        |WHERE j >= 0.8""".stripMargin,

    "q30_lang_id" ->
      """WITH t AS (
        |  SELECT lang,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT lang,
        |    len(list_filter(toks, x -> list_contains(['the','and','is','of','to'], x))) AS s_en,
        |    len(list_filter(toks, x -> list_contains(['der','und','ist','von','zu'], x))) AS s_de,
        |    len(list_filter(toks, x -> list_contains(['el','y','es','de','que'], x))) AS s_es,
        |    len(list_filter(toks, x -> list_contains(['le','et','est','de','que'], x))) AS s_fr
        |  FROM t),
        |p AS (
        |  SELECT lang,
        |    CASE WHEN s_en = GREATEST(s_en, s_de, s_es, s_fr) AND GREATEST(s_en, s_de, s_es, s_fr) > 0 THEN 'en'
        |         WHEN s_de = GREATEST(s_en, s_de, s_es, s_fr) AND GREATEST(s_en, s_de, s_es, s_fr) > 0 THEN 'de'
        |         WHEN s_es = GREATEST(s_en, s_de, s_es, s_fr) AND GREATEST(s_en, s_de, s_es, s_fr) > 0 THEN 'es'
        |         WHEN s_fr = GREATEST(s_en, s_de, s_es, s_fr) AND GREATEST(s_en, s_de, s_es, s_fr) > 0 THEN 'fr'
        |         ELSE 'und' END AS pred_lang
        |  FROM sc)
        |SELECT lang, pred_lang, COUNT(*) AS n FROM p GROUP BY lang, pred_lang""".stripMargin,

    "q31_text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS txt
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, txt, length(txt) AS n_chars_norm,
        |    string_split(txt, ' ') AS toks,
        |    length(txt) - length(regexp_replace(txt, '[^a-z0-9 ]', '', 'g')) AS punct
        |  FROM t)
        |SELECT doc_id,
        |  CAST(n_chars_norm AS BIGINT) AS n_chars_norm,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  ROUND(CAST(punct AS DOUBLE) / GREATEST(n_chars_norm, 1), 4) AS punct_ratio,
        |  ROUND(CAST(len(list_filter(toks, x -> list_contains(
        |    ['the','a','an','and','or','of','to','in','is','it','for','on','with','as','at','by','from','that','this'], x)))
        |    AS DOUBLE) / GREATEST(len(toks), 1), 4) AS stopword_ratio,
        |  ROUND(CAST(n_chars_norm AS DOUBLE) / GREATEST(len(toks), 1), 4) AS mean_token_len
        |FROM x""".stripMargin,

    "q32_token_count" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_ws_tokens,
        |  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE len(regexp_split_to_array(trim(text), '[^A-Za-z0-9]+'))
        |      + length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))
        |      + length(text) // 16 END AS BIGINT) AS n_bpe_tokens
        |FROM documents""".stripMargin,

    "q33_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    "q46_try_cast" ->
      """SELECT p_partkey,
        |  TRY_CAST(p_name AS INTEGER) AS name_as_int,
        |  TRY_CAST(p_size AS VARCHAR) AS size_str,
        |  TRY_CAST(substr(p_name, 1, 1) AS INTEGER) AS first_char_int,
        |  COALESCE(TRY_CAST(p_name AS INTEGER), -1) AS with_default
        |FROM part""".stripMargin,

    "q47_date_predicate" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS ymd FROM orders
        |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-03-01' AND DATE '1996-03-03'
        |   OR CAST(o_orderdate AS DATE) IN (DATE '1996-07-14', DATE '1996-09-02')""".stripMargin,

    "q43_iqr_outliers" ->
      """WITH stats AS (
        |  SELECT p_brand,
        |    ROUND(q1 - (q3 - q1) * 1.5, 4) AS lo,
        |    ROUND(q3 + (q3 - q1) * 1.5, 4) AS hi
        |  FROM (
        |    SELECT p_brand,
        |      PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY p_retailprice) AS q1,
        |      PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY p_retailprice) AS q3
        |    FROM part GROUP BY p_brand) t)
        |SELECT p_partkey, p.p_brand, p_retailprice, lo, hi
        |FROM part p JOIN stats s ON p.p_brand = s.p_brand
        |WHERE p_retailprice < lo OR p_retailprice > hi""".stripMargin,

    "q44_global_rank" ->
      """SELECT p_partkey, p_retailprice,
        |  CAST(ROW_NUMBER() OVER (ORDER BY p_retailprice DESC, p_partkey) + 100 - 1 AS BIGINT) AS display_rank
        |FROM part""".stripMargin,

    "q45_union_distinct" ->
      """SELECT DISTINCT status FROM (
        |  SELECT o_orderstatus AS status FROM orders
        |  UNION ALL
        |  SELECT l_linestatus AS status FROM lineitem) t""".stripMargin,

    "q42_agg_map" ->
      """SELECT o_orderpriority,
        |  COUNT(o_orderkey) AS o_orderkey_count,
        |  MIN(o_totalprice) AS o_totalprice_min,
        |  MAX(o_totalprice) AS o_totalprice_max,
        |  array_to_string(list_sort(list(o_orderstatus)), ',') AS statuses
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q49_funnel" ->
      """WITH s AS (
        |  SELECT user_id, MIN(ts) AS ts_signup FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT DISTINCT e.user_id FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s.ts_signup)
        |SELECT (SELECT COUNT(*) FROM s) AS n_signup,
        |       (SELECT COUNT(*) FROM p) AS n_converted""".stripMargin,

    "q48_stock_report" ->
      """WITH daily AS (
        |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS ymd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS day_qty
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT a.l_partkey, a.ymd, a.day_qty,
        |    CAST((SELECT SUM(b.day_qty) FROM daily b
        |          WHERE b.l_partkey = a.l_partkey
        |            AND b.ymd BETWEEN a.ymd - 30 AND a.ymd - 1) AS DECIMAL(38,2)) AS qty_30d
        |  FROM daily a)
        |SELECT l_partkey, ymd, CAST(day_qty AS DOUBLE) AS day_qty,
        |  CAST(qty_30d AS DOUBLE) AS qty_30d,
        |  CAST(LEAD(day_qty) OVER (PARTITION BY l_partkey ORDER BY ymd) AS DOUBLE) AS next_qty,
        |  CAST(LEAD(day_qty) OVER (PARTITION BY l_partkey ORDER BY ymd) - day_qty AS DOUBLE) AS dod
        |FROM r""".stripMargin,

    "q41_profit_mom" ->
      """WITH u AS (
        |  SELECT CAST(o_orderdate AS DATE) AS ymd, 'orders' AS channel,
        |    CAST(o_totalprice AS DECIMAL(18,4)) AS amount FROM orders
        |  UNION ALL
        |  SELECT CAST(l_shipdate AS DATE), 'lineitem',
        |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |  FROM lineitem
        |  UNION ALL
        |  SELECT CAST(ts AS DATE), 'events', CAST(value AS DECIMAL(18,4))
        |  FROM events WHERE event_type = 'purchase'),
        |core AS (
        |  SELECT ymd, channel, CAST(SUM(amount) AS DECIMAL(38,4)) AS revenue
        |  FROM u GROUP BY 1, 2),
        |base AS (
        |  SELECT CAST(date_trunc('month', ymd) AS DATE) AS month, channel,
        |    CAST(SUM(revenue) AS DECIMAL(38,4)) AS revenue
        |  FROM core
        |  WHERE ymd BETWEEN DATE '1990-01-01' AND DATE '2030-12-31'
        |  GROUP BY 1, 2),
        |lagged AS (
        |  SELECT month, channel, revenue,
        |    CAST(LAG(revenue) OVER (PARTITION BY channel ORDER BY month) AS DECIMAL(38,4)) AS prev_revenue
        |  FROM base)
        |SELECT month, channel, CAST(revenue AS DOUBLE) AS revenue,
        |  CAST(prev_revenue AS DOUBLE) AS prev_revenue,
        |  CAST(CAST(ROUND(CAST((CAST(revenue AS DOUBLE) - CAST(prev_revenue AS DOUBLE))
        |    / CAST(prev_revenue AS DOUBLE) * 100 AS DECIMAL(38,10)), 4) AS DECIMAL(38,4)) AS DOUBLE) AS mom_pct
        |FROM lagged""".stripMargin,

    "q37_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, value,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN prev_ts IS NULL
        |      OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS is_new
        |  FROM e)
        |SELECT user_id,
        |  CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
        |  ts, event_id, value
        |FROM f""".stripMargin,

    "q38_temporal_join" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS ymd,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS total FROM orders),
        |rel AS (SELECT DISTINCT CAST(date_trunc('quarter', ymd) AS DATE) AS q_start FROM o),
        |rel2 AS (
        |  SELECT q_start,
        |    CAST(q_start + INTERVAL 3 MONTH AS DATE) - 1 AS q_end,
        |    concat(CAST(EXTRACT(year FROM q_start) AS VARCHAR), '-Q',
        |           CAST(EXTRACT(quarter FROM q_start) AS VARCHAR)) AS q_label
        |  FROM rel)
        |SELECT q_label, COUNT(*) AS n_orders,
        |  CAST(SUM(total) AS DOUBLE) AS total
        |FROM o JOIN rel2 ON o.ymd BETWEEN q_start AND q_end
        |GROUP BY q_label""".stripMargin,

    "q39_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS n_open,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_filled,
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS n_pending
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q63_ann_ivf" -> q63Oracle,

    // persisted-IVF serving search: q63's pipeline restricted to the
    // fixed 20-query probe batch — the bucketed on-disk index must
    // reproduce the in-memory operator value-for-value (the BM25
    // serving-index precedent); per-query ranks are unaffected by the
    // outer filter
    "q198_ann_ivf_serving" ->
      s"SELECT * FROM (\n$q63Oracle\n) t WHERE query_id < 20",

    "q64_train_split" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
        |  FROM documents)
        |SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val'
        |  ELSE 'test' END AS split,
        |  COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM s GROUP BY 1""".stripMargin,

    "q61_tfidf" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    UNNEST(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc_id, tf.term AS term, CAST(tf AS BIGINT) AS tf,
        |    ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS tfidf
        |  FROM tf JOIN dfq ON tf.term = dfq.term CROSS JOIN n)
        |SELECT doc_id, term, tf, tfidf, CAST(rn AS BIGINT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY tfidf DESC, term) AS rn FROM s) x
        |WHERE rn <= 3""".stripMargin,

    "q62_rolling_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(
        |        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |        t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 2147483647)),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS rfp
        |FROM documents""".stripMargin,

    "q68_attribution_daily" ->
      """WITH l AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |r0 AS (
        |  SELECT user_id, ts, value AS ref_value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |      ORDER BY value DESC) AS rn
        |  FROM events WHERE event_type = 'pageview'),
        |r AS (SELECT user_id, ts, ref_value FROM r0 WHERE rn = 1),
        |j AS (
        |  SELECT l.user_id, l.ts, l.value, r.ts AS asof_ts
        |  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts)
        |SELECT CAST(ts AS DATE) AS ymd, COUNT(*) AS n_purchases,
        |  COUNT(asof_ts) AS n_attributed,
        |  CAST(SUM(CASE WHEN asof_ts IS NOT NULL
        |    THEN CAST(FLOOR(value * 10000) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    AS attributed_value_e4
        |FROM j GROUP BY 1""".stripMargin,

    "q67_profile" ->
      """SELECT 'c_custkey' AS column, COUNT(*) AS n_rows,
        |  COUNT(c_custkey) AS n_nonnull, COUNT(DISTINCT c_custkey) AS n_distinct
        |FROM customer
        |UNION ALL
        |SELECT 'c_name', COUNT(*), COUNT(c_name), COUNT(DISTINCT c_name) FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', COUNT(*), COUNT(c_nationkey), COUNT(DISTINCT c_nationkey) FROM customer
        |UNION ALL
        |SELECT 'c_mktsegment', COUNT(*), COUNT(c_mktsegment), COUNT(DISTINCT c_mktsegment) FROM customer""".stripMargin,

    "q66_bucketed_range_join" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS ymd,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS total FROM orders),
        |rel AS (SELECT DISTINCT CAST(date_trunc('quarter', ymd) AS DATE) AS q_start FROM o),
        |rel2 AS (
        |  SELECT q_start,
        |    CAST(q_start + INTERVAL 3 MONTH AS DATE) - 1 AS q_end,
        |    concat(CAST(EXTRACT(year FROM q_start) AS VARCHAR), '-Q',
        |           CAST(EXTRACT(quarter FROM q_start) AS VARCHAR)) AS q_label
        |  FROM rel)
        |SELECT q_label, COUNT(*) AS n_orders,
        |  CAST(SUM(total) AS DOUBLE) AS total
        |FROM o JOIN rel2 ON o.ymd BETWEEN q_start AND q_end
        |GROUP BY q_label""".stripMargin,

    "q60_asof_join" ->
      """WITH l AS (
        |  SELECT user_id, event_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |r0 AS (
        |  SELECT user_id, ts, value AS ref_value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |      ORDER BY value DESC) AS rn
        |  FROM events WHERE event_type = 'pageview'),
        |r AS (SELECT user_id, ts, ref_value FROM r0 WHERE rn = 1)
        |SELECT l.user_id, l.event_id, l.ts, l.value,
        |  r.ts AS asof_ts, r.ref_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    "q58_stock_outliers" ->
      """WITH daily AS (
        |  SELECT l_partkey, CAST(l_shipdate AS DATE) AS ymd,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS day_qty
        |  FROM lineitem GROUP BY 1, 2),
        |stats AS (
        |  SELECT l_partkey,
        |    ROUND(q1 - (q3 - q1) * 1.5, 4) AS lo,
        |    ROUND(q3 + (q3 - q1) * 1.5, 4) AS hi
        |  FROM (
        |    SELECT l_partkey,
        |      PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY CAST(day_qty AS DOUBLE)) AS q1,
        |      PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY CAST(day_qty AS DOUBLE)) AS q3
        |    FROM daily GROUP BY l_partkey) t)
        |SELECT d.l_partkey, d.ymd, CAST(d.day_qty AS DOUBLE) AS day_qty, lo, hi
        |FROM daily d JOIN stats s ON d.l_partkey = s.l_partkey
        |WHERE CAST(d.day_qty AS DOUBLE) < lo OR CAST(d.day_qty AS DOUBLE) > hi""".stripMargin,

    "q65_corpus_lang_stats" ->
      """WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS txt
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, md5(txt) AS digest,
        |    CAST(len(string_split(txt, ' ')) AS BIGINT) AS n_tokens,
        |    ROUND(CAST(length(txt) - length(regexp_replace(txt, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
        |      / GREATEST(length(txt), 1), 4) AS punct_ratio
        |  FROM t),
        |p AS (SELECT * FROM x WHERE n_tokens >= 5 AND punct_ratio <= 0.3),
        |k AS (SELECT digest, MIN(doc_id) AS doc_id FROM p GROUP BY digest),
        |kept AS (SELECT p.doc_id, p.n_tokens FROM p
        |         JOIN k ON p.digest = k.digest AND p.doc_id = k.doc_id)
        |SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        |FROM kept JOIN documents USING (doc_id)
        |GROUP BY lang""".stripMargin,

    "q59_corpus_clean" ->
      """WITH t AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS txt
        |  FROM documents),
        |x AS (
        |  SELECT doc_id, md5(txt) AS digest,
        |    CAST(len(string_split(txt, ' ')) AS BIGINT) AS n_tokens,
        |    ROUND(CAST(length(txt) - length(regexp_replace(txt, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
        |      / GREATEST(length(txt), 1), 4) AS punct_ratio
        |  FROM t),
        |p AS (SELECT * FROM x WHERE n_tokens >= 5 AND punct_ratio <= 0.3),
        |k AS (SELECT digest, MIN(doc_id) AS doc_id FROM p GROUP BY digest)
        |SELECT p.doc_id, p.digest, p.n_tokens, p.punct_ratio
        |FROM p JOIN k ON p.digest = k.digest AND p.doc_id = k.doc_id""".stripMargin,

    "q56_search_summary" ->
      """WITH base AS (
        |  SELECT 'q' || CAST(o_custkey % 50 AS VARCHAR) AS query,
        |    o_orderkey % 3 AS s1, o_custkey % 2 AS s2, o_orderkey % 2 AS c1
        |  FROM orders),
        |items AS (
        |  SELECT query, 0 AS seq, 'shop' AS section,
        |    's' || CAST(s1 AS VARCHAR) AS subject FROM base
        |  UNION ALL
        |  SELECT query, 0, 'shop', 's' || CAST(s2 AS VARCHAR) FROM base
        |  UNION ALL
        |  SELECT query, 1, 'cafe', 'c' || CAST(c1 AS VARCHAR) FROM base)
        |SELECT query, CAST(seq AS BIGINT) AS seq, section, subject,
        |  COUNT(*) AS item_count
        |FROM items GROUP BY query, seq, section, subject""".stripMargin,

    "q55_hcenter_sales" ->
      """WITH items AS (
        |  SELECT DISTINCT o_orderkey AS product_id, 77 AS mall_seq,
        |    TRY_CAST(CASE WHEN o_orderkey % 11 = 0 THEN 'x'
        |      ELSE CAST(o_custkey % 100 AS VARCHAR) END AS INTEGER) AS category_id3,
        |    o_orderkey % 7 AS click_count,
        |    o_orderkey % 3 AS payment_count,
        |    CAST(FLOOR(o_totalprice) AS BIGINT) AS payment_amount,
        |    DATE '2024-01-31' AS payment_date
        |  FROM orders)
        |SELECT product_id, MAX(mall_seq) AS mall_seq,
        |  MAX(category_id3) AS category_id3,
        |  CAST(SUM(click_count) AS BIGINT) AS click_count,
        |  CAST(SUM(payment_count) AS BIGINT) AS payment_count,
        |  CAST(SUM(payment_amount) AS BIGINT) AS payment_amount,
        |  payment_date
        |FROM items GROUP BY product_id, payment_date""".stripMargin,

    "q53_relation_ranges" ->
      """WITH g AS (
        |  SELECT c_mktsegment, c_custkey,
        |    c_custkey - ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_custkey) AS grp
        |  FROM customer),
        |r AS (
        |  SELECT c_mktsegment, grp, MIN(c_custkey) AS lo, MAX(c_custkey) AS hi
        |  FROM g GROUP BY 1, 2)
        |SELECT c_mktsegment,
        |  STRING_AGG(printf('%d-%d', lo, hi), ',' ORDER BY lo) AS ranges,
        |  COUNT(*) AS n_ranges
        |FROM r GROUP BY c_mktsegment""".stripMargin,

    "q54_base64" ->
      """SELECT p_partkey,
        |  to_base64(encode(p_name)) AS b64,
        |  decode(from_base64(to_base64(encode(p_name)))) AS roundtrip
        |FROM part""".stripMargin,

    "q52_settlement" ->
      """WITH raw AS (
        |  SELECT 'G' || CAST(o_custkey % 50 AS VARCHAR) AS gk,
        |    o_orderkey,
        |    CAST(o_orderkey % 100 AS VARCHAR) AS ratio,
        |    CAST(CAST(FLOOR(o_totalprice) AS INTEGER) AS VARCHAR) AS final_amt,
        |    CAST(CAST(FLOOR(o_totalprice) AS INTEGER) AS VARCHAR) AS sales,
        |    CASE WHEN o_orderkey % 7 = 0 THEN 'n/a'
        |      ELSE CAST(CAST(-FLOOR(o_totalprice * 0.1) AS INTEGER) AS VARCHAR) END AS refunded,
        |    CAST(CAST(FLOOR(o_totalprice * 0.8) AS INTEGER) AS VARCHAR) AS payable,
        |    CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS start_s,
        |    CAST(CAST(o_orderdate AS DATE) + 13 AS VARCHAR) AS end_s
        |  FROM orders),
        |st AS (
        |  SELECT gk,
        |    CAST(SUM(TRY_CAST(ratio AS INTEGER)) OVER (PARTITION BY gk) AS BIGINT) AS settlement_ratio,
        |    CAST(SUM(TRY_CAST(final_amt AS INTEGER)) OVER (PARTITION BY gk) AS BIGINT) AS settlement_amount,
        |    TRY_CAST(sales AS INTEGER) AS sales_amount,
        |    TRY_CAST(refunded AS INTEGER) AS refund_amount,
        |    CAST(SUM(TRY_CAST(payable AS INTEGER)) OVER (PARTITION BY gk) AS BIGINT) AS payable_amount,
        |    CAST(start_s AS TIMESTAMP) + INTERVAL 9 HOUR AS start_date,
        |    CAST(end_s AS TIMESTAMP) + INTERVAL 9 HOUR AS end_date,
        |    ROW_NUMBER() OVER (PARTITION BY gk ORDER BY o_orderkey) AS rn
        |  FROM raw)
        |SELECT gk AS group_key, 'V1' AS vendor_id, settlement_ratio,
        |  settlement_amount, sales_amount, refund_amount, payable_amount,
        |  start_date, end_date
        |FROM st WHERE rn = 1""".stripMargin,

    "q50_payment_split" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag,
        |         o_totalprice, CAST(o_orderdate AS DATE) AS ymd,
        |         SUM(l_extendedprice) OVER (PARTITION BY l_orderkey) AS wsum
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |r AS (
        |  SELECT l_orderkey, ymd, l_returnflag,
        |    CAST(ROUND(CAST(o_totalprice * l_extendedprice / wsum AS DECIMAL(38,10)), 2) AS DECIMAL(38,2)) AS raw,
        |    CAST(o_totalprice AS DECIMAL(38,2)) AS total,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_extendedprice) AS rn
        |  FROM li),
        |a AS (
        |  SELECT ymd, l_returnflag,
        |    CAST(CASE WHEN rn = 1
        |      THEN total - SUM(raw) OVER (PARTITION BY l_orderkey) + raw
        |      ELSE raw END AS DECIMAL(38,2)) AS alloc
        |  FROM r)
        |SELECT ymd, l_returnflag, CAST(SUM(alloc) AS DOUBLE) AS alloc_total,
        |  COUNT(*) AS n_items
        |FROM a GROUP BY ymd, l_returnflag""".stripMargin,

    "q51_insight_daily" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS ymd,
        |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
        |    CAST(o_orderkey % 3 + 1 AS INTEGER) AS n
        |  FROM orders),
        |e AS (SELECT ymd, cents, n, UNNEST(generate_series(0, n - 1)) AS pos FROM o),
        |a AS (SELECT ymd, CAST(pos AS BIGINT) AS pos,
        |        cents // n + CASE WHEN pos = 0 THEN cents % n ELSE 0 END AS alloc
        |      FROM e)
        |SELECT ymd, pos, CAST(SUM(alloc) AS BIGINT) AS alloc_total,
        |  COUNT(*) AS n_slots
        |FROM a GROUP BY ymd, pos""".stripMargin,

    "q34_ann_bruteforce" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.qid AS query_id, e.vec_id AS corpus_id,
        |    list_dot_product(e.v, q.qv)
        |      / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.qid)
        |SELECT query_id, corpus_id, ROUND(cos, 4) AS cos, CAST(rn AS BIGINT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY cos DESC, corpus_id) AS rn FROM scored) t
        |WHERE rn <= 10""".stripMargin
  ) ++ Map(
    "q100_gads_campaign_master" -> MastersOracles.q100,
    "q101_gads_adgroup_master" -> MastersOracles.q101,
    "q102_gads_ad_master" -> MastersOracles.q102,
    "q103_meta_campaign_master" -> MastersOracles.q103,
    "q104_meta_adset_master" -> MastersOracles.q104,
    "q105_meta_ad_master" -> MastersOracles.q105,
    "q106_cads_campaign_master" -> MastersOracles.q106,
    "q107_cads_adgroup_master" -> MastersOracles.q107,
    "q108_nsa_adgroup_master" -> MastersOracles.q108,
    "q109_brand_master" -> ProductOracles.q109,
    "q110_smartstore_product_master" -> ProductOracles.q110,
    "q111_sabangnet_product_master" -> ProductOracles.q111,
    "q112_sabangnet_option_master" -> ProductOracles.q112,
    "q113_coupang_option_master" -> ProductOracles.q113,
    "q114_profit_monthly" -> ReportOracles.q114,
    "q115_stock_cost_mom" -> ReportOracles.q115,
    "q116_stock_time_ds" -> ReportOracles.q116,
    "q117_nsh_grp_relation" -> ReportOracles.q117,
    "q118_smt_ranged_relation" -> ReportOracles.q118,
    "q119_dable_report" -> ReportOracles.q119,
    "q120_cj_invoice" -> ReportOracles.q120,
    "q121_stock_report_ds" -> ReportOracles.q121,
    "q122_smartstore_order_count" -> OrderCountOracles.q122,
    "q123_sabangnet_order_count" -> OrderCountOracles.q123,
    "q124_coupang_order_count" -> OrderCountOracles.q124,
    "q125_coupang_sales_daily" -> SalesDailyOracle.q125,
    "q126_nsh_stock_sales" -> SalesDailyOracle.q126,
    "q127_smt_opt_relation" -> SmtOptOracle.q127,
    "q128_sabangnet_sales_daily" -> SbnSalesOracle.q128,
    "q239_smartstore_sales_daily" -> SmtSalesOracle.q239,
    "q129_gads_insight_daily" -> InsightOracles.q129,
    "q130_meta_insight_daily" -> InsightOracles.q130,
    "q131_cads_insight_daily" -> InsightOracles.q131,
    "q132_gads_report_daily" -> InsightOracles.q132,
    "q133_meta_report_daily" -> InsightOracles.q133,
    "q134_cads_report_daily" -> InsightOracles.q134,
    "q135_sa_campaign_master" -> SearchadOracles.q135,
    "q136_sa_ad_master" -> SearchadOracles.q136,
    "q137_sa_contract_master" -> SearchadOracles.q137,
    "q138_sa_contract_daily" -> SearchadOracles.q138,
    "q139_smt_option_master" -> ProductOracles.q139,
    "q140_cj_stock_batch" -> StockBatchOracles.q140,
    "q141_cpg_stock_batch" -> StockBatchOracles.q141,
    "q142_core_stock_batch" -> StockBatchOracles.q142,
    "q143_searchad_contract" -> SearchadOracles.q143,

    "q144_kmv_distinct" ->
      """WITH w AS (
        |  SELECT CAST(o_orderkey AS VARCHAR) AS key FROM orders),
        |h AS (
        |  SELECT DISTINCT ('0x' || substr(md5(key), 1, 15))::BIGINT AS h
        |  FROM w WHERE key IS NOT NULL),
        |topk AS (SELECT h FROM h ORDER BY h LIMIT 1024)
        |SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
        |  MAX(h) AS kth_min_hash,
        |  CASE WHEN COUNT(*) < 1024 THEN CAST(COUNT(*) AS DOUBLE)
        |    ELSE CAST(COUNT(*) - 1 AS DOUBLE)
        |      * CAST(1152921504606846976 AS DOUBLE)
        |      / CAST(MAX(h) AS DOUBLE) END AS n_distinct_est
        |FROM topk""".stripMargin,

    "q145_sampled_topk" ->
      """WITH w AS (
        |  SELECT user_id FROM events),
        |s AS (
        |  SELECT user_id AS key,
        |    CAST(COUNT(*) AS BIGINT) AS sampled_count
        |  FROM w
        |  WHERE user_id IS NOT NULL
        |    AND ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      ::BIGINT % 4 = 0
        |  GROUP BY user_id)
        |SELECT key, sampled_count,
        |  CAST(sampled_count * 4 AS BIGINT) AS est_total_count
        |FROM s ORDER BY est_total_count DESC, key LIMIT 20"""
        .stripMargin,

    "q146_sampled_quantiles" ->
      """WITH s AS (
        |  SELECT o_totalprice AS v FROM orders
        |  WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
        |    ::BIGINT % 16 = 0)
        |SELECT CAST(0.5 AS DOUBLE) AS quantile,
        |  ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY v), 4)
        |    AS value FROM s
        |UNION ALL
        |SELECT CAST(0.9 AS DOUBLE),
        |  ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY v), 4)
        |  FROM s
        |UNION ALL
        |SELECT CAST(0.99 AS DOUBLE),
        |  ROUND(PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY v), 4)
        |  FROM s""".stripMargin,

    "q147_decontaminate" ->
      raw"""WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN h < 90 THEN 'train' WHEN h < 95 THEN 'val'
        |      ELSE 'test' END AS split,
        |    toks
        |  FROM (
        |    SELECT doc_id,
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |        ::BIGINT % 100 AS h,
        |      string_split(trim(regexp_replace(lower(text), '\s+', ' ',
        |        'g')), ' ') AS toks
        |    FROM documents) t_),
        |ex AS (
        |  SELECT DISTINCT doc_id, split, shingle FROM (
        |    SELECT doc_id, split,
        |      UNNEST(CASE WHEN len(toks) - 2 <= 0
        |        THEN [array_to_string(toks, ' ')]
        |        ELSE list_transform(range(1, len(toks) - 1),
        |          i -> array_to_string(toks[i:i+2], ' ')) END) AS shingle
        |    FROM base) u_),
        |train AS (SELECT DISTINCT shingle FROM ex WHERE split = 'train')
        |SELECT e.doc_id, e.split,
        |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(COUNT(t.shingle) AS BIGINT) AS n_shared,
        |  COUNT(t.shingle) >= 3 AS is_contaminated
        |FROM ex e
        |LEFT JOIN train t ON e.shingle = t.shingle
        |WHERE e.split != 'train'
        |GROUP BY e.doc_id, e.split""".stripMargin,

    "q148_pg_union_dedup" ->
      """WITH o AS (
        |  SELECT o_custkey AS cust_id,
        |    strftime(o_orderdate, '%Y-%m') AS order_ym
        |  FROM orders)
        |SELECT order_ym, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM (
        |  (SELECT * FROM o WHERE order_ym BETWEEN '1995-01' AND '1995-06')
        |  UNION
        |  (SELECT * FROM o WHERE order_ym BETWEEN '1995-01' AND '1995-12')
        |) t_ GROUP BY order_ym""".stripMargin,

    "q149_pg_median" ->
      """SELECT l_returnflag,
        |  CAST(MEDIAN(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS median_qty,
        |  CAST(MEDIAN(CAST(floor(l_extendedprice) AS BIGINT)) AS DOUBLE)
        |    AS median_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q150_repetition" ->
      raw"""WITH t AS (
        |  SELECT doc_id,
        |    string_split(trim(regexp_replace(lower(text), '\s+', ' ',
        |      'g')), ' ') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id,
        |    UNNEST(list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1])) AS gram
        |  FROM t WHERE len(toks) >= 2),
        |c AS (SELECT doc_id, gram, count(*) AS cnt FROM b GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(cnt) AS BIGINT) AS total_ngrams,
        |  CAST(COUNT(*) AS BIGINT) AS distinct_ngrams,
        |  CAST(MAX(cnt) AS BIGINT) AS top_ngram_count,
        |  CAST(SUM(cnt) - COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
        |    AS dup_ngram_frac
        |FROM c GROUP BY doc_id""".stripMargin,

    "q153_stratified_sample" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars < 250 THEN 'short'
        |         WHEN n_chars < 350 THEN 'mid' ELSE 'long' END AS stratum
        |  FROM documents)
        |SELECT doc_id, stratum FROM d
        |WHERE ('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |    % 1000000
        |  < (CASE stratum WHEN 'short' THEN 0.25 WHEN 'mid' THEN 0.5
        |     ELSE 1.0 END) * 1000000""".stripMargin,

    "q154_corpus_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars < 250 THEN 'short'
        |         WHEN n_chars < 350 THEN 'mid' ELSE 'long' END AS corpus,
        |    CASE WHEN n_chars < 250 THEN 2.5
        |         WHEN n_chars < 350 THEN 1.0 ELSE 0.25 END AS w
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, corpus,
        |    CAST(FLOOR(w) AS BIGINT) +
        |    (CASE WHEN CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |        % 1000000 AS DOUBLE) / 1000000.0 < w - FLOOR(w)
        |      THEN 1 ELSE 0 END) AS copies
        |  FROM d)
        |SELECT doc_id, corpus, CAST(UNNEST(range(1, copies + 1)) AS BIGINT) AS epoch
        |FROM c WHERE copies > 0""".stripMargin,

    // temperature mix: weights derived from measured domain counts
    // (round to 6dp exactly as the operator does), then q154's copy rule
    "q187_temperature_mix" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars < 250 THEN 'short'
        |         WHEN n_chars < 350 THEN 'mid' ELSE 'long' END AS corpus
        |  FROM documents),
        |n AS (SELECT corpus, count(*) AS n FROM d GROUP BY corpus),
        |z AS (SELECT SUM(pow(n, 0.5)) AS z FROM n),
        |w AS (SELECT corpus,
        |    ROUND(1000 * pow(n, 0.5) / z / n, 6) AS w
        |  FROM n CROSS JOIN z),
        |c AS (
        |  SELECT doc_id, d.corpus,
        |    CAST(FLOOR(w) AS BIGINT) +
        |    (CASE WHEN CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |        % 1000000 AS DOUBLE) / 1000000.0 < w - FLOOR(w)
        |      THEN 1 ELSE 0 END) AS copies
        |  FROM d JOIN w ON d.corpus = w.corpus)
        |SELECT doc_id, corpus, CAST(UNNEST(range(1, copies + 1)) AS BIGINT) AS epoch
        |FROM c WHERE copies > 0""".stripMargin,

    "q151_pii_redact" ->
      raw"""WITH aug AS (
        |  SELECT doc_id, text ||
        |    (CASE WHEN doc_id % 3 = 0
        |      THEN ' contact user' || doc_id || '@example.com'
        |      ELSE '' END) ||
        |    (CASE WHEN doc_id % 4 = 0
        |      THEN ' call 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR),
        |        4, '0') || '-1234'
        |      ELSE '' END) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{2,3}-[0-9]{3,4}-[0-9]{4}'))
        |    AS BIGINT) AS n_phones,
        |  md5(regexp_replace(regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
        |      'g'),
        |    '[0-9]{2,3}-[0-9]{3,4}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
        |FROM aug""".stripMargin,

    // concat-and-split packing: DuckDB's global window IS the oracle for
    // the bucketed two-phase prefix sum (value-identical by construction)
    "q156_pack_sequences" ->
      raw"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END
        |      AS tok
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, CAST(tok AS BIGINT) AS n_tokens,
        |    CAST(SUM(tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok
        |      AS BIGINT) AS strt
        |  FROM t WHERE tok > 0),
        |e AS (
        |  SELECT doc_id, n_tokens, strt,
        |    UNNEST(range(strt // 512, (strt + n_tokens - 1) // 512 + 1))
        |      AS pack_id
        |  FROM p)
        |SELECT doc_id, n_tokens, CAST(pack_id AS BIGINT) AS pack_id,
        |  CAST(GREATEST(strt, pack_id * 512) - strt AS BIGINT) AS seg_start,
        |  CAST(LEAST(strt + n_tokens, (pack_id + 1) * 512)
        |    - GREATEST(strt, pack_id * 512) AS BIGINT) AS seg_tokens,
        |  CAST(GREATEST(strt, pack_id * 512) - pack_id * 512 AS BIGINT)
        |    AS pack_off
        |FROM e""".stripMargin,

    // bigram-LM scoring: same add-one model, same DECIMAL(18,4) per-bigram
    // snapshot before the exact decimal sum, same 38,10-snapshot final round
    "q157_ngram_lm_score" ->
      raw"""WITH t AS (SELECT doc_id, $dkToks AS toks FROM documents),
        |i AS (SELECT doc_id, toks,
        |        UNNEST(range(1, len(toks))) AS ix
        |      FROM t WHERE len(toks) >= 2),
        |b AS (SELECT doc_id, toks[ix] AS w1, toks[ix + 1] AS w2 FROM i),
        |g AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS k
        |      FROM b GROUP BY 1, 2, 3),
        |c2 AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c2
        |       FROM g GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |v AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
        |      FROM (SELECT UNNEST(toks) AS tok FROM t) WHERE tok <> ''),
        |s AS (
        |  SELECT g.doc_id, CAST(SUM(g.k) AS BIGINT) AS n_bigrams,
        |    SUM(CAST(g.k AS DECIMAL(9,0)) *
        |        CAST(ln(CAST(c1.c1 + v.v AS DOUBLE))
        |          - ln(CAST(c2.c2 + 1 AS DOUBLE)) AS DECIMAL(18,4)))
        |      AS sum_nll
        |  FROM g JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
        |  GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(s.n_bigrams, 0) AS n_bigrams,
        |  CAST(ROUND(CAST(CAST(s.sum_nll AS DOUBLE) / s.n_bigrams
        |    AS DECIMAL(38,10)), 4) AS DOUBLE) AS avg_nll
        |FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id""".stripMargin,

    "q158_semantic_dedup" -> q158Oracle,

    // deterministic shuffle-shard: same content hash, same per-shard
    // dense position (ROW_NUMBER is 1-based on both sides; -1 here, the
    // cast-long -1 in Sampling.shuffleShard)
    "q159_shuffle_shard" ->
      s"""WITH h AS (SELECT doc_id,
        |    ${dkHash("'shuffle|' || CAST(doc_id AS VARCHAR)")} AS h
        |  FROM documents)
        |SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard,
        |  ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
        |    AS pos
        |FROM h""".stripMargin,

    // int8 quantization: floor(x*127/amax + 0.5) over identical IEEE
    // doubles — codes and scale replay bit-for-bit
    "q160_quantize_int8" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |a AS (SELECT vec_id, v,
        |    list_aggregate(list_transform(v, x -> abs(x)), 'max') AS amax
        |  FROM e)
        |SELECT vec_id, amax / 127.0 AS scale,
        |  array_to_string(CASE WHEN amax = 0
        |    THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |    ELSE list_transform(v,
        |      x -> CAST(floor(x * 127.0 / amax + 0.5) AS BIGINT))
        |  END, ',') AS qdigest
        |FROM a""".stripMargin,

    // change-feed replay: latest change per key; ts desc with the
    // remaining columns desc (name-sorted) as tie-break — the exact
    // ordering changeFeedReplay/changeFeedSink use
    "q161_change_feed" ->
      """SELECT event_id, ts, user_id, event_type, value, props
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC, event_type DESC, props DESC,
        |      value DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    // chunk dedup: non-overlapping 10-token spans, cross-engine md5 hash;
    // a span is dup when its hash occurs at 2+ (doc, position) sites
    "q162_chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, $dkToks AS toks FROM documents),
        |ch AS (SELECT doc_id,
        |    unnest(list_transform(range(len(toks) // 10),
        |      i -> ${dkHash("'chunk|' || array_to_string(toks[(i*10+1):(i*10+10)], ' ')")}))
        |      AS h
        |  FROM t),
        |g AS (SELECT h, count(*) AS c FROM ch GROUP BY h),
        |per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |    CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS dup_chunks
        |  FROM ch JOIN g USING (h) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_chunks, 0) AS n_chunks,
        |  coalesce(dup_chunks, 0) AS dup_chunks,
        |  CASE WHEN coalesce(n_chunks, 0) = 0 THEN 0.0
        |    ELSE coalesce(dup_chunks, 0) / n_chunks END AS dup_frac,
        |  (CASE WHEN coalesce(n_chunks, 0) = 0 THEN 0.0
        |    ELSE coalesce(dup_chunks, 0) / n_chunks END) <= 0.3 AS keep
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,

    // Gopher-rules gate: word count, mean word length, alpha fraction,
    // stop-word floor — stats + conjunctive keep
    "q163_gopher_filter" ->
      s"""WITH t AS (SELECT doc_id, $dkToks AS toks FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(toks) AS BIGINT) AS n_words,
        |    round(CAST(list_sum(list_transform(toks, w -> length(w)))
        |        AS DOUBLE) / greatest(len(toks), 1), 4) AS mean_word_len,
        |    round(CAST(len(list_filter(toks,
        |        w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
        |      / greatest(len(toks), 1), 4) AS alpha_frac,
        |    CAST(len(list_filter(toks, w -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it',
        |       'for','on','with','as','at','by','from','that','this'], w)))
        |      AS BIGINT) AS n_stopwords
        |  FROM t)
        |SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stopwords,
        |  (n_words BETWEEN 30 AND 100000)
        |    AND (mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND alpha_frac >= 0.8 AND n_stopwords >= 2 AS keep
        |FROM m""".stripMargin,

    "q164_ann_recall" -> q164Oracle,

    // BPE iteration-0 pair counts: chars + '</w>' marker per vocab word,
    // pair frequency weighted by word frequency; top 20 by (freq, pair)
    "q165_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest($dkToks) AS word FROM documents),
        |wf AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w
        |  WHERE len(word) > 0 GROUP BY word),
        |sy AS (SELECT freq, list_append(string_split(word, ''), '</w>')
        |    AS syms FROM wf),
        |pr AS (SELECT freq, unnest(list_transform(range(len(syms) - 1),
        |    i -> {'l': syms[i+1], 'r': syms[i+2]})) AS p FROM sy)
        |SELECT p.l AS left_sym, p.r AS right_sym,
        |  CAST(sum(freq) AS BIGINT) AS freq
        |FROM pr GROUP BY p.l, p.r
        |ORDER BY freq DESC, left_sym, right_sym LIMIT 20""".stripMargin,

    // tumbling 10-minute windows; DuckDB time_bucket's sub-month origin
    // (2000-01-03) is minute-aligned, so boundaries match Spark's
    // epoch-aligned window() exactly
    "q166_windowed_stats" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
        |  time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes'
        |    AS win_end,
        |  event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    // the salted two-phase aggregation must reproduce the plain GROUP BY
    "q167_salted_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    // the composed curation funnel: each stage's statistics over the
    // previous stage's survivors — quality (q163 rules) → 10-token span
    // dedup (q162 shape) → exact-digest min-id survivor (q26 shape)
    "q169_curation_funnel" ->
      s"""WITH toks AS (SELECT doc_id, $dkToks AS t FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_words,
        |    round(CAST(list_sum(list_transform(t, w -> length(w)))
        |        AS DOUBLE) / greatest(len(t), 1), 4) AS mean_word_len,
        |    round(CAST(len(list_filter(t,
        |        w -> regexp_matches(w, '[a-z]'))) AS DOUBLE)
        |      / greatest(len(t), 1), 4) AS alpha_frac,
        |    CAST(len(list_filter(t, w -> list_contains(
        |      ['the','a','an','and','or','of','to','in','is','it',
        |       'for','on','with','as','at','by','from','that','this'], w)))
        |      AS BIGINT) AS n_stop
        |  FROM toks),
        |k1 AS (SELECT d.doc_id, d.text, d.lang, d.source
        |  FROM documents d JOIN m USING (doc_id)
        |  WHERE (m.n_words BETWEEN 30 AND 100000)
        |    AND (m.mean_word_len BETWEEN 3.0 AND 10.0)
        |    AND m.alpha_frac >= 0.8 AND m.n_stop >= 2),
        |t1 AS (SELECT doc_id, $dkToks AS t FROM k1),
        |ch AS (SELECT doc_id,
        |    unnest(list_transform(range(len(t) // 10),
        |      i -> ${dkHash("'chunk|' || array_to_string(t[(i*10+1):(i*10+10)], ' ')")}))
        |      AS h
        |  FROM t1),
        |g AS (SELECT h, count(*) AS c FROM ch GROUP BY h),
        |per AS (SELECT doc_id, count(*) AS n_chunks,
        |    sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS dup_chunks
        |  FROM ch JOIN g USING (h) GROUP BY doc_id),
        |k2 AS (SELECT k1.* FROM k1 LEFT JOIN per USING (doc_id)
        |  WHERE coalesce(per.n_chunks, 0) = 0
        |    OR per.dup_chunks / per.n_chunks <= 0.3),
        |dig AS (SELECT doc_id, lang, source,
        |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
        |      AS digest
        |  FROM k2),
        |win AS (SELECT digest, min(doc_id) AS keep_id,
        |    CAST(count(*) AS BIGINT) AS n_dups
        |  FROM dig GROUP BY digest)
        |SELECT win.keep_id AS doc_id, win.n_dups, dig.lang, dig.source
        |FROM win JOIN dig ON dig.doc_id = win.keep_id""".stripMargin,

    // blocked fuzzy match: same (first char, length band) blocking and
    // unit-cost levenshtein in both engines
    "q170_fuzzy_match" ->
      """WITH p AS (SELECT p_partkey AS id, lower(trim(p_name)) AS n
        |  FROM part),
        |b AS (SELECT id, n, substr(n, 1, 1) AS c0, len(n) // 4 AS lb
        |  FROM p),
        |l AS (SELECT * FROM b WHERE id < 100)
        |SELECT l.id AS left_id, l.n AS left_name,
        |  b.id AS right_id, b.n AS right_name,
        |  CAST(levenshtein(l.n, b.n) AS BIGINT) AS dist
        |FROM l JOIN b ON l.c0 = b.c0 AND l.lb = b.lb AND l.id <> b.id
        |WHERE levenshtein(l.n, b.n) <= 2""".stripMargin,

    // keep-longest survivor per simhash cluster (q29's signature CTE)
    "q168_best_survivor" ->
      s"""WITH sims AS ($q29Oracle),
        |sc AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS score
        |  FROM documents),
        |j AS (SELECT sims.id AS doc_id, sims.simhash AS cluster, sc.score
        |  FROM sims JOIN sc ON sims.id = sc.doc_id),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY cluster
        |      ORDER BY score DESC, doc_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY cluster) AS n_members
        |  FROM j)
        |SELECT cluster, doc_id AS keep_id, score,
        |  CAST(n_members AS BIGINT) AS n_members
        |FROM r WHERE rn = 1""".stripMargin,

    // BM25: same Lucene idf/saturation arithmetic, per-term score
    // snapshotted to DECIMAL(18,6) before the per-(query,doc) sum;
    // avgdl is one double division of two exact integers in both engines
    "q171_bm25" ->
      s"""WITH q(query_id, term) AS (VALUES
        |  (CAST(0 AS BIGINT), 'table'), (0, 'scan'),
        |  (1, 'window'), (1, 'agg'), (1, 'sort'),
        |  (2, 'customer'), (2, 'value')),
        |t AS (SELECT doc_id, $dkToks AS t FROM documents),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(t)) AS BIGINT) AS sum_dl FROM t),
        |d AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        |    unnest(t) AS term FROM t),
        |p AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
        |    any_value(dl) AS dl
        |  FROM d WHERE term IN (SELECT DISTINCT term FROM q)
        |  GROUP BY term, doc_id),
        |f AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM p GROUP BY term),
        |sc AS (SELECT q.query_id, p.doc_id,
        |    CAST(round(
        |      ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE)
        |          + 0.5) / (CAST(f.df AS DOUBLE) + 0.5)) *
        |      (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0) /
        |        (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |          ((1.0 - CAST(0.75 AS DOUBLE)) +
        |           CAST(0.75 AS DOUBLE) * CAST(p.dl AS DOUBLE) /
        |             (CAST(stats.sum_dl AS DOUBLE)
        |               / CAST(stats.n_docs AS DOUBLE))))),
        |      6) AS DECIMAL(18,6)) AS s
        |  FROM p JOIN f USING (term) JOIN q USING (term) CROSS JOIN stats),
        |g AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_matched,
        |    CAST(sum(s) AS DOUBLE) AS score
        |  FROM sc GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS rank FROM g)
        |SELECT query_id, doc_id, n_matched, score,
        |  CAST(rank AS BIGINT) AS rank
        |FROM r WHERE rank <= 10""".stripMargin,

    // span removal: same canonical-first-occurrence policy — the keeper
    // is the lexicographic MIN over the (doc_id, pos) STRUCT, exactly the
    // Scala side's struct-min (a packed doc_id*2^20+pos key would order
    // differently for negative ids or >2^20 spans per doc)
    "q172_remove_spans" ->
      s"""WITH t AS (SELECT doc_id, $dkToks AS t FROM documents),
        |sp AS (SELECT doc_id,
        |    unnest(list_transform(range((len(t) + 9) // 10),
        |      i -> {'pos': i,
        |            's': array_to_string(t[(i*10+1):(i*10+10)], ' ')}))
        |      AS u
        |  FROM t),
        |s2 AS (SELECT doc_id, u.pos AS pos, u.s AS s,
        |    ${dkHash("'span|' || u.s")} AS h,
        |    {'d': doc_id, 'p': u.pos} AS okey
        |  FROM sp),
        |g AS (SELECT h, min(okey) AS keeper, count(*) AS c
        |  FROM s2 GROUP BY h),
        |k AS (SELECT s2.* FROM s2 JOIN g USING (h)
        |  WHERE c = 1 OR okey = keeper),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(s, ' ' ORDER BY pos) AS clean_text
        |  FROM k GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
        |  FROM s2 GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(tot.n_spans, 0) AS n_spans,
        |  coalesce(tot.n_spans, 0) - coalesce(agg.n_kept, 0) AS n_removed,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM documents d
        |LEFT JOIN tot ON tot.doc_id = d.doc_id
        |LEFT JOIN agg ON agg.doc_id = d.doc_id""".stripMargin,

    // sliding-window ExactSubstr: one window per token position; keeper
    // is the lexicographic-min (doc_id, pos) struct; covered = distinct
    // union of marked windows' position ranges; rebuild drops covered
    // token positions
    "q215_exact_substr" ->
      s"""WITH t AS (SELECT doc_id, $dkToks AS t FROM documents),
        |w AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |    ${dkHash("'xw|' || array_to_string(t[(i+1):(i+10)], ' ')")} AS h,
        |    {'d': doc_id, 'p': CAST(i AS INT)} AS okey
        |  FROM t, UNNEST(range(len(t) - 9)) u(i)),
        |g AS (SELECT h, min(okey) AS keeper FROM w
        |  GROUP BY h HAVING count(*) > 1),
        |mk AS (SELECT w.doc_id, w.pos FROM w JOIN g USING (h)
        |  WHERE w.okey <> g.keeper),
        |cov AS (SELECT DISTINCT doc_id, pos + j AS ci
        |  FROM mk, UNNEST(range(10)) v(j)),
        |tok AS (SELECT doc_id, i - 1 AS ti, t[CAST(i AS INT)] AS tk
        |  FROM t, UNNEST(range(1, len(t) + 1)) u(i)),
        |kept AS (SELECT tok.doc_id, ti, tk FROM tok LEFT JOIN cov
        |    ON cov.doc_id = tok.doc_id AND cov.ci = tok.ti
        |  WHERE cov.ci IS NULL),
        |agg AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY ti) AS clean_text
        |  FROM kept GROUP BY doc_id),
        |nrem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        |  FROM cov GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(nrem.n_removed, 0) AS BIGINT) AS n_removed,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM t
        |LEFT JOIN nrem ON nrem.doc_id = t.doc_id
        |LEFT JOIN agg ON agg.doc_id = t.doc_id""".stripMargin,

    // split assignment: same md5 ticket + cumulative thresholds
    "q221_split_assign" ->
      s"""SELECT doc_id, source,
        |  CASE WHEN ${dkHash("'split|' || source")} % 1000000 < 100000
        |         THEN 'val'
        |       WHEN ${dkHash("'split|' || source")} % 1000000 < 200000
        |         THEN 'test'
        |       ELSE 'train' END AS split
        |FROM documents""".stripMargin,

    // domain quota: the two-phase Spark rank is EXACT top-n, so the
    // oracle is the plain window
    "q222_domain_quota" ->
      """SELECT doc_id, source, CAST(r AS BIGINT) AS rank_in_domain
        |FROM (SELECT doc_id, source, ROW_NUMBER() OVER (
        |    PARTITION BY source
        |    ORDER BY length(text) DESC, doc_id) AS r
        |  FROM documents)
        |WHERE r <= 20""".stripMargin,

    // JL projection: the same plane literals, list_dot_product's
    // ascending fold = DotProduct's loop, DECIMAL(18,6) snapshot
    "q223_random_projection" -> q223Oracle,

    // merge-on-read delete parity: the survivors of doc_id % 10 <> 3,
    // re-aggregated from the raw fixture
    "q224_delta_mor_delete" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 10 <> 3
        |GROUP BY source""".stripMargin,

    // RESTORE undid the DV DELETE: the unfiltered fixture aggregate
    "q240_delta_restore" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source""".stripMargin,

    // the v1 wall clock resolves to the DELETE state: q224's survivors
    "q241_timestamp_travel" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE doc_id % 10 <> 3
        |GROUP BY source""".stripMargin,

    "q225_label_propagation" -> q225Oracle,
    "q237_minhash_estimate" -> q237Oracle,

    // q237 over the q180-style hash-ticket sample: integer-derived
    // modulus, deterministic md5-hash ticket, then the estimator body
    // against the sampled doc universe
    "q242_minhash_estimate_sampled" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
        |bb AS (SELECT CASE WHEN (n + 511) // 512 <= 1 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(len(bin((n + 511) // 512 - 1)) AS BIGINT) END AS bits
        |  FROM nn),
        |mm AS (SELECT CAST(1 AS BIGINT) << bits AS m FROM bb),
        |sd AS (SELECT d.* FROM documents d CROSS JOIN mm
        |  WHERE ${dkHash("CAST(doc_id AS VARCHAR)")} % m = 0),
        |res AS (
        |${q237OracleFrom("sd")}
        |)
        |SELECT * FROM res""".stripMargin,

    // q242's gate-scale twin: identical nesting over the sampled CTE,
    // targetSample 128 so the ticket modulus is > 1 at sf0.01
    "q244_minhash_estimate_sampled_m4" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
        |bb AS (SELECT CASE WHEN (n + 127) // 128 <= 1 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(len(bin((n + 127) // 128 - 1)) AS BIGINT) END AS bits
        |  FROM nn),
        |mm AS (SELECT CAST(1 AS BIGINT) << bits AS m FROM bb),
        |sd AS (SELECT d.* FROM documents d CROSS JOIN mm
        |  WHERE ${dkHash("CAST(doc_id AS VARCHAR)")} % m = 0),
        |res AS (
        |${q237OracleFrom("sd")}
        |)
        |SELECT * FROM res""".stripMargin,

    // frontier funnel, each stage in closed form: the canonicalizer's
    // output is stated directly (lowered scheme/host, www/port stripped,
    // tracking params dropped, params sorted), dedup is min-doc per URL,
    // blocklist/robots verdicts are the fixture's CASE logic, quota is
    // the same (url, doc_id) total-order window
    "q238_crawl_frontier" ->
      """WITH urls AS (
        |  SELECT doc_id,
        |    'https://h' || (doc_id % 5) || '.example.com/Sec' ||
        |      (doc_id % 7) || '/item' || (doc_id % 13) || '?a=1&b=2' AS url
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id,
        |    'https://h' || (doc_id % 5) || '.example.com' ||
        |      CASE WHEN doc_id % 3 = 0 THEN '/private/ok/x'
        |           ELSE '/private/x' END AS url
        |  FROM documents),
        |dedup AS (
        |  SELECT url, CAST(min(doc_id) AS BIGINT) AS doc_id
        |  FROM urls GROUP BY url),
        |hosted AS (
        |  SELECT doc_id, url,
        |    regexp_extract(url, '^https://([^/]+)', 1) AS host
        |  FROM dedup),
        |admitted AS (
        |  SELECT doc_id, url, host FROM hosted
        |  WHERE host <> 'h3.example.com'
        |    AND (host = 'h4.example.com'
        |         OR url NOT LIKE '%/private/%'
        |         OR url LIKE '%/private/ok%')),
        |quota AS (
        |  SELECT doc_id, url, host,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY host
        |      ORDER BY url, doc_id) AS BIGINT) AS rank_in_domain
        |  FROM admitted)
        |SELECT doc_id, url, host, rank_in_domain FROM quota
        |WHERE rank_in_domain <= 20""".stripMargin,
    "q226_binary_rerank" -> q226Oracle,
    "q229_prototype_prune" -> q229Oracle,
    "q230_prf_expansion" -> q230Oracle,

    // bigram-PMI collocations: exact counts, one pinned double
    // expression DECIMAL-snapshotted, deterministic top-100
    "q234_collocations" ->
      s"""WITH t AS (SELECT doc_id, $dkToks AS t FROM documents),
         |bg AS (SELECT t[CAST(i AS INT)] AS w1,
         |    t[CAST(i + 1 AS INT)] AS w2
         |  FROM t, UNNEST(range(1, len(t))) u(i)),
         |big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_ab
         |  FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w
         |  FROM (SELECT unnest(t) AS w FROM t) GROUP BY 1),
         |stats AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n_tok,
         |    CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS n_big FROM t),
         |sc AS (SELECT w1, w2, n_ab,
         |    CAST(CAST(ln(
         |      (CAST(n_ab AS DOUBLE) / CAST(n_big AS DOUBLE)) /
         |      ((CAST(a.n_w AS DOUBLE) / CAST(n_tok AS DOUBLE)) *
         |       (CAST(b.n_w AS DOUBLE) / CAST(n_tok AS DOUBLE)))
         |    ) AS DECIMAL(18,6)) AS DOUBLE) AS pmi
         |  FROM big JOIN uni a ON a.w = big.w1
         |  JOIN uni b ON b.w = big.w2 CROSS JOIN stats)
         |SELECT w1, w2, n_ab, pmi FROM sc
         |ORDER BY pmi DESC, w1, w2 LIMIT 100""".stripMargin,

    // asymmetric containment: the oracle states the COMPLETE answer as
    // an all-pairs join (the prefix filter must lose nothing)
    "q235_ngram_containment" ->
      s"""WITH d2 AS (
         |  SELECT doc_id * 2 AS doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id * 2 + 1,
         |    text || ' unique containment tail marker ' || doc_id
         |  FROM documents WHERE doc_id % 13 = 0),
         |t AS (SELECT doc_id, $dkToks AS toks FROM d2),
         |s AS (SELECT doc_id,
         |    list_distinct(list_transform(${dkShingles(3)},
         |      s -> ${dkHash("s")})) AS sh
         |  FROM t),
         |f AS (SELECT * FROM s WHERE len(sh) > 0)
         |SELECT id_a, id_b, ROUND(c, 4) AS containment FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         |      / len(a.sh) AS c
         |  FROM f a JOIN f b ON a.doc_id <> b.doc_id)
         |WHERE c >= 0.9""".stripMargin,

    // grouped HLL: top-8-bits register, binary-string-length rank,
    // exact HUGEINT harmonic fold, one double division, linear-counting
    // branch when raw <= 640 with empty registers
    "q236_hll_distinct" ->
      s"""WITH k AS (SELECT event_type,
         |    ${dkHash("CAST(event_id AS VARCHAR)")} AS h FROM events),
         |r AS (SELECT event_type, h >> 52 AS j,
         |    h & ${(1L << 52) - 1} AS w FROM k),
         |rk AS (SELECT event_type, j,
         |    max(CASE WHEN w = 0 THEN 53
         |      ELSE 53 - length(printf('%b', w)) END) AS m
         |  FROM r GROUP BY 1, 2),
         |ag AS (SELECT event_type,
         |    sum(1::BIGINT << (60 - m)) AS zsum,
         |    CAST(count(*) AS BIGINT) AS np
         |  FROM rk GROUP BY 1),
         |est AS (SELECT event_type, CAST(256 - np AS BIGINT) AS n_empty,
         |    ((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 /
         |     (CAST(zsum + CAST(256 - np AS HUGEINT)
         |         * 1152921504606846976 AS DOUBLE)
         |      / CAST(1152921504606846976 AS DOUBLE))) AS raw
         |  FROM ag),
         |fin AS (SELECT event_type, n_empty,
         |    CASE WHEN raw <= 640.0 AND n_empty > 0
         |      THEN 256.0 * ln(256.0 / CAST(n_empty AS DOUBLE))
         |      ELSE raw END AS e
         |  FROM est),
         |ex AS (SELECT event_type,
         |    CAST(count(DISTINCT event_id) AS BIGINT) AS n_exact
         |  FROM events GROUP BY 1)
         |SELECT f.event_type, ex.n_exact, f.n_empty,
         |  CAST(CAST(f.e AS DECIMAL(18,4)) AS DOUBLE) AS n_hll
         |FROM fin f JOIN ex ON ex.event_type = f.event_type""".stripMargin,

    // the skew-treated join must reproduce the plain join (q167's
    // contract at join grain)
    "q231_skew_join" ->
      """WITH fact AS (SELECT event_id,
        |    CASE WHEN event_id % 2 = 0 THEN 0 ELSE user_id END AS uid,
        |    value
        |  FROM events),
        |d2 AS (SELECT uid, uid % 7 AS grp FROM
        |  (SELECT DISTINCT uid FROM fact)),
        |j AS (SELECT f.uid, d2.grp, f.value FROM fact f JOIN d2 USING (uid))
        |SELECT grp, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
        |FROM j GROUP BY grp""".stripMargin,

    // version diff v0 -> v1 on the q224 table: exactly the DV-deleted
    // rows, each op='D'
    "q232_delta_version_diff" ->
      """SELECT 'D' AS op, doc_id, source, n_chars
        |FROM documents WHERE doc_id % 10 = 3""".stripMargin,

    // CDC latest-wins replay: D drops (incl. the seq-2 D overriding the
    // seq-1 U on k%42=7), U rewrites, I appends, untouched rows pass
    "q233_cdc_apply" ->
      """WITH base AS (SELECT c_custkey AS k, c_name AS name,
        |    CAST(c_nationkey AS BIGINT) AS nat FROM customer),
        |src AS (SELECT * FROM base WHERE k % 7 = 0),
        |ch AS (
        |  SELECT k, name, nat, 'D' AS op, CAST(1 AS BIGINT) AS seq
        |    FROM src WHERE k % 21 = 0
        |  UNION ALL
        |  SELECT k, name || ' v2', nat + 100, 'U', 1 FROM src
        |    WHERE k % 21 = 7
        |  UNION ALL
        |  SELECT k + 10000000, 'new ' || name, nat, 'I', 1 FROM src
        |    WHERE k % 21 = 14
        |  UNION ALL
        |  SELECT k, name, nat, 'D', 2 FROM src WHERE k % 42 = 7),
        |latest AS (SELECT k, name, nat, op FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k
        |      ORDER BY seq DESC) AS rn FROM ch) WHERE rn = 1)
        |SELECT b.k, b.name, b.nat FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.k = b.k)
        |UNION ALL
        |SELECT k, name, nat FROM latest WHERE op <> 'D'""".stripMargin,

    // exact phrase search: alignment-vote algebra over the positional
    // token index; injected phrase suffixes by doc_id
    "q227_phrase_search" ->
      s"""WITH d2 AS (SELECT doc_id, text ||
         |    (CASE WHEN doc_id % 7 = 0 THEN ' alpha beta gamma' ELSE '' END) ||
         |    (CASE WHEN doc_id % 11 = 0 THEN ' beta gamma delta' ELSE '' END)
         |    AS text
         |  FROM documents),
         |q(query_id, phrase) AS (VALUES
         |  (CAST(0 AS BIGINT), 'alpha beta gamma'), (1, 'beta gamma'),
         |  (2, 'gamma delta'), (3, 'alpha gamma')),
         |t AS (SELECT doc_id, $dkToks AS t FROM d2),
         |d AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
         |    t[CAST(i AS INT)] AS term
         |  FROM t, UNNEST(range(1, len(t) + 1)) u(i)),
         |pq AS (SELECT query_id, string_split(phrase, ' ') AS pt FROM q),
         |p AS (SELECT query_id, CAST(i - 1 AS BIGINT) AS ppos,
         |    pt[CAST(i AS INT)] AS term, len(pt) AS plen
         |  FROM pq, UNNEST(range(1, len(pt) + 1)) u(i)),
         |o AS (SELECT query_id, doc_id, s FROM (
         |    SELECT p.query_id, d.doc_id, d.pos - p.ppos AS s,
         |      count(*) AS c, min(p.plen) AS plen
         |    FROM d JOIN p USING (term) WHERE d.pos - p.ppos >= 0
         |    GROUP BY 1, 2, 3) WHERE c = plen)
         |SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_hits,
         |  CAST(min(s) AS BIGINT) AS first_pos
         |FROM o GROUP BY 1, 2""".stripMargin,

    // link-density main-content extraction: same block split + tag
    // strip + anchor-length integer keep rule
    "q228_main_content" ->
      raw"""WITH h AS (SELECT doc_id,
         |    '<div><a href="/h">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div><p>'
         |    || text ||
         |    '</p><div>site map <a href="/t">Terms</a> <a href="/p">Privacy</a></div>'
         |    AS html
         |  FROM documents),
         |b AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS bpos,
         |    blk[CAST(i AS INT)] AS block
         |  FROM (SELECT doc_id, string_split_regex(html,
         |      '(?i)</?(?:p|div|li|ul|ol|h[1-6]|br|table|tr|td|section|article|header|footer|nav)[^>]*>')
         |      AS blk FROM h),
         |    UNNEST(range(1, len(blk) + 1)) u(i)),
         |s AS (SELECT doc_id, bpos,
         |    trim(regexp_replace(block, '<[^>]*>', '', 'g')) AS txt,
         |    -- array_to_string([], '') is NULL in DuckDB: anchor-free
         |    -- blocks must score alen = 0, not NULL
         |    CAST(coalesce(length(array_to_string(regexp_extract_all(block,
         |      '(?i)<a\b[^>]*>([^<]*)</a>', 1), '')), 0) AS BIGINT) AS alen
         |  FROM b),
         |f AS (SELECT doc_id, bpos, txt, alen,
         |    CAST(length(txt) AS BIGINT) AS tlen
         |  FROM s WHERE length(txt) > 0)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
         |  CAST(sum(CASE WHEN alen * 2 <= tlen * 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_kept,
         |  coalesce(string_agg(CASE WHEN alen * 2 <= tlen * 1 THEN txt END,
         |    chr(10) ORDER BY bpos), '') AS main_text
         |FROM f GROUP BY doc_id""".stripMargin,

    // HITS: generated unrolled fixed-point iterations (see q220Oracle)
    "q220_hits" -> q220Oracle,

    // hybrid retrieval: q171's BM25 CTEs (ranked leg), q34's cosine CTEs
    // (dense leg), q178's RRF tail — the three verified shapes composed
    "q219_hybrid_retrieval" ->
      s"""WITH q(query_id, term) AS (VALUES
        |  (CAST(0 AS BIGINT), 'table'), (0, 'scan'),
        |  (1, 'window'), (1, 'agg'), (1, 'sort'),
        |  (2, 'customer'), (2, 'value')),
        |t AS (SELECT doc_id, $dkToks AS t FROM documents),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(t)) AS BIGINT) AS sum_dl FROM t),
        |d AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
        |    unnest(t) AS term FROM t),
        |p AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
        |    any_value(dl) AS dl
        |  FROM d WHERE term IN (SELECT DISTINCT term FROM q)
        |  GROUP BY term, doc_id),
        |f AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        |  FROM p GROUP BY term),
        |sc AS (SELECT q.query_id, p.doc_id,
        |    CAST(round(
        |      ln(1.0 + (CAST(stats.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE)
        |          + 0.5) / (CAST(f.df AS DOUBLE) + 0.5)) *
        |      (CAST(p.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0) /
        |        (CAST(p.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
        |          ((1.0 - CAST(0.75 AS DOUBLE)) +
        |           CAST(0.75 AS DOUBLE) * CAST(p.dl AS DOUBLE) /
        |             (CAST(stats.sum_dl AS DOUBLE)
        |               / CAST(stats.n_docs AS DOUBLE))))),
        |      6) AS DECIMAL(18,6)) AS s
        |  FROM p JOIN f USING (term) JOIN q USING (term) CROSS JOIN stats),
        |g AS (SELECT query_id, doc_id, CAST(sum(s) AS DOUBLE) AS score
        |  FROM sc GROUP BY 1, 2),
        |sparse AS (SELECT query_id, doc_id AS id, rn AS rank
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY score DESC, doc_id) AS rn FROM g) WHERE rn <= 10),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |qv AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 3),
        |dense_s AS (SELECT qv.qid AS query_id, e.vec_id AS id,
        |    list_dot_product(e.v, qv.qv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(qv.qv, qv.qv))) AS cos
        |  FROM e CROSS JOIN qv WHERE e.vec_id <> qv.qid),
        |dense AS (SELECT query_id, id, rn AS rank FROM (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, id) AS rn FROM dense_s) WHERE rn <= 10),
        |u AS (SELECT query_id, id,
        |    CAST(round(1.0 / (60.0 + CAST(rank AS DOUBLE)), 10)
        |      AS DECIMAL(18,10)) AS c
        |  FROM sparse
        |  UNION ALL
        |  SELECT query_id, id,
        |    CAST(round(1.0 / (60.0 + CAST(rank AS DOUBLE)), 10)
        |      AS DECIMAL(18,10)) AS c
        |  FROM dense),
        |gg AS (SELECT query_id, id, CAST(count(*) AS BIGINT) AS n_lists,
        |    CAST(sum(c) AS DOUBLE) AS rrf_score
        |  FROM u GROUP BY 1, 2)
        |SELECT query_id, id, n_lists, rrf_score, CAST(rn AS BIGINT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf_score DESC, id) AS rn FROM gg)
        |WHERE rn <= 10""".stripMargin,

    // script profile: same strip-and-diff counts via RE2's script
    // classes; ratios divide exact longs in IEEE double on both engines
    "q216_script_profile" ->
      raw"""WITH t AS (SELECT doc_id,
        |    text || ${suffixCaseSql(scriptSuffixCps)} AS s
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  length(s) - length(regexp_replace(s, '[\p{Latin}]', '', 'g'))
        |    AS c_latin,
        |  length(s) - length(regexp_replace(s, '[\p{Cyrillic}]', '', 'g'))
        |    AS c_cyrillic,
        |  length(s) - length(regexp_replace(s, '[\p{Han}]', '', 'g'))
        |    AS c_han,
        |  length(s) - length(regexp_replace(s,
        |    '[\p{Hiragana}\p{Katakana}]', '', 'g')) AS c_kana,
        |  length(s) - length(regexp_replace(s, '[\p{Arabic}]', '', 'g'))
        |    AS c_arabic,
        |  length(s) - length(regexp_replace(s, '[\p{Hangul}]', '', 'g'))
        |    AS c_hangul,
        |  length(s) - length(regexp_replace(s, '[\p{L}]', '', 'g')) AS nl
        |FROM t),
        |m AS (SELECT *,
        |    greatest(c_latin, c_cyrillic, c_han, c_kana, c_arabic,
        |      c_hangul) AS mx,
        |    CAST(greatest(nl, 1) AS DOUBLE) AS den FROM c)
        |SELECT doc_id, CAST(nl AS BIGINT) AS n_letters,
        |  CAST(c_latin AS DOUBLE) / den AS latin_ratio,
        |  CAST(c_cyrillic AS DOUBLE) / den AS cyrillic_ratio,
        |  CAST(c_han AS DOUBLE) / den AS han_ratio,
        |  CAST(c_kana AS DOUBLE) / den AS kana_ratio,
        |  CAST(c_arabic AS DOUBLE) / den AS arabic_ratio,
        |  CAST(c_hangul AS DOUBLE) / den AS hangul_ratio,
        |  CASE WHEN mx = 0 THEN 'none'
        |       WHEN c_latin = mx THEN 'latin'
        |       WHEN c_cyrillic = mx THEN 'cyrillic'
        |       WHEN c_han = mx THEN 'han'
        |       WHEN c_kana = mx THEN 'kana'
        |       WHEN c_arabic = mx THEN 'arabic'
        |       WHEN c_hangul = mx THEN 'hangul'
        |       ELSE 'other' END AS dominant,
        |  CAST(mx AS DOUBLE) / den >= 0.5 AS keep
        |FROM m""".stripMargin,

    // NFC: DuckDB nfc_normalize replays the Catalyst expression;
    // lengths count codepoints in both engines
    "q217_nfc_normalize" ->
      s"""WITH t AS (SELECT doc_id,
        |    text || ${suffixCaseSql(nfcSuffixCps)} AS s
        |  FROM documents)
        |SELECT doc_id, CAST(length(s) AS BIGINT) AS n_before,
        |  CAST(length(nfc_normalize(s)) AS BIGINT) AS n_after,
        |  nfc_normalize(s) AS norm_text
        |FROM t""".stripMargin,

    // mojibake repair: the SAME closed-form rule as MojibakeRepair —
    // validity regex over the latin-1 char classes, then per-char
    // arithmetic decode over the split char list (continuations emit
    // nothing; 2-/3-byte leads consume their following chars)
    "q218_fix_mojibake" ->
      raw"""WITH t AS (SELECT doc_id,
        |    text || ${suffixCaseSql(mojibakeSuffixCps)} AS s
        |  FROM documents),
        |f AS (SELECT doc_id, s,
        |  CASE WHEN regexp_matches(s,
        |      '^(?:[\x00-\x7f]|[\x{00C2}-\x{00DF}][\x{0080}-\x{00BF}]|' ||
        |      '[\x{00E0}-\x{00EC}\x{00EE}\x{00EF}][\x{0080}-\x{00BF}]{2})*$$')
        |    AND regexp_matches(s, '[\x{00C2}-\x{00EF}]')
        |  THEN (SELECT array_to_string(list_transform(
        |      range(1, length(s) + 1), i ->
        |      CASE WHEN unicode(cs[CAST(i AS INT)])
        |             BETWEEN 128 AND 191 THEN ''
        |           WHEN unicode(cs[CAST(i AS INT)])
        |             BETWEEN 194 AND 223
        |             THEN chr((unicode(cs[CAST(i AS INT)]) % 32) * 64 +
        |               (unicode(cs[CAST(i AS INT) + 1]) % 64))
        |           WHEN unicode(cs[CAST(i AS INT)]) >= 224
        |             THEN chr((unicode(cs[CAST(i AS INT)]) % 16) * 4096 +
        |               (unicode(cs[CAST(i AS INT) + 1]) % 64) * 64 +
        |               (unicode(cs[CAST(i AS INT) + 2]) % 64))
        |           ELSE cs[CAST(i AS INT)] END), '')
        |    FROM (SELECT string_split(s, '') AS cs))
        |  ELSE s END AS fixed FROM t)
        |SELECT doc_id, fixed <> s AS changed,
        |  CAST(length(s) AS BIGINT) AS n_before,
        |  CAST(length(fixed) AS BIGINT) AS n_after,
        |  fixed AS fixed_text
        |FROM f""".stripMargin,

    // DSIR: per-bucket log-ratio snapshots to DECIMAL(18,8) before the
    // per-doc decimal sum; final average through DECIMAL(38,10) (the
    // q157 determinism rule)
    "q173_dsir_weights" ->
      s"""WITH t AS (SELECT doc_id,
        |    source IN ('src1','src2','src3') AS is_target, $dkToks AS t
        |  FROM documents),
        |bg AS (SELECT doc_id, is_target,
        |    unnest(list_transform(range(len(t) - 1),
        |      i -> t[i+1] || ' ' || t[i+2])) AS g
        |  FROM t WHERE len(t) >= 2),
        |dg AS (SELECT doc_id, is_target,
        |    ${dkHash("'dsir|' || g")} % 4096 AS bucket,
        |    CAST(count(*) AS BIGINT) AS k
        |  FROM bg GROUP BY 1, 2, 3),
        |bc AS (SELECT bucket,
        |    CAST(sum(CASE WHEN is_target THEN k ELSE 0 END) AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN NOT is_target THEN k ELSE 0 END) AS BIGINT)
        |      AS cr
        |  FROM dg GROUP BY bucket),
        |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
        |    CAST(sum(cr) AS BIGINT) AS tr FROM bc),
        |lr AS (SELECT bucket,
        |    CAST(round(ln(CAST(ct + 1 AS DOUBLE)) -
        |      ln(CAST(tt + 4096 AS DOUBLE)) -
        |      ln(CAST(cr + 1 AS DOUBLE)) +
        |      ln(CAST(tr + 4096 AS DOUBLE)), 8) AS DECIMAL(18,8)) AS lr
        |  FROM bc CROSS JOIN tot),
        |sc AS (SELECT doc_id, is_target,
        |    CAST(sum(k) AS BIGINT) AS n_bigrams,
        |    sum(CAST(k AS DECIMAL(9,0)) * lr) AS sum_lr
        |  FROM dg JOIN lr USING (bucket) GROUP BY 1, 2)
        |SELECT d.doc_id,
        |  d.source IN ('src1','src2','src3') AS is_target,
        |  coalesce(sc.n_bigrams, 0) AS n_bigrams,
        |  CAST(round(CAST(CAST(sc.sum_lr AS DOUBLE) / sc.n_bigrams
        |    AS DECIMAL(38,10)), 4) AS DOUBLE) AS dsir_logweight
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin,

    // vocabulary coverage: rank/cumsum window runs over the k-row top-k
    // in both engines
    "q174_vocab_coverage" ->
      s"""WITH toks AS (SELECT unnest($dkToks) AS token FROM documents),
        |nz AS (SELECT token FROM toks WHERE token <> ''),
        |f AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
        |  FROM nz GROUP BY token),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM nz),
        |top AS (SELECT token, freq FROM f
        |  ORDER BY freq DESC, token LIMIT 100),
        |r AS (SELECT token, freq,
        |    ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rank,
        |    SUM(freq) OVER (ORDER BY freq DESC, token
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM top)
        |SELECT token, freq, CAST(rank AS BIGINT) AS rank,
        |  round(CAST(cum AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
        |    AS cum_frac
        |FROM r CROSS JOIN tot""".stripMargin,

    // hashed linear classifier: identical pseudo-trained integer
    // milli-weights regenerated from the bucket id; the dot product is
    // exact integer math, only the final sigmoid touches doubles
    "q175_hashed_classifier" ->
      s"""WITH w AS (SELECT CAST(i AS BIGINT) AS bucket,
        |    ${dkHash("'w|' || CAST(i AS VARCHAR)")} % 2001 - 1000
        |      AS w_milli
        |  FROM (SELECT unnest(range(1024)) AS i)),
        |toks AS (SELECT doc_id,
        |    unnest($dkToks) AS token FROM documents),
        |feat AS (SELECT doc_id,
        |    ${dkHash("'f|' || token")} % 1024 AS bucket,
        |    CAST(count(*) AS BIGINT) AS tf
        |  FROM toks WHERE token <> '' GROUP BY 1, 2),
        |sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
        |    CAST(sum(tf * w_milli) AS BIGINT) AS dot_milli
        |  FROM feat JOIN w USING (bucket) GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(sc.n_tokens, 0) AS n_tokens,
        |  coalesce(sc.dot_milli, 0) AS dot_milli,
        |  round(1.0 / (1.0 + exp(-(CAST(coalesce(sc.dot_milli, 0) AS DOUBLE)
        |    / (CAST(greatest(coalesce(sc.n_tokens, 0), 1) AS DOUBLE)
        |      * 1000.0)))), 4) AS score
        |FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin,

    // dedup evaluation: exact prefix-filter ground truth at 0.7 (q27's
    // CTEs) vs the full q28 LSH pipeline; pair-keyed hit counts
    "q179_dedup_recall" ->
      s"""WITH ex AS (
        |  WITH t AS (SELECT doc_id, $dkToks AS toks FROM documents),
        |  s AS (SELECT doc_id,
        |      list_distinct(list_transform(${dkShingles(3)},
        |        s -> ${dkHash("s")})) AS sh
        |    FROM t)
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.7),
        |ap AS (
        |$q28Oracle
        |),
        |c AS (SELECT (SELECT count(*) FROM ex) AS ne,
        |      (SELECT count(*) FROM ap) AS na,
        |      (SELECT count(*) FROM ex JOIN ap USING (id_a, id_b)) AS nh)
        |SELECT CAST(ne AS BIGINT) AS n_exact, CAST(na AS BIGINT) AS n_approx,
        |  CAST(nh AS BIGINT) AS n_hit,
        |  round(CAST(nh AS DOUBLE) / CAST(greatest(na, 1) AS DOUBLE), 4)
        |    AS pair_precision,
        |  round(CAST(nh AS DOUBLE) / CAST(greatest(ne, 1) AS DOUBLE), 4)
        |    AS pair_recall
        |FROM c""".stripMargin,

    // sampled recall: integer-derived ticket modulus (len(bin(q-1)) ==
    // ceil(log2(q)) — no float-boundary drift vs the Scala
    // numberOfLeadingZeros form), hash-ticket sample, then the q179
    // body over the sample
    "q180_dedup_recall_sampled" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
        |bb AS (SELECT CASE WHEN (n + 127) // 128 <= 1 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(len(bin((n + 127) // 128 - 1)) AS BIGINT) END AS bits
        |  FROM nn),
        |mm AS (SELECT bits, CAST(1 AS BIGINT) << bits AS m FROM bb),
        |sd AS (SELECT d.* FROM documents d CROSS JOIN mm
        |  WHERE ${dkHash("CAST(doc_id AS VARCHAR)")} % m = 0),
        |ex AS (
        |  WITH t AS (SELECT doc_id, $dkToks AS toks FROM sd),
        |  s AS (SELECT doc_id,
        |      list_distinct(list_transform(${dkShingles(3)},
        |        s -> ${dkHash("s")})) AS sh
        |    FROM t)
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.7),
        |ap AS (
        |${q28OracleFrom("sd")}
        |),
        |c AS (SELECT (SELECT count(*) FROM ex) AS ne,
        |      (SELECT count(*) FROM ap) AS na,
        |      (SELECT count(*) FROM ex JOIN ap USING (id_a, id_b)) AS nh,
        |      (SELECT count(*) FROM sd) AS ns)
        |SELECT CAST(ns AS BIGINT) AS n_sample,
        |  (SELECT bits FROM bb) AS sample_bits,
        |  CAST(ne AS BIGINT) AS n_exact, CAST(na AS BIGINT) AS n_approx,
        |  CAST(nh AS BIGINT) AS n_hit,
        |  CASE WHEN na > 0 THEN
        |    round(CAST(nh AS DOUBLE) / CAST(na AS DOUBLE), 4) END
        |    AS pair_precision,
        |  CASE WHEN ne > 0 THEN
        |    round(CAST(nh AS DOUBLE) / CAST(ne AS DOUBLE), 4) END
        |    AS pair_recall
        |FROM c""".stripMargin,

    // q179's bench form: corpus-scale LSH vs ticket-sampled exact
    // ground truth; approx pairs restricted to the sampled universe by
    // the same deterministic ticket on both endpoints
    "q243_dedup_recall_sampled_exact" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
        |bb AS (SELECT CASE WHEN (n + 127) // 128 <= 1 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(len(bin((n + 127) // 128 - 1)) AS BIGINT) END AS bits
        |  FROM nn),
        |mm AS (SELECT bits, CAST(1 AS BIGINT) << bits AS m FROM bb),
        |sd AS (SELECT d.* FROM documents d CROSS JOIN mm
        |  WHERE ${dkHash("CAST(doc_id AS VARCHAR)")} % m = 0),
        |ex AS (
        |  WITH t AS (SELECT doc_id, $dkToks AS toks FROM sd),
        |  s AS (SELECT doc_id,
        |      list_distinct(list_transform(${dkShingles(3)},
        |        s -> ${dkHash("s")})) AS sh
        |    FROM t)
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM s a JOIN s b ON a.doc_id < b.doc_id
        |  WHERE ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))), 4) >= 0.7),
        |ap0 AS (
        |$q28Oracle
        |),
        |ap AS (SELECT id_a, id_b FROM ap0 CROSS JOIN mm
        |  WHERE ${dkHash("CAST(id_a AS VARCHAR)")} % m = 0
        |    AND ${dkHash("CAST(id_b AS VARCHAR)")} % m = 0),
        |c AS (SELECT (SELECT count(*) FROM ex) AS ne,
        |      (SELECT count(*) FROM ap) AS na,
        |      (SELECT count(*) FROM ex JOIN ap USING (id_a, id_b)) AS nh,
        |      (SELECT count(*) FROM sd) AS ns)
        |SELECT CAST(ns AS BIGINT) AS n_sample,
        |  (SELECT bits FROM bb) AS sample_bits,
        |  CAST(ne AS BIGINT) AS n_exact, CAST(na AS BIGINT) AS n_approx,
        |  CAST(nh AS BIGINT) AS n_hit,
        |  CASE WHEN na > 0 THEN
        |    round(CAST(nh AS DOUBLE) / CAST(na AS DOUBLE), 4) END
        |    AS pair_precision,
        |  CASE WHEN ne > 0 THEN
        |    round(CAST(nh AS DOUBLE) / CAST(ne AS DOUBLE), 4) END
        |    AS pair_recall
        |FROM c""".stripMargin,

    // bloom-prefiltered incremental exact dedup — the bloom is a router,
    // not a decider, so the oracle is the pure exact semantics: corpus
    // fingerprint match → smallest corpus id, else within-batch match →
    // smallest batch id, else admitted
    "q182_bloom_incremental_exact" ->
      s"""WITH cf AS (SELECT doc_id,
        |    ${dkHash(raw"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))")}
        |      AS fp
        |  FROM documents WHERE doc_id % 2 = 0),
        |bf AS (SELECT doc_id,
        |    ${dkHash(raw"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))")}
        |      AS fp
        |  FROM documents WHERE doc_id % 2 = 1),
        |cd AS (SELECT fp, min(doc_id) AS corpus_dup FROM cf GROUP BY fp),
        |bm AS (SELECT fp, min(doc_id) AS batch_min FROM bf GROUP BY fp)
        |SELECT b.doc_id, (dup_of IS NULL) AS is_admitted, dup_of
        |FROM (SELECT b.doc_id,
        |    coalesce(cd.corpus_dup,
        |      CASE WHEN b.doc_id <> bm.batch_min THEN bm.batch_min END)
        |      AS dup_of
        |  FROM bf b
        |  LEFT JOIN cd ON b.fp = cd.fp
        |  JOIN bm ON b.fp = bm.fp) b""".stripMargin,

    // delta pruned scan: the oracle is the logical query — per-order
    // sums restricted to the key range (file skipping is a physical
    // detail the values must be invariant to)
    "q183_delta_pruned_scan" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_lines
        |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000
        |GROUP BY 1""".stripMargin,

    // boilerplate removal: the same doc-frequency rule replayed line by
    // line — a normalized line is boilerplate in a domain when it hits
    // > 50% of the domain's docs and >= 3 docs
    "q184_boilerplate_removal" ->
      raw"""WITH docs AS (SELECT doc_id, source AS domain,
        |    text || chr(10) || 'visit ' || source || ' dot com' ||
        |    chr(10) ||
        |    CASE WHEN doc_id % 4 = 0 THEN 'subscribe to our newsletter'
        |         ELSE 'unique tail ' || CAST(doc_id AS VARCHAR) END
        |      AS text
        |  FROM documents),
        |ls AS (SELECT doc_id, domain,
        |    string_split(text, chr(10)) AS arr FROM docs),
        |lines AS (SELECT doc_id, domain,
        |    unnest(list_transform(range(len(arr)),
        |      i -> {'pos': i, 'line': arr[i+1]})) AS u
        |  FROM ls),
        |l2 AS (SELECT doc_id, domain, u.pos AS pos, u.line AS line,
        |    trim(regexp_replace(lower(u.line), '\s+', ' ', 'g')) AS lnorm
        |  FROM lines),
        |dd AS (SELECT domain, count(DISTINCT doc_id) AS n_docs
        |  FROM docs GROUP BY domain),
        |bo AS (SELECT domain, lnorm
        |  FROM l2 JOIN dd USING (domain)
        |  WHERE len(lnorm) > 0
        |  GROUP BY domain, lnorm, n_docs
        |  HAVING count(DISTINCT doc_id) >= 3
        |    AND count(DISTINCT doc_id) * 1.0 / n_docs > 0.5),
        |kept AS (SELECT l2.*
        |  FROM l2 LEFT JOIN bo
        |    ON l2.domain = bo.domain AND l2.lnorm = bo.lnorm
        |  WHERE bo.lnorm IS NULL),
        |agg AS (SELECT doc_id,
        |    string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id),
        |tot AS (SELECT doc_id,
        |    len(string_split(text, chr(10))) AS n_lines FROM docs)
        |SELECT t.doc_id, coalesce(a.clean_text, '') AS text,
        |  CAST(t.n_lines AS BIGINT) AS n_lines,
        |  CAST(t.n_lines - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
        |FROM tot t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // RRF hybrid fusion: both rankings' CTEs (q34's cosine, q176's int8),
    // per-list 1/(c+rank) contributions snapshotted to DECIMAL(18,10)
    "q178_rrf_fusion" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        |dense_s AS (SELECT q.qid AS query_id, e.vec_id AS id,
        |    list_dot_product(e.v, q.qv) /
        |      (sqrt(list_dot_product(e.v, e.v)) *
        |       sqrt(list_dot_product(q.qv, q.qv))) AS cos
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.qid),
        |dense AS (SELECT query_id, id, rn AS rank FROM (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, id) AS rn FROM dense_s) WHERE rn <= 10),
        |a AS (SELECT vec_id, v,
        |    list_aggregate(list_transform(v, x -> abs(x)), 'max') AS amax
        |  FROM e),
        |qz AS (SELECT vec_id, amax / 127.0 AS scale,
        |    CASE WHEN amax = 0
        |      THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(v,
        |        x -> CAST(floor(x * 127.0 / amax + 0.5) AS BIGINT))
        |    END AS q8
        |  FROM a),
        |qs AS (SELECT vec_id AS query_id, scale AS qscale, q8 AS qq
        |  FROM qz WHERE vec_id < 5),
        |int8_s AS (SELECT qs.query_id, c.vec_id AS id,
        |    CAST(CAST(list_dot_product(c.q8, qs.qq) AS BIGINT) AS DOUBLE)
        |      * c.scale * qs.qscale AS score
        |  FROM qz c CROSS JOIN qs WHERE c.vec_id <> qs.query_id),
        |int8 AS (SELECT query_id, id, rn AS rank FROM (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, id) AS rn FROM int8_s) WHERE rn <= 10),
        |u AS (SELECT query_id, id,
        |    CAST(round(1.0 / (60.0 + CAST(rank AS DOUBLE)), 10)
        |      AS DECIMAL(18,10)) AS c
        |  FROM dense
        |  UNION ALL
        |  SELECT query_id, id,
        |    CAST(round(1.0 / (60.0 + CAST(rank AS DOUBLE)), 10)
        |      AS DECIMAL(18,10)) AS c
        |  FROM int8),
        |g AS (SELECT query_id, id, CAST(count(*) AS BIGINT) AS n_lists,
        |    CAST(sum(c) AS DOUBLE) AS rrf_score
        |  FROM u GROUP BY 1, 2)
        |SELECT query_id, id, n_lists, rrf_score, CAST(rn AS BIGINT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY rrf_score DESC, id) AS rn FROM g)
        |WHERE rn <= 10""".stripMargin,

    // half-open timestamp ranges on the raw column (q47's semantics, the
    // pushdown-friendly spelling)
    "q177_datetime_predicate" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS ymd FROM orders
        |WHERE (o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
        |       AND o_orderdate < TIMESTAMP '1996-03-04 00:00:00')
        |   OR (o_orderdate >= TIMESTAMP '1996-07-14 00:00:00'
        |       AND o_orderdate < TIMESTAMP '1996-07-15 00:00:00')
        |   OR (o_orderdate >= TIMESTAMP '1996-09-02 00:00:00'
        |       AND o_orderdate < TIMESTAMP '1996-09-03 00:00:00')""".stripMargin,

    // int8 retrieval: q160's quantization on both sides, integer dot
    // (values < 2^53, so DuckDB's double path is still exact), the two
    // dequantization scales multiplied back in with the same op order
    "q176_int8_topk" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |a AS (SELECT vec_id, v,
        |    list_aggregate(list_transform(v, x -> abs(x)), 'max') AS amax
        |  FROM e),
        |qz AS (SELECT vec_id, amax / 127.0 AS scale,
        |    CASE WHEN amax = 0
        |      THEN list_transform(v, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(v,
        |        x -> CAST(floor(x * 127.0 / amax + 0.5) AS BIGINT))
        |    END AS q
        |  FROM a),
        |qs AS (SELECT vec_id AS query_id, scale AS qscale, q AS qq
        |  FROM qz WHERE vec_id < 5),
        |scored AS (SELECT qs.query_id, c.vec_id AS corpus_id,
        |    CAST(list_dot_product(c.q, qs.qq) AS BIGINT) AS dot_int,
        |    CAST(CAST(list_dot_product(c.q, qs.qq) AS BIGINT) AS DOUBLE)
        |      * c.scale * qs.qscale AS score
        |  FROM qz c CROSS JOIN qs WHERE c.vec_id <> qs.query_id)
        |SELECT query_id, corpus_id, dot_int, round(score, 4) AS score,
        |  CAST(rn AS BIGINT) AS rank
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        |        ORDER BY score DESC, corpus_id) AS rn FROM scored) t
        |WHERE rn <= 10""".stripMargin
  )
}
