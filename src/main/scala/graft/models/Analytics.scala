package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Concrete analytics DAG over the test star schema, mirroring the
  * reference's dbt graph structure (SURVEY §7 step 7): per-channel staging
  * facts → UNION ALL → re-aggregated core daily fact → parameterized
  * report models (TVF-style) → month-over-month mart.
  *
  * Graph (reference analogs in parens):
  *   src orders/lineitem
  *     → sales_orders / sales_lineitems   (sabangnet/smartstore__sales_daily)
  *     → core_sales_daily                 (core__sales_daily, incremental by ymd)
  *     → profit_base(start,end)           (analytics__profit_base TVF)
  *     → profit_mom(start,end)            (analytics__profit_mom TVF-on-TVF)
  */
object Analytics {

  /** Build the registry; `sfDir` is the source location (a real deployment
    * would bind sources to catalog tables instead).
    */
  def registry(sfDir: String): ModelRegistry = {
    val r = new ModelRegistry

    r.register(Model("sales_orders", Nil, View, ctx => {
      Tables.orders(ctx.session, sfDir).select(
        to_date(col("o_orderdate")).as("ymd"),
        lit("orders").as("channel"),
        col("o_totalprice").cast("decimal(18,4)").as("amount"))
    }))

    r.register(Model("sales_lineitems", Nil, View, ctx => {
      Tables.lineitem(ctx.session, sfDir).select(
        to_date(col("l_shipdate")).as("ymd"),
        lit("lineitem").as("channel"),
        // exact at 4dp (2dp price × 2dp factor); a further rescale to 2dp
        // would hit .xx50 ties, where engines disagree on rounding
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)").as("amount"))
    }))

    r.register(Model("sales_events", Nil, View, ctx => {
      Tables.events(ctx.session, sfDir)
        .filter(col("event_type") === "purchase")
        .select(
          col("ts").cast("date").as("ymd"),
          lit("events").as("channel"),
          col("value").cast("decimal(18,4)").as("amount"))
    }))

    // multi-source UNION ALL → re-aggregate (the reference's 6-source core
    // fact, core__sales_daily: per-channel staging models unioned then
    // re-aggregated by day)
    r.register(Model("core_sales_daily",
      Seq("sales_orders", "sales_lineitems", "sales_events"),
      Incremental("ymd"), ctx => {
        ctx.ref("sales_orders")
          .unionByName(ctx.ref("sales_lineitems"))
          .unionByName(ctx.ref("sales_events"))
          .groupBy(col("ymd"), col("channel"))
          .agg(sum(col("amount")).cast("decimal(38,4)").as("revenue"),
            count(lit(1)).as("n_rows"))
      }))

    // TVF-style: bounded by (ds_start_date, ds_end_date) params
    r.register(Model("profit_base", Seq("core_sales_daily"), View, ctx => {
      val start = ctx.params("ds_start_date")
      val end = ctx.params("ds_end_date")
      ctx.ref("core_sales_daily")
        .filter(col("ymd").between(lit(start).cast("date"), lit(end).cast("date")))
        .groupBy(date_trunc("month", col("ymd")).cast("date").as("month"),
          col("channel"))
        .agg(sum(col("revenue")).cast("decimal(38,4)").as("revenue"))
    }))

    // TVF calling TVF: month-over-month deltas over profit_base
    r.register(Model("profit_mom", Seq("profit_base"), View, ctx => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("channel")).orderBy(col("month"))
      ctx.ref("profit_base")
        .withColumn("prev_revenue",
          lag(col("revenue"), 1).over(w).cast("decimal(38,4)"))
        .withColumn("mom_pct",
          round(((col("revenue").cast("double") - col("prev_revenue").cast("double"))
            / col("prev_revenue").cast("double") * 100).cast("decimal(38,10)"), 4)
            .cast("decimal(38,4)"))
    }))

    // stock chain (reference: core__sold_qty_30d_daily → stock models):
    // daily sold qty per part → 30-day rolling window → day-over-day diff
    r.register(Model("sold_qty_daily", Nil, Incremental("ymd"), ctx => {
      Tables.lineitem(ctx.session, sfDir)
        .groupBy(col("l_partkey"), to_date(col("l_shipdate")).as("ymd"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("day_qty"))
    }))

    r.register(Model("sold_qty_30d", Seq("sold_qty_daily"), View, ctx => {
      graft.operators.Joins.rollingSumByDays(
          ctx.ref("sold_qty_daily"), Seq(col("l_partkey")), col("ymd"),
          col("day_qty"), 30, "qty_30d")
        .withColumn("qty_30d", col("qty_30d").cast("decimal(38,2)"))
    }))

    r.register(Model("stock_report", Seq("sold_qty_30d"), View, ctx => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_partkey")).orderBy(col("ymd"))
      ctx.ref("sold_qty_30d")
        .withColumn("next_qty", lead(col("day_qty"), 1).over(w).cast("decimal(38,2)"))
        .withColumn("dod", (col("next_qty") - col("day_qty")).cast("decimal(38,2)"))
    }))

    // J6/W5 inside the DAG (reference: naver_shp__stock_sales.sql:123-155 —
    // per-key IQR bounds from grouped quartiles, broadcast-joined back to
    // flag outlier days)
    r.register(Model("stock_outliers", Seq("sold_qty_daily"), View, ctx => {
      val d = ctx.ref("sold_qty_daily")
      val stats = d.groupBy(col("l_partkey")).agg(
          expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY CAST(day_qty AS DOUBLE))").as("q1"),
          expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY CAST(day_qty AS DOUBLE))").as("q3"))
        .select(col("l_partkey"),
          round(col("q1") - (col("q3") - col("q1")) * 1.5, 4).as("lo"),
          round(col("q3") + (col("q3") - col("q1")) * 1.5, 4).as("hi"))
      // no broadcast hint: stats is one row per PART (unbounded dim) — a
      // plain equi-join lets AQE broadcast only when it actually fits
      // (contrast q43, whose per-brand stats are bounded)
      d.join(stats, Seq("l_partkey"))
        .filter(col("day_qty").cast("double") < col("lo") ||
          col("day_qty").cast("double") > col("hi"))
        .select(col("l_partkey"), col("ymd"),
          col("day_qty").cast("double").as("day_qty"), col("lo"), col("hi"))
    }))

    // A8 inside the DAG (reference: dbt_bigquery/models/intermediate/sales/
    // smartstore__sales_daily.sql:171-217,335-371 — the order-level paid
    // amount split across items proportionally to item price, remainder
    // repaired exactly, then re-aggregated to a daily split fact).
    r.register(Model("order_payment_alloc", Nil, Incremental("ymd"), ctx => {
      val li = Tables.lineitem(ctx.session, sfDir)
        .join(Tables.orders(ctx.session, sfDir).select(
            col("o_orderkey"), col("o_totalprice"),
            to_date(col("o_orderdate")).as("ymd")),
          col("l_orderkey") === col("o_orderkey"))
      graft.operators.Allocation.weightedAllocate(li,
          Seq(col("l_orderkey")), Seq(col("l_linenumber"), col("l_extendedprice")),
          col("o_totalprice"), col("l_extendedprice"), "alloc", 2)
        .select(col("ymd"), col("l_returnflag"), col("alloc"))
    }))

    r.register(Model("payment_split_daily", Seq("order_payment_alloc"), View,
      ctx => {
        ctx.ref("order_payment_alloc")
          .groupBy(col("ymd"), col("l_returnflag"))
          .agg(sum(col("alloc")).cast("decimal(38,2)").as("alloc_total"),
            count(lit(1)).as("n_items"))
      }))

    // A9 inside the DAG (reference: dbt_bigquery/models/intermediate/ads/
    // searchad__insight_daily.sql:197-230 — a cent-exact amount divided
    // equally over exploded slots, remainder to slot 0, re-aggregated daily).
    r.register(Model("insight_slots", Nil, Incremental("ymd"), ctx => {
      val o = Tables.orders(ctx.session, sfDir).select(
        col("o_orderkey"), to_date(col("o_orderdate")).as("ymd"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int").as("n"))
      o.select(col("ymd"), col("cents"), col("n"),
          posexplode(sequence(lit(0), col("n") - 1)).as(Seq("pos", "__v")))
        .select(col("ymd"), col("pos").cast("long").as("pos"),
          graft.operators.Allocation.divModAllocate(col("cents"), col("n"),
            col("pos")).as("alloc"))
    }))

    r.register(Model("insight_daily", Seq("insight_slots"), View, ctx => {
      ctx.ref("insight_slots")
        .groupBy(col("ymd"), col("pos"))
        .agg(sum(col("alloc")).as("alloc_total"), count(lit(1)).as("n_slots"))
    }))

    // training-data corpus chain: the text-pipeline operators as DAG
    // citizens — cleaning model feeding a per-language stats mart
    r.register(Model("corpus_clean", Nil, View, ctx => {
      graft.operators.TextAnalysis.cleanCorpus(
        Tables.documents(ctx.session, sfDir),
        col("doc_id"), col("text"))
    }))

    r.register(Model("corpus_lang_stats", Seq("corpus_clean"), View, ctx => {
      ctx.ref("corpus_clean").select("doc_id", "n_tokens")
        .join(Tables.documents(ctx.session, sfDir).select("doc_id", "lang"),
          "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"))
    }))

    // attribution chain: purchases matched to the latest prior-or-equal
    // pageview per user (as-of join inside the DAG), rolled up to a daily
    // attribution mart — the reference's channel-attribution shape with
    // the as-of operator replacing its validity-window join
    r.register(Model("attributed_purchases", Nil, View, ctx => {
      val e = Tables.events(ctx.session, sfDir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      val pageviews = e.filter(col("event_type") === "pageview")
        .select(col("user_id"), col("ts"), col("value").as("ref_value"))
      graft.operators.Joins.asOfJoin(purchases, pageviews,
        Seq("user_id"), "ts", "ts", Seq("ref_value"))
    }))

    r.register(Model("attribution_daily", Seq("attributed_purchases"), View,
      ctx => {
        // double sums are order-dependent; fixed-point through FLOOR (no
        // tie-rounding rule to disagree on) keeps the mart exact
        ctx.ref("attributed_purchases")
          .groupBy(col("ts").cast("date").as("ymd"))
          .agg(count(lit(1)).as("n_purchases"),
            count(col("asof_ts")).as("n_attributed"),
            sum(when(col("asof_ts").isNotNull,
                floor(col("value") * 10000).cast("long")).otherwise(lit(0L)))
              .as("attributed_value_e4"))
      }))

    r
  }
}
