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

    // ---- order_count_mom (reference: dbt_bigquery/models/marts/sales/
    // analytics__order_count_mom.sql): the distinct-countable-grain
    // pattern — a parameterized order-grain TVF invoked twice (the request
    // range + a monthly lookback), unioned WITHOUT aggregation so order_id
    // stays distinct-countable downstream, with per-month validity windows
    // and a formatted date-range label joined from the day-of-week dim.
    r.register(Model("order_count", Nil, View, ctx => {
      orderCountSlice(ctx.session, sfDir,
        lit(ctx.params("ds_start_date")).cast("date"),
        lit(ctx.params("ds_end_date")).cast("date"))
    }))

    r.register(Model("order_count_mom", Seq("order_count"), View, ctx => {
      val w = org.apache.spark.sql.expressions.Window
      val endD = java.time.LocalDate.parse(ctx.params("ds_end_date"))
      val startD = java.time.LocalDate.parse(ctx.params("ds_start_date"))
      val months = ctx.params("ds_interval_month").toInt
      val endMonth = endD.withDayOfMonth(1)
      def d(x: java.time.LocalDate) = lit(java.sql.Date.valueOf(x))
      // min/max order_date per month computed PER SLICE (the reference's
      // per-CTE windows), before the union. The lookback slice partitions
      // by real months; the REQUEST slice's order_ym is a constant — the
      // reference's `PARTITION BY DATE_TRUNC(DS_END_DATE, MONTH)` window
      // would funnel the whole slice through one partition, so its min/max
      // come from a single-row aggregate broadcast instead (same values,
      // distributed computation).
      val slice0 = orderCountSlice(ctx.session, sfDir, d(startD), d(endD))
        .withColumn("order_ym", d(endMonth))
      val sliceBounds = slice0.agg(
        min(col("order_date")).as("order_start_date"),
        max(col("order_date")).as("order_end_date"))
      val slice = slice0.crossJoin(broadcast(sliceBounds))
      val wYm = w.partitionBy(col("order_ym"))
      val lookback = orderCountSlice(ctx.session, sfDir,
          d(endMonth.minusMonths(months)), d(endMonth.minusDays(1)))
        .withColumn("order_ym", date_trunc("month", col("order_date")).cast("date"))
        .withColumn("order_start_date", min(col("order_date")).over(wYm))
        .withColumn("order_end_date", max(col("order_date")).over(wYm))
      val dow = graft.functions.F.inlineDim(ctx.session, Seq("dw", "name"),
        Seq("(일)", "(월)", "(화)", "(수)", "(목)", "(금)", "(토)")
          .zipWithIndex.map { case (n, i) => Seq(i + 1, n) })
      val fact = slice.unionByName(lookback)
      fact
        .join(broadcast(dow.select(col("dw").as("__sd"), col("name").as("__sn"))),
          dayofweek(col("order_start_date")) === col("__sd"), "left")
        .join(broadcast(dow.select(col("dw").as("__ed"), col("name").as("__en"))),
          dayofweek(col("order_end_date")) === col("__ed"), "left")
        .select(col("order_id"), col("order_status"), col("order_quantity"),
          col("order_date"), col("order_ym"), col("order_start_date"),
          col("order_end_date"),
          concat(
            lit("[ "), date_format(col("order_end_date"), "yy"), lit("년 "),
            date_format(col("order_end_date"), "MM"), lit("월 ]\n"),
            when(col("order_start_date") =!= col("order_end_date"),
              concat(date_format(col("order_start_date"), "yy/MM/dd"),
                col("__sn"), lit("\n~ ")))
              .otherwise(lit("\n")),
            date_format(col("order_end_date"), "yy/MM/dd"), col("__en"))
            .as("order_date_range"))
    }))

    // ---- searchad report (reference: dbt_bigquery/models/marts/ads/
    // searchad__report_daily.sql): the wide two-channel union mart —
    // insight rows enriched through campaign/ad/product masters + device
    // dim with layered COALESCE fallbacks, UNION ALL the contract channel
    // with its literal device type and null counter columns.
    r.register(Model("searchad_insight", Nil, Incremental("ymd"), ctx => {
      Tables.orders(ctx.session, sfDir).select(
        col("o_orderkey").as("ad_id"),
        pmod(col("o_custkey"), lit(500)).as("campaign_id"),
        (pmod(col("o_orderkey"), lit(2000)) + 1).as("product_id"),
        element_at(array(lit("P"), lit("M"), lit("X")),
          (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")).as("device_code"),
        (pmod(col("o_orderkey"), lit(1000)) * 7).as("impression_count"),
        pmod(col("o_orderkey"), lit(50)).as("click_count"),
        floor(col("o_totalprice") * 0.01).cast("long").as("ad_cost"),
        to_date(col("o_orderdate")).as("ymd"))
    }))

    r.register(Model("searchad_campaign_master", Nil, View, ctx => {
      Tables.customer(ctx.session, sfDir)
        .filter(col("c_custkey") < 400)
        .select(col("c_custkey").as("campaign_id"),
          col("c_nationkey").cast("long").as("customer_id"),
          concat(lit("CMP"), col("c_custkey")).as("campaign_name"),
          when(pmod(col("c_custkey"), lit(5)) === 0, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("campaign_type"),
          col("c_mktsegment").as("account_type"),
          when(pmod(col("c_custkey"), lit(2)) === 0, lit("쇼핑검색"))
            .otherwise(lit(null).cast("string")).as("ad_type"))
    }))

    r.register(Model("searchad_ad_master", Nil, View, ctx => {
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(col("o_orderkey"), lit(3)) === 0)
        .select(col("o_orderkey").as("ad_id"),
          col("o_custkey").cast("long").as("customer_id"),
          pmod(col("o_orderkey"), lit(100)).as("adgroup_id"),
          when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null).cast("string"))
            .otherwise(concat(lit("AG"), pmod(col("o_orderkey"), lit(4))))
            .as("adgroup_type"),
          when(pmod(col("o_orderkey"), lit(5)) === 0, lit(null).cast("string"))
            .otherwise(lit("파워링크")).as("ad_type"),
          concat(lit("ADCMP"), pmod(col("o_custkey"), lit(500))).as("campaign_name"),
          when(pmod(col("o_orderkey"), lit(2)) === 0, lit(null).cast("string"))
            .otherwise(lit("파워")).as("campaign_type"))
    }))

    r.register(Model("core_product_master", Nil, View, ctx => {
      Tables.part(ctx.session, sfDir).select(
        col("p_partkey").as("product_id"),
        when(pmod(col("p_partkey"), lit(6)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("T"), pmod(col("p_partkey"), lit(5))))
          .as("team_name"))
    }))

    r.register(Model("searchad_contract_daily", Nil, Incremental("ymd"), ctx => {
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(col("o_orderkey"), lit(11)) === 0)
        .select((col("o_orderkey") + 9000000).as("contract_id"),
          pmod(col("o_orderkey"), lit(100)).as("adgroup_id"),
          (pmod(col("o_orderkey"), lit(2000)) + 1).as("product_id"),
          floor(col("o_totalprice") * 0.05).cast("long").as("ad_cost"),
          to_date(col("o_orderdate")).as("ymd"))
    }))

    r.register(Model("searchad_contract_master", Nil, View, ctx => {
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(col("o_orderkey"), lit(11)) === 0 &&
          pmod(col("o_orderkey"), lit(2)) === 0)
        .select((col("o_orderkey") + 9000000).as("contract_id"),
          col("o_custkey").cast("long").as("customer_id"),
          pmod(col("o_custkey"), lit(500)).as("campaign_id"),
          concat(lit("CTCMP"), pmod(col("o_custkey"), lit(500))).as("campaign_name"),
          when(pmod(col("o_orderkey"), lit(4)) === 0, lit("브랜드검색"))
            .otherwise(lit(null).cast("string")).as("contract_type"))
    }))

    r.register(Model("searchad_report_daily",
      Seq("searchad_insight", "searchad_campaign_master", "searchad_ad_master",
        "core_product_master", "searchad_contract_daily",
        "searchad_contract_master"), View, ctx => {
      val start = lit(ctx.params("ds_start_date")).cast("date")
      val end = lit(ctx.params("ds_end_date")).cast("date")
      val device = graft.functions.F.inlineDim(ctx.session,
        Seq("code", "label"), Seq(Seq("P", "PC"), Seq("M", "모바일")))
      val ins = ctx.ref("searchad_insight")
        .filter(col("ymd").between(start, end)).alias("i")
      val cmp = ctx.ref("searchad_campaign_master").alias("c")
      val ad = ctx.ref("searchad_ad_master").alias("a")
      val prod = ctx.ref("core_product_master").alias("p")
      val side1 = ins
        .join(broadcast(device.alias("d")),
          col("i.device_code") === col("d.code"), "left")
        .join(broadcast(cmp), col("i.campaign_id") === col("c.campaign_id"), "left")
        .join(ad, col("i.ad_id") === col("a.ad_id"), "left")
        .join(prod, col("i.product_id") === col("p.product_id"), "left")
        .select(
          coalesce(col("a.customer_id"), col("c.customer_id")).as("customer_id"),
          col("i.campaign_id").as("campaign_id"),
          coalesce(col("a.campaign_name"), col("c.campaign_name")).as("campaign_name"),
          coalesce(col("a.campaign_type"), col("c.campaign_type"),
            lit("캠페인 없음")).as("campaign_type"),
          col("a.adgroup_id").as("adgroup_id"),
          coalesce(col("a.adgroup_type"),
            concat(col("c.account_type"), lit("-기타")),
            lit("그룹 없음")).as("adgroup_type"),
          col("i.ad_id").as("ad_id"),
          coalesce(col("a.ad_type"), col("c.ad_type"), lit("유형 없음")).as("ad_type"),
          coalesce(col("p.team_name"), lit("담당팀 없음")).as("team_name"),
          coalesce(col("d.label"), lit("-")).as("device_type"),
          col("i.impression_count").as("impression_count"),
          col("i.click_count").as("click_count"),
          col("i.ad_cost").as("ad_cost"), col("i.ymd").as("ymd"))
      val con = ctx.ref("searchad_contract_daily")
        .filter(col("ymd").between(start, end)).alias("cd")
      val cm = ctx.ref("searchad_contract_master").alias("cm")
      val side2 = con
        .join(cm, col("cd.contract_id") === col("cm.contract_id"), "left")
        .join(prod, col("cd.product_id") === col("p.product_id"), "left")
        .select(
          col("cm.customer_id").as("customer_id"),
          col("cm.campaign_id").as("campaign_id"),
          col("cm.campaign_name").as("campaign_name"),
          lit("캠페인 없음").as("campaign_type"),
          col("cd.adgroup_id").as("adgroup_id"),
          lit("그룹 없음").as("adgroup_type"),
          col("cd.contract_id").as("ad_id"),
          coalesce(col("cm.contract_type"), lit("유형 없음")).as("ad_type"),
          coalesce(col("p.team_name"), lit("담당팀 없음")).as("team_name"),
          lit("계약").as("device_type"),
          lit(null).cast("long").as("impression_count"),
          lit(null).cast("long").as("click_count"),
          col("cd.ad_cost").as("ad_cost"), col("cd.ymd").as("ymd"))
      side1.unionByName(side2)
    }))

    // ---- cross-platform ad report (reference: marts/ads/
    // analytics__adreport_daily.sql): per-channel daily models harmonized
    // onto one column set and UNION ALLed under a platform label — '-'
    // fillers where a channel lacks the dimension, NULL conversion columns
    // where it lacks the metric.
    def channelDaily(slice: Int, prefix: String, costPct: Double,
                     withConv: Boolean): ModelContext => DataFrame = ctx => {
      val o = Tables.orders(ctx.session, sfDir)
        .filter(pmod(col("o_orderkey"), lit(5)) === slice)
      o.select(
        concat(lit(prefix), pmod(col("o_custkey"), lit(100)))
          .as("campaign_name"),
        concat(lit(prefix), lit("G"), pmod(col("o_orderkey"), lit(40)))
          .as("adgroup_name"),
        concat(lit(prefix), lit("A"), pmod(col("o_orderkey"), lit(500)))
          .as("ad_name"),
        element_at(array(lit("SALES"), lit("NCA"), lit("REACH")),
          (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")).as("ad_type"),
        floor(col("o_totalprice") * costPct).cast("long").as("ad_cost"),
        (if (withConv) floor(col("o_totalprice") * 0.5).cast("long")
         else lit(null).cast("long")).as("conv_amount"),
        when(pmod(col("o_custkey"), lit(6)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("T"), pmod(col("o_custkey"), lit(5))))
          .as("team_name"),
        to_date(col("o_orderdate")).as("ymd"))
    }
    r.register(Model("coupang_ads_daily", Nil, Incremental("ymd"),
      channelDaily(1, "CP", 0.04, withConv = true)))
    r.register(Model("google_ads_daily", Nil, Incremental("ymd"),
      channelDaily(2, "GG", 0.03, withConv = false)))
    r.register(Model("meta_ads_daily", Nil, Incremental("ymd"),
      channelDaily(3, "MT", 0.02, withConv = false)))

    r.register(Model("adreport_daily",
      Seq("searchad_report_daily", "coupang_ads_daily", "google_ads_daily",
        "meta_ads_daily"), View, ctx => {
      val start = lit(ctx.params("ds_start_date")).cast("date")
      val end = lit(ctx.params("ds_end_date")).cast("date")
      // the naver channel IS the searchad mart, harmonized: it carries no
      // adgroup_name ('-' filler) and no conversion metric (NULL)
      val naver = ctx.ref("searchad_report_daily").select(
        lit("네이버").as("platform_name"),
        col("campaign_name"),
        lit("-").as("adgroup_name"),
        col("ad_id").cast("string").as("ad_name"),
        col("ad_type"),
        col("ad_cost"),
        lit(null).cast("long").as("conv_amount"),
        col("team_name"), col("ymd"))
      def channel(name: String, label: String) =
        ctx.ref(name).filter(col("ymd").between(start, end)).select(
          lit(label).as("platform_name"), col("campaign_name"),
          col("adgroup_name"), col("ad_name"), col("ad_type"),
          col("ad_cost"), col("conv_amount"),
          coalesce(col("team_name"), lit("담당팀 없음")).as("team_name"),
          col("ymd"))
      naver
        .unionByName(channel("coupang_ads_daily", "쿠팡"))
        .unionByName(channel("google_ads_daily", "구글"))
        .unionByName(channel("meta_ads_daily", "메타"))
    }))

    // ---- relation ranges as a DAG citizen (reference: relation__ad_id_to_
    // ranged_sbn_ids.sql:17-96 feeding the insight join — its real role,
    // vs q53 which exercises only the islands/format shape): gap-islands
    // ranges model → big-big bucketed range join → per-range rollup.
    r.register(Model("ad_sbn_ranges", Nil, View, ctx => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_mktsegment")).orderBy(col("c_custkey"))
      Tables.customer(ctx.session, sfDir)
        .select(col("c_mktsegment"), col("c_custkey"))
        .withColumn("__grp", col("c_custkey") - row_number().over(w))
        .groupBy(col("c_mktsegment"), col("__grp"))
        .agg(min(col("c_custkey")).as("lo"), max(col("c_custkey")).as("hi"))
        .drop("__grp")
    }))

    r.register(Model("orders_by_sbn_range", Seq("ad_sbn_ranges"), View, ctx => {
      val o = Tables.orders(ctx.session, sfDir).select(col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("__total"))
      graft.operators.Joins.bucketedRangeJoin(
          o, col("o_custkey"),
          ctx.ref("ad_sbn_ranges"), col("lo"), col("hi"), bucketWidth = 64)
        .groupBy(col("c_mktsegment"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("__total")).cast("double").as("revenue"))
    }))

    // ---- batch freshness probe (reference: marts/stock/
    // analytics__stock_report.sql:53-62 — `batch = (SELECT MAX(batch) …
    // WHERE ymd = REPORT_DATE)` unless the caller pinned batch 10/20):
    // correlated scalar via single-row aggregate + broadcast, no collect.
    r.register(Model("stock_qty_batch", Nil, Incremental("ymd"), ctx => {
      Tables.lineitem(ctx.session, sfDir).select(
        col("l_partkey").as("product_code"),
        to_date(col("l_shipdate")).as("ymd"),
        element_at(array(lit(10), lit(20), lit(30)),
          (pmod(col("l_orderkey"), lit(3)) + 1).cast("int")).as("batch"),
        col("l_quantity").cast("long").as("stock_qty"))
    }))

    r.register(Model("stock_report_batch", Seq("stock_qty_batch"), View, ctx => {
      val day = ctx.ref("stock_qty_batch")
        .filter(col("ymd") === lit(ctx.params("report_date")).cast("date"))
      val rb = ctx.params("report_batch").toInt
      val chosen =
        if (rb == 10 || rb == 20) day.filter(col("batch") === rb)
        else {
          val mx = day.agg(max(col("batch")).as("__max_batch"))
          day.crossJoin(broadcast(mx))
            .filter(col("batch") === col("__max_batch")).drop("__max_batch")
        }
      chosen.groupBy(col("product_code"), col("batch"))
        .agg(sum(col("stock_qty")).as("stock_qty"), count(lit(1)).as("n_rows"))
    }))

    // ---- opex daily spread (reference: intermediate/ads/core__opex_daily
    // .sql): a date-range expense divided equally over its days via a
    // generated day scaffold, integer remainder to the FIRST day (A9's
    // div/mod allocation against a date axis instead of slots).
    r.register(Model("opex_daily", Nil, Incremental("ymd"), ctx => {
      val o = Tables.orders(ctx.session, sfDir).select(
        col("o_orderkey").as("expense_id"),
        concat(lit("EXP"), pmod(col("o_orderkey"), lit(40))).as("expense_name"),
        pmod(col("o_custkey"), lit(12)).as("dept_id"),
        pmod(col("o_orderkey"), lit(25)).as("brand_id"),
        floor(col("o_totalprice") * 100).cast("long").as("amount"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null).cast("date"))
          .otherwise(to_date(col("o_orderdate"))).as("__start0"),
        date_add(to_date(col("o_orderdate")),
          pmod(col("o_orderkey"), lit(9)).cast("int")).as("end_date"))
      val src = o
        .withColumn("start_date", coalesce(col("__start0"), col("end_date")))
        .withColumn("date_count",
          (datediff(col("end_date"), col("start_date")) + 1).cast("long"))
      src.select(col("expense_id"), col("expense_name"), col("dept_id"),
          col("brand_id"), col("amount"), col("date_count"), col("start_date"),
          posexplode(sequence(lit(0), col("date_count") - 1))
            .as(Seq("date_offset", "__v")))
        .select(col("expense_id"), col("expense_name"), col("dept_id"),
          col("brand_id"),
          graft.operators.Allocation.divModAllocate(col("amount"),
            col("date_count"), col("date_offset")).as("amount"),
          expr("date_add(start_date, date_offset)").as("ymd"))
    }))

    // ---- cj invoice/order delivery costs (reference: intermediate/
    // delivery/cj__invoice_order.sql): two carrier feeds normalized
    // (dashes stripped from invoice numbers, missing order ids to the
    // 'none' sentinel), unioned, sentinel rows dropped, re-aggregated to
    // order grain.
    r.register(Model("cj_invoice_order", Nil, View, ctx => {
      val start = lit(ctx.params("ds_start_date")).cast("date")
      val end = lit(ctx.params("ds_end_date")).cast("date")
      val o = Tables.orders(ctx.session, sfDir)
      val lois = o.filter(pmod(col("o_orderkey"), lit(2)) === 0 &&
          to_date(col("o_orderdate")).between(start, end))
        .select(
          regexp_replace(concat(lit("LP-"), col("o_orderkey")), "-", "")
            .as("invoice_no"),
          coalesce(when(pmod(col("o_orderkey"), lit(11)) === 0,
              lit(null).cast("string"))
            .otherwise(concat(lit("ORD"), col("o_orderkey"))), lit("none"))
            .as("order_id"),
          pmod(col("o_orderkey"), lit(5000)).as("delivery_fee"),
          lit(0L).as("box_cost"))
      val eflexs = o.filter(pmod(col("o_orderkey"), lit(3)) === 0 &&
          to_date(col("o_orderdate")).between(start, end))
        .select(concat(lit("EF"), col("o_orderkey")).as("invoice_no"),
          concat(lit("ORD"), col("o_orderkey")).as("order_id"),
          pmod(col("o_orderkey"), lit(3000)).as("delivery_fee"),
          pmod(col("o_orderkey"), lit(700)).as("box_cost"))
      def perInvoice(df: DataFrame) = df
        .groupBy(col("invoice_no"), col("order_id"))
        .agg(sum(col("delivery_fee")).as("delivery_fee"),
          sum(col("box_cost")).as("box_cost"))
      perInvoice(lois).unionByName(perInvoice(eflexs))
        .filter(col("order_id") =!= "none")
        .groupBy(col("order_id"))
        .agg(sum(col("delivery_fee")).as("delivery_fee"),
          sum(col("box_cost")).as("box_cost"))
    }))

    // ---- sales target vs actual (reference: marts/sales/
    // analytics__sales_target.sql): previous/current-month conditional
    // pivot over the order fact, FULL OUTER join against the target table
    // (targets with no sales and sales with no target both survive), and
    // the single-row period-boundary struct cross-joined onto every row.
    // The reference pivots on CURRENT_DATE; here the pivot month is a
    // param so runs replay.
    r.register(Model("sales_target", Nil, View, ctx => {
      val pivotMonth = java.time.LocalDate.parse(ctx.params("pivot_month"))
      def d(x: java.time.LocalDate) = lit(java.sql.Date.valueOf(x))
      val prevStart = pivotMonth.minusMonths(1)
      val monthEnd = pivotMonth.plusMonths(1).minusDays(1)
      val prod = Tables.part(ctx.session, sfDir)
        .select(col("p_partkey").as("product_id"), col("p_brand"))
      val fact = Tables.orders(ctx.session, sfDir)
        .filter(to_date(col("o_orderdate")).between(d(prevStart), d(monthEnd)) &&
          pmod(col("o_orderkey"), lit(4)) === 0)
        .select((pmod(col("o_orderkey"), lit(2000)) + 1).as("product_id"),
          concat(lit("S"), pmod(col("o_custkey"), lit(20))).as("shop_id"),
          floor(col("o_totalprice")).cast("long").as("payment_amount"),
          to_date(col("o_orderdate")).as("order_date"))
        .join(prod, Seq("product_id"), "left")
        .withColumn("brand_id", coalesce(col("p_brand"), lit("200000")))
        .withColumn("group_id",
          when(date_trunc("month", col("order_date")).cast("date") ===
            d(pivotMonth), lit(1)).otherwise(lit(0)))
      val period = fact.agg(
        min(when(col("group_id") === 0, col("order_date")))
          .as("previous_start_date"),
        max(when(col("group_id") === 0, col("order_date")))
          .as("previous_end_date"),
        min(when(col("group_id") === 1, col("order_date")))
          .as("current_start_date"),
        max(when(col("group_id") === 1, col("order_date")))
          .as("current_end_date"))
      val sales = fact.filter(col("payment_amount") =!= 0)
        .groupBy(col("brand_id"), col("shop_id"))
        .agg(sum(when(col("group_id") === 0, col("payment_amount"))
            .otherwise(lit(0L))).as("previous_sales"),
          sum(when(col("group_id") === 1, col("payment_amount"))
            .otherwise(lit(0L))).as("current_sales"))
      // smallest-partkey row wins per (brand, shop) — dropDuplicates keeps
      // an arbitrary row, which no oracle can replay
      val targets = graft.functions.F.qualifyTopN(
        Tables.part(ctx.session, sfDir)
          .select(col("p_brand").as("brand_id"),
            concat(lit("S"), pmod(col("p_partkey"), lit(20))).as("shop_id"),
            floor(col("p_retailprice") * 100).cast("long").as("monthly_amount"),
            col("p_partkey")),
        Seq(col("brand_id"), col("shop_id")), Seq(col("p_partkey")))
        .drop("p_partkey")
      sales.alias("f")
        .join(targets.alias("t"),
          col("f.brand_id") === col("t.brand_id") &&
            col("f.shop_id") === col("t.shop_id"), "full_outer")
        .select(
          coalesce(col("f.brand_id"), col("t.brand_id")).as("brand_id"),
          coalesce(col("f.shop_id"), col("t.shop_id")).as("shop_id"),
          coalesce(col("f.previous_sales"), lit(0L)).as("previous_sales"),
          coalesce(col("f.current_sales"), lit(0L)).as("current_sales"),
          nullif(col("t.monthly_amount"), lit(0L)).as("target_sales"))
        .crossJoin(broadcast(period))
    }))

    // ---- stock batch times (reference: intermediate/stock/
    // core__stock_time_batch.sql): three inventory feeds tagged by
    // channel, batch = the 17:00 cutoff (updates before 5pm are the
    // morning batch 10, after are batch 20), MAX update time overall and
    // per channel via conditional aggregates.
    r.register(Model("stock_time_batch", Nil, Incremental("ymd"), ctx => {
      // one scan with a derived channel tag — a filter-per-channel union
      // would read events three times AND silently drop NULL-user rows
      // the conditional aggregates are defined over
      Tables.events(ctx.session, sfDir)
        .select(col("ts").cast("date").as("ymd"),
          when(hour(col("ts")) < 17, lit(10)).otherwise(lit(20)).as("batch"),
          pmod(col("user_id"), lit(3)).cast("int").as("group_id"),
          col("ts").as("updated_at"))
        .groupBy(col("ymd"), col("batch"))
        .agg(max(col("updated_at")).as("max_updated_at"),
          max(when(col("group_id") === 0, col("updated_at")))
            .as("ecount_max_updated_at"),
          max(when(col("group_id") === 1, col("updated_at")))
            .as("cj_eflexs_max_updated_at"),
          max(when(col("group_id") === 2, col("updated_at")))
            .as("coupang_rfm_max_updated_at"))
    }))

    // ---- option master (reference: marts/product/smartstore__option_
    // master.sql): channel/product-master enrichment joins plus the
    // sentinel SORT KEY — unmatched products get REPEAT('9',
    // LENGTH(MAX(sort_key))): the all-9s value of the max key's width,
    // >= every real key (strictly after unless the realized max is itself
    // all 9s — the reference's own edge). The reference computes the max
    // with a global `MAX() OVER ()` window; here it is a single-row
    // aggregate broadcast (same value, no single-partition window).
    r.register(Model("option_master", Nil, View, ctx => {
      // deterministic dedups (dropDuplicates keeps an arbitrary row that
      // no oracle can replay): smallest channel + highest price win
      val opt = graft.functions.F.qualifyTopN(
        Tables.lineitem(ctx.session, sfDir).select(
          col("l_partkey").as("product_id"),
          (col("l_partkey") * 10 + pmod(col("l_linenumber"), lit(3)))
            .as("option_id"),
          pmod(col("l_suppkey"), lit(7)).as("channel_seq"),
          floor(col("l_extendedprice")).cast("long").as("sales_price")),
        Seq(col("option_id")),
        Seq(col("channel_seq"), col("sales_price").desc))
      val chl = graft.functions.F.qualifyTopN(
        Tables.nation(ctx.session, sfDir).select(
          pmod(col("n_nationkey"), lit(7)).as("channel_seq"),
          concat(lit("T"), pmod(col("n_nationkey"), lit(5))).as("team_name"),
          col("n_name").as("brand_name")),
        Seq(col("channel_seq")), Seq(col("brand_name")))
      val prd = Tables.part(ctx.session, sfDir)
        .filter(pmod(col("p_partkey"), lit(3)) === 0)
        .select(col("p_partkey").as("product_id"),
          col("p_name").as("product_name"),
          pmod(col("p_partkey") * 7, lit(997)).as("sort_key"))
      val mx = prd.agg(max(col("sort_key")).as("__mx"))
      opt
        .join(broadcast(chl), Seq("channel_seq"), "left")
        .join(prd, Seq("product_id"), "left")
        .crossJoin(broadcast(mx))
        .select(col("product_id"), col("option_id"), col("team_name"),
          col("brand_name"), col("product_name"), col("sales_price"),
          coalesce(col("sort_key"),
            expr("cast(repeat('9', length(cast(__mx AS STRING))) AS BIGINT)"))
            .as("sort_key1"))
    }))

    // ---- enriched order-grain profit view (reference: marts/sales/
    // analytics__profit_daily.sql — the TVF fact LEFT JOINed through the
    // product/shop masters and status dim, every dimension COALESCEd to
    // its declared fallback, and the conditional unit-name concat).
    r.register(Model("order_profit_daily", Seq("order_count"), View, ctx => {
      val fact = ctx.ref("order_count")
        .withColumn("product_id", pmod(col("order_id"), lit(2000)) + 1)
        .withColumn("shop_id",
          concat(lit("S"), pmod(col("order_id"), lit(20))))
      val item = Tables.part(ctx.session, sfDir).select(
        col("p_partkey").as("product_id"),
        col("p_name").as("product_name"),
        when(pmod(col("p_partkey"), lit(4)) === 0, lit(null).cast("string"))
          .otherwise(col("p_type")).as("category_name3"),
        when(pmod(col("p_partkey"), lit(5)) === 0, lit(null).cast("string"))
          .otherwise(concat(lit("EA"), pmod(col("p_partkey"), lit(4))))
          .as("unit_name"))
      val status = graft.functions.F.inlineDim(ctx.session,
        Seq("code", "label"),
        Seq(Seq("O", "주문"), Seq("F", "완료"), Seq("P", "대기")))
      fact
        .join(item, Seq("product_id"), "left")
        .join(broadcast(status),
          col("order_status") === col("code"), "left")
        .select(col("order_id"), col("product_id"), col("shop_id"),
          coalesce(col("product_name"), lit("매칭 불가 상품"))
            .as("product_name"),
          coalesce(
            when(col("unit_name").isNull, col("category_name3"))
              .otherwise(concat(col("category_name3"), lit(" ("),
                col("unit_name"), lit(")"))),
            lit("-")).as("category_unit_name"),
          coalesce(col("label"), lit("알 수 없음")).as("order_status"),
          col("order_quantity"), col("order_date"))
    }))

    // ---- total order (reference: marts/sales/analytics__total_order.sql
    // — the reference's largest mart; this model is its sabangnet channel
    // steps 2-5 + 10): bundle products explode into components via the
    // 'pid:qty,pid:qty' bundle-option string (component sku = component
    // qty × order qty), the order's payment CONCENTRATES on the first
    // exploded row (`IF(rn=1, MAX(payment) OVER order, 0)` — the
    // reference's dedup of the repeated order-level amount), costs attach,
    // and multi-product orders re-allocate the order total by cost weight
    // with exact remainder repair (A8), then aggregate daily.
    r.register(Model("total_order", Nil, Incremental("order_dt"), ctx => {
      val w = org.apache.spark.sql.expressions.Window
      val k = pmod(col("l_partkey"), lit(300))
      val detail = Tables.lineitem(ctx.session, sfDir)
        .join(Tables.orders(ctx.session, sfDir).select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("order_dt")),
          col("l_orderkey") === col("o_orderkey"))
        .select(
          (col("l_orderkey") * 10 + col("l_linenumber")).as("order_seq"),
          col("l_orderkey").as("order_id"),
          pmod(col("l_suppkey"), lit(5)).as("account_no"),
          concat(lit("P"), k).as("product_id"),
          when(pmod(col("l_partkey"), lit(10)) === 0,
              concat(lit("C"), k, lit("a:2,C"), k, lit("b:1")))
            .otherwise(lit(null).cast("string")).as("bundle_option_ids"),
          col("l_quantity").cast("long").as("order_quantity"),
          floor(col("l_extendedprice")).cast("long").as("payment_amount"),
          col("order_dt"))
      val nonBundle = detail.filter(col("bundle_option_ids").isNull)
        .select(col("order_seq"), col("order_id"), col("account_no"),
          col("product_id"), col("order_quantity").as("sku_quantity"),
          col("payment_amount"), col("order_dt"))
      val wOrd = w.partitionBy(col("account_no"), col("order_id"))
      val exploded = detail.filter(col("bundle_option_ids").isNotNull)
        .select(col("order_seq"), col("order_id"), col("account_no"),
          col("order_quantity"), col("payment_amount"), col("order_dt"),
          explode(split(col("bundle_option_ids"), ",")).as("bundle_option"))
        .select(col("order_seq"), col("order_id"), col("account_no"),
          split(col("bundle_option"), ":").getItem(0).as("product_id"),
          (coalesce(expr("try_cast(split(bundle_option, ':')[1] AS BIGINT)"),
            lit(1L)) * col("order_quantity")).as("sku_quantity"),
          col("payment_amount"), col("order_dt"),
          // order_seq collides ((l_orderkey, l_linenumber) is NOT unique in
          // the fixture); quantity + payment make the order total over
          // row content
          row_number().over(wOrd.orderBy(col("order_seq"),
            col("bundle_option"), col("order_quantity"),
            col("payment_amount"))).as("__rn"),
          max(col("payment_amount")).over(wOrd).as("__maxpay"))
        .select(col("order_seq"), col("order_id"), col("account_no"),
          col("product_id"), col("sku_quantity"),
          when(col("__rn") === 1, col("__maxpay")).otherwise(lit(0L))
            .as("payment_amount"),
          col("order_dt"))
      val withCost = nonBundle.unionByName(exploded)
        .withColumn("org_price",
          expr("try_cast(regexp_extract(product_id, '([0-9]+)', 1) AS BIGINT)" +
            " % 97 + 3"))
        .withColumn("cost_amount", col("org_price") * col("sku_quantity"))
        .withColumn("__total", sum(col("payment_amount")).over(wOrd))
      // ONE allocation pass over every row — the single/multi split is a
      // plan-level no-op (a 1-row group's weighted share of its own
      // total IS the row's amount, zero-weight included), and the split
      // form planned the whole explode/union subtree twice (the q125
      // collapse, oracle-verified there and here)
      val alloc = graft.operators.Allocation.weightedAllocate(
          withCost,
          Seq(col("account_no"), col("order_id")),
          Seq(col("product_id"), col("order_seq"), col("sku_quantity"),
            col("payment_amount")),
          col("__total"), col("cost_amount"), "payment_alloc", scale = 0)
        .select(col("order_id"), col("order_dt"), col("sku_quantity"),
          col("payment_alloc").cast("long").as("pay"))
      alloc
        .groupBy(col("order_dt"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("order_id")).as("n_orders"),
          sum(col("sku_quantity")).cast("long").as("sku_quantity"),
          sum(col("pay")).cast("long").as("payment_amount"))
    }))

    AdsMasters.install(r, sfDir)
    ProductMarts.install(r, sfDir)
    ReportMarts.install(r, sfDir)
    OrderCounts.install(r, sfDir)
    SalesDaily.install(r, sfDir)
    SmtOptRelation.install(r, sfDir)
    SbnSales.install(r, sfDir)
    SmtSales.install(r, sfDir)
    InsightDaily.install(r, sfDir)
    SearchadFull.install(r, sfDir)
    StockBatch.install(r, sfDir)

    r
  }

  /** Order-grain slice of the orders fact bounded by [start, end] — the
    * `analytics__order_count` TVF the mom mart invokes twice. No
    * aggregation: order_id stays distinct-countable (the pattern's point).
    */
  private def orderCountSlice(spark: org.apache.spark.sql.SparkSession,
                              sfDir: String,
                              start: org.apache.spark.sql.Column,
                              end: org.apache.spark.sql.Column): DataFrame =
    Tables.orders(spark, sfDir).select(
        col("o_orderkey").as("order_id"),
        col("o_orderstatus").as("order_status"),
        (pmod(col("o_orderkey"), lit(5)) + 1).as("order_quantity"),
        to_date(col("o_orderdate")).as("order_date"))
      .filter(col("order_date").between(start, end))
}
