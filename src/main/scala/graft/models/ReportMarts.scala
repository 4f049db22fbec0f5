package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Report/relation marts (reference: marts/sales/analytics__profit_monthly
  * .sql, marts/stock/analytics__stock_cost_mom.sql, analytics__stock_time_
  * ds.sql, analytics__stock_report_ds.sql, intermediate/benchmark/naver_shp/
  * relation__nsh_prd_to_grp_id.sql, intermediate/ads/searchad/relation__smt_
  * prd_to_ranged_sbn_ids.sql, intermediate/ads/dable__report_daily.sql,
  * intermediate/delivery/cj__invoice.sql).
  *
  * New structural patterns this file adds to the registry:
  *
  *  - latest-batch-per-month selection via two ANDed QUALIFY windows over
  *    DIFFERENT partitionings (`ymd = MAX(ymd) OVER (month)` AND
  *    `batch = MAX(batch) OVER (ymd)`, stock_cost_mom);
  *  - zero-cost fallback scaffold rows for sales periods with no stock
  *    (anti-join + month-end date borrow, stock_cost_mom);
  *  - the gated primary/fallback TVF union: fallback rows survive ONLY
  *    when the primary is empty (`WHERE NOT EXISTS (SELECT 1 FROM
  *    primary)`) — expressed as a broadcast single-row count, not a
  *    driver-side collect (stock_time_ds / stock_report_ds);
  *  - a cascading multi-depth fallback join ladder with keyword gates and
  *    COALESCE carry-forward (nsh_prd_to_grp_id — 4 category depths, each
  *    join guarded on `group_id IS NULL`);
  *  - array-membership rule rewrite with validity windows: relations whose
  *    bundle contains a sentinel product split into pre/post ranges, the
  *    post range dropping or expanding the sentinel (smt_prd ranged
  *    relation);
  *  - a conditional renewal-mapping join inside a div/mod bundle explode
  *    (`ON id = new AND ymd < renewal_date`, dable report).
  */
object ReportMarts {

  private val nullStr = lit(null).cast("string")

  /** The q98-style enriched item dim over part (int product ids, matching
    * the order fact's derived product ids). Shared with InsightDaily's
    * string-keyed projection — one source of truth for the synthesis.
    */
  private[models] def itemDim(s: SparkSession, sfDir: String): DataFrame =
    Tables.part(s, sfDir).select(
      col("p_partkey").as("product_id"),
      concat(lit("NA-"), lpad(col("p_partkey").cast("string"), 6, "0"),
        lit("-00")).as("item_id"),
      pmod(col("p_partkey"), lit(97)).as("item_seq"),
      when(pmod(col("p_partkey"), lit(6)) === 0, nullStr)
        .otherwise(concat(lit("T"), pmod(col("p_partkey"), lit(5))))
        .as("team_name"),
      when(pmod(col("p_partkey"), lit(7)) === 0, nullStr)
        .otherwise(col("p_brand")).as("brand_name"),
      substring_index(col("p_type"), " ", 1).as("category_name1"),
      col("p_brand").as("category_name2"),
      when(pmod(col("p_partkey"), lit(4)) === 0, nullStr)
        .otherwise(col("p_type")).as("category_name3"),
      concat(lit("CTN"), pmod(col("p_partkey"), lit(8))).as("category_name4"),
      concat(lit("COL"), pmod(col("p_partkey"), lit(6))).as("color"),
      col("p_name").as("product_name"),
      when(pmod(col("p_partkey"), lit(5)) === 0, nullStr)
        .otherwise(concat(lit("EA"), pmod(col("p_partkey"), lit(4))))
        .as("unit_name"),
      when(pmod(col("p_partkey"), lit(5)) === 0, lit(null).cast("bigint"))
        .otherwise(pmod(col("p_partkey"), lit(3)) + 1).as("unit_scale"))

  def install(r: ModelRegistry, sfDir: String): Unit = {

    // ---- profit monthly (reference: marts/sales/analytics__profit_
    // monthly.sql:21-91): the profit fact rolled up to month × product ×
    // shop × status (SUMs + MIN/MAX order dates), then enriched through
    // the item master / shop dim / status mapping with every dimension
    // COALESCEd to its declared fallback, and unit_quantity scaled by the
    // item's unit_scale.
    r.register(Model("profit_monthly", Seq("order_count"), View, ctx => {
      val fact = ctx.ref("order_count")
        .withColumn("product_id", pmod(col("order_id"), lit(2000)) + 1)
        .withColumn("shop_id",
          concat(lit("S"), pmod(col("order_id"), lit(20))))
        .withColumn("sku_quantity", col("order_quantity"))
        .withColumn("payment_amount", pmod(col("order_id"), lit(10000)))
        .withColumn("supply_cost", pmod(col("order_id") * 3, lit(5000)))
        .withColumn("delivery_fee", pmod(col("order_id"), lit(30)) * 100)
        .withColumn("ad_cost", pmod(col("order_id") * 7, lit(1000)))
      val monthly = fact
        .groupBy(date_trunc("month", col("order_date")).cast("date")
            .as("order_ym"),
          col("product_id"), col("shop_id"), col("order_status"))
        .agg(sum(col("sku_quantity")).as("sku_quantity"),
          sum(col("payment_amount")).as("payment_amount"),
          sum(col("supply_cost")).as("supply_cost"),
          sum(col("delivery_fee")).as("delivery_fee"),
          sum(col("payment_amount") - col("supply_cost"))
            .as("margin_amount"),
          sum(col("ad_cost")).as("ad_cost"),
          sum(col("payment_amount") - col("supply_cost")
            - col("delivery_fee") - col("ad_cost")).as("profit"),
          min(col("order_date")).as("order_start_date"),
          max(col("order_date")).as("order_end_date"))
      val item = itemDim(ctx.session, sfDir)
      val shop = graft.functions.F.inlineDim(ctx.session,
        Seq("shop_id", "shop_group", "shop_alias"),
        (0 until 20).map(i => Seq(s"S$i",
          if (i % 3 == 0) "오픈마켓" else "자사몰", s"샵$i")))
      val status = graft.functions.F.inlineDim(ctx.session,
        Seq("code", "label"),
        Seq(Seq("O", "주문"), Seq("F", "완료"), Seq("P", "대기")))
      monthly
        .join(item, Seq("product_id"), "left")
        .join(broadcast(shop), Seq("shop_id"), "left")
        .join(broadcast(status), col("order_status") === col("code"), "left")
        .select(col("product_id"),
          coalesce(col("item_id"), lit("NA-AAAAAA-00")).as("item_id"),
          coalesce(col("item_seq"), lit(99999999L)).as("item_seq"),
          coalesce(col("team_name"), lit("담당팀 없음")).as("team_name"),
          coalesce(col("brand_name"), lit("브랜드 없음")).as("brand_name"),
          coalesce(col("category_name1"), lit("-")).as("category_name1"),
          coalesce(col("category_name2"), lit("-")).as("category_name2"),
          coalesce(col("category_name3"), lit("-")).as("category_name3"),
          coalesce(col("category_name4"), lit("-")).as("category_name4"),
          coalesce(col("color"), lit("-")).as("color"),
          coalesce(col("product_name"), lit("매칭 불가 상품"))
            .as("product_name"),
          coalesce(
            when(col("unit_name").isNull, col("category_name3"))
              .otherwise(concat(col("category_name3"), lit(" ("),
                col("unit_name"), lit(")"))),
            lit("-")).as("category_unit_name"),
          col("shop_id"),
          coalesce(col("shop_group"), lit("-")).as("shop_group"),
          coalesce(col("shop_alias"), lit("-")).as("shop_name"),
          coalesce(col("label"), lit("알 수 없음")).as("order_status"),
          coalesce(col("sku_quantity") * coalesce(col("unit_scale"), lit(1L)),
            lit(0L)).as("unit_quantity"),
          col("sku_quantity"), col("payment_amount"), col("supply_cost"),
          col("delivery_fee"), col("margin_amount"), col("ad_cost"),
          col("profit"), col("order_start_date"), col("order_end_date"),
          col("order_ym"))
    }))

    // ---- stock cost month-over-month (reference: marts/stock/
    // analytics__stock_cost_mom.sql:23-145): the latest batch of the
    // latest stock day per month (two ANDed QUALIFY windows over
    // different partitionings), valued at org_price, with ZERO-cost
    // fallback rows for products that sold in a month but held no stock,
    // then item enrichment + the [ yy/mm/dd(요일) ] end-date label.
    r.register(Model("stock_cost_mom", Seq("stock_qty_batch"), View, ctx => {
      val endD = lit(ctx.params("ds_end_date")).cast("date")
      val startD = lit(ctx.params("ds_start_date")).cast("date")
      val months = ctx.params("ds_interval_month").toInt
      val windowStart = date_trunc("month", add_months(endD, -months))
        .cast("date")
      // ecount product sheet: option-keyed rows priced at org_price; rows
      // without an option id are excluded (reference WHERE COALESCE(
      // option_id,'') != '')
      val eco = Tables.part(ctx.session, sfDir).select(
          col("p_partkey").as("product_code"),
          when(pmod(col("p_partkey"), lit(15)) === 0, nullStr)
            .when(pmod(col("p_partkey"), lit(15)) === 7, lit(""))
            .otherwise(concat(col("p_partkey").cast("string"), lit("-0001")))
            .as("option_id"),
          floor(col("p_retailprice")).cast("long").as("org_price"))
        .filter(coalesce(col("option_id"), lit("")) =!= "")
        .select(col("product_code"),
          split(col("option_id"), "-").getItem(0).as("product_id"),
          col("org_price"))
      val qty = ctx.ref("stock_qty_batch")
        .filter(col("ymd").between(windowStart, endD))
      val wMonth = Window.partitionBy(date_trunc("month", col("ymd")))
      val wDay = Window.partitionBy(col("ymd"))
      val monthly = qty
        .join(eco, Seq("product_code"), "left")
        .withColumn("__max_ymd", max(col("ymd")).over(wMonth))
        .withColumn("__max_batch", max(col("batch")).over(wDay))
        .filter(col("ymd") === col("__max_ymd") &&
          col("batch") === col("__max_batch"))
        .select(coalesce(col("product_id"), lit("200000")).as("product_id"),
          (coalesce(col("org_price"), lit(0L))
            * coalesce(col("stock_qty"), lit(0L))).as("stock_cost"),
          col("ymd").as("stock_ymd"))
        .groupBy(col("stock_ymd"), col("product_id"))
        .agg(sum(col("stock_cost")).as("stock_cost"))
        .withColumn("order_ym",
          date_trunc("month", col("stock_ymd")).cast("date"))
      // sales scaffold: products that sold in the window (current slice at
      // the end date; lookback months at each LAST_DAY), minus products
      // that already have stock rows for that month → zero-cost rows
      val sales = Tables.orders(ctx.session, sfDir).select(
        (pmod(col("o_orderkey"), lit(2000)) + 1).cast("string")
          .as("product_id"),
        to_date(col("o_orderdate")).as("order_date"))
      val dsRange = sales
        .filter(col("order_date").between(startD, endD))
        .select(col("product_id"), endD.as("stock_ymd"),
          date_trunc("month", endD).cast("date").as("order_ym")).distinct()
      val lookback = sales
        .filter(col("order_date").between(windowStart,
          date_sub(date_trunc("month", endD).cast("date"), 1)))
        .select(col("product_id"), last_day(col("order_date")).as("stock_ymd"),
          date_trunc("month", col("order_date")).cast("date").as("order_ym"))
        .distinct()
      val monthEnds = monthly.select(col("order_ym"),
        col("stock_ymd").as("month_stock_ymd")).distinct()
      val fallback = dsRange.union(lookback).distinct()
        .join(monthly.select(col("product_id"), col("order_ym"),
            lit(1).as("__has_stock")).distinct(),
          Seq("product_id", "order_ym"), "left")
        .filter(col("__has_stock").isNull)
        .join(monthEnds, Seq("order_ym"), "left")
        .select(col("product_id"), lit(0L).as("stock_cost"),
          coalesce(col("month_stock_ymd"), col("stock_ymd")).as("stock_ymd"),
          col("order_ym"))
      val item = itemDim(ctx.session, sfDir)
        .withColumn("product_id", col("product_id").cast("string"))
      val dow = graft.functions.F.inlineDim(ctx.session,
        Seq("dw", "name_ko"),
        Seq(Seq(1, "(일)"), Seq(2, "(월)"), Seq(3, "(화)"), Seq(4, "(수)"),
          Seq(5, "(목)"), Seq(6, "(금)"), Seq(7, "(토)")))
      monthly.select(col("product_id"), col("stock_cost"), col("stock_ymd"),
          col("order_ym"))
        .unionByName(fallback)
        .join(item, Seq("product_id"), "left")
        .join(broadcast(dow), dayofweek(col("stock_ymd")) === col("dw"),
          "left")
        .select(col("product_id"),
          coalesce(col("item_id"), lit("NA-AAAAAA-00")).as("item_id"),
          coalesce(col("item_seq"), lit(99999999L)).as("item_seq"),
          coalesce(col("team_name"), lit("담당팀 없음")).as("team_name"),
          coalesce(col("brand_name"), lit("브랜드 없음")).as("brand_name"),
          coalesce(col("category_name1"), lit("-")).as("category_name1"),
          coalesce(col("category_name2"), lit("-")).as("category_name2"),
          coalesce(col("category_name3"), lit("-")).as("category_name3"),
          coalesce(col("category_name4"), lit("-")).as("category_name4"),
          coalesce(col("color"), lit("-")).as("color"),
          coalesce(col("product_name"), lit("매칭 불가 상품"))
            .as("product_name"),
          coalesce(
            when(col("unit_name").isNull, col("category_name3"))
              .otherwise(concat(col("category_name3"), lit(" ("),
                col("unit_name"), lit(")"))),
            lit("-")).as("category_unit_name"),
          col("stock_cost"), col("stock_ymd"), col("order_ym"),
          concat(lit("[ "), date_format(col("stock_ymd"), "yy/MM/dd"),
            col("name_ko"), lit(" ]")).as("stock_date_label"))
    }))

    // ---- gated primary/fallback ds marts (reference: marts/stock/
    // analytics__stock_time_ds.sql:15-80, analytics__stock_report_ds.sql:
    // 13-46): the TVF invoked twice — a primary slice and a previous-day
    // fallback that survives ONLY when the primary is empty. The
    // reference's `WHERE NOT EXISTS (SELECT 1 FROM primary)` becomes a
    // broadcast single-row COUNT joined onto the fallback (no driver
    // collect, no cartesian beyond one row).
    r.register(Model("stock_time_ds", Seq("stock_time_batch"), View, ctx => {
      val batch = ctx.params("report_batch").toInt
      val reportDate = lit(ctx.params("report_date")).cast("date")
      val base = ctx.ref("stock_time_batch")
      def slice(day: org.apache.spark.sql.Column) = {
        val onDay = base.filter(col("ymd") === day)
        val chosen =
          if (batch == 10 || batch == 20) onDay.filter(col("batch") === batch)
          else {
            val mx = onDay.agg(max(col("batch")).as("__mxb"))
            onDay.crossJoin(broadcast(mx))
              .filter(col("batch") === col("__mxb")).drop("__mxb")
          }
        chosen.select(col("ymd").as("report_date"),
          col("batch").as("report_batch"),
          date_sub(col("ymd"), 30).as("order_start_date"),
          date_sub(col("ymd"), 1).as("order_end_date"),
          col("max_updated_at"), col("ecount_max_updated_at"),
          col("cj_eflexs_max_updated_at"), col("coupang_rfm_max_updated_at"))
      }
      val primary = slice(reportDate)
      // fixed batches disable the fallback (reference: the CASE returns
      // tomorrow, an empty slice); the MAX-batch path falls back to the
      // previous day
      val fallback =
        if (batch == 10 || batch == 20) primary.limit(0)
        else slice(date_sub(reportDate, 1))
      val primaryCount = primary.agg(count(lit(1)).as("__n_primary"))
      primary.unionByName(
        fallback.crossJoin(broadcast(primaryCount))
          .filter(col("__n_primary") === 0).drop("__n_primary"))
    }))

    r.register(Model("stock_report_ds", Seq("stock_qty_batch"), View, ctx => {
      val batch = ctx.params("report_batch").toInt
      val reportDate = lit(ctx.params("report_date")).cast("date")
      val base = ctx.ref("stock_qty_batch")
      def report(day: org.apache.spark.sql.Column) = {
        val onDay = base.filter(col("ymd") === day)
        val chosen =
          if (batch == 10 || batch == 20) onDay.filter(col("batch") === batch)
          else {
            val mx = onDay.agg(max(col("batch")).as("__mxb"))
            onDay.crossJoin(broadcast(mx))
              .filter(col("batch") === col("__mxb")).drop("__mxb")
          }
        chosen.groupBy(col("product_code"), col("batch"))
          .agg(sum(col("stock_qty")).as("stock_qty"),
            count(lit(1)).as("n_rows"))
          .withColumn("report_date", day)
      }
      val primary = report(reportDate)
      val fallback =
        if (batch == 10 || batch == 20) primary.limit(0)
        else report(date_sub(reportDate, 1))
      val primaryCount = primary.agg(count(lit(1)).as("__n_primary"))
      primary.unionByName(
        fallback.crossJoin(broadcast(primaryCount))
          .filter(col("__n_primary") === 0).drop("__n_primary"))
    }))

    // ---- category-group relation ladder (reference: intermediate/
    // benchmark/naver_shp/relation__nsh_prd_to_grp_id.sql:60-147): two
    // product feeds joined to the category tree, then matched against
    // mapping rows depth 4 → 3 → 2 → 1, each depth a LEFT JOIN guarded on
    // `group_id IS NULL` with an optional keyword-containment gate, the
    // match COALESCE-carried forward; one best match per product at the
    // end (smallest mapping_seq).
    r.register(Model("nsh_prd_to_grp_id", Nil, View, ctx => {
      val s = ctx.session
      val cat = Tables.part(s, sfDir)
        .select(pmod(col("p_partkey"), lit(200)).as("category_id")).distinct()
        .select(col("category_id"),
          pmod(col("category_id"), lit(5)).as("category_id1"),
          pmod(col("category_id"), lit(25)).as("category_id2"),
          pmod(col("category_id"), lit(100)).as("category_id3"),
          col("category_id").as("category_id4"),
          (pmod(col("category_id"), lit(4)) + 1).cast("int").as("depth"))
      val grp = graft.functions.F.inlineDim(s,
        Seq("mapping_seq", "group_id", "mapping_id", "mapping_keyword",
          "mapping_depth"),
        Seq(
          Seq(1, "G-A", 7, null, 4), Seq(2, "G-B", 19, "al", 4),
          Seq(3, "G-C", 55, null, 3), Seq(4, "G-D", 31, "an", 3),
          Seq(5, "G-E", 77, null, 3), Seq(6, "G-F", 13, null, 2),
          Seq(7, "G-G", 21, "re", 2), Seq(8, "G-H", 2, null, 1),
          Seq(9, "G-I", 4, "ol", 1), Seq(10, "G-J", 3, null, 1)))
      val smt = Tables.part(s, sfDir).select(
          col("p_partkey").as("product_id"),
          col("p_name").as("product_name"),
          when(pmod(col("p_partkey"), lit(17)) === 0, lit(null).cast("bigint"))
            .otherwise(pmod(col("p_partkey"), lit(200))).as("category_id0"),
          pmod(col("p_partkey"), lit(100)).as("category_id3f"))
        .join(cat, coalesce(col("category_id0"), col("category_id3f"))
          === cat("category_id"))
        .select(col("product_id"), col("product_name"), col("category_id"),
          col("category_id1"), col("category_id2"), col("category_id3"),
          col("category_id4"), col("depth").as("category_depth"))
      // every attribute derives from product_id (orders repeat ids, and a
      // row picked among differing duplicates would be nondeterministic)
      val stk = Tables.orders(s, sfDir).select(
          (lit(400000) + pmod(col("o_orderkey"), lit(300))).as("product_id"))
        .distinct()
        .select(col("product_id"),
          concat(lit("STK "), pmod(col("product_id"), lit(9)))
            .as("product_name"),
          pmod(col("product_id"), lit(200)).as("category_id0"))
        .join(cat, col("category_id0") === cat("category_id"))
        .select(col("product_id"), col("product_name"), col("category_id"),
          col("category_id1"), col("category_id2"), col("category_id3"),
          col("category_id4"), col("depth").as("category_depth"))
      val prd = smt.unionByName(stk)
      // one depth rung: LEFT JOIN the depth's mapping rows, guarded on
      // no-match-yet, keyword gate = NULL or containment; COALESCE carries
      // the first (deepest) match forward
      def rung(df: DataFrame, depth: Int,
               depthGate: org.apache.spark.sql.Column) = {
        val g = grp.filter(col("mapping_depth") === depth)
          .select(col("group_id").as(s"__g$depth"),
            col("mapping_seq").as(s"__s$depth"),
            col("mapping_id"), col("mapping_keyword"))
        df.join(broadcast(g),
            col("group_id").isNull && depthGate &&
              (col(s"category_id$depth") === col("mapping_id")) &&
              (col("mapping_keyword").isNull ||
                instr(lower(col("product_name")),
                  lower(trim(col("mapping_keyword")))) > 0),
            "left")
          .withColumn("group_id",
            coalesce(col("group_id"), col(s"__g$depth")))
          .withColumn("mapping_seq",
            coalesce(col("mapping_seq"), col(s"__s$depth")))
          .drop(s"__g$depth", s"__s$depth", "mapping_id", "mapping_keyword")
      }
      val d4 = rung(prd
          .withColumn("group_id", nullStr)
          .withColumn("mapping_seq", lit(null).cast("int")),
        4, col("category_depth") === 4)
      val d3 = rung(d4, 3, col("category_depth") >= 3)
      val d2 = rung(d3, 2, col("category_depth") >= 2)
      val d1 = rung(d2, 1, lit(true))
      graft.functions.F.qualifyTopN(
        d1.filter(col("group_id").isNotNull),
        Seq(col("product_id")),
        Seq(col("mapping_seq").asc_nulls_last, col("group_id")))
        .select(col("product_id"), col("category_id"), col("group_id"))
    }))

    // ---- ranged bundle relation with a sentinel rewrite (reference:
    // intermediate/ads/searchad/relation__smt_prd_to_ranged_sbn_ids.sql:
    // 17-86): relations whose bundle contains the sentinel product split
    // into a pre range (unchanged, ends at the cutover) and a post range
    // (sentinel-only bundles expand to the 7-product list; mixed bundles
    // drop the sentinel, NULLIF-ing an emptied list); sentinel-free
    // relations keep the unbounded range.
    r.register(Model("smt_prd_ranged_relation", Nil, View, ctx => {
      val rel = Tables.part(ctx.session, sfDir).select(
        concat(lit("SMT"), col("p_partkey")).as("product_id"),
        when(pmod(col("p_partkey"), lit(7)) === 0,
            concat(lit("100081,100088")))
          .when(pmod(col("p_partkey"), lit(7)) === 1, lit("100088"))
          .otherwise(concat(
            (lit(100000) + pmod(col("p_partkey"), lit(80))).cast("string"),
            lit(","),
            (lit(100100) + pmod(col("p_partkey") * 3, lit(80)))
              .cast("string"))).as("bundle_product_ids"))
      val hasSentinel =
        exists(split(col("bundle_product_ids"), ","), _ === "100088")
      val default = rel.filter(!hasSentinel)
        .select(col("product_id"), col("bundle_product_ids"),
          lit("1990-01-01").cast("date").as("start_date"),
          lit("2999-12-31").cast("date").as("end_date"))
      val pre = rel.filter(hasSentinel)
        .select(col("product_id"), col("bundle_product_ids"),
          lit("1990-01-01").cast("date").as("start_date"),
          lit("1996-06-09").cast("date").as("end_date"))
      val post = rel.filter(hasSentinel)
        .select(col("product_id"),
          when(col("bundle_product_ids") === "100088",
            lit("100081,100082,100083,100084,100085,100086,100087"))
            .otherwise(nullif(array_join(
              filter(split(col("bundle_product_ids"), ","), _ =!= "100088"),
              ","), lit(""))).as("bundle_product_ids"),
          lit("1996-06-10").cast("date").as("start_date"),
          lit("2999-12-31").cast("date").as("end_date"))
      default.unionByName(pre).unionByName(post)
        .filter(col("start_date") <= col("end_date"))
    }))

    // ---- dable report daily (reference: intermediate/ads/dable__report_
    // daily.sql:18-95): campaign reports joined to their validity-ranged
    // bundle relation, re-aggregated per campaign-day (ANY_VALUE bundle),
    // then div/mod-exploded over bundle components with the renewal
    // mapping applied conditionally (`ON component = new AND ymd <
    // renewal_date` → the old id).
    r.register(Model("dable_report_daily", Nil, Incremental("ymd"), ctx => {
      val s = ctx.session
      val startD = lit(ctx.params("ds_start_date")).cast("date")
      val endD = lit(ctx.params("ds_end_date")).cast("date")
      val report = Tables.orders(s, sfDir).select(
        pmod(col("o_orderkey"), lit(40)).as("campaign_id"),
        (pmod(col("o_orderkey"), lit(500)) + 1).as("expose_count"),
        (pmod(col("o_orderkey") * 3, lit(300)) + 1).as("impression_count"),
        pmod(col("o_orderkey"), lit(50)).as("click_count"),
        pmod(col("o_orderkey") * 7, lit(90000)).as("ad_cost"),
        pmod(col("o_orderkey"), lit(5)).as("conv_count"),
        to_date(col("o_orderdate")).as("ymd"))
        .filter(col("ymd").between(startD, endD))
      // the dable slice of the ranged relation: campaign → bundle with a
      // validity window
      val rel = Tables.nation(s, sfDir).select(
        pmod(col("n_nationkey") * 3, lit(40)).as("campaign_id"),
        concat((lit(100000) + pmod(col("n_nationkey"), lit(50)))
            .cast("string"), lit(","),
          (lit(100050) + pmod(col("n_nationkey") * 7, lit(50)))
            .cast("string")).as("bundle_product_ids"),
        lit("1995-01-01").cast("date").as("start_date"),
        expr("date_add(DATE '1995-01-01', cast(n_nationkey * 200 AS INT))")
          .as("end_date"))
      val renewal = graft.functions.F.inlineDim(s,
        Seq("product_id_new", "product_id_old", "renewal_date_s"),
        Seq(Seq("100003", "100503", "1996-03-01"),
          Seq("100017", "100517", "1996-07-01"),
          Seq("100061", "100561", "1996-05-01")))
        .withColumn("renewal_date", col("renewal_date_s").cast("date"))
        .drop("renewal_date_s")
      val daily = report.join(rel,
          report("campaign_id") === rel("campaign_id") &&
            col("ymd").between(col("start_date"), col("end_date")), "left")
        .select(report("campaign_id"),
          coalesce(col("bundle_product_ids"), lit("200000"))
            .as("bundle_product_ids"),
          col("expose_count"), col("impression_count"), col("click_count"),
          col("ad_cost"), col("conv_count"), col("ymd"))
      val reagg = daily.groupBy(col("ymd"), col("campaign_id"))
        // ANY_VALUE is deterministic here: the relation has exactly one row
        // per campaign (3k mod 40 is injective for the 25 nation keys), so
        // every row in a (ymd, campaign) group carries the same bundle
        .agg(first(col("bundle_product_ids")).as("bundle_product_ids"),
          sum(col("expose_count")).as("expose_count"),
          sum(col("impression_count")).as("impression_count"),
          sum(col("click_count")).as("click_count"),
          sum(col("ad_cost")).as("ad_cost"),
          sum(col("conv_count")).as("conv_count"))
      val exploded = reagg.select(col("campaign_id"), col("ymd"),
          col("expose_count"), col("impression_count"), col("click_count"),
          col("ad_cost"), col("conv_count"),
          size(split(col("bundle_product_ids"), ","))
            .cast("long").as("bundle_product_count"),
          posexplode(split(col("bundle_product_ids"), ","))
            .as(Seq("bundle_product_offset", "component")))
        .join(broadcast(renewal),
          col("component") === col("product_id_new") &&
            col("ymd") < col("renewal_date"), "left")
        .withColumn("product_id",
          coalesce(col("product_id_old"), col("component")))
      def divmod(c: String) =
        graft.operators.Allocation.divModAllocate(col(c),
          col("bundle_product_count"), col("bundle_product_offset")).as(c)
      exploded.select(col("campaign_id"), col("product_id"),
        divmod("expose_count"), divmod("impression_count"),
        divmod("click_count"), divmod("ad_cost"), divmod("conv_count"),
        col("ymd"))
    }))

    // ---- cj invoice (reference: intermediate/delivery/cj__invoice.sql:
    // 18-51): the invoice-grain sibling of cj_invoice_order — both carrier
    // feeds aggregated per (invoice, order) first, then rolled up to the
    // invoice grain (keeping the 'none' order sentinel rows, unlike the
    // order-grain model which drops them).
    r.register(Model("cj_invoice", Nil, View, ctx => {
      cjInvoice(ctx.session, sfDir,
        lit(ctx.params("ds_start_date")).cast("date"),
        lit(ctx.params("ds_end_date")).cast("date"))
    }))
  }

  /** Both CJ carrier feeds pre-aggregated to (invoice, order) grain —
    * shared by the cj models and the sabangnet sales mart (which invokes
    * them with ±7-day-widened bounds, reference sabangnet__sales_daily
    * .sql:294-303).
    */
  private[models] def cjPerInvoiceOrder(s: SparkSession, sfDir: String,
      start: org.apache.spark.sql.Column,
      end: org.apache.spark.sql.Column): DataFrame = {
    val o = Tables.orders(s, sfDir)
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
  }

  /** cj__invoice: invoice grain, 'none' order rows kept. */
  private[models] def cjInvoice(s: SparkSession, sfDir: String,
      start: org.apache.spark.sql.Column,
      end: org.apache.spark.sql.Column): DataFrame =
    cjInvoiceGrain(cjPerInvoiceOrder(s, sfDir, start, end))

  /** cj__invoice_order: order grain, sentinel rows dropped. */
  private[models] def cjInvoiceOrder(s: SparkSession, sfDir: String,
      start: org.apache.spark.sql.Column,
      end: org.apache.spark.sql.Column): DataFrame =
    cjOrderGrain(cjPerInvoiceOrder(s, sfDir, start, end))

  private def cjInvoiceGrain(base: DataFrame): DataFrame =
    base.groupBy(col("invoice_no"))
      .agg(sum(col("delivery_fee")).as("delivery_fee"),
        sum(col("box_cost")).as("box_cost"))

  private def cjOrderGrain(base: DataFrame): DataFrame =
    base.filter(col("order_id") =!= "none")
      .groupBy(col("order_id"))
      .agg(sum(col("delivery_fee")).as("delivery_fee"),
        sum(col("box_cost")).as("box_cost"))

  /** Both CJ fallback grains over ONE persisted (invoice, order)-grain
    * base — for the sales marts, which consume the pair in the same
    * plan: unshared, each grain re-scanned and re-aggregated both
    * carrier feeds (column pruning de-canonicalizes the copies, so
    * ReuseExchange never fires — r14 plan audit: the q128/q239 plans
    * carried the 4-exchange CJ subtree TWICE). The base is the
    * per-(invoice, order) aggregate — already the compacted grain, so
    * the persist is bounded by invoice count, not feed rows.
    */
  private[models] def cjFallbackPair(s: SparkSession, sfDir: String,
      start: org.apache.spark.sql.Column,
      end: org.apache.spark.sql.Column,
      track: DataFrame => DataFrame = identity): (DataFrame, DataFrame) = {
    // callers inside a model build pass ctx.track so the run releases
    // this persist with the rest of its cache (round-15 directive 3)
    val base = track(cjPerInvoiceOrder(s, sfDir, start, end).persist())
    (cjInvoiceGrain(base), cjOrderGrain(base))
  }
}
