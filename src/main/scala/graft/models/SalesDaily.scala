package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The coupang rocket sales-daily mart (reference: intermediate/sales/
  * coupang_rfm/coupang_rfm__sales_daily.sql:20-260) — the reference's
  * second-largest sales model, built around four patterns the registry
  * didn't yet hold together:
  *
  *  - a FULL OUTER merge of the sales and shipping feeds on (order,
  *    option) with COALESCEd keys — shipping-only orders become status 7
  *    ('배송'), sales statuses clamp with LEAST(status, 3);
  *  - a tiered delivery-cost dim built by window: each tier's upper bound
  *    is the NEXT tier's `min_unit` (LEAD over the group), the top tier
  *    capped by the 9999 sentinel, then a BETWEEN band join on computed
  *    units (sku_quantity × per-product unit scale);
  *  - per-(order, option) delivery extra attached as `MAX(extra_cost)
  *    OVER` — the band join may multiply rows, the window dedups the fee;
  *  - a SIMULTANEOUS 3-metric cost-weighted split (payment / supply /
  *    delivery) with ROUND + remainder-to-first-row repair, zero-cost
  *    groups (the status-6 giveaway rule) splitting to 0 with the first
  *    row absorbing the total — `Allocation.weightedAllocate` × 3 over
  *    one window partitioning.
  */
object SalesDaily {

  private val nullStr = lit(null).cast("string")

  def install(r: ModelRegistry, sfDir: String): Unit = {

    r.register(Model("coupang_sales_daily", Nil, Incremental("order_date"),
      ctx => {
        val s = ctx.session
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")
        val weekStart = date_sub(startD, (dayofweek(startD) + lit(5)) % 7)
        val weekEnd = date_add(
          date_sub(endD, (dayofweek(endD) + lit(5)) % 7), 6)

        // tiered delivery groups: raw min_unit NULL on the base tier (the
        // COALESCE(min_unit, 1) rule), upper bound = LEAD(min_unit) with
        // NULLS FIRST (BigQuery's ASC default — DuckDB needs it spelled),
        // top tier capped at 9999
        val dlvRaw = graft.functions.F.inlineDim(s,
          Seq("delivery_group", "min_unit_raw", "coolant_cost", "label_cost",
            "wrap_cost", "box_cost"),
          Seq(
            Seq("G0", 10, 300, 200, 50, 400),
            Seq("G0", null, 500, null, 100, 300),
            Seq("G0", 50, 700, 100, null, null),
            Seq("G1", 20, 300, 300, null, null),
            Seq("G1", null, null, null, null, 1000),
            Seq("G2", 5, null, null, 250, 250)))
        val wg = Window.partitionBy(col("delivery_group"))
        val dlv = dlvRaw.select(col("delivery_group"),
          coalesce(col("min_unit_raw"), lit(1)).as("min_unit"),
          when(max(col("min_unit_raw")).over(wg) === col("min_unit_raw"),
            lit(9999))
            .otherwise(lead(col("min_unit_raw"), 1).over(
              wg.orderBy(col("min_unit_raw").asc_nulls_first)))
            .as("max_unit"),
          (coalesce(col("coolant_cost"), lit(0))
            + coalesce(col("label_cost"), lit(0))
            + coalesce(col("wrap_cost"), lit(0))
            + coalesce(col("box_cost"), lit(0))).as("extra_cost"))

        // ecount product sheet: option-keyed with duplicate options —
        // earliest expiration wins, largest product_code breaks ties
        val eco = graft.functions.F.qualifyTopN(
          Tables.part(s, sfDir).select(
            concat((lit(200000) + pmod(col("p_partkey"), lit(400)))
              .cast("string"), lit("-0001")).as("option_id"),
            expr("date_add(DATE '1995-01-01', cast(p_partkey % 50 AS INT))")
              .as("expiration_date"),
            col("p_partkey").as("product_code"),
            expr("cast(floor(p_retailprice) AS BIGINT) * 2 div 3")
              .as("org_price")),
          Seq(col("option_id")),
          Seq(col("expiration_date").asc, col("product_code").desc))
          .select(split(col("option_id"), "-").getItem(0).as("product_id"),
            col("org_price"))

        // core item sheet slice: org_price / extra_cost / delivery_group,
        // all nullable (the triple COALESCE fallback's reason to exist)
        val itm = Tables.part(s, sfDir).select(
            (lit(200000) + pmod(col("p_partkey"), lit(400))).cast("string")
              .as("product_id"),
            when(pmod(col("p_partkey"), lit(6)) === 0,
              lit(null).cast("bigint"))
              .otherwise(expr("cast(floor(p_retailprice) AS BIGINT)"))
              .as("org_price"),
            when(pmod(col("p_partkey"), lit(4)) === 0,
              lit(null).cast("bigint"))
              .otherwise(pmod(col("p_partkey"), lit(200))).as("extra_cost"),
            when(pmod(col("p_partkey"), lit(5)) === 0, nullStr)
              .otherwise(concat(lit("G"), pmod(col("p_partkey"), lit(3))))
              .as("delivery_group"),
            col("p_partkey").as("__seq"))
        val itmD = graft.functions.F.qualifyTopN(itm,
          Seq(col("product_id")), Seq(col("__seq"))).drop("__seq")

        val unitDim = graft.functions.F.inlineDim(s,
          Seq("product_id", "unit"),
          Seq(Seq("200036", 100), Seq("200119", 100), Seq("200222", 100)))

        val salesRaw = Tables.lineitem(s, sfDir).select(
            concat(lit("CO"), col("l_orderkey")).as("order_id"),
            concat(lit("CP"), col("l_partkey"), lit("-"),
              pmod(col("l_linenumber"), lit(3))).as("option_id"),
            pmod(col("l_partkey"), lit(20)).as("vendor_id"),
            element_at(array(lit(0), lit(1), lit(3), lit(6)),
              (pmod(col("l_orderkey") + col("l_partkey"), lit(4)) + 1)
                .cast("int")).as("settlement_type"),
            col("l_quantity").cast("long").as("order_quantity"),
            when(pmod(col("l_suppkey"), lit(11)) === 0,
              lit(null).cast("long"))
              .otherwise(expr("cast(floor(l_extendedprice / 100) AS BIGINT)"))
              .as("unit_price"),
            (pmod(col("l_orderkey"), lit(7)) * 3).as("coupang_discount"),
            pmod(col("l_suppkey"), lit(11)).as("seller_discount"),
            expr("cast(floor(l_extendedprice) AS BIGINT) * 4 div 5")
              .as("settlement_amount"),
            to_date(col("l_shipdate")).as("sales_date"))
          .filter(col("sales_date").between(weekStart, weekEnd))
        val sales = salesRaw
          .groupBy(col("order_id"), col("option_id"))
          .agg(max(col("vendor_id")).as("vendor_id"),
            max(col("settlement_type")).as("order_status"),
            sum(col("order_quantity")).as("order_quantity"),
            sum(coalesce(col("unit_price"), lit(0L))
              * coalesce(col("order_quantity"), lit(0L))
              - coalesce(col("coupang_discount"), lit(0L))
              - coalesce(col("seller_discount"), lit(0L)))
              .as("sales_amount"),
            sum(col("settlement_amount")).as("settlement_amount"),
            max(col("sales_date")).as("sales_date"))

        val shipRaw = Tables.lineitem(s, sfDir)
          .filter(pmod(col("l_orderkey") + col("l_linenumber"), lit(3)) === 0)
          .select(
            concat(lit("CO"), col("l_orderkey")).as("order_id"),
            concat(lit("CP"), col("l_partkey"), lit("-"),
              pmod(col("l_linenumber"), lit(3))).as("option_id"),
            pmod(col("l_partkey"), lit(20)).as("vendor_id"),
            when(pmod(col("l_suppkey"), lit(13)) === 0,
              lit(null).cast("long"))
              .otherwise(pmod(col("l_suppkey") * 3, lit(500)))
              .as("warehousing_fee"),
            pmod(col("l_suppkey"), lit(100)).as("discount_amount"),
            when(pmod(col("l_orderkey"), lit(17)) === 0,
              lit(null).cast("long"))
              .otherwise(pmod(col("l_orderkey"), lit(50))).as("extra_fee"),
            to_date(col("l_shipdate")).as("sales_date"))
          .filter(col("sales_date").between(weekStart, weekEnd))
        val shipping = shipRaw
          .groupBy(col("order_id"), col("option_id"))
          .agg(max(col("vendor_id")).as("vendor_id"),
            sum(coalesce(col("warehousing_fee"), lit(0L))
              - coalesce(col("discount_amount"), lit(0L))
              + coalesce(col("extra_fee"), lit(0L))).as("delivery_fee"),
            max(col("sales_date")).as("sales_date"))

        // FULL OUTER merge: shipping-only orders surface as status 7, sales
        // statuses clamp at 3 (LEAST); keys COALESCE across sides
        val sl = sales.alias("sl")
        val sh = shipping.alias("sh")
        val merged = sl.join(sh,
            col("sl.order_id") === col("sh.order_id") &&
              col("sl.option_id") === col("sh.option_id"), "full_outer")
          .select(
            coalesce(col("sl.order_id"), col("sh.order_id")).as("order_id"),
            coalesce(col("sl.option_id"), col("sh.option_id"))
              .as("option_id"),
            coalesce(col("sl.vendor_id"), col("sh.vendor_id"))
              .as("vendor_id"),
            col("sl.order_status").as("sales_status"),
            col("sl.order_quantity").as("order_quantity"),
            col("sl.sales_amount").as("sales_amount"),
            col("sl.settlement_amount").as("settlement_amount"),
            col("sh.delivery_fee").as("delivery_fee"),
            coalesce(col("sl.sales_date"), col("sh.sales_date"))
              .as("sales_date"))
          .groupBy(col("sales_date"), col("order_id"), col("option_id"))
          .agg(max(col("vendor_id")).as("vendor_id"),
            when(max(col("sales_status")).isNull, lit(7))
              .otherwise(least(max(col("sales_status")), lit(3)))
              .as("order_status"),
            sum(coalesce(col("order_quantity"), lit(0L)))
              .as("order_quantity"),
            sum(coalesce(col("sales_amount"), lit(0L))).as("sales_amount"),
            sum(coalesce(col("settlement_amount"), lit(0L)))
              .as("settlement_amount"),
            sum(coalesce(col("delivery_fee"), lit(0L))).as("delivery_fee"))

        // relation: 2-component bundles (distinct id ranges so the split
        // has real multi-row groups), 9-prefixed singles for %9 options.
        // The option universe comes from the raw lineitem scan, NOT from
        // `merged` — every lineitem row feeds the sales side, so the sets
        // are identical, and re-deriving from `merged` would recompute the
        // whole FULL OUTER subtree a second time
        val rel = Tables.lineitem(s, sfDir)
          .select(concat(lit("CP"), col("l_partkey"), lit("-"),
            pmod(col("l_linenumber"), lit(3))).as("option_id")).distinct()
          .withColumn("__p", expr(
            "cast(regexp_extract(option_id, 'CP([0-9]+)-', 1) AS BIGINT)"))
          .filter(pmod(col("__p"), lit(3)) === 0)
          .select(col("option_id"),
            when(pmod(col("__p"), lit(9)) === 0,
              concat((lit(900000) + pmod(col("__p") * 11, lit(200)))
                .cast("string"), lit(":1")))
              .otherwise(concat(
                (lit(200000) + pmod(col("__p") * 11 + 3, lit(400)))
                  .cast("string"), lit(":1,"),
                (lit(210000) + pmod(col("__p") * 7, lit(300)))
                  .cast("string"), lit(":2")))
              .as("bundle_product_ids"))
        val vdr = graft.functions.F.inlineDim(s,
          Seq("vendor_id", "bundle_brand_ids"),
          (0 until 20).map(i => Seq(i,
            if (i % 4 == 0) null else s"2005${"%02d".format(i)}")))
          .withColumn("vendor_id", col("vendor_id").cast("bigint"))

        val bundled = merged
          .join(rel, Seq("option_id"), "left")
          .join(broadcast(vdr), Seq("vendor_id"), "left")
          .filter(col("sales_date").between(startD, endD) &&
            !(col("order_quantity") === 0 && col("delivery_fee") === 0))
          .select(col("order_id"), col("option_id"),
            coalesce(col("bundle_product_ids"), col("bundle_brand_ids"),
              lit("200000")).as("bundle_product_ids"),
            col("order_status"), col("order_quantity"),
            col("sales_amount").as("payment_amount"),
            col("settlement_amount").as("supply_amount"),
            col("delivery_fee"),
            col("sales_date").as("order_date"))

        val exploded = bundled
          .select(col("order_id"), col("option_id"), col("order_status"),
            col("order_quantity"), col("payment_amount"),
            col("supply_amount"), col("delivery_fee"), col("order_date"),
            explode(split(col("bundle_product_ids"), ",")).as("component"))
          .select(col("*"),
            split(col("component"), ":").getItem(0).as("product_id"),
            (coalesce(expr("try_cast(get(split(component, ':'), 1) AS BIGINT)"),
              lit(1L)) * col("order_quantity")).as("sku_quantity"))
          .withColumn("order_status",
            when(col("order_status") === 0 &&
              substring(col("component"), 1, 1) === "9", lit(6))
              .otherwise(col("order_status")))
          .join(eco.withColumnRenamed("org_price", "eco_org"),
            Seq("product_id"), "left")
          .join(itmD.withColumnRenamed("org_price", "itm_org"),
            Seq("product_id"), "left")
          .withColumn("org_price",
            coalesce(col("eco_org"), col("itm_org"), lit(0L))
              + coalesce(col("extra_cost"), lit(0L)))

        val wOO = Window.partitionBy(col("order_id"), col("option_id"))
        val withExtra = exploded
          .join(broadcast(unitDim), Seq("product_id"), "left")
          .join(broadcast(dlv),
            exploded("delivery_group") === dlv("delivery_group") &&
              (col("sku_quantity") * coalesce(col("unit"), lit(1)))
                .between(col("min_unit"), col("max_unit")), "left")
          .select(col("order_id"), col("option_id"), col("product_id"),
            col("order_status"), col("sku_quantity"), col("payment_amount"),
            col("supply_amount"),
            (col("org_price") * col("sku_quantity")).as("supply_cost"),
            col("delivery_fee"), col("order_date"), col("component"),
            dlv("extra_cost").as("band_extra_cost"),
            when(col("order_status") === 6, lit(0L))
              .otherwise(col("org_price") * col("sku_quantity"))
              .as("cost_amount"))
          .withColumn("delivery_fee",
            coalesce(max(col("band_extra_cost")).over(wOO), lit(0L))
              + col("delivery_fee"))
          .withColumn("bundle_product_count", count(lit(1)).over(wOO))
          .drop("band_extra_cost")

        val part = Seq(col("order_id"), col("option_id"))
        val ord = Seq(col("product_id"), col("component"))
        // ONE allocation pass over every row — the reference's
        // single/multi branch split is a plan-level no-op (the q128
        // collapse, r4-audited there): a 1-row group's weighted share of
        // its own total IS the row's amount, zero-weight groups included
        // (the first row absorbs the full total). The split form planned
        // the whole FULL-OUTER-merge subtree TWICE (r14 plan audit: two
        // SortMergeJoin FullOuter nodes, 20 inlined scans) because the
        // two filtered branches de-canonicalize and defeat ReuseExchange.
        val allocated = Seq("payment_amount", "supply_amount",
          "delivery_fee")
          .foldLeft(withExtra.drop("bundle_product_count")) { (df, m) =>
            graft.operators.Allocation.weightedAllocate(df, part, ord,
              col(m), col("cost_amount"), s"__${m}_split", scale = 0)
          }
          .select(col("order_id"), col("product_id"), col("order_status"),
            col("sku_quantity"),
            col("__payment_amount_split").cast("long").as("payment_amount"),
            col("__supply_amount_split").cast("long").as("supply_amount"),
            col("supply_cost"),
            col("__delivery_fee_split").cast("long").as("delivery_fee"),
            col("order_date"))

        allocated
          .groupBy(col("order_date"), col("product_id"), col("order_status"))
          .agg(sum(col("sku_quantity")).as("sku_quantity"),
            sum(col("payment_amount")).as("payment_amount"),
            sum(col("supply_amount")).as("supply_amount"),
            sum(col("supply_cost")).as("supply_cost"),
            sum(col("delivery_fee")).as("delivery_fee"))
      }))

    // ---- naver shopping stock-delta sales (reference: intermediate/
    // benchmark/naver_shp/naver_shp__stock_sales.sql:20-180): sales are
    // INFERRED from daily stock snapshots — LEAD(stock) per (product,
    // option) gives the next snapshot, consumption = stock - next, valid
    // only for consecutive days; products with option-level snapshots on a
    // day are excluded from the product-level path (NOT EXISTS); a ±window
    // self-join (28 days back, 7 forward) computes per-day quartiles of
    // nonzero consumption, and a tiered fence removes stock-correction
    // spikes (count<100 always passes; thin history → fixed caps; full
    // history → Q3 + 5·IQR, floored at 100).
    r.register(Model("nsh_stock_sales", Nil, Incremental("payment_date"),
      ctx => {
        val s = ctx.session
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")
        val winLo = date_sub(startD, 28)
        val winHi = date_add(endD, 8)
        val li = Tables.lineitem(s, sfDir).select(
          pmod(col("l_partkey"), lit(120)).as("product_id"),
          to_date(col("l_shipdate")).as("payment_date"),
          pmod(col("l_orderkey") * 13 + col("l_linenumber"), lit(86400))
            .as("created_sec"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("src_seq"),
          when(pmod(col("l_orderkey"), lit(19)) === 0, lit(0L))
            .otherwise((pmod(col("l_partkey"), lit(50)) + 1) * 100
              + pmod(col("l_orderkey"), lit(7))).as("sales_price"),
          (lit(5000) - pmod(col("l_orderkey") * 7 + col("l_partkey") * 3,
            lit(4000))).as("stock_quantity"),
          col("l_partkey"), col("l_suppkey"), col("l_orderkey"))
          .filter(col("payment_date").between(winLo, winHi))
        // first snapshot of each day wins (reference ORDER BY created_at).
        // (l_orderkey, l_linenumber) duplicates exist, so created_sec +
        // src_seq can tie for rows that differ in partkey/suppkey-derived
        // content — those columns join the order to make it total
        val baseStock = graft.functions.F.qualifyTopN(li,
          Seq(col("product_id"), col("payment_date")),
          Seq(col("created_sec"), col("src_seq"), col("l_partkey"),
            col("l_suppkey")))
          .select(col("product_id"), col("sales_price"),
            col("stock_quantity"), col("payment_date"))
        val detail = graft.functions.F.qualifyTopN(
          li.filter(pmod(col("l_partkey"), lit(3)) =!= 0)
            .select(col("product_id"),
              (col("product_id") * 10 + pmod(col("l_suppkey"), lit(2)))
                .as("option_id"),
              when(pmod(col("l_suppkey"), lit(7)) === 0,
                lit(null).cast("long"))
                .otherwise(pmod(col("l_suppkey"), lit(30)) * 10)
                .as("option_price"),
              (lit(4000) - pmod(col("l_orderkey") * 11 + col("l_suppkey"),
                lit(3500))).as("stock_quantity"),
              col("payment_date"), col("created_sec"), col("src_seq"),
              col("l_suppkey")),
          Seq(col("product_id"), col("option_id"), col("payment_date")),
          Seq(col("created_sec"), col("src_seq"), col("l_suppkey"),
            col("stock_quantity")))
          .select(col("product_id"), col("option_id"),
            coalesce(col("option_price"), lit(0L)).as("option_price"),
            col("stock_quantity"), col("payment_date"))
        val wOpt = Window.partitionBy(col("product_id"), col("option_id"))
          .orderBy(col("payment_date"))
        val optionStock = detail
          .join(baseStock.select(col("product_id"), col("payment_date"),
            col("sales_price").as("base_price")),
            Seq("product_id", "payment_date"), "left")
          .select(col("product_id"), col("option_id"),
            (col("base_price") + col("option_price")).as("sales_price"),
            col("stock_quantity"),
            lead(col("stock_quantity"), 1).over(wOpt)
              .as("next_stock_quantity"),
            col("payment_date"),
            lead(col("payment_date"), 1).over(wOpt).as("next_payment_date"))
        val wPrd = Window.partitionBy(col("product_id"))
          .orderBy(col("payment_date"))
        val productStock = baseStock
          .join(detail.select(col("product_id"), col("payment_date"))
            .distinct(),
            Seq("product_id", "payment_date"), "left_anti")
          .select(col("product_id"), col("product_id").as("option_id"),
            col("sales_price"), col("stock_quantity"),
            lead(col("stock_quantity"), 1).over(wPrd)
              .as("next_stock_quantity"),
            col("payment_date"),
            lead(col("payment_date"), 1).over(wPrd).as("next_payment_date"))
        // THREE consumers below (the window self-join's cur side, its
        // prev side, and the final fence join-back) — without a persist
        // the full upstream (two qualifyTopN windows + two lead windows
        // + the option/product split join) is recomputed per consumer
        // (round-15: same multiply-consumed-frame rule as r14's G4;
        // run-scoped, released via ctx.track)
        val totalStock = ctx.track(productStock.unionByName(optionStock)
          .filter(col("sales_price") > 0 &&
            col("stock_quantity") >= col("next_stock_quantity") &&
            col("stock_quantity") - col("next_stock_quantity") < 10000 &&
            col("payment_date") === date_sub(col("next_payment_date"), 1))
          .select(col("product_id"), col("option_id"), col("sales_price"),
            (col("stock_quantity") - col("next_stock_quantity"))
              .as("payment_count"),
            ((col("stock_quantity") - col("next_stock_quantity"))
              * col("sales_price")).as("payment_amount"),
            col("payment_date"))
          .persist())
        // ±window self-join (28 back, 7 forward, same key, not same day)
        val cur = totalStock.alias("cur")
        val prev = totalStock.select(col("product_id"), col("option_id"),
          col("payment_date").as("prev_date"),
          col("payment_count").as("prev_count"))
        val stats = cur.join(prev,
            col("cur.product_id") === prev("product_id") &&
              col("cur.option_id") === prev("option_id") &&
              col("prev_date") >= date_sub(col("cur.payment_date"), 28) &&
              col("prev_date") =!= col("cur.payment_date") &&
              col("prev_date") <= date_add(col("cur.payment_date"), 7),
            "left")
          .groupBy(col("cur.payment_date").as("payment_date"),
            col("cur.product_id").as("product_id"),
            col("cur.option_id").as("option_id"))
          .agg(count(nullif(col("prev_count"), lit(0L)))
              .as("effective_days_in"),
            expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY " +
              "CAST(nullif(prev_count, 0) AS DOUBLE))").as("q1"),
            expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY " +
              "CAST(nullif(prev_count, 0) AS DOUBLE))").as("q2"),
            expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY " +
              "CAST(nullif(prev_count, 0) AS DOUBLE))").as("q3"))
        // the fence thresholds ROUND through a DECIMAL(38,10) snapshot so
        // half-ties replay identically in the oracle
        def snapRound(c: org.apache.spark.sql.Column) =
          round(c.cast("decimal(38,10)"), 0).cast("long")
        totalStock
          .join(stats, Seq("payment_date", "product_id", "option_id"))
          .filter(col("payment_date").between(startD, endD) &&
            when(col("payment_count") < 100, lit(true))
              .when(col("effective_days_in") < 3, col("payment_count") < 1000)
              .when(col("effective_days_in") < 7, col("payment_count") <
                greatest(snapRound(col("q2") * 10), lit(100L)))
              .otherwise(col("payment_count") <
                greatest(snapRound(col("q3")
                  + (col("q3") - col("q1")) * 5), lit(100L))))
          .select(col("product_id"), col("option_id"), col("sales_price"),
            col("payment_count"), col("payment_amount"), col("payment_date"))
      }))
  }
}
