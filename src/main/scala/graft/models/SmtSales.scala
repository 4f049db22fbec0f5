package graft.models

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The smartstore sales-daily mart (reference: intermediate/sales/
  * smartstore/smartstore__sales_daily.sql:16-396) — the third and last of
  * the reference's big sales-daily siblings (coupang = q125, sabangnet =
  * q128). Shares the order/status/bundle fixture universe with
  * [[OrderCounts]]'s smartstore_order_count (same source in the
  * reference) and adds the mart's money pipeline:
  *
  *  - payment = (unit_price + option_price) × quantity − seller_discount,
  *    supply from the channel's own settlement column (sql:103-108);
  *  - bundle explosion over the resolved bundle string — smartstore has
  *    NO non-bundle branch: the fallback chain ends at the '200000'
  *    sentinel, so every row explodes (sql:95-100,160);
  *  - '9'-prefixed components downgrade OPEN orders to status 6, whose
  *    cost_amount is zeroed before any allocation (sql:146-151);
  *  - cost attach: ecount price sheet at PRODUCT grain (only '-0001'
  *    options carry the sheet row, earliest expiration wins, sql:37-46)
  *    → core item default + extra cost;
  *  - allocation 1: payment AND supply split by cost weight over
  *    product_order_id, remainder to the first product (sql:176-228);
  *  - CJ delivery fallback chain, both CJ models ±7 days (sql:243-263);
  *    id-space adaptation: the carrier fixture records channel orders as
  *    'ORD<key>', so the reference's CAST(order_id AS STRING) join key
  *    becomes concat('ORD', order_id) here;
  *  - order-level fee resolution per (order, invoice, delivery_group)
  *    with the tier-band rule — including the n_arrival branch the
  *    sabangnet sibling never exercises: delivery_type 7 prices as
  *    n_arrival_fee + n_arrival_add × (qty − min_unit) (sql:272-296);
  *    largest ABSOLUTE fee wins per (order, invoice) (sql:298);
  *  - allocation 2: the resolved fee split by cost weight over
  *    (order, invoice) (sql:320-360);
  *  - daily aggregate by (order_date, product_id, delivery_type,
  *    order_status) (sql:366-383).
  *
  * Plan shape (the SbnSales discipline): one hash exchange on
  * product_order_id carries steps 1-3 (every window partitions on a
  * superset), the (order, invoice) stages re-key once, every dim join
  * broadcasts, and the reference's aggregate-and-join-back fee resolution
  * is a window + greatest-ladder at row grain — no self-join, one linear
  * pipeline. The single/multi allocation branches collapse into one pass:
  * a 1-row group's weighted share of its own total is exactly the row's
  * original amount.
  */
object SmtSales {

  private val nullStr = lit(null).cast("string")
  private val nullLong = lit(null).cast("bigint")

  def install(r: ModelRegistry, sfDir: String): Unit = {

    r.register(Model("smartstore_sales_daily", Nil,
      Incremental("order_date"), ctx => {
        val s = ctx.session
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")

        // core delivery_group source — the smartstore model is the one
        // consumer of the n_arrival columns (the sabangnet macro ignores
        // them). Bands derived in Scala exactly like SbnSales: inclusive
        // [min_unit, max_unit], largest raw min takes the 9999 sentinel.
        val dlvLit: Seq[(String, Option[Int], Int, Int, Int, Int)] = Seq(
          ("G0", Some(10), 3000, 300 + 200 + 50 + 400, 2500, 100),
          ("G0", None, 2500, 500 + 0 + 100 + 300, 3000, 150),
          ("G0", Some(50), 3500, 700 + 100 + 0 + 0, 2000, 120),
          ("G1", Some(20), 4000, 300 + 300 + 0 + 0, 4500, 200),
          ("G1", None, 2000, 0 + 0 + 0 + 1000, 1800, 80),
          ("G2", Some(5), 5000, 0 + 0 + 250 + 250, 5200, 260))
        val tierBands: Seq[(String, Int, Int, Int, Int, Int, Int)] =
          dlvLit.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
            val sorted = rows.sortBy(_._2.getOrElse(Int.MinValue))
            val maxRaw = rows.flatMap(_._2).max
            sorted.zipWithIndex.map {
              case ((_, raw, fee, extra, nFee, nAdd), i) =>
                val lo = raw.getOrElse(1)
                val hi = if (raw.contains(maxRaw)) 9999
                         else sorted(i + 1)._2.get
                (g, lo, hi, fee, extra, nFee, nAdd)
            }
          }

        // ecount price sheet at PRODUCT grain: only '-0001' options carry
        // a row; earliest expiration, then highest product_code, wins
        val eco = graft.functions.F.qualifyTopN(
          Tables.part(s, sfDir).select(
            concat((lit(200000) + pmod(col("p_partkey") * 7 + 3, lit(500)))
              .cast("string"), lit("-"),
              lpad((pmod(col("p_partkey"), lit(4)) + 1).cast("string"),
                4, "0")).as("option_id"),
            expr("date_add(DATE '1995-01-01', cast(p_partkey % 50 AS INT))")
              .as("expiration_date"),
            col("p_partkey").as("product_code"),
            expr("cast(floor(p_retailprice) AS BIGINT) * 2 div 3")
              .as("org_price"))
            .filter(substring(col("option_id"), -5, 5) === "-0001"),
          Seq(col("option_id")),
          Seq(col("expiration_date").asc, col("product_code").desc))
          .select(split(col("option_id"), "-").getItem(0).as("product_id"),
            col("org_price").as("eco_org"))

        // core item slice — same source rows as the sabangnet sibling
        val itm = graft.functions.F.qualifyTopN(
          Tables.part(s, sfDir).select(
            (lit(200000) + pmod(col("p_partkey") * 7 + 3, lit(500)))
              .cast("string").as("product_id"),
            when(pmod(col("p_partkey"), lit(6)) === 0, nullLong)
              .otherwise(expr("cast(floor(p_retailprice) AS BIGINT)"))
              .as("itm_org"),
            when(pmod(col("p_partkey"), lit(4)) === 0, nullLong)
              .otherwise(pmod(col("p_partkey"), lit(200))).as("extra_cost"),
            when(pmod(col("p_partkey"), lit(5)) === 0, nullStr)
              .otherwise(concat(lit("G"), pmod(col("p_partkey"), lit(3))))
              .as("delivery_group"),
            when(pmod(col("p_partkey"), lit(7)) === 0, nullLong)
              .otherwise(pmod(col("p_partkey"), lit(3)) * 1500)
              .as("itm_delivery_fee"),
            col("p_partkey").as("__seq")),
          Seq(col("product_id")), Seq(col("__seq"))).drop("__seq")

        val unitDim = graft.functions.F.inlineDim(s,
          Seq("product_id", "unit"),
          Seq(Seq("200036", 100), Seq("200119", 100), Seq("200222", 100)))

        // order_detail + order_delivery + order_status, one source frame
        // (OrderCounts.smartstore_order_count's fixture extended with the
        // money columns; invoice_no is constant per product_order, so the
        // reference's ANY_VALUE roll-up is the expression itself)
        val ordRaw = Tables.lineitem(s, sfDir)
          .join(Tables.orders(s, sfDir).select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("order_date").between(startD, endD))
          .select(col("l_orderkey").as("order_id"),
            (col("l_orderkey") * 10 + col("l_linenumber"))
              .as("product_order_id"),
            pmod(col("l_suppkey"), lit(7)).as("channel_seq"),
            concat((lit(200000) + pmod(col("l_partkey") * 7 + 3, lit(500)))
                .cast("string"), lit("-"),
              lpad((pmod(col("l_linenumber"), lit(4)) + 1).cast("string"),
                4, "0")).as("option_id"),
            when(pmod(col("l_orderkey"), lit(9)) === 0, lit(7))
              .otherwise(pmod(col("l_orderkey"), lit(3)).cast("int"))
              .as("delivery_type_raw"),
            coalesce(when(pmod(col("l_orderkey"), lit(13)) === 0, nullLong)
              .otherwise(col("l_quantity").cast("long")), lit(0L))
              .as("order_quantity"),
            when(pmod(col("l_orderkey"), lit(23)) === 0, nullLong)
              .otherwise(expr("cast(floor(l_extendedprice / 10) AS BIGINT)"))
              .as("unit_price"),
            when(pmod(col("l_orderkey"), lit(11)) === 0, nullLong)
              .otherwise(pmod(col("l_partkey"), lit(900))).as("option_price"),
            when(pmod(col("l_orderkey"), lit(7)) === 0,
              expr("cast(floor(l_extendedprice / 100) AS BIGINT)"))
              .otherwise(nullLong).as("seller_discount_amount"),
            coalesce(when(pmod(col("l_orderkey"), lit(19)) === 0, nullLong)
              .otherwise(expr(
                "cast(floor(l_extendedprice / 12) AS BIGINT)")), lit(0L))
              .as("supply_amount"),
            when(pmod(col("l_orderkey"), lit(2)) === 0,
              concat(lit("LP"), col("l_orderkey")))
              .when(pmod(col("l_orderkey"), lit(3)) === 0,
                concat(lit("EF"), col("l_orderkey")))
              .otherwise(nullStr).as("invoice_no_raw"),
            element_at(array(lit(0), lit(5), lit(6), lit(7), lit(8)),
              (pmod(col("l_partkey") + col("l_orderkey"), lit(5)) + 1)
                .cast("int")).as("__smt_status_raw"),
            col("order_date"))
          // TWO consumers (bundled below and the rel bundle derivation) —
          // without a persist the lineitem⋈orders join + the full
          // 14-expression staging ladder run twice (round-15: orders
          // scanned 5x in the q239 plan; run-scoped, ctx.track-released)
          .persist()
        ctx.track(ordRaw)

        // bundle relation + channel dim (the order-count fixture's)
        val relPid = expr("try_cast(split(option_id, '-')[0] AS BIGINT)")
        val rel = ordRaw.select(col("option_id")).distinct()
          .withColumn("__p", relPid)
          .select(col("option_id"),
            when(pmod(col("__p"), lit(5)) === 0,
              concat((lit(100000) + pmod(col("__p"), lit(300)))
                  .cast("string"), lit(":1,"),
                (lit(900000) + pmod(col("__p") * 3, lit(300)))
                  .cast("string"), lit(":1")))
              .when(pmod(col("__p"), lit(5)) === 1,
                concat((lit(100000) + pmod(col("__p") * 7, lit(300)))
                  .cast("string"), lit(":2")))
              .otherwise(nullStr).as("bundle_product_ids"))
          .filter(col("bundle_product_ids").isNotNull)
        val chl = graft.functions.F.inlineDim(s,
          Seq("channel_seq", "brand_id"),
          (0 until 7).map(i => Seq(i, if (i % 3 == 0) null else s"20020$i")))
          .withColumn("channel_seq", col("channel_seq").cast("bigint"))
        val statusCor = OrderCounts.coreStatus(s, sfDir)
          .filter(col("order_date").between(startD, endD) &&
            col("shop_name") === "스마트스토어" &&
            col("order_id").rlike("^[0-9]+$"))
          .groupBy(col("order_id").cast("bigint").as("order_id"))
          .agg(max(col("order_status")).as("status_cor"))

        // step 1: the product-order frame. THE fact exchange: one hash
        // repartition on product_order_id carries steps 1-3 (the status
        // roll-up, the explode, and allocation 1 all partition on it or a
        // superset); order_id is functionally determined by
        // product_order_id (= order_id*10+line), so the later (order,
        // invoice) stages re-key once.
        val wPO = Window.partitionBy(col("product_order_id"))
        val bundled = ordRaw.repartition(col("product_order_id"))
          .withColumn("status_smt", max(col("__smt_status_raw")).over(wPO))
          .join(rel, Seq("option_id"), "left")
          .join(broadcast(chl), Seq("channel_seq"), "left")
          .join(statusCor, Seq("order_id"), "left")
          .select(col("order_id"), col("product_order_id"),
            coalesce(col("invoice_no_raw"), lit("-")).as("invoice_no"),
            coalesce(col("bundle_product_ids"), col("brand_id"),
              lit("200000")).as("bundle_product_ids"),
            when(col("delivery_type_raw") === 7, lit(7)).otherwise(lit(0))
              .as("delivery_type"),
            when(col("status_cor").isNotNull, col("status_cor"))
              .when(col("status_smt") === 7, lit(1))
              .when(col("status_smt") === 5, lit(2))
              .when(col("status_smt").isin(6, 8), lit(3))
              .otherwise(lit(0)).as("order_status"),
            col("order_quantity"),
            ((coalesce(col("unit_price"), lit(0L))
              + coalesce(col("option_price"), lit(0L)))
              * col("order_quantity")
              - coalesce(col("seller_discount_amount"), lit(0L)))
              .as("payment_amount"),
            col("supply_amount"),
            col("order_date"))

        // step 2: explode EVERY row's bundle (the '200000' sentinel is a
        // 1-element bundle), '9'-component downgrade, cost attach;
        // status-6 rows carry zero cost into both allocations
        val exploded = bundled
          .select(col("order_id"), col("product_order_id"),
            col("invoice_no"), col("delivery_type"), col("order_status"),
            col("order_quantity"), col("payment_amount"),
            col("supply_amount"), col("order_date"),
            explode(split(col("bundle_product_ids"), ","))
              .as("bundle_product"))
          .select(col("order_id"), col("product_order_id"),
            col("invoice_no"),
            split(col("bundle_product"), ":").getItem(0).as("product_id"),
            col("delivery_type"),
            when(col("order_status") === 0 &&
                substring(col("bundle_product"), 1, 1) === "9", lit(6))
              .otherwise(col("order_status")).as("order_status"),
            (coalesce(expr("try_cast(get(split(bundle_product, ':'), 1) " +
              "AS BIGINT)"), lit(1L)) * col("order_quantity"))
              .as("sku_quantity"),
            col("payment_amount"), col("supply_amount"), col("order_date"))
        val costed = exploded
          .join(broadcast(eco), Seq("product_id"), "left")
          .join(broadcast(itm), Seq("product_id"), "left")
          .select(col("order_id"), col("product_order_id"),
            col("invoice_no"), col("product_id"), col("delivery_type"),
            col("order_status"), col("sku_quantity"),
            col("payment_amount"), col("supply_amount"),
            (coalesce(col("eco_org"), col("itm_org"), lit(0L))
              + coalesce(col("extra_cost"), lit(0L))).as("org_price"),
            coalesce(col("delivery_group"), lit("-")).as("delivery_group"),
            coalesce(col("itm_delivery_fee"), lit(0L))
              .as("item_delivery_fee"),
            col("order_date"))
          .withColumn("cost_amount",
            when(col("order_status") === 6, lit(0L))
              .otherwise(col("org_price") * col("sku_quantity")))

        // step 3: payment + supply split by cost weight over the product
        // order. The totals are the source row's own (exploded-duplicated)
        // amounts — constant per group, so no window sum is needed
        // ordering must be total over VALUE-DISTINCT rows: duplicate
        // (orderkey, linenumber) fixture rows share a product_order_id
        // with different amounts, and the remainder repair takes the
        // rn=1 row's total — the amounts join the sort key so the
        // repaired row is the same on both engines
        val part3 = Seq(col("product_order_id"))
        val ord3 = Seq(col("product_id"), col("sku_quantity"),
          col("order_status"), col("payment_amount"), col("supply_amount"))
        val allocated3 = graft.operators.Allocation.weightedAllocateMulti(
          costed, part3, ord3, col("cost_amount"),
          Seq(col("payment_amount") -> "__pay_split",
            col("supply_amount") -> "__sup_split"), scale = 0)
          .select(col("order_id"), col("invoice_no"), col("product_id"),
            col("delivery_type"), col("order_status"), col("sku_quantity"),
            col("__pay_split").cast("long").as("payment_amount"),
            col("__sup_split").cast("long").as("supply_amount"),
            col("org_price"), col("delivery_group"),
            col("item_delivery_fee"), col("order_date"), col("cost_amount"))

        // step 4: CJ fallback chain ±7 days + delivery unit — both
        // grains derived from ONE persisted (invoice, order) base
        // (ReportMarts.cjFallbackPair), not two full re-aggregations
        val (cjInvRaw, cjOrdRaw) = ReportMarts.cjFallbackPair(s, sfDir,
          date_sub(startD, 7), date_add(endD, 7), ctx.track)
        val cjInv = cjInvRaw
          .select(col("invoice_no"), col("delivery_fee").as("cj_inv_fee"),
            col("box_cost").as("cj_inv_box"))
        val cjOrd = cjOrdRaw
          .select(col("order_id").as("__cj_order_id"),
            col("delivery_fee").as("cj_ord_fee"),
            col("box_cost").as("cj_ord_box"))
        val withCj = allocated3
          .join(cjInv, Seq("invoice_no"), "left")
          .join(cjOrd, concat(lit("ORD"), col("order_id").cast("string"))
            === col("__cj_order_id"), "left")
          .join(broadcast(unitDim), Seq("product_id"), "left")
          .select(col("order_id"), col("invoice_no"), col("product_id"),
            col("delivery_type"), col("order_status"), col("sku_quantity"),
            col("payment_amount"), col("supply_amount"),
            (col("org_price") * col("sku_quantity")).as("supply_cost"),
            col("delivery_group"),
            (col("sku_quantity") * coalesce(col("unit"), lit(1)))
              .as("delivery_quantity"),
            coalesce(col("cj_inv_fee"), col("cj_ord_fee"),
              col("item_delivery_fee"), lit(0L)).as("delivery_fee"),
            coalesce(col("cj_inv_box"), col("cj_ord_box"), lit(0L))
              .as("box_cost"),
            col("order_date"), col("cost_amount"))

        // steps 5-6: the (order, invoice, group) aggregates as windows at
        // row grain, the 6-row tier dim as a greatest-ladder (the n_arrival
        // branch prices delivery_type-7 groups by quantity over the band's
        // min_unit), the winning fee as FIRST_VALUE by abs desc — the
        // SbnSales shape, no self-join
        val wOIG = Window.partitionBy(col("order_id"), col("invoice_no"),
          col("delivery_group"))
        val wOI = Window.partitionBy(col("order_id"), col("invoice_no"))
        val grp = withCj
          .withColumn("__g_type", max(col("delivery_type")).over(wOIG))
          .withColumn("__g_fee", max(col("delivery_fee")).over(wOIG))
          .withColumn("__g_box", sum(col("box_cost")).over(wOIG))
          .withColumn("__g_qty",
            coalesce(sum(col("delivery_quantity")).over(wOIG), lit(0L)))
        val tierCands = tierBands.map {
          case (g, lo, hi, fee, extra, nFee, nAdd) =>
            val c = when(col("__g_fee") > 0,
              col("__g_fee") + when(col("__g_box") > 0, col("__g_box"))
                .otherwise(lit(extra.toLong)))
              .when(col("__g_type") === 7,
                lit(nFee.toLong) + lit(nAdd.toLong)
                  * (col("__g_qty") - lit(lo.toLong)))
              .otherwise(lit(fee.toLong + extra.toLong))
            when(col("delivery_group") === lit(g) &&
              col("__g_qty").between(lit(lo), lit(hi)),
              struct(abs(c).as("a"), c.as("f")))
        }
        val bestTier = greatest(tierCands: _*)
        val attached = grp
          .withColumn("__resolved_fee",
            when(bestTier.isNull, col("__g_fee"))
              .otherwise(bestTier.getField("f")))
          .withColumn("order_delivery_fee",
            first_value(col("__resolved_fee")).over(wOI.orderBy(
              abs(col("__resolved_fee")).desc, col("__resolved_fee").desc)))

        // step 7: the resolved fee split over (order, invoice) — the total
        // is the windowed fee itself, constant per group
        val allocated7 = graft.operators.Allocation.weightedAllocate(
          attached,
          Seq(col("order_id"), col("invoice_no")),
          Seq(col("product_id"), col("sku_quantity"), col("payment_amount"),
            col("supply_amount"), col("order_status")),
          col("order_delivery_fee"), col("cost_amount"),
          "__dlv_split", scale = 0)
          .select(col("product_id"), col("delivery_type"),
            col("order_status"), col("sku_quantity"), col("payment_amount"),
            col("supply_amount"), col("supply_cost"),
            col("__dlv_split").cast("long").as("delivery_fee"),
            col("order_date"))

        // step 8: daily aggregate
        allocated7
          .groupBy(col("order_date"), col("product_id"),
            col("delivery_type"), col("order_status"))
          .agg(sum(col("sku_quantity")).as("sku_quantity"),
            sum(col("payment_amount")).as("payment_amount"),
            sum(col("supply_amount")).as("supply_amount"),
            sum(col("supply_cost")).as("supply_cost"),
            sum(col("delivery_fee")).as("delivery_fee"))
      }))
  }
}
