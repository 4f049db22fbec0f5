package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The sabangnet sales-daily mart (reference: intermediate/sales/sabangnet/
  * sabangnet__sales_daily.sql:16-434 + the rule macros in macros/mapping/
  * sabangnet.sql:35-55) — the reference's LARGEST sales model. Beyond the
  * pieces already in the registry it adds:
  *
  *  - `payment_amount_rules`: the order total CONCENTRATES on the first
  *    row (rn=1 gets `SUM(payment) OVER (account, order)`, the rest 0) —
  *    EXCEPT shop0666 orders under the 19,800 threshold, where EVERY row
  *    carries total+3000 (the reference's own wart, kept faithfully);
  *  - `net_rate_rules`: supply = ROUND(payment × net_rate) with a
  *    shop/product/date-window override; rates are basis points and the
  *    arithmetic stays in DECIMAL so rounding replays across engines;
  *  - the CJ delivery fallback chain: per-invoice carrier fee →
  *    per-order carrier fee → item default → 0, both CJ models invoked
  *    with ±7-day-widened bounds (late scans);
  *  - max-delivery-fee resolution: fees aggregate per (order, invoice,
  *    delivery_group), a banded tier join prices group rules, a CASE picks
  *    own-fee / fee+box-or-extra / group-fee+extra, and the largest
  *    ABSOLUTE fee wins per (order, invoice);
  *  - TWO allocation stages: payment+supply split by cost weight over
  *    (account, order), then the resolved delivery fee split over
  *    (order, invoice).
  *
  * Deviation noted: the reference's step-3 explode carries `WHERE
  * bundle_option_ids IS NULL` (sql:166) — in BigQuery `CROSS JOIN
  * UNNEST(SPLIT(NULL))` yields no rows, so as written the branch is dead
  * and bundle orders vanish from the mart. The sibling order-count model's
  * identical step uses IS NOT NULL; this port follows the evident intent.
  */
object SbnSales {

  private val nullStr = lit(null).cast("string")

  def install(r: ModelRegistry, sfDir: String): Unit = {

    r.register(Model("sabangnet_sales_daily", Nil, Incremental("order_date"),
      ctx => {
        val s = ctx.session
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")

        // delivery tiers (the sabangnet variant carries a per-tier fee the
        // coupang model ignores). The tier rule is a literal macro in the
        // reference (macros/mapping/sabangnet.sql:35-55), so the band
        // table is derived HERE in plain Scala — [min_unit, max_unit]
        // bands per group, the largest raw min taking the 9999 sentinel,
        // the others ending at the next tier's raw min (inclusive on both
        // ends, exactly like the reference's lead() construction — a
        // boundary quantity legitimately matches two tiers and the
        // max-abs resolution below sees both candidates). Deriving bands
        // in Scala lets the tier LOOKUP compile to a scalar expression
        // ladder instead of a join, which matters because the lookup now
        // runs at fact-row grain: a join would duplicate fact rows on
        // boundary quantities; an expression cannot. (A genuinely
        // table-sized tier dim would use the J5 banded broadcast join at
        // the (order, invoice, group) aggregate grain instead.)
        val dlvLit: Seq[(String, Option[Int], Int, Int)] = Seq(
          ("G0", Some(10), 3000, 300 + 200 + 50 + 400),
          ("G0", None, 2500, 500 + 0 + 100 + 300),
          ("G0", Some(50), 3500, 700 + 100 + 0 + 0),
          ("G1", Some(20), 4000, 300 + 300 + 0 + 0),
          ("G1", None, 2000, 0 + 0 + 0 + 1000),
          ("G2", Some(5), 5000, 0 + 0 + 250 + 250))
        val tierBands: Seq[(String, Int, Int, Int, Int)] =
          dlvLit.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
            val sorted = rows.sortBy(_._2.getOrElse(Int.MinValue))
            val maxRaw = rows.flatMap(_._2).max
            sorted.zipWithIndex.map { case ((_, raw, fee, extra), i) =>
              val lo = raw.getOrElse(1)
              val hi = if (raw.contains(maxRaw)) 9999
                       else sorted(i + 1)._2.get
              (g, lo, hi, fee, extra)
            }
          }

        // ecount price sheet keyed by OPTION id (earliest expiration wins)
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
              .as("org_price")),
          Seq(col("option_id")),
          Seq(col("expiration_date").asc, col("product_code").desc))
          .select(col("option_id"), col("org_price"))

        // core item slice: default org price / delivery group / default fee
        val itm = graft.functions.F.qualifyTopN(
          Tables.part(s, sfDir).select(
            (lit(200000) + pmod(col("p_partkey") * 7 + 3, lit(500)))
              .cast("string").as("product_id"),
            when(pmod(col("p_partkey"), lit(6)) === 0,
              lit(null).cast("bigint"))
              .otherwise(expr("cast(floor(p_retailprice) AS BIGINT)"))
              .as("itm_org"),
            when(pmod(col("p_partkey"), lit(4)) === 0,
              lit(null).cast("bigint"))
              .otherwise(pmod(col("p_partkey"), lit(200))).as("extra_cost"),
            when(pmod(col("p_partkey"), lit(5)) === 0, nullStr)
              .otherwise(concat(lit("G"), pmod(col("p_partkey"), lit(3))))
              .as("delivery_group"),
            when(pmod(col("p_partkey"), lit(7)) === 0,
              lit(null).cast("bigint"))
              .otherwise(pmod(col("p_partkey"), lit(3)) * 1500)
              .as("itm_delivery_fee"),
            col("p_partkey").as("__seq")),
          Seq(col("product_id")), Seq(col("__seq"))).drop("__seq")

        val unitDim = graft.functions.F.inlineDim(s,
          Seq("product_id", "unit"),
          Seq(Seq("200036", 100), Seq("200119", 100), Seq("200222", 100)))

        // accounts: shop + commission (basis points — DECIMAL-exact
        // supply rounding needs integer rates)
        val acc = graft.functions.F.inlineDim(s,
          Seq("account_no", "shop_id", "commission_bp"),
          Seq(Seq(0, "shop0055", 1000), Seq(1, "shop0100", 1200),
            Seq(2, "chop0022", 1500), Seq(3, "shop0666", 2000),
            Seq(4, "shop0200", 800)))
          .withColumn("account_no", col("account_no").cast("bigint"))

        val opt = ProductMarts.sbnOption(s, sfDir)
          .select(col("option_id"), col("bundle_option_ids"))

        val ordRaw = Tables.lineitem(s, sfDir)
          .join(Tables.orders(s, sfDir).select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("order_date").between(startD, endD))
          .select(
            (col("l_orderkey") * 10 + col("l_linenumber")).as("order_seq"),
            coalesce(when(pmod(col("l_orderkey"), lit(29)) === 0,
                concat(lit("병원출고"), col("l_orderkey")))
              .when(pmod(col("l_orderkey"), lit(31)) === 0, nullStr)
              .otherwise(concat(lit("ORD"), col("l_orderkey"))), lit("-"))
              .as("order_id"),
            pmod(col("l_suppkey"), lit(5)).as("account_no"),
            concat((lit(200000) + pmod(col("l_partkey") * 7 + 3, lit(500)))
                .cast("string"), lit("-"),
              lpad((pmod(col("l_linenumber"), lit(4)) + 1).cast("string"),
                4, "0")).as("option_id"),
            pmod(col("l_partkey"), lit(997)).cast("string")
              .as("product_id_shop"),
            coalesce(when(pmod(col("l_orderkey"), lit(17)) === 0,
                lit(null).cast("long"))
              .otherwise(col("l_quantity").cast("long")), lit(0L))
              .as("order_quantity"),
            (col("l_quantity").cast("long") * 10).as("sku_quantity_raw"),
            coalesce(when(pmod(col("l_orderkey"), lit(23)) === 0,
                lit(null).cast("long"))
              .otherwise(expr("cast(floor(l_extendedprice / 10) AS BIGINT)")),
              lit(0L)).as("payment_amount"),
            when(pmod(col("l_orderkey"), lit(2)) === 0,
              concat(lit("LP"), col("l_orderkey")))
              .when(pmod(col("l_orderkey"), lit(3)) === 0,
                concat(lit("EF"), col("l_orderkey")))
              .otherwise(nullStr).as("invoice_no_raw"),
            element_at(array(lit(7), lit(8), lit(9), lit(10), lit(11),
              lit(12), lit(21), lit(22), lit(23), lit(24), lit(25),
              lit(26), lit(999)),
              (pmod(col("l_partkey") * 3 + col("l_linenumber"), lit(13)) + 1)
                .cast("int")).as("__inv_status_raw"),
            col("order_date"))
        val statusCor = OrderCounts.coreStatus(s, sfDir)
          .filter(col("order_date").between(startD, endD) &&
            col("shop_name") =!= "스마트스토어")
          .groupBy(col("order_id"))
          .agg(max(col("order_status")).as("status_cor"))

        // THE fact exchange: one hash repartition on order_id carries the
        // whole mart — every window below partitions on a superset of
        // {order_id} (the (order, seq) invoice roll-up, the (account,
        // order) payment/allocation stages, the (order, invoice) fee
        // stages), every dim join broadcasts, and the (order, invoice)
        // aggregate and self-join cluster on a superset too — so steps
        // 1-9 plan as sort-only stages over this single shuffle plus the
        // final daily re-aggregation.
        //
        // The reference's invoice CTE (groupBy order_seq + join back) is
        // a window here: invoice_no_raw is constant per order_seq group
        // (both derive from l_orderkey), so MAX-over-window ≡ the
        // groupBy's FIRST, without the extra shuffle + self-join.
        val wSeq = Window.partitionBy(col("order_id"), col("order_seq"))
        val detail = ordRaw.repartition(col("order_id"))
          .withColumn("invoice_no",
            coalesce(max(col("invoice_no_raw")).over(wSeq), lit("-")))
          .withColumn("status_sbn_raw",
            max(col("__inv_status_raw")).over(wSeq))
          .join(broadcast(acc), Seq("account_no"), "left")
          .filter(!col("shop_id").isin("shop0055", "chop0022", "chop0027",
            "chop0028", "chop0029"))
          .join(broadcast(opt), Seq("option_id"), "left")
          .join(statusCor, Seq("order_id"), "left")

        // step 2: the rule ladders (shop / bundle / status / sku /
        // payment / net-rate), then supply = ROUND(pay × net) in DECIMAL.
        // The whole-order payment sum is phrased over the row_number's
        // ordered spec with a full rows frame so both share one WindowExec
        // and one sort (same trick as Allocation.weightedAllocate).
        val wAOOrd = Window.partitionBy(col("account_no"), col("order_id"))
          .orderBy(col("order_seq"), col("option_id"),
            col("product_id_shop"), col("sku_quantity_raw"),
            col("payment_amount"))
        val wAO = wAOOrd.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        val ruled = detail.select(
            col("order_seq"), col("order_id"), col("invoice_no"),
            col("account_no"),
            when(col("order_id").startsWith("병원출고"), lit("chop9022"))
              .otherwise(col("shop_id")).as("shop_id"),
            split(col("option_id"), "-").getItem(0).as("product_id"),
            col("option_id"),
            when(col("option_id") === "200345-0001" &&
                col("sku_quantity_raw") >= 100, lit("200330-0001:1"))
              .when(col("option_id") === "200377-0001" &&
                col("sku_quantity_raw") >= 100, lit("200741-0001:1"))
              .when(col("bundle_option_ids").isNull, nullStr)
              .when(col("bundle_option_ids") === "200345-0001:100",
                lit("200330-0001:1"))
              .when(col("bundle_option_ids") === "200377-0001:100",
                lit("200741-0001:1"))
              .otherwise(col("bundle_option_ids")).as("bundle_option_ids"),
            when(col("status_cor").isNotNull, col("status_cor"))
              .when(col("status_sbn_raw").isin(9, 12, 25, 26), lit(1))
              .when(col("status_sbn_raw").isin(8, 11, 21, 22, 23, 24),
                lit(2))
              .when(col("status_sbn_raw").isin(7, 10, 999), lit(3))
              .otherwise(lit(0)).as("order_status"),
            col("order_quantity"),
            when(col("option_id").isin("200330-0001", "200741-0001"),
              col("order_quantity")).otherwise(col("sku_quantity_raw"))
              .as("sku_quantity"),
            when(col("shop_id") === "shop0666" &&
                sum(col("payment_amount")).over(wAO) < 19800,
              sum(col("payment_amount")).over(wAO) + 3000)
              .when(row_number().over(wAOOrd) === 1,
                coalesce(sum(col("payment_amount")).over(wAO), lit(0L)))
              .otherwise(lit(0L)).as("payment_amount"),
            when(col("shop_id") === "shop0200" &&
                col("product_id_shop") === "123" &&
                col("order_date").between(lit("1996-03-01").cast("date"),
                  lit("1996-03-31").cast("date")), lit(1000))
              .otherwise(col("commission_bp")).as("eff_bp"),
            col("order_date"))
          // ROUND(pay × net_rate) in pure integer arithmetic (half-up for
          // the non-negative amounts here): decimal-division result scales
          // differ between engines, integer div does not
          .withColumn("supply_amount",
            expr("cast((payment_amount * (10000 - eff_bp) + 5000) " +
              "div 10000 AS BIGINT)"))
          .filter(col("shop_id") =!= "chop9022")

        // step 3: explode bundles (IS NOT NULL — see header) with the
        // second payment/supply concentration over the exploded grain.
        // ONE Generate covers both arms — non-bundle rows explode a
        // 1-element null array and pass through — because a union of the
        // two filtered branches would both re-plan the ruled subtree per
        // branch AND destroy the order_id partitioning (UnionExec
        // concatenates child partitions), forcing a re-shuffle. The
        // bundle-only window semantics survive as conditional aggregates:
        // MAX(payment) over bundle rows only, and the bundle-subset
        // ROW_NUMBER as a running count of bundle rows in the same order.
        val exploded0 = ruled.select(
          col("order_seq"), col("order_id"), col("invoice_no"),
          col("account_no"), col("shop_id"), col("product_id"),
          col("option_id"), col("order_status"), col("order_quantity"),
          col("sku_quantity"), col("payment_amount"), col("supply_amount"),
          col("order_date"),
          explode(when(col("bundle_option_ids").isNull, array(nullStr))
            .otherwise(split(col("bundle_option_ids"), ",")))
            .as("bundle_option"))
        val isB = col("bundle_option").isNotNull
        // (l_orderkey, l_linenumber) duplicates make order_seq non-unique;
        // the remaining columns order ties by row content (tied rows are
        // fully identical, so which one takes rnB=1 is value-irrelevant)
        val rnW = Window.partitionBy(col("account_no"), col("order_id"))
          .orderBy(col("order_seq"), col("bundle_option"),
            col("order_quantity"), col("payment_amount"),
            col("supply_amount"))
        val rnB = sum(when(isB, 1)).over(
          rnW.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        // full-frame twin of rnW: the bundle max shares rnB's sort
        val wAO2 = rnW.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        val exploded = exploded0.select(
          col("order_seq"), col("order_id"), col("invoice_no"),
          col("account_no"), col("shop_id"),
          when(isB, split(col("bundle_option"), "-").getItem(0))
            .otherwise(col("product_id")).as("product_id"),
          when(isB, split(col("bundle_option"), ":").getItem(0))
            .otherwise(col("option_id")).as("option_id"),
          col("order_status"),
          when(isB, coalesce(expr("try_cast(get(split(bundle_option, ':')" +
            ", 1) AS BIGINT)"), lit(1L)) * col("order_quantity"))
            .otherwise(col("sku_quantity")).as("sku_quantity"),
          when(!isB, col("payment_amount"))
            .when(rnB === 1, max(when(isB, col("payment_amount"))).over(wAO2))
            .otherwise(lit(0L)).as("payment_amount"),
          when(!isB, col("supply_amount"))
            .when(rnB === 1, max(when(isB, col("supply_amount"))).over(wAO2))
            .otherwise(lit(0L)).as("supply_amount"),
          col("order_date"))

        // step 4: cost attach (option-keyed sheet → item default → 0).
        // Both price dims are option/product-grain (bounded by the id
        // spaces, ~thousands of rows at any SF) — broadcast, preserving
        // the fact's order_id partitioning from the detail exchange.
        val costed = exploded
          .join(broadcast(eco.withColumnRenamed("org_price", "eco_org")),
            Seq("option_id"), "left")
          .join(broadcast(itm), Seq("product_id"), "left")
          .select(col("order_id"), col("invoice_no"), col("account_no"),
            col("shop_id"), col("product_id"), col("option_id"),
            col("order_status"),
            col("sku_quantity"), col("payment_amount"), col("supply_amount"),
            (coalesce(col("eco_org"), col("itm_org"), lit(0L))
              + coalesce(col("extra_cost"), lit(0L))).as("org_price"),
            coalesce(col("delivery_group"), lit("-")).as("delivery_group"),
            coalesce(col("itm_delivery_fee"), lit(0L))
              .as("item_delivery_fee"),
            col("order_date"))
          .withColumn("cost_amount", col("org_price") * col("sku_quantity"))

        // step 5: payment + supply split by cost weight over the order.
        // ONE allocation pass over every row — a 1-row (account, order)
        // group's weighted share of its own group total is exactly the
        // row's original amount (zero-weight included: the first row
        // absorbs the full total), so the reference's single/multi branch
        // split is a no-op here and the plan needn't union two copies of
        // the upstream.
        val part5 = Seq(col("account_no"), col("order_id"))
        val ord5 = Seq(col("product_id"), col("option_id"),
          col("sku_quantity"), col("order_status"), col("invoice_no"))
        // group totals over the allocation's own ordered spec (full rows
        // frame) so they fuse into the allocator's sort
        val wAO3 = Window.partitionBy(part5: _*).orderBy(ord5: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val allocated5 = graft.operators.Allocation.weightedAllocateMulti(
          costed
            .withColumn("__tp", sum(col("payment_amount")).over(wAO3))
            .withColumn("__ts", sum(col("supply_amount")).over(wAO3)),
          part5, ord5, col("cost_amount"),
          Seq(col("__tp") -> "__payment_amount_split",
            col("__ts") -> "__supply_amount_split"), scale = 0)
          .select(col("order_id"), col("invoice_no"), col("shop_id"),
            col("product_id"), col("order_status"), col("sku_quantity"),
            col("__payment_amount_split").cast("long").as("payment_amount"),
            col("__supply_amount_split").cast("long").as("supply_amount"),
            col("org_price"), col("delivery_group"),
            col("item_delivery_fee"), col("order_date"), col("cost_amount"))

        // step 6: CJ delivery fallback chain (both CJ grains, ±7 days)
        // over ONE persisted (invoice, order) base — see
        // ReportMarts.cjFallbackPair
        val (cjInvRaw, cjOrdRaw) = ReportMarts.cjFallbackPair(s, sfDir,
          date_sub(startD, 7), date_add(endD, 7), ctx.track)
        val cjInv = cjInvRaw
          .select(col("invoice_no"), col("delivery_fee").as("cj_inv_fee"),
            col("box_cost").as("cj_inv_box"))
        val cjOrd = cjOrdRaw
          .select(col("order_id"), col("delivery_fee").as("cj_ord_fee"),
            col("box_cost").as("cj_ord_box"))
        val withCj = allocated5
          .join(cjInv, Seq("invoice_no"), "left")
          .join(cjOrd, Seq("order_id"), "left")
          .join(broadcast(unitDim), Seq("product_id"), "left")
          .select(col("order_id"), col("invoice_no"), col("shop_id"),
            col("product_id"), col("order_status"), col("sku_quantity"),
            col("payment_amount"), col("supply_amount"),
            (col("org_price") * col("sku_quantity")).as("supply_cost"),
            col("org_price"), col("delivery_group"),
            (col("sku_quantity") * coalesce(col("unit"), lit(1)))
              .as("delivery_quantity"),
            coalesce(col("cj_inv_fee"), col("cj_ord_fee"),
              col("item_delivery_fee"), lit(0L)).as("delivery_fee"),
            coalesce(col("cj_inv_box"), col("cj_ord_box"), lit(0L))
              .as("box_cost"),
            col("order_date"), col("cost_amount"))

        // steps 7-8: resolve the order-level fee — per delivery group, the
        // banded tier rule prices missing fees, box beats extra when paid,
        // the largest ABSOLUTE fee wins per (order, invoice). The
        // reference aggregates to (order, invoice, group) grain and joins
        // back; here the group aggregates are WINDOWS at row grain, the
        // 6-row tier dim joins broadcast against the fact directly, and
        // the winning fee is a FIRST_VALUE over the (order, invoice)
        // window — no self-join, no second consumer of the fact, so the
        // whole mart stays one linear pipeline over the detail exchange.
        val wOIG = Window.partitionBy(col("order_id"), col("invoice_no"),
          col("delivery_group"))
        val wOI = Window.partitionBy(col("order_id"), col("invoice_no"))
        val grp = withCj
          .withColumn("__g_fee", max(col("delivery_fee")).over(wOIG))
          .withColumn("__g_box", sum(col("box_cost")).over(wOIG))
          .withColumn("__g_qty",
            coalesce(sum(col("delivery_quantity")).over(wOIG), lit(0L)))
        // per matching tier, the candidate fee as an (|fee|, fee) struct;
        // greatest() over the candidates is the lexicographic max — i.e.
        // the reference's QUALIFY ORDER BY abs(fee) DESC, fee DESC — and
        // null (no tier matched / group not in the rule) falls back to the
        // group's own max fee, the reference's left-join-miss arm
        val tierCands = tierBands.map { case (g, lo, hi, fee, extra) =>
          val c = when(col("__g_fee") > 0,
            col("__g_fee") + when(col("__g_box") > 0, col("__g_box"))
              .otherwise(lit(extra.toLong)))
            .otherwise(lit(fee.toLong + extra.toLong))
          when(col("delivery_group") === lit(g) &&
            col("__g_qty").between(lit(lo), lit(hi)),
            struct(abs(c).as("a"), c.as("f")))
        }
        val bestTier = greatest(tierCands: _*)
        val resolved = grp.withColumn("__resolved_fee",
          when(bestTier.isNull, col("__g_fee"))
            .otherwise(bestTier.getField("f")))
        val attached = resolved.withColumn("order_delivery_fee",
          first_value(col("__resolved_fee")).over(wOI.orderBy(
            abs(col("__resolved_fee")).desc, col("__resolved_fee").desc)))

        // step 9: split the resolved fee over (order, invoice). Same
        // branch collapse as step 5: a 1-row (order, invoice) group
        // allocates its full fee to itself, so one pass covers both the
        // reference's single and multi arms.
        val allocated9 = graft.operators.Allocation.weightedAllocate(
          attached,
          Seq(col("order_id"), col("invoice_no")),
          Seq(col("product_id"), col("sku_quantity"), col("payment_amount"),
            col("supply_amount"), col("order_status")),
          col("order_delivery_fee"), col("cost_amount"),
          "__dlv_split", scale = 0)
          .select(col("order_id"), col("shop_id"), col("product_id"),
            col("order_status"), col("sku_quantity"), col("payment_amount"),
            col("supply_amount"), col("supply_cost"),
            col("__dlv_split").cast("long").as("delivery_fee"),
            col("order_date"))

        // step 10: daily aggregate
        allocated9
          .groupBy(col("order_date"), col("product_id"), col("shop_id"),
            col("order_status"))
          .agg(sum(col("sku_quantity")).as("sku_quantity"),
            sum(col("payment_amount")).as("payment_amount"),
            sum(col("supply_amount")).as("supply_amount"),
            sum(col("supply_cost")).as("supply_cost"),
            sum(col("delivery_fee")).as("delivery_fee"))
      }))
  }
}
