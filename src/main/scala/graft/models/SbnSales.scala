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
        // coupang model ignores)
        val dlvRaw = graft.functions.F.inlineDim(s,
          Seq("delivery_group", "min_unit_raw", "tier_fee", "coolant_cost",
            "label_cost", "wrap_cost", "box_cost"),
          Seq(
            Seq("G0", 10, 3000, 300, 200, 50, 400),
            Seq("G0", null, 2500, 500, null, 100, 300),
            Seq("G0", 50, 3500, 700, 100, null, null),
            Seq("G1", 20, 4000, 300, 300, null, null),
            Seq("G1", null, 2000, null, null, null, 1000),
            Seq("G2", 5, 5000, null, null, 250, 250)))
        val wg = Window.partitionBy(col("delivery_group"))
        val dlv = dlvRaw.select(col("delivery_group"),
          coalesce(col("min_unit_raw"), lit(1)).as("min_unit"),
          when(max(col("min_unit_raw")).over(wg) === col("min_unit_raw"),
            lit(9999))
            .otherwise(lead(col("min_unit_raw"), 1).over(
              wg.orderBy(col("min_unit_raw").asc_nulls_first)))
            .as("max_unit"),
          coalesce(col("tier_fee"), lit(0)).as("tier_delivery_fee"),
          (coalesce(col("coolant_cost"), lit(0))
            + coalesce(col("label_cost"), lit(0))
            + coalesce(col("wrap_cost"), lit(0))
            + coalesce(col("box_cost"), lit(0))).as("extra_cost"))

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
        val invoice = ordRaw.groupBy(col("order_seq"))
          .agg(first(col("invoice_no_raw")).as("invoice_no"),
            max(col("__inv_status_raw")).as("status_sbn_raw"))
        val statusCor = OrderCounts.coreStatus(s, sfDir)
          .filter(col("order_date").between(startD, endD) &&
            col("shop_name") =!= "스마트스토어")
          .groupBy(col("order_id"))
          .agg(max(col("order_status")).as("status_cor"))

        val detail = ordRaw
          .join(broadcast(acc), Seq("account_no"), "left")
          .filter(!col("shop_id").isin("shop0055", "chop0022", "chop0027",
            "chop0028", "chop0029"))
          .join(opt, Seq("option_id"), "left")
          .join(invoice.select(col("order_seq"),
            coalesce(col("invoice_no"), lit("-")).as("invoice_no"),
            col("status_sbn_raw")), Seq("order_seq"), "left")
          .join(statusCor, Seq("order_id"), "left")

        // step 2: the rule ladders (shop / bundle / status / sku /
        // payment / net-rate), then supply = ROUND(pay × net) in DECIMAL
        val wAO = Window.partitionBy(col("account_no"), col("order_id"))
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
              .when(row_number().over(wAO.orderBy(col("order_seq"),
                  col("option_id"), col("product_id_shop"),
                  col("sku_quantity_raw"), col("payment_amount"))) === 1,
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
        // second payment/supply concentration over the exploded grain
        val nonBundle = ruled.filter(col("bundle_option_ids").isNull)
          .select(col("order_seq"), col("order_id"), col("invoice_no"),
            col("account_no"), col("shop_id"), col("product_id"),
            col("option_id"), col("order_status"), col("sku_quantity"),
            col("payment_amount"), col("supply_amount"), col("order_date"))
        val wAO2 = Window.partitionBy(col("account_no"), col("order_id"))
        val exploded0 = ruled.filter(col("bundle_option_ids").isNotNull)
          .select(col("order_seq"), col("order_id"), col("invoice_no"),
            col("account_no"), col("shop_id"), col("order_status"),
            col("order_quantity"), col("payment_amount"),
            col("supply_amount"), col("order_date"),
            explode(split(col("bundle_option_ids"), ",")).as("bundle_option"))
        // (l_orderkey, l_linenumber) duplicates make order_seq non-unique;
        // the remaining columns order ties by row content
        val rnW = wAO2.orderBy(col("order_seq"), col("bundle_option"),
          col("order_quantity"), col("payment_amount"), col("supply_amount"))
        val exploded = exploded0.select(
          col("order_seq"), col("order_id"), col("invoice_no"),
          col("account_no"), col("shop_id"),
          split(col("bundle_option"), "-").getItem(0).as("product_id"),
          split(col("bundle_option"), ":").getItem(0).as("option_id"),
          col("order_status"),
          (coalesce(expr("try_cast(get(split(bundle_option, ':'), 1) " +
            "AS BIGINT)"), lit(1L)) * col("order_quantity"))
            .as("sku_quantity"),
          when(row_number().over(rnW) === 1,
            max(col("payment_amount")).over(wAO2)).otherwise(lit(0L))
            .as("payment_amount"),
          when(row_number().over(rnW) === 1,
            max(col("supply_amount")).over(wAO2)).otherwise(lit(0L))
            .as("supply_amount"),
          col("order_date"))

        // step 4: cost attach (option-keyed sheet → item default → 0)
        val wAO3 = Window.partitionBy(col("account_no"), col("order_id"))
        val costed = nonBundle.unionByName(exploded)
          .join(eco.withColumnRenamed("org_price", "eco_org"),
            Seq("option_id"), "left")
          .join(itm, Seq("product_id"), "left")
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
          .withColumn("bundle_product_count", count(lit(1)).over(wAO3))

        // step 5: payment + supply split by cost weight over the order
        val part5 = Seq(col("account_no"), col("order_id"))
        val ord5 = Seq(col("product_id"), col("option_id"),
          col("sku_quantity"), col("order_status"), col("invoice_no"))
        val multi5 = Seq("payment_amount", "supply_amount")
          .foldLeft(costed.filter(col("bundle_product_count") > 1)
            .withColumn("__tp", sum(col("payment_amount")).over(wAO3))
            .withColumn("__ts", sum(col("supply_amount")).over(wAO3))) {
            (df, m) =>
              val total = if (m == "payment_amount") col("__tp")
                else col("__ts")
              graft.operators.Allocation.weightedAllocate(df, part5, ord5,
                total, col("cost_amount"), s"__${m}_split", scale = 0)
          }
          .select(col("order_id"), col("invoice_no"), col("shop_id"),
            col("product_id"), col("order_status"), col("sku_quantity"),
            col("__payment_amount_split").cast("long").as("payment_amount"),
            col("__supply_amount_split").cast("long").as("supply_amount"),
            col("org_price"), col("delivery_group"),
            col("item_delivery_fee"), col("order_date"), col("cost_amount"))
        val single5 = costed.filter(col("bundle_product_count") === 1)
          .select(col("order_id"), col("invoice_no"), col("shop_id"),
            col("product_id"), col("order_status"), col("sku_quantity"),
            col("payment_amount"), col("supply_amount"),
            col("org_price"), col("delivery_group"),
            col("item_delivery_fee"), col("order_date"), col("cost_amount"))

        // step 6: CJ delivery fallback chain (both CJ models, ±7 days)
        val cjInv = ReportMarts.cjInvoice(s, sfDir,
          date_sub(startD, 7), date_add(endD, 7))
          .select(col("invoice_no"), col("delivery_fee").as("cj_inv_fee"),
            col("box_cost").as("cj_inv_box"))
        val cjOrd = ReportMarts.cjInvoiceOrder(s, sfDir,
          date_sub(startD, 7), date_add(endD, 7))
          .select(col("order_id"), col("delivery_fee").as("cj_ord_fee"),
            col("box_cost").as("cj_ord_box"))
        val withCj = single5.unionByName(multi5)
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

        // step 7: resolve the order-level fee — per delivery group, the
        // banded tier rule prices missing fees, box beats extra when paid,
        // the largest ABSOLUTE fee wins per (order, invoice)
        val grpAgg = withCj
          .groupBy(col("order_id"), col("invoice_no"), col("delivery_group"))
          .agg(max(col("delivery_fee")).as("delivery_fee"),
            sum(col("box_cost")).as("box_cost"),
            coalesce(sum(col("delivery_quantity")), lit(0L))
              .as("delivery_quantity"))
        val resolved = grpAgg.join(broadcast(dlv),
            grpAgg("delivery_group") === dlv("delivery_group") &&
              grpAgg("delivery_quantity")
                .between(dlv("min_unit"), dlv("max_unit")), "left")
          .select(col("order_id"), col("invoice_no"),
            when(dlv("delivery_group").isNull, grpAgg("delivery_fee"))
              .when(grpAgg("delivery_fee") > 0,
                grpAgg("delivery_fee") + when(col("box_cost") > 0,
                  col("box_cost")).otherwise(col("extra_cost")))
              .otherwise(col("tier_delivery_fee") + col("extra_cost"))
              .as("delivery_fee"))
        val maxFee = graft.functions.F.qualifyTopN(resolved,
          Seq(col("order_id"), col("invoice_no")),
          Seq(abs(col("delivery_fee")).desc, col("delivery_fee").desc))
          .select(col("order_id"), col("invoice_no"),
            col("delivery_fee").as("order_delivery_fee"))

        // steps 8-9: attach + split the resolved fee over (order, invoice)
        val wOI = Window.partitionBy(col("order_id"), col("invoice_no"))
        val attached = withCj
          .join(maxFee, Seq("order_id", "invoice_no"), "left")
          .withColumn("bundle_invoice_count", count(lit(1)).over(wOI))
        val multi9b = graft.operators.Allocation.weightedAllocate(
          attached.filter(col("bundle_invoice_count") > 1),
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
        val single9 = attached.filter(col("bundle_invoice_count") === 1)
          .select(col("order_id"), col("shop_id"), col("product_id"),
            col("order_status"), col("sku_quantity"), col("payment_amount"),
            col("supply_amount"), col("supply_cost"),
            col("order_delivery_fee").as("delivery_fee"), col("order_date"))

        // step 10: daily aggregate
        single9.unionByName(multi9b)
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
