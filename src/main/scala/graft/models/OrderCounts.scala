package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Per-channel order-count source models (reference: intermediate/sales/
  * smartstore/smartstore__order_count.sql:19-99, sabangnet/
  * sabangnet__order_count.sql:20-126, coupang_rfm/coupang_rfm__order_count
  * .sql:18-81, and the rule macros in macros/mapping/sabangnet.sql:1-33).
  *
  * The shared shape: resolve an ORDER STATUS by priority (a core feed
  * overrides the channel's own status codes through a mapping ladder),
  * resolve the BUNDLE through a fallback chain (relation → channel dim →
  * the '200000' sentinel), explode the bundle string, downgrade rows whose
  * component id is '9'-prefixed (sample/giveaway products), and re-aggregate
  * at the exploded grain. Channel-specific quirks kept faithfully:
  * smartstore's delivery_type-7 passthrough, sabangnet's shop exclusion
  * list + '병원출고' shop rewrite + quantity-conditioned bundle rewrite,
  * coupang's week-widened prefilter + LEAST(status, 3) clamp.
  */
object OrderCounts {

  private val nullStr = lit(null).cast("string")

  /** The shared core order-status feed (reference source('core',
    * 'order_status')): hand-entered overrides keyed by a STRING order id —
    * numeric for smartstore rows (the regexp gate is the point), prefixed
    * for other shops.
    */
  private[models] def coreStatus(s: SparkSession, sfDir: String): DataFrame =
    Tables.orders(s, sfDir)
      .filter(pmod(col("o_orderkey"), lit(6)) === 0)
      .select(
        // smartstore rows carry numeric ids (some corrupted with a prefix —
        // the regexp gate's reason to exist); other shops use the channel's
        // 'ORD…' form so the sabangnet join can hit
        when(pmod(col("o_orderkey"), lit(30)) === 0,
            when(pmod(col("o_orderkey"), lit(60)) === 0,
                concat(lit("X"), col("o_orderkey")))
              .otherwise(col("o_orderkey").cast("string")))
          .otherwise(concat(lit("ORD"), col("o_orderkey"))).as("order_id"),
        when(pmod(col("o_orderkey"), lit(30)) === 0, lit("스마트스토어"))
          .otherwise(lit("기타")).as("shop_name"),
        (pmod(col("o_orderkey"), lit(4)) + 1).cast("int").as("order_status"),
        to_date(col("o_orderdate")).as("order_date"))

  def install(r: ModelRegistry, sfDir: String): Unit = {

    // ---- smartstore order count (reference: smartstore__order_count.sql:
    // 19-99): channel status codes map through 7→1 / 5→2 / (6,8)→3, the
    // core feed (numeric ids only, smartstore rows only) overrides
    // unconditionally, bundles fall back relation → channel brand →
    // '200000', and exploded '9'-prefixed components downgrade open
    // orders to status 3.
    r.register(Model("smartstore_order_count", Nil, Incremental("order_date"),
      ctx => {
        val s = ctx.session
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")
        val pid = (lit(200000) + pmod(col("l_partkey") * 7 + 3, lit(500)))
          .cast("string")
        val ord = Tables.lineitem(s, sfDir)
          .join(Tables.orders(s, sfDir).select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("order_date").between(startD, endD))
          .select(col("l_orderkey").as("order_id"),
            (col("l_orderkey") * 10 + col("l_linenumber"))
              .as("product_order_id"),
            pmod(col("l_suppkey"), lit(7)).as("channel_seq"),
            concat(pid, lit("-"),
              lpad((pmod(col("l_linenumber"), lit(4)) + 1).cast("string"),
                4, "0")).as("option_id"),
            when(pmod(col("l_orderkey"), lit(9)) === 0, lit(7))
              .otherwise(pmod(col("l_orderkey"), lit(3)).cast("int"))
              .as("delivery_type"),
            coalesce(when(pmod(col("l_orderkey"), lit(13)) === 0,
                lit(null).cast("long"))
              .otherwise(col("l_quantity").cast("long")), lit(0L))
              .as("order_quantity"),
            col("order_date"),
            element_at(array(lit(0), lit(5), lit(6), lit(7), lit(8)),
              (pmod(col("l_partkey") + col("l_orderkey"), lit(5)) + 1)
                .cast("int")).as("__smt_status_raw"))
        // channel status feed: MAX per product_order_id (the reference's
        // GROUP BY over the status event stream)
        val statusSmt = ord.groupBy(col("product_order_id"))
          .agg(max(col("__smt_status_raw")).as("status_smt"))
        val statusCor = coreStatus(s, sfDir)
          .filter(col("order_date").between(startD, endD) &&
            col("shop_name") === "스마트스토어" &&
            col("order_id").rlike("^[0-9]+$"))
          .groupBy(col("order_id").cast("bigint").as("order_id"))
          .agg(max(col("order_status")).as("status_cor"))
        // relation: bundles for options whose numeric pid % 5 ∈ {0, 1};
        // pid % 5 = 0 carries a 9-prefixed second component
        val relPid = expr(
          "try_cast(split(option_id, '-')[0] AS BIGINT)")
        val rel = ord.select(col("option_id")).distinct()
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
        val chl = graft.functions.F.inlineDim(s, Seq("channel_seq", "brand_id"),
          (0 until 7).map(i => Seq(i,
            if (i % 3 == 0) null else s"20020$i")))
          .withColumn("channel_seq", col("channel_seq").cast("bigint"))
        val bundled = ord
          .join(rel, Seq("option_id"), "left")
          .join(broadcast(chl), Seq("channel_seq"), "left")
          .join(statusSmt, Seq("product_order_id"), "left")
          .join(statusCor, Seq("order_id"), "left")
          .select(col("order_id"), col("product_order_id"),
            coalesce(col("bundle_product_ids"), col("brand_id"),
              lit("200000")).as("bundle_product_ids"),
            when(col("status_cor").isNotNull, col("status_cor"))
              .when(col("status_smt") === 7, lit(1))
              .when(col("status_smt") === 5, lit(2))
              .when(col("status_smt").isin(6, 8), lit(3))
              .otherwise(lit(0)).as("order_status"),
            when(col("delivery_type") === 7, lit(7)).otherwise(lit(0))
              .as("delivery_type"),
            col("order_quantity"), col("order_date"))
        bundled
          .select(col("order_id"), col("product_order_id"),
            col("order_status"), col("delivery_type"),
            col("order_quantity"), col("order_date"),
            explode(split(col("bundle_product_ids"), ",")).as("component"))
          .select(col("order_id"), col("product_order_id"),
            split(col("component"), ":").getItem(0).as("product_id"),
            when(col("order_status") === 0 &&
                substring(col("component"), 1, 1) === "9", lit(3))
              .otherwise(col("order_status")).as("order_status"),
            col("delivery_type"), col("order_quantity"), col("order_date"))
          .groupBy(col("order_id"), col("product_order_id"),
            col("order_date"), col("product_id"), col("delivery_type"),
            col("order_status"))
          .agg(sum(col("order_quantity")).as("order_quantity"))
      }))

    // ---- sabangnet order count (reference: sabangnet__order_count.sql:
    // 20-126 + macros/mapping/sabangnet.sql:1-33): account-joined shop
    // exclusion list, the '병원출고' (hospital dispatch) shop rewrite
    // that rung 2 then filters, the quantity-conditioned bundle rewrite
    // ladder, invoice-status code groups → core override, explode
    // non-null bundles UNION the rest.
    r.register(Model("sabangnet_order_count", Nil, Incremental("order_date"),
      ctx => {
        val s = ctx.session
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")
        val opt = ProductMarts.sbnOption(s, sfDir)
          .select(col("option_id"), col("bundle_option_ids"))
        val ord = Tables.lineitem(s, sfDir)
          .join(Tables.orders(s, sfDir).select(col("o_orderkey"),
            to_date(col("o_orderdate")).as("order_date")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("order_date").between(startD, endD))
          .select(
            (col("l_orderkey") * 10 + col("l_linenumber")).as("order_seq"),
            when(pmod(col("l_orderkey"), lit(29)) === 0,
                concat(lit("병원출고"), col("l_orderkey")))
              .otherwise(concat(lit("ORD"), col("l_orderkey")))
              .as("order_id"),
            concat(lit("ORD"), col("l_orderkey"), lit("-"),
              col("l_linenumber")).as("product_order_id"),
            pmod(col("l_suppkey"), lit(5)).as("account_no"),
            concat((lit(200000) + pmod(col("l_partkey") * 7 + 3, lit(500)))
                .cast("string"), lit("-"),
              lpad((pmod(col("l_linenumber"), lit(4)) + 1).cast("string"),
                4, "0")).as("option_id"),
            coalesce(when(pmod(col("l_orderkey"), lit(17)) === 0,
                lit(null).cast("long"))
              .otherwise(col("l_quantity").cast("long")), lit(0L))
              .as("order_quantity"),
            (col("l_quantity").cast("long") * 10).as("sku_quantity"),
            col("order_date"),
            element_at(array(lit(7), lit(8), lit(9), lit(10), lit(11),
              lit(12), lit(21), lit(22), lit(23), lit(24), lit(25),
              lit(26), lit(999)),
              (pmod(col("l_partkey") * 3 + col("l_linenumber"), lit(13)) + 1)
                .cast("int")).as("__inv_status_raw"))
        val acc = graft.functions.F.inlineDim(s, Seq("account_no", "shop_id"),
          Seq(Seq(0, "shop0055"), Seq(1, "shop0100"), Seq(2, "chop0022"),
            Seq(3, "shop0666"), Seq(4, "shop0200")))
          .withColumn("account_no", col("account_no").cast("bigint"))
        val invoice = ord.groupBy(col("order_seq"))
          .agg(max(col("__inv_status_raw")).as("status_sbn_raw"))
        val statusCor = coreStatus(s, sfDir)
          .filter(col("order_date").between(startD, endD) &&
            col("shop_name") =!= "스마트스토어")
          .groupBy(col("order_id"))
          .agg(max(col("order_status")).as("status_cor"))
        val detail = ord
          .join(broadcast(acc), Seq("account_no"), "left")
          .filter(!col("shop_id").isin("shop0055", "chop0022", "chop0027",
            "chop0028", "chop0029"))
          .join(opt, Seq("option_id"), "left")
          .join(invoice, Seq("order_seq"), "left")
          .join(statusCor, Seq("order_id"), "left")
          .select(col("order_id"), col("product_order_id"),
            // shop_id_rules: hospital-dispatch orders re-home to chop9022
            when(col("order_id").startsWith("병원출고"), lit("chop9022"))
              .otherwise(col("shop_id")).as("shop_id"),
            split(col("option_id"), "-").getItem(0).as("product_id"),
            // bundle_option_rules: quantity-conditioned rewrites beat the
            // raw bundle string (reference option ids remapped to this id
            // space: 200345/200377 → 200330/200741)
            when(col("option_id") === "200345-0001" &&
                col("sku_quantity") >= 100, lit("200330-0001:1"))
              .when(col("option_id") === "200377-0001" &&
                col("sku_quantity") >= 100, lit("200741-0001:1"))
              .when(col("bundle_option_ids").isNull, nullStr)
              .when(col("bundle_option_ids") === "200345-0001:100",
                lit("200330-0001:1"))
              .when(col("bundle_option_ids") === "200377-0001:100",
                lit("200741-0001:1"))
              .otherwise(col("bundle_option_ids")).as("bundle_option_ids"),
            // order_status_rules: core override, then invoice code groups
            when(col("status_cor").isNotNull, col("status_cor"))
              .when(col("status_sbn_raw").isin(9, 12, 25, 26), lit(1))
              .when(col("status_sbn_raw").isin(8, 11, 21, 22, 23, 24),
                lit(2))
              .when(col("status_sbn_raw").isin(7, 10, 999), lit(3))
              .otherwise(lit(0)).as("order_status"),
            col("order_quantity"), col("order_date"))
          .filter(col("shop_id") =!= "chop9022")
        val nonBundle = detail.filter(col("bundle_option_ids").isNull)
          .drop("bundle_option_ids")
        val exploded = detail.filter(col("bundle_option_ids").isNotNull)
          .select(col("order_id"), col("product_order_id"), col("shop_id"),
            col("order_status"), col("order_quantity"), col("order_date"),
            explode(split(col("bundle_option_ids"), ",")).as("component"))
          .select(col("order_id"), col("product_order_id"), col("shop_id"),
            split(col("component"), "-").getItem(0).as("product_id"),
            col("order_status"), col("order_quantity"), col("order_date"))
        nonBundle.unionByName(exploded)
          .groupBy(col("order_id"), col("product_order_id"),
            col("order_date"), col("product_id"), col("shop_id"),
            col("order_status"))
          .agg(sum(col("order_quantity")).as("order_quantity"))
      }))

    // ---- coupang rocket order count (reference: coupang_rfm__order_count
    // .sql:18-81): the pre-aggregation window is WIDENED to whole weeks
    // (late-arriving settlement rows of the same order must fold into the
    // MAX/SUM before the exact date filter), bundles fall back relation →
    // vendor brand list → sentinel, and the explode clamps the settlement
    // code with LEAST(status, 3), '9'-prefixed components forcing 6.
    r.register(Model("coupang_order_count", Nil, Incremental("order_date"),
      ctx => {
        val s = ctx.session
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")
        // Monday-start week bounds (BigQuery bq_week_start_date /
        // bq_week_end_date macros)
        val weekStart = date_sub(startD,
          (dayofweek(startD) + lit(5)) % 7)
        val weekEnd = date_add(
          date_sub(endD, (dayofweek(endD) + lit(5)) % 7), 6)
        val sales = Tables.lineitem(s, sfDir).select(
            concat(lit("CO"), col("l_orderkey")).as("order_id"),
            concat(lit("CP"), col("l_partkey"), lit("-"),
              pmod(col("l_linenumber"), lit(3))).as("option_id"),
            pmod(col("l_suppkey"), lit(20)).as("vendor_id"),
            element_at(array(lit(0), lit(1), lit(3), lit(6)),
              (pmod(col("l_orderkey") + col("l_partkey"), lit(4)) + 1)
                .cast("int")).as("settlement_type"),
            (col("l_quantity").cast("long") - lit(26)).as("order_quantity"),
            to_date(col("l_shipdate")).as("sales_date"))
          .filter(col("sales_date").between(weekStart, weekEnd))
        val rocket = sales
          .groupBy(col("order_id"), col("option_id"), col("vendor_id"))
          .agg(max(col("settlement_type")).as("order_status"),
            sum(col("order_quantity")).as("order_quantity"),
            max(col("sales_date")).as("sales_date"))
        val rel = sales.select(col("option_id")).distinct()
          .withColumn("__p", expr(
            "cast(regexp_extract(option_id, 'CP([0-9]+)-', 1) AS BIGINT)"))
          .filter(pmod(col("__p"), lit(3)) === 0)
          .select(col("option_id"),
            when(pmod(col("__p"), lit(9)) === 0,
              concat((lit(900000) + pmod(col("__p") * 11, lit(200)))
                .cast("string"), lit(":1")))
              .otherwise(concat(
                (lit(200000) + pmod(col("__p") * 11 + 3, lit(400)))
                  .cast("string"), lit(":1")))
              .as("bundle_product_ids"))
        val vdr = graft.functions.F.inlineDim(s,
          Seq("vendor_id", "bundle_brand_ids"),
          (0 until 20).map(i => Seq(i,
            if (i % 4 == 0) null else s"2005${"%02d".format(i)}")))
          .withColumn("vendor_id", col("vendor_id").cast("bigint"))
        val bundled = rocket
          .join(rel, Seq("option_id"), "left")
          .join(broadcast(vdr), Seq("vendor_id"), "left")
          .filter(col("sales_date").between(startD, endD) &&
            col("order_quantity") =!= 0)
          .select(col("order_id"),
            coalesce(col("bundle_product_ids"), col("bundle_brand_ids"),
              lit("200000")).as("bundle_product_ids"),
            col("order_status"), col("order_quantity"),
            col("sales_date").as("order_date"))
        bundled
          .select(col("order_id"), col("order_status"),
            col("order_quantity"), col("order_date"),
            explode(split(col("bundle_product_ids"), ",")).as("component"))
          .select(col("order_id"),
            split(col("component"), ":").getItem(0).as("product_id"),
            when(col("order_status") === 0 &&
                substring(col("component"), 1, 1) === "9", lit(6))
              .otherwise(least(col("order_status"), lit(3)))
              .as("order_status"),
            col("order_quantity"), col("order_date"))
          .groupBy(col("order_id"), col("order_date"), col("product_id"),
            col("order_status"))
          .agg(sum(col("order_quantity")).as("order_quantity"))
      }))
  }
}
