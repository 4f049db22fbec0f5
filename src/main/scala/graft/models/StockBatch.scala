package graft.models

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.F

/** The batch stock-quantity family (reference: intermediate/stock/sources/
  * cj_eflexs__stock_qty_batch.sql, coupang_rfm__stock_qty_batch.sql,
  * ecount__stock_qty_batch.sql; intermediate/stock/core__stock_qty_batch
  * .sql).
  *
  * Structural patterns this file adds to the registry:
  *
  *  - the 17:00-cutoff batch stamp over a timestamp feed, per channel;
  *  - a csv item-code mapping exploded then TRIM/DISTINCT'd before the
  *    stock join (cj item_mapping);
  *  - a timestamp-validity expiration join + a null-preserving bundle
  *    explode whose components carry ':qty' multipliers (coupang —
  *    `LEFT JOIN UNNEST` spelled as explode_outer, the multiplier via
  *    try_element_at/try_cast with a 1 default);
  *  - the sku→ecount repair map: parse-tolerant date (try_to_date with
  *    the 2999-12-31 fallback), NULLIF('') option ids, and a QUALIFY
  *    dedup ordered by freshness with full content tie-breaks;
  *  - the three-channel union re-aggregated with per-channel conditional
  *    sums (`SUM(IF(group_id = k, qty, NULL))` — NULL when a channel has
  *    no rows for the key).
  *
  * Scale: each channel aggregates to its (ymd, batch, key) grain before
  * the core union, so the final shuffle carries pre-combined partials;
  * the sku/option mapping joins have unique (deduped) right sides. The
  * one deliberate fan-out is the cj item mapping: an item code can map
  * to several products (the csv explode keeps DISTINCT (item, product)
  * PAIRS, per the reference), so a stock row's quantity is counted under
  * each mapped product — bounded by the mapping's max products-per-item.
  */
object StockBatch {

  private val nullStr = lit(null).cast("string")

  def install(r: ModelRegistry, sfDir: String): Unit = {
    installFeeds(r, sfDir)
    installSources(r, sfDir)
    installCore(r, sfDir)
  }

  private def installFeeds(r: ModelRegistry, sfDir: String): Unit = {
    def ts(dateExpr: String, hourExpr: String) =
      expr(s"cast($dateExpr AS TIMESTAMP) + " +
        s"make_interval(0, 0, 0, 0, cast($hourExpr AS INT), 0, 0)")

    r.register(Model("eco_inventory", Nil, View, ctx =>
      Tables.lineitem(ctx.session, sfDir)
        .filter(pmod(col("l_orderkey"), lit(6)) === 2)
        .select(
          concat(lit("EC"), pmod(col("l_partkey"), lit(900)))
            .as("product_code"),
          col("l_quantity").cast("long").as("quantity"),
          ts("l_shipdate", "l_suppkey % 24").as("updated_at"))))

    // one row per product_code by construction (p < 900, p unique)
    r.register(Model("eco_product", Nil, View, ctx => {
      val p = col("p_partkey")
      Tables.part(ctx.session, sfDir).filter(p < 900).select(
        concat(lit("EC"), p).as("product_code"),
        when(pmod(p, lit(6)) === 0, lit(""))
          .when(pmod(p, lit(5)) === 0, nullStr)
          .otherwise(concat(pmod(p, lit(800)), lit("-"), pmod(p, lit(3))))
          .as("option_id"),
        when(pmod(p, lit(7)) === 0, lit("BAD"))
          .otherwise(date_format(
            expr("date_add(DATE '1996-01-01', cast(p_partkey % 200 AS INT))"),
            "yyyyMMdd")).as("expiration_date"),
        when(pmod(p, lit(17)) === 0, lit(null).cast("timestamp"))
          .otherwise(expr("cast(date_add(DATE '1996-01-01', " +
            "cast(p_partkey % 300 AS INT)) AS TIMESTAMP) + " +
            "make_interval(0, 0, 0, 0, cast(p_partkey % 24 AS INT), 0, 0)"))
          .as("updated_at"))
    }))

    r.register(Model("cj_stock", Nil, View, ctx =>
      Tables.lineitem(ctx.session, sfDir)
        .filter(pmod(col("l_orderkey"), lit(5)) === 0)
        .select(
          concat(lit("IT"), pmod(col("l_partkey"), lit(600)))
            .as("item_code"),
          when(pmod(col("l_suppkey"), lit(4)) === 0,
            lit(null).cast("date"))
            .otherwise(date_add(to_date(col("l_shipdate")), 30))
            .as("validate_date"),
          col("l_quantity").cast("long").as("usable_quantity"),
          ts("l_shipdate", "l_suppkey % 24").as("updated_at"))))

    r.register(Model("core_item", Nil, View, ctx => {
      val p = col("p_partkey")
      Tables.part(ctx.session, sfDir).filter(p < 500).select(
        when(pmod(p, lit(16)) === 0, nullStr)
          .otherwise(pmod(p, lit(800)).cast("string")).as("product_id"),
        when(pmod(p, lit(9)) === 0, nullStr)
          .otherwise(concat(lit("IT"), pmod(p, lit(600)), lit(", IT"),
            pmod(p + 7, lit(600)))).as("eflexs_item_code"))
    }))

    r.register(Model("cpg_inventory", Nil, View, ctx =>
      Tables.lineitem(ctx.session, sfDir)
        .filter(pmod(col("l_orderkey"), lit(4)) === 1)
        .select(
          pmod(col("l_partkey"), lit(400)).cast("long").as("option_id"),
          col("l_quantity").cast("long").as("stock_quantity"),
          ts("l_shipdate", "l_suppkey % 24").as("updated_at"))))

    r.register(Model("cpg_inventory_exp", Nil, View, ctx => {
      val p = col("p_partkey")
      Tables.part(ctx.session, sfDir).filter(p < 400).select(
        p.cast("long").as("exp_option_id"),
        expr("cast(date_add(DATE '1992-01-01', " +
          "cast(p_partkey % 100 AS INT)) AS TIMESTAMP)").as("start_time"),
        expr("cast(date_add(DATE '1992-01-01', " +
          "cast(p_partkey % 100 + 2000 AS INT)) AS TIMESTAMP)")
          .as("end_time"),
        expr("date_add(DATE '1996-01-01', cast(p_partkey % 200 AS INT))")
          .as("expiration_date"))
    }))

    // raw (unstripped) option→bundle relation: ':2' multipliers survive
    r.register(Model("cpg_opt_raw", Nil, View, ctx => {
      val p = col("p_partkey")
      Tables.part(ctx.session, sfDir).filter(p < 400).select(
        p.cast("long").as("rel_option_id"),
        when(pmod(p, lit(5)) === 0, nullStr)
          .otherwise(concat(pmod(p, lit(800)), lit(":2,"),
            pmod(p + 7, lit(800)))).as("bundle_product_ids"))
    }))
  }

  private def installSources(r: ModelRegistry, sfDir: String): Unit = {
    def inRange(ctx: ModelContext) = {
      val startD = lit(ctx.params("ds_start_date")).cast("date")
      val endD = lit(ctx.params("ds_end_date")).cast("date")
      col("updated_at") >= startD.cast("timestamp") &&
        col("updated_at") < date_add(endD, 1).cast("timestamp")
    }
    val batch = when(hour(col("updated_at")) < 17, lit(10))
      .otherwise(lit(20)).as("batch")

    // ecount__stock_qty_batch.sql:18-35
    r.register(Model("ecount_stock_qty_batch", Seq("eco_inventory"),
      Incremental("ymd"), ctx =>
        ctx.ref("eco_inventory").filter(inRange(ctx))
          .select(col("updated_at").cast("date").as("ymd"), batch,
            col("product_code"), col("quantity"))
          .groupBy(col("ymd"), col("batch"), col("product_code"))
          .agg(sum(col("quantity")).as("stock_quantity"))))

    // cj_eflexs__stock_qty_batch.sql:18-50: the csv item-code mapping,
    // exploded + TRIM'd + DISTINCT'd, then the '200000'/2999-12-31
    // fallbacks
    r.register(Model("cj_eflexs_stock_qty_batch",
      Seq("cj_stock", "core_item"), Incremental("ymd"), ctx => {
        val mapping = ctx.ref("core_item")
          .filter(col("product_id").isNotNull)
          .select(col("product_id"),
            explode(split(coalesce(col("eflexs_item_code"), lit("")), ","))
              .as("raw_code"))
          .select(trim(col("raw_code")).as("item_code"), col("product_id"))
          .filter(col("item_code") =!= "")
          .distinct()
        ctx.ref("cj_stock").filter(inRange(ctx))
          .join(mapping, Seq("item_code"), "left")
          .select(col("updated_at").cast("date").as("ymd"), batch,
            coalesce(col("product_id"), lit("200000")).as("product_id"),
            coalesce(col("validate_date"), lit("2999-12-31").cast("date"))
              .as("expiration_date"),
            col("usable_quantity"))
          .groupBy(col("ymd"), col("batch"), col("product_id"),
            col("expiration_date"))
          .agg(sum(col("usable_quantity")).as("stock_quantity"))
      }))

    // coupang_rfm__stock_qty_batch.sql:18-45: expiration validity join +
    // null-preserving bundle explode with ':qty' multipliers
    r.register(Model("coupang_rfm_stock_qty_batch",
      Seq("cpg_inventory", "cpg_inventory_exp", "cpg_opt_raw"),
      Incremental("ymd"), ctx => {
        val inv = ctx.ref("cpg_inventory").filter(inRange(ctx))
        val ex = ctx.ref("cpg_inventory_exp")
        val rel = ctx.ref("cpg_opt_raw")
        inv
          .join(ex, col("option_id") === col("exp_option_id") &&
            col("updated_at").between(col("start_time"), col("end_time")),
            "left")
          .join(rel, col("exp_option_id") === col("rel_option_id"), "left")
          .select(col("updated_at").cast("date").as("ymd"), batch,
            coalesce(col("expiration_date"), lit("2999-12-31").cast("date"))
              .as("expiration_date"),
            col("stock_quantity"),
            explode_outer(split(col("bundle_product_ids"), ","))
              .as("product"))
          .select(col("ymd"), col("batch"),
            coalesce(expr("try_element_at(split(product, ':'), 1)"),
              lit("200000")).as("product_id"),
            col("expiration_date"),
            (col("stock_quantity") *
              expr("coalesce(try_cast(try_element_at(split(product, ':')," +
                " 2) AS BIGINT), 1)")).as("stock_quantity"))
          .groupBy(col("ymd"), col("batch"), col("product_id"),
            col("expiration_date"))
          .agg(sum(col("stock_quantity")).as("stock_quantity"))
      }))
  }

  // core__stock_qty_batch.sql:18-105
  private def installCore(r: ModelRegistry, sfDir: String): Unit = {
    r.register(Model("core_stock_qty_batch",
      Seq("eco_product", "ecount_stock_qty_batch",
        "cj_eflexs_stock_qty_batch", "coupang_rfm_stock_qty_batch"),
      Incremental("ymd"), ctx => {
        // Step 1: parse-tolerant ecount product + the sku→ecount map
        val prd = ctx.ref("eco_product").select(
          col("product_code"),
          coalesce(expr("try_element_at(split(nullif(option_id, ''), '-')" +
            ", 1)"), lit("200000")).as("product_id"),
          expr("nullif(option_id, '')").as("option_id"),
          coalesce(expr("try_to_date(expiration_date, 'yyyyMMdd')"),
            lit("2999-12-31").cast("date")).as("expiration_date"),
          col("updated_at"))
        val sku = F.qualifyTopN(
          prd.filter(col("option_id").isNotNull)
            .select(col("product_id"), col("expiration_date"),
              col("product_code"), col("option_id"), col("updated_at")),
          Seq(col("product_id"), col("expiration_date")),
          Seq(col("updated_at").desc_nulls_last, col("product_code"),
            col("option_id")))
          .select(col("product_id").as("s_product_id"),
            col("expiration_date").as("s_expiration_date"),
            col("product_code").as("s_product_code"))

        // Step 2: per-channel rows mapped onto the ecount code space
        val eco = ctx.ref("ecount_stock_qty_batch")
          .join(prd.select(col("product_code").as("p_code")),
            col("product_code") === col("p_code"), "left")
          .select(col("ymd"), col("batch"),
            coalesce(col("p_code"), lit("")).as("product_code"),
            lit(0).as("group_id"), col("stock_quantity"))
        def mapped(model: String, gid: Int) = ctx.ref(model)
          .join(sku, col("product_id") === col("s_product_id") &&
            col("expiration_date") === col("s_expiration_date"), "left")
          .select(col("ymd"), col("batch"),
            coalesce(col("s_product_code"), lit("")).as("product_code"),
            lit(gid).as("group_id"), col("stock_quantity"))
        val cj = mapped("cj_eflexs_stock_qty_batch", 1)
        val cpg = mapped("coupang_rfm_stock_qty_batch", 2)

        // Step 3: channel-conditional re-aggregation
        eco.unionByName(cj).unionByName(cpg)
          .groupBy(col("ymd"), col("batch"), col("product_code"))
          .agg(sum(col("stock_quantity")).as("stock_qty"),
            sum(when(col("group_id") === 0, col("stock_quantity")))
              .as("ecount_stock_qty"),
            sum(when(col("group_id") === 1, col("stock_quantity")))
              .as("cj_eflexs_stock_qty"),
            sum(when(col("group_id") === 2, col("stock_quantity")))
              .as("coupang_rfm_stock_qty"))
      }))
  }
}
