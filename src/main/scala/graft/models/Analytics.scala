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

    // 2-source UNION ALL → re-aggregate (the reference's 6-source core fact)
    r.register(Model("core_sales_daily",
      Seq("sales_orders", "sales_lineitems"), Incremental("ymd"), ctx => {
        ctx.ref("sales_orders").unionByName(ctx.ref("sales_lineitems"))
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

    r
  }
}
