package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-total allocation operators.
  *
  * A8 — weighted allocation with remainder repair (reference:
  * dbt_bigquery/models/intermediate/sales/smartstore__sales_daily.sql:171-217
  * payment split, :335-371 delivery-fee split;
  * dbt_bigquery/models/intermediate/sales/sabangnet__sales_daily.sql:210-259):
  * two-pass — per-group weight `x/SUM(x) OVER g`, ROUND to cents, then the
  * first row (deterministic order) absorbs `total - SUM(split) OVER g` so the
  * group total is preserved exactly.
  *
  * A9 — integer div/mod equal split across an exploded bundle (reference:
  * dbt_bigquery/models/intermediate/ads/searchad__insight_daily.sql:197-230):
  * `DIV(x,n) + IF(offset=0, MOD(x,n), 0)`.
  *
  * Scale notes: both are single-window-shuffle operators — one hash exchange
  * on the group key, no joins, no driver-side loops. Group cardinality is the
  * only skew axis; groups are small (order line counts), so no salting needed.
  */
object Allocation {

  /** Weighted split of `total` across rows of a group, proportional to
    * `weight`, rounded to `scale` decimals; the first row under `order`
    * absorbs the rounding remainder so SUM(alloc) == total exactly per group.
    *
    * Arithmetic is done in double with a fixed operation order
    * (total * weight / weightSum) then rounded and repaired in decimal, so
    * results are deterministic and totals are exact.
    */
  def weightedAllocate(df: DataFrame, partition: Seq[Column], order: Seq[Column],
                       total: Column, weight: Column,
                       out: String, scale: Int = 2): DataFrame = {
    val wOrd = Window.partitionBy(partition: _*).orderBy(order: _*)
    // whole-partition aggregates phrased over the ORDERED spec with an
    // explicit full rows frame: same values, but every window function in
    // the operator shares one (partitionBy, orderBy) and so one WindowExec
    // and one sort, instead of alternating ordered/unordered specs
    val w = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val p = 38
    val weightSum = sum(weight).over(w)
    // Round via DECIMAL(38,10): rounding the raw double directly is
    // engine-dependent at shortest-repr ties (x.xx5); the 10-dp decimal
    // snapshot is identical across engines, and decimal→2dp rounding is
    // well-defined HALF_UP everywhere.
    // NULLIF + COALESCE: an all-zero-weight group (reference: coupang_rfm__
    // sales_daily.sql:225 `cost_amount / NULLIF(SUM(cost_amount) OVER …, 0)`)
    // splits to 0 everywhere and the first row absorbs the full total
    val raw = coalesce(
      round((total * weight / nullif(weightSum, lit(0)))
        .cast(s"decimal($p,10)"), scale).cast(s"decimal($p,$scale)"),
      lit(0).cast(s"decimal($p,$scale)"))
    val withRaw = df.withColumn("__raw", raw)
      .withColumn("__rn", row_number().over(wOrd))
    // remainder = total - sum(rounded) ; absorbed by row 1
    val rawSum = sum(col("__raw")).over(w)
    withRaw
      .withColumn(out,
        when(col("__rn") === 1,
          (total.cast(s"decimal($p,$scale)") - rawSum + col("__raw")).cast(s"decimal($p,$scale)"))
        .otherwise(col("__raw")))
      .drop("__raw", "__rn")
  }

  /** [[weightedAllocate]] for several (total, out) measures sharing one
    * group and one weight: all per-measure window sums land in a single
    * WindowExec (identical unordered spec), the row_number is computed
    * once, and the remainder repair applies per measure. Semantically
    * identical to folding weightedAllocate per measure; physically it
    * halves the window stages — the difference between 4 and 2 sorts on a
    * mart that allocates payment and supply over the same order grain.
    */
  def weightedAllocateMulti(df: DataFrame, partition: Seq[Column],
                            order: Seq[Column], weight: Column,
                            measures: Seq[(Column, String)],
                            scale: Int = 2): DataFrame = {
    val wOrd = Window.partitionBy(partition: _*).orderBy(order: _*)
    val w = wOrd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing) // see weightedAllocate: one shared sort
    val p = 38
    val weightSum = sum(weight).over(w)
    val withRaw = measures.zipWithIndex.foldLeft(
      df.withColumn("__rn", row_number().over(wOrd))) {
      case (acc, ((total, _), i)) =>
        acc.withColumn(s"__raw$i", coalesce(
          round((total * weight / nullif(weightSum, lit(0)))
            .cast(s"decimal($p,10)"), scale).cast(s"decimal($p,$scale)"),
          lit(0).cast(s"decimal($p,$scale)")))
    }
    val repaired = measures.zipWithIndex.foldLeft(withRaw) {
      case (acc, ((total, out), i)) =>
        acc.withColumn(out,
          when(col("__rn") === 1,
            (total.cast(s"decimal($p,$scale)")
              - sum(col(s"__raw$i")).over(w) + col(s"__raw$i"))
              .cast(s"decimal($p,$scale)"))
          .otherwise(col(s"__raw$i")))
    }
    repaired.drop("__rn" +: measures.indices.map(i => s"__raw$i"): _*)
  }

  /** Equal integer split of `amount` over `n` slots for a row exploded with
    * `posexplode` offset `pos`: every slot gets amount DIV n, slot 0 also
    * gets amount MOD n. Total is preserved exactly.
    */
  def divModAllocate(amount: Column, n: Column, pos: Column): Column =
    (amount / n).cast("long") + when(pos === 0, amount % n).otherwise(lit(0L))
}
