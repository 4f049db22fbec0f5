package graft.staging

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** L2 staging — ranked shop-search payload (FIXTURES.md §4; reference:
  * core/naver/openapi/search/models.sql:182-202): result rows carry HTML
  * tags in titles, string-typed numerics, a sentinel mall name mapped to
  * NULL, and a request-relative display rank.
  *
  * - `display_rank = ROW_NUMBER() OVER () + $start - 1` (W2 global rank —
  *   deliberately single-partition: one API page is ≤100 rows);
  * - `product_id = regexp_extract(link, '/products/(\d+)$')` (NULL on miss);
  * - `product_name = regexp_replace(title, '<[^>]+>', '')` (tag strip);
  * - `product_type = (type + 2) % 3` recode;
  * - sentinel mall name → NULL.
  */
object ShopSearch {

  def stage(raw: DataFrame, keyword: String, start: Int,
            sentinelMall: String = "네이버"): DataFrame = {
    val w = Window.orderBy(monotonically_increasing_id())
    raw.select(
        lit(keyword).as("keyword"),
        (row_number().over(w) + start - 1).cast("long").as("display_rank"),
        expr("try_cast(productId AS BIGINT)").as("nv_mid"),
        expr("try_cast(regexp_extract(link, '/products/([0-9]+)$', 1) AS BIGINT)")
          .as("product_id"),
        regexp_replace(col("title"), "<[^>]+>", "").as("product_name"),
        pmod(expr("try_cast(productType AS INT)") + 2, lit(3)).as("product_type"),
        when(col("mallName") === sentinelMall, lit(null))
          .otherwise(nullif(col("mallName"), lit(""))).as("mall_name"),
        nullif(col("brand"), lit("")).as("brand"),
        col("category1"), col("category2"),
        expr("try_cast(lprice AS BIGINT)").as("low_price"))
  }
}
