package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** L2 staging — naver OpenAPI blog search (reference:
  * core/naver/openapi/search/models.sql, BlogSearch): display rank =
  * page-relative row number offset by `$start`, HTML markup stripped from
  * title/description (`REGEXP_REPLACE('<[^>]+>')`), `%Y%m%d` post date.
  *
  * The reference's `ROW_NUMBER() OVER ()` leans on the API's row order;
  * a distributed engine has no implicit order, so the caller names the
  * arrival-order column (`orderCol`) and the rank is a window over it —
  * deterministic under any partitioning.
  */
object NaverOpenapiSearch {

  private def stripTags(c: Column): Column =
    regexp_replace(c, "<[^>]+>", "")

  def stageBlogSearch(raw: DataFrame, keyword: String, start: Int,
                      orderCol: Column): DataFrame =
    raw.select(
        lit(keyword).as("keyword"),
        (row_number().over(Window.orderBy(orderCol)) + start - 1).cast("int")
          .as("display_rank"),
        stripTags(col("title")).as("title"),
        col("link").as("url"),
        stripTags(col("description")).as("description"),
        col("bloggername").as("address"),
        col("bloggerlink").as("blogger_url"),
        expr("to_date(try_to_timestamp(postdate, 'yyyyMMdd'))").as("post_date"))
}
