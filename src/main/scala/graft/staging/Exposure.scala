package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.F

/** L2 staging — search-ad exposure diagnosis (reference:
  * core/searchad/center/exposure/models.sql:16-36 `ExposureDiagnosis`):
  *
  * - the product id is recovered from the image URL by host family: CDN
  *   hosts carry it as a path segment (`regexp_extract`); ad hosts carry it
  *   base64-encoded (`unbase64` → cast) — a CASE over `startswith`;
  * - empty brand/maker strings become NULL (`NULLIF`);
  * - price coalesces desktop-then-mobile and TRY_CASTs;
  * - the `$is_own` parameter is the reference's null-safe optional filter —
  *   absent means no predicate at all ([[F.optEquals]] folds to `true` at
  *   plan time, so the filter vanishes from the physical plan).
  */
object Exposure {

  def stage(raw: DataFrame, keyword: String,
            isOwn: Option[Boolean] = None): DataFrame =
    raw
      .filter(F.optEquals(col("isOwn"), isOwn))
      .select(
        lit(keyword).as("keyword"),
        col("rank").cast("int").as("display_rank"),
        when(col("imageUrl").startsWith("https://shopping-"),
            expr("try_cast(regexp_extract(imageUrl, '^https://[^/]+/main_[0-9]+/([0-9]+)', 1) AS BIGINT)"))
          .when(col("imageUrl").startsWith("https://searchad-"),
            expr("try_cast(decode(unbase64(regexp_extract(imageUrl, '^https://[^/]+/[^/]+/([^.]+)', 1)), 'UTF-8') AS BIGINT)"))
          .otherwise(lit(null).cast("long")).as("nv_mid"),
        col("productTitle").as("product_name"),
        col("isOwn").as("is_own"),
        col("categoryNames").as("full_category_name"),
        nullif(col("fmpBrand"), lit("")).as("brand_name"),
        nullif(col("fmpMaker"), lit("")).as("maker_name"),
        col("imageUrl").as("image_url"),
        expr("try_cast(coalesce(lowPrice, mobileLowPrice) AS INT)").as("sales_price"))
}
