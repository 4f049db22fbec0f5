package graft.staging

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** L2 staging — seller-center brand catalog (reference:
  * core/smartstore/hcenter/catalog/models.sql, BrandCatalog): the
  * `>`-delimited category path split into four (id, name) levels
  * (`SPLIT_PART(fullId, '>', n)` with empty→NULL), `NULLIF(makerSeq, 0)`,
  * nested price/image paths, and the ISO-8601 'T' register parse.
  */
object HcenterCatalog {

  val payloadSchema: StructType = StructType(Seq(
    StructField("identifier", LongType),
    StructField("prodName", StringType),
    StructField("makerSeq", LongType),
    StructField("makerName", StringType),
    StructField("brandSeq", LongType),
    StructField("brandName", StringType),
    StructField("category", StructType(Seq(
      StructField("identifier", StringType),
      StructField("name", StringType),
      StructField("fullId", StringType),
      StructField("fullName", StringType)))),
    StructField("lowestPrice", IntegerType),
    StructField("productCount", IntegerType),
    StructField("totalReviewCount", IntegerType),
    StructField("registerDate", StringType)))

  def stageBrandCatalog(raw: DataFrame, payloadCol: Column): DataFrame = {
    // Parse ONCE into an intermediate struct column (own projection):
    // with getField directly over from_json in a single projection,
    // Catalyst's JSON schema pruning rewrites EVERY field access into
    // its own single-field from_json — the r15 q91 plan carried 13
    // separate parses of the same payload per row (non-codegen Project,
    // ~14 full JSON parses/row). Extracting from a struct ATTRIBUTE in
    // a separate select leaves nothing for the pruning rule to match,
    // and CollapseProject keeps the boundary because the parse is an
    // expensive expression referenced many times. All fields of the
    // schema are consumed, so pruning had nothing to save anyway.
    val parsed = raw.select(from_json(payloadCol, payloadSchema).as("__p"))
    val p = col("__p")
    val cat = p.getField("category")
    def level(n: Int): Seq[Column] = Seq(
      expr(s"try_cast(split_part(__full_id, '>', $n) AS INT)")
        .as(s"category_id$n"),
      nullif(split_part(col("__full_name"), lit(">"), lit(n)), lit(""))
        .as(s"category_name$n"))
    parsed.select(
        p.getField("identifier").as("product_id"),
        p.getField("prodName").as("catalog_name"),
        nullif(p.getField("makerSeq"), lit(0L)).as("maker_id"),
        p.getField("makerName").as("maker_name"),
        p.getField("brandSeq").as("brand_id"),
        p.getField("brandName").as("brand_name"),
        cat.getField("identifier").as("__cat_id"),
        cat.getField("name").as("category_name"),
        cat.getField("fullId").as("__full_id"),
        cat.getField("fullName").as("__full_name"),
        p.getField("lowestPrice").as("lowest_price"),
        p.getField("productCount").as("product_count"),
        p.getField("totalReviewCount").as("review_count"),
        p.getField("registerDate").as("__reg"))
      .select(Seq(
        col("product_id"), col("catalog_name"), col("maker_id"),
        col("maker_name"), col("brand_id"), col("brand_name"),
        expr("try_cast(__cat_id AS INT)").as("category_id"),
        col("category_name")) ++
        (1 to 4).flatMap(level) ++ Seq(
        col("lowest_price"), col("product_count"), col("review_count"),
        expr("try_to_timestamp(substring(__reg, 1, 19), " +
          "\"yyyy-MM-dd'T'HH:mm:ss\")").as("register_dt")): _*)
  }
}
