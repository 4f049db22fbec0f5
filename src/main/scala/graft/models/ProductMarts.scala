package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The reference's marts/product family plus `core__brand_master`
  * (reference: dbt_bigquery/models/marts/product/smartstore__product_master
  * .sql, sabangnet__product_master.sql:1-101, sabangnet__option_master
  * .sql:1-93, coupang__option_master.sql:1-40, and intermediate/
  * core__brand_master.sql:1-20), re-expressed over the test star schema.
  *
  * Patterns these marts add over the ones already in the registry:
  *
  *  - double-QUALIFY dedup: `ROW_NUMBER() OVER (PARTITION BY product_id …)
  *    = 1 AND ROW_NUMBER() OVER (PARTITION BY brand_name …) = 1` — one row
  *    per product AND per brand, both windows evaluated on the same pre-filter
  *    row set (brand_master);
  *  - bundle-exploded primary-option selection: the option table's
  *    'optid:qty,optid:qty' bundle string explodes, components enrich from
  *    the item master, and `QUALIFY … ORDER BY item_seq ASC NULLS LAST,
  *    option_quantity DESC` keeps one representative per product
  *    (sabangnet__product_master.sql:27-52);
  *  - data-dependent sort-key scale: `POWER(10, MAX(LENGTH(qty)))` computed
  *    once and multiplied into every row's composite key — here a
  *    broadcast single-row aggregate, not a global window
  *    (sabangnet__product_master.sql:54-58,86-90);
  *  - ordered STRING_AGG of exploded components with a per-component
  *    fallback label (sabangnet__option_master.sql:31-46) — posexplode +
  *    array_sort(collect_list(struct(off, name))) keeps the aggregation
  *    deterministic and map-side combinable;
  *  - the REPEAT('9', LENGTH(MAX(sort_key))) sentinel for unmatched rows
  *    (sabangnet__option_master.sql:78-81), as a broadcast scalar.
  *
  * All source tables are synthesized deterministically from the TPC-H-ish
  * test tables with DuckDB-expressible arithmetic so every mart replays
  * value-for-value in the oracle.
  */
object ProductMarts {

  private val nullStr = lit(null).cast("string")

  /** Lazy shared-frame materialization for multi-consumer dedups whose
    * window order is total (recompute is value-identical): first action
    * fills the in-memory columnar cache, later consumers read it. The
    * eager disk checkpoint (F.checkpointShared) stays reserved for frames
    * whose recompute could resample a partitioner (F.globalRowNumber).
    */
  private def persistTopN(ctx: ModelContext, df: DataFrame): DataFrame =
    ctx.track(df.persist())

  /** Reference source('core','item'): the hand-maintained item sheet —
    * multiple rows per product_id (dedup is the point), 1xx/2xx/3xx-prefixed
    * 6-char product ids, nullable team/brand, the literal '브랜드 없음'
    * placeholder appearing as DATA (brand_master filters it out).
    */
  private[graft] def coreItem(s: SparkSession, sfDir: String): DataFrame =
    Tables.part(s, sfDir).select(
      (element_at(array(lit(100000), lit(200000), lit(300000)),
        (pmod(col("p_partkey"), lit(3)) + 1).cast("int"))
        + pmod(col("p_partkey"), lit(400))).cast("string").as("product_id"),
      concat(lit("NA-"), lpad(col("p_partkey").cast("string"), 6, "0"),
        lit("-00")).as("item_id"),
      pmod(col("p_partkey"), lit(97)).as("item_seq"),
      when(pmod(col("p_partkey"), lit(6)) === 0, nullStr)
        .otherwise(concat(lit("T"), pmod(col("p_partkey"), lit(5))))
        .as("team_name"),
      when(pmod(col("p_partkey"), lit(7)) === 0, nullStr)
        .when(pmod(col("p_partkey"), lit(11)) === 0, lit("브랜드 없음"))
        .otherwise(col("p_brand")).as("brand_name"),
      col("p_name").as("product_name"),
      // the test part table has no p_mfgr/p_container; first word of
      // p_type and a derived carton code stand in for them
      substring_index(col("p_type"), " ", 1).as("category_name1"),
      col("p_brand").as("category_name2"),
      when(pmod(col("p_partkey"), lit(4)) === 0, nullStr)
        .otherwise(col("p_type")).as("category_name3"),
      concat(lit("CTN"), pmod(col("p_partkey"), lit(8)))
        .as("category_name4"),
      when(pmod(col("p_partkey"), lit(5)) === 0, nullStr)
        .otherwise(concat(lit("EA"), pmod(col("p_partkey"), lit(4))))
        .as("unit_name"))

  /** One canonical row per product_id (the reference's core__product_master
    * view over the item sheet): smallest item_seq wins, item_id breaks ties
    * deterministically.
    */
  private[graft] def coreMaster(s: SparkSession, sfDir: String): DataFrame =
    graft.functions.F.qualifyTopN(coreItem(s, sfDir),
      Seq(col("product_id")), Seq(col("item_seq"), col("item_id")))

  /** Reference source('sabangnet','option'): one row per option_id after
    * dedup; ~10% carry a 2-component bundle string, ~10% a single
    * unquantified component.
    */
  private[graft] def sbnOption(s: SparkSession, sfDir: String): DataFrame = {
    // mod 500 (the product master uses mod 400): option ids 200400-200499
    // have no product-master row at any SF, so the option mart's all-9s
    // sentinel branch is exercised by real rows everywhere
    val pid = (lit(200000) + pmod(col("l_partkey") * 7 + 3, lit(500)))
      .cast("string")
    val comp1 = concat(
      (lit(200000) + pmod(col("l_partkey") * 7 + 13, lit(400))).cast("string"),
      lit("-0001"))
    val comp2 = concat(
      (lit(100000) + pmod(col("l_partkey") * 3 + 7, lit(400))).cast("string"),
      lit("-0002"))
    val raw = Tables.lineitem(s, sfDir).select(
      concat(pid, lit("-"),
        lpad((pmod(col("l_linenumber"), lit(4)) + 1).cast("string"), 4, "0"))
        .as("option_id"),
      concat(lit("G"), pmod(col("l_suppkey"), lit(5))).as("option_group"),
      concat(lit("OPT "), pmod(col("l_partkey"), lit(50)), lit(" / "),
        pmod(col("l_suppkey"), lit(20))).as("option_name"),
      when(pmod(col("l_partkey"), lit(10)) === 0,
          concat(comp1, lit(":2,"), comp2, lit(":1")))
        .when(pmod(col("l_partkey"), lit(10)) === 5, comp1)
        .otherwise(nullStr).as("bundle_option_ids"),
      element_at(array(lit("SALE"), lit("STOP")),
        (pmod(col("l_orderkey"), lit(2)) + 1).cast("int")).as("option_status"),
      when(pmod(col("l_suppkey"), lit(13)) === 0, lit(null).cast("int"))
        .otherwise(pmod(col("l_suppkey"), lit(3)).cast("int"))
        .as("option_type"),
      (pmod(col("l_orderkey"), lit(3)) + 1).as("option_quantity"),
      floor(col("l_extendedprice") / 10).cast("long").as("option_price"),
      to_date(col("l_shipdate")).as("register_dt"),
      (col("l_orderkey") * 10 + col("l_linenumber")).as("__src_seq"),
      col("l_partkey").as("__tb1"), col("l_suppkey").as("__tb2"),
      floor(col("l_extendedprice")).cast("long").as("__tb3"))
    // option_id is the table's PK; the synthesized feed has collisions, so
    // dedup on a fully deterministic order. (l_orderkey, l_linenumber) is
    // NOT unique in the fixture — duplicate pairs differ in every other
    // column — so __src_seq alone ties whenever a duplicate pair lands in
    // the same option_id; the source-column tie-breaks make the order
    // total over row CONTENT (fully-tied rows are identical, so either
    // one is the same row).
    graft.functions.F.qualifyTopN(raw, Seq(col("option_id")),
      Seq(col("__src_seq"), col("__tb1"), col("__tb2"), col("__tb3"),
        col("register_dt")))
      .drop("__src_seq", "__tb1", "__tb2", "__tb3")
  }

  /** Reference source('sabangnet','product'): one row per product_id. */
  private[graft] def sbnProduct(s: SparkSession, sfDir: String): DataFrame = {
    val raw = Tables.part(s, sfDir).select(
      (lit(200000) + pmod(col("p_partkey"), lit(400))).cast("string")
        .as("product_id"),
      concat(lit("M"), pmod(col("p_partkey"), lit(50))).as("model_code"),
      pmod(col("p_partkey"), lit(500)).as("model_id"),
      col("p_name").as("product_name"),
      substring_index(col("p_type"), " ", 1).as("product_keyword"),
      when(pmod(col("p_partkey"), lit(9)) === 0, nullStr)
        .otherwise(col("p_brand")).as("brand_name"),
      element_at(array(lit("SALE"), lit("STOP"), lit("CLOSE")),
        (pmod(col("p_partkey"), lit(3)) + 1).cast("int")).as("product_status"),
      (lit(1990) + pmod(col("p_partkey"), lit(30))).as("manufacture_year"),
      floor(col("p_retailprice")).cast("long").as("sales_price"),
      expr("cast(floor(p_retailprice) AS BIGINT) * 3 div 5").as("org_price"),
      when(pmod(col("p_partkey"), lit(4)) === 0, nullStr)
        .otherwise(concat(lit("img"), col("p_partkey"), lit(".jpg")))
        .as("image_file"),
      to_date(lit("1995-01-01")).as("register_dt"),
      expr("date_add(DATE '1995-01-01', cast(p_partkey % 700 AS INT))")
        .as("modify_dt"),
      col("p_partkey").as("__src_seq"))
    graft.functions.F.qualifyTopN(raw, Seq(col("product_id")),
      Seq(col("__src_seq"))).drop("__src_seq")
  }

  def install(r: ModelRegistry, sfDir: String): Unit = {

    // ---- shared dedup sources: each is a window dedup over a fact/dim
    // scan that several marts in the SAME run consume (the option master
    // pulls the product master, which re-reads both). Registering them as
    // lazily-persisted models makes ModelContext.ref hand every consumer
    // ONE cached copy per run instead of re-running the dedup window per
    // consumer (the run cache is per-query, so no state leaks across
    // queries). persist(), not checkpoint: both dedup orders are total,
    // so a dropped-block recompute is value-identical.
    r.register(Model("sbn_option_dedup", Nil, View, ctx =>
      ctx.track(sbnOption(ctx.session, sfDir).persist())))
    r.register(Model("core_item_dedup", Nil, View, ctx =>
      ctx.track(coreMaster(ctx.session, sfDir).persist())))

    // ---- core brand master (reference: intermediate/core__brand_master
    // .sql:9-20): 2-prefixed items with a real brand, deduped to one row
    // per product AND one row per brand (the double QUALIFY), then a
    // global brand_seq by team DESC NULLS LAST. The deduped set is
    // dimension-sized but unbounded in principle, so the global rank uses
    // the two-phase distributed form, not a single-partition window.
    r.register(Model("core_brand_master", Nil, View, ctx => {
      val pre = coreItem(ctx.session, sfDir)
        .filter(substring(col("product_id"), 1, 1) === "2" &&
          col("brand_name").isNotNull && col("brand_name") =!= "브랜드 없음")
      // the reference orders both windows by item_seq alone; item_id is the
      // deterministic tie-break both engines replay
      val perProduct = Window.partitionBy(col("product_id"))
        .orderBy(col("item_seq"), col("item_id"))
      val perBrand = Window.partitionBy(col("brand_name"))
        .orderBy(col("item_seq"), col("item_id"))
      val dedup = pre
        .withColumn("__rp", row_number().over(perProduct))
        .withColumn("__rb", row_number().over(perBrand))
        .filter(col("__rp") === 1 && col("__rb") === 1)
        .select(col("product_id").as("brand_id"), col("item_id"),
          col("item_seq"), col("team_name"), col("brand_name"))
      // Deliberate determinization: the reference computes brand_seq's
      // ROW_NUMBER() in the same inner SELECT as the two dedup ranks and
      // filters afterwards, so survivors keep GAPPED sequence numbers —
      // and which numbers they keep depends on how ties among the
      // discarded rows broke (tie-nondeterministic in BigQuery). We rank
      // the survivor set instead: dense 1..N, stable across engines and
      // runs. Downstream consumers only use brand_seq for ordering, which
      // both forms preserve.
      graft.functions.F.globalRowNumber(dedup,
        Seq(col("team_name").desc_nulls_last, col("brand_id")), "brand_seq")
    }))

    // ---- smartstore product master (reference: marts/product/
    // smartstore__product_master.sql:24-62): three literal mapping dims,
    // channel + category enrichment, and the arithmetic composite sort key
    // (brand_seq*1000 + delivery_type*10 + status_seq with per-term
    // fallbacks). All dims broadcast; the fact scans once.
    r.register(Model("smartstore_product_master", Nil, View, ctx => {
      val s = ctx.session
      val prd = Tables.part(s, sfDir).select(
        col("p_partkey").as("product_id"),
        (col("p_partkey") + 100000).as("product_no"),
        when(pmod(col("p_partkey"), lit(8)) === 0, nullStr)
          .otherwise(concat(lit("C"), pmod(col("p_partkey"), lit(50))))
          .as("catalog_id"),
        pmod(col("p_partkey"), lit(7)).as("channel_seq"),
        col("p_name").as("product_name"),
        element_at(array(lit("SALE"), lit("SUSPENSION"), lit("OUTOFSTOCK"),
            lit("CLOSE")),
          (pmod(col("p_partkey"), lit(4)) + 1).cast("int")).as("status_type"),
        element_at(array(lit("ON"), lit("SUSPENSION")),
          (pmod(col("p_partkey"), lit(2)) + 1).cast("int"))
          .as("display_type_code"),
        when(pmod(col("p_partkey"), lit(9)) === 0, lit(null).cast("int"))
          .otherwise(pmod(col("p_partkey"), lit(3)).cast("int"))
          .as("delivery_type_code"),
        pmod(col("p_partkey"), lit(25)).as("category_id"),
        substring_index(col("p_type"), " ", 1).as("tags"),
        floor(col("p_retailprice")).cast("long").as("price"),
        expr("cast(floor(p_retailprice) AS BIGINT) * 9 div 10")
          .as("sales_price"),
        (pmod(col("p_partkey"), lit(2)) * 2500).as("delivery_fee"),
        to_date(lit("1994-06-01")).as("register_dt"),
        expr("date_add(DATE '1994-06-01', cast(p_partkey % 500 AS INT))")
          .as("modify_dt"))
      val chl = graft.functions.F.qualifyTopN(
        Tables.nation(s, sfDir).select(
          pmod(col("n_nationkey"), lit(7)).as("channel_seq"),
          concat(lit("T"), pmod(col("n_nationkey"), lit(5))).as("team_name"),
          col("n_name").as("brand_name"),
          when(pmod(col("n_nationkey"), lit(4)) === 0, lit(null).cast("int"))
            .otherwise(pmod(col("n_nationkey"), lit(10)).cast("int"))
            .as("brand_seq")),
        Seq(col("channel_seq")), Seq(col("brand_name")))
      val cat = Tables.nation(s, sfDir).select(
        col("n_nationkey").as("category_id"),
        substring(col("n_name"), 1, 3).as("category_name1"),
        substring(col("n_name"), 1, 5).as("category_name2"),
        col("n_name").as("category_name3"),
        concat(col("n_name"), lit("-L4")).as("category_name4"))
      val statusDim = graft.functions.F.inlineDim(s,
        Seq("code", "label", "seq"),
        Seq(Seq("SALE", "판매중", 1), Seq("SUSPENSION", "판매중지", 2),
          Seq("OUTOFSTOCK", "품절", 3), Seq("CLOSE", "판매종료", 4)))
      val displayDim = graft.functions.F.inlineDim(s,
        Seq("code", "label"),
        Seq(Seq("ON", "전시중"), Seq("SUSPENSION", "전시중지")))
      val deliveryDim = graft.functions.F.inlineDim(s,
        Seq("code", "label"),
        Seq(Seq(0, "택배"), Seq(1, "직접배송"), Seq(2, "방문수령")))
      prd
        .join(broadcast(chl), Seq("channel_seq"), "left")
        .join(broadcast(statusDim.withColumnRenamed("label", "status_label")),
          col("status_type") === col("code"), "left").drop("code")
        .join(broadcast(displayDim.withColumnRenamed("label", "display_label")),
          col("display_type_code") === col("code"), "left").drop("code")
        .join(broadcast(deliveryDim
            .withColumnRenamed("label", "delivery_label")),
          col("delivery_type_code") === col("code"), "left").drop("code")
        .join(broadcast(cat), Seq("category_id"), "left")
        .select(col("product_id"), col("product_no"), col("catalog_id"),
          col("team_name"), col("brand_name"), col("product_name"),
          col("status_label").as("status_type"),
          col("display_label").as("display_type"),
          col("delivery_label").as("delivery_type"),
          col("category_id"), col("category_name1"), col("category_name2"),
          col("category_name3"), col("category_name4"),
          col("tags"), col("price"), col("sales_price"),
          col("delivery_fee"),
          col("register_dt"), col("modify_dt"),
          (coalesce(col("brand_seq"), lit(99)) * 1000
            + coalesce(col("delivery_type_code"), lit(99)) * 10
            + coalesce(col("seq"), lit(9))).as("sort_key"))
    }))

    // ---- sabangnet product master (reference: marts/product/
    // sabangnet__product_master.sql:27-99): primary option via bundle
    // explosion + QUALIFY (item_seq ASC NULLS LAST, option_quantity DESC),
    // the POWER(10, MAX(LENGTH(qty))) scale scalar broadcast into the
    // composite sort key, the '대표' override when the product exists in
    // the core master, and the conditional image URL.
    r.register(Model("sabangnet_product_master",
      Seq("core_brand_master", "sbn_option_dedup", "core_item_dedup"),
      View, ctx => {
        val s = ctx.session
        val opt = ctx.ref("sbn_option_dedup")
        val itm = ctx.ref("core_item_dedup")
        val exploded = opt.select(
            split(col("option_id"), "-").getItem(0).as("product_id"),
            col("option_id"), col("option_type"),
            explode(split(coalesce(col("bundle_option_ids"),
              col("option_id")), ",")).as("component"))
          .select(col("product_id"), col("option_id"), col("option_type"),
            col("component"),
            split(col("component"), "-").getItem(0).as("component_pid"),
            // get() (not [1]): a component without ':qty' has a 1-element
            // split, and ANSI mode makes [1] an error rather than NULL
            coalesce(expr("try_cast(get(split(component, ':'), 1) AS BIGINT)"),
              lit(1L)).as("option_quantity"))
          .join(itm.select(col("product_id").as("component_pid"),
            col("item_id"), col("item_seq")), Seq("component_pid"), "left")
        val wCnt = Window.partitionBy(col("product_id"))
        // consumed by BOTH the scale scalar and the spine join — checkpoint
        // so the explode + two windows behind it compute once. This one
        // stays an EAGER checkpoint deliberately: it is the deepest shared
        // frame in the chain, and truncating the plan here measurably
        // beats a lazy cache (the downstream option-master model re-plans
        // this subtree per consumer otherwise; 5.6s vs 6.5s at sf0.1)
        val primary = graft.functions.F.checkpointShared(
          graft.functions.F.qualifyTopN(
            exploded.withColumn("option_count", count(lit(1)).over(wCnt)),
            Seq(col("product_id")),
            // reference order: item_seq ASC NULLS LAST, option_quantity
            // DESC; option_id + component break remaining ties
            Seq(col("item_seq").asc_nulls_last,
              col("option_quantity").desc,
              col("option_id"), col("component")))
            .select(col("product_id"), col("item_id"), col("item_seq"),
              col("option_type"), col("option_count"),
              col("option_quantity")))
        // data-dependent sort-key scale: single-row aggregate, broadcast —
        // the reference's CROSS JOIN max_quantity (sql:54-58)
        val scaleRow = primary.agg(
          pow(lit(10), max(length(col("option_quantity").cast("string"))))
            .cast("long").as("__scale"))
        val typeDim = graft.functions.F.inlineDim(s,
          Seq("tcode", "tlabel"),
          Seq(Seq(0, "단일"), Seq(1, "옵션"), Seq(2, "추가구성")))
        val brd = ctx.ref("core_brand_master")
          .select(col("brand_name"), col("item_seq").as("brand_item_seq"))
        val prd = sbnProduct(s, sfDir)
        prd
          .join(primary.withColumnRenamed("item_seq", "opt_item_seq"),
            Seq("product_id"), "left")
          .join(itm.select(col("item_id"), col("category_name1"),
            col("category_name2"), col("category_name3"),
            col("category_name4")), Seq("item_id"), "left")
          .join(itm.select(col("product_id"), lit(1).as("__in_core")),
            Seq("product_id"), "left")
          .join(broadcast(typeDim), col("option_type") === col("tcode"),
            "left")
          .join(brd, Seq("brand_name"), "left")
          .crossJoin(broadcast(scaleRow))
          .select(col("product_id"), col("model_code"), col("model_id"),
            col("product_name"), col("product_keyword"), col("brand_name"),
            col("category_name1"), col("category_name2"),
            col("category_name3"), col("category_name4"),
            graft.functions.F.recode(col("product_status"),
              Seq("SALE" -> "판매중", "STOP" -> "판매중지",
                "CLOSE" -> "판매종료")).as("product_status"),
            when(col("__in_core").isNotNull, lit("대표"))
              .otherwise(col("tlabel")).as("option_type"),
            col("option_count"), col("manufacture_year"),
            col("sales_price"), col("org_price"),
            when(col("image_file").isNotNull,
              concat(lit("https://img.example.com/100/"), col("image_file")))
              .otherwise(nullStr).as("image_url"),
            col("register_dt"), col("modify_dt"),
            (coalesce(col("opt_item_seq"),
                coalesce(col("brand_item_seq"), lit(99000000)) + 999999)
              * col("__scale") * 10
              + when(col("__in_core").isNotNull, lit(0))
                .otherwise(coalesce(col("option_type"), lit(9)))
                * col("__scale")
              + coalesce(col("option_quantity"), lit(0))).as("sort_key"))
      }))

    // ---- sabangnet option master (reference: marts/product/
    // sabangnet__option_master.sql:20-92): per-option primary item, the
    // ordered STRING_AGG of bundle component names with the '상품코드
    // 불일치' per-component fallback, mapping dims, the '대표'
    // passthrough, and the REPEAT('9') sentinel sort key as a broadcast
    // scalar instead of a global window.
    r.register(Model("sabangnet_option_master",
      Seq("sabangnet_product_master", "sbn_option_dedup", "core_item_dedup"),
      View, ctx => {
        val s = ctx.session
        // three consumers here (primary, bundleNames, the final spine)
        // each get a differently-pruned copy of the windowed dedup — and
        // the product-master dependency reads the same frame again. The
        // shared persisted model runs the lineitem window once per run
        // for all of them.
        val opt = ctx.ref("sbn_option_dedup")
        val itm = ctx.ref("core_item_dedup")
        // primary item per option: explode, enrich, keep smallest item_seq
        val primary = graft.functions.F.qualifyTopN(
          opt.select(col("option_id"),
              explode(split(coalesce(col("bundle_option_ids"),
                col("option_id")), ",")).as("component"))
            .select(col("option_id"),
              split(split(col("component"), ":").getItem(0), "-").getItem(0)
                .as("component_pid"),
              col("component"))
            .join(itm.select(col("product_id").as("component_pid"),
              col("item_id"), col("item_seq")), Seq("component_pid"), "left"),
          Seq(col("option_id")),
          Seq(col("item_seq").asc_nulls_last, col("item_id").asc_nulls_last,
            col("component")))
          .select(col("option_id"), col("item_id"))
        // ordered STRING_AGG with per-component fallback: posexplode keeps
        // the offset; array_sort on (offset, name) structs restores order
        // inside a deterministic, map-side-combinable aggregate
        val bundleNames = opt.filter(col("bundle_option_ids").isNotNull)
          .select(col("option_id"),
            posexplode(split(col("bundle_option_ids"), ","))
              .as(Seq("off", "component")))
          .select(col("option_id"), col("off"),
            split(split(col("component"), ":").getItem(0), "-").getItem(0)
              .as("component_pid"),
            coalesce(expr("get(split(component, ':'), 1)"), lit("1"))
              .as("qty"))
          .join(itm.select(col("product_id").as("component_pid"),
            col("product_name")), Seq("component_pid"), "left")
          .select(col("option_id"), col("off"),
            coalesce(concat(col("product_name"), lit(" x "), col("qty")),
              lit("상품코드 불일치")).as("cname"))
          .groupBy(col("option_id"))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("off"), col("cname")))),
            x => x.getField("cname")), "\n").as("bundle_option_names"))
        // categories come from the option's PRIMARY item row (reference
        // sql:57-60 joins core.item via the primary match, not the product
        // master's own categories)
        // the sentinel scalar and the spine both consume the FULL product
        // master chain — persist its projection so the upstream model
        // runs once, not twice (same lazy-over-eager reasoning as opt)
        val prd = ctx.track(
          ctx.ref("sabangnet_product_master").select(
            col("product_id"), col("model_code"), col("model_id"),
            col("product_name"), col("product_keyword"), col("brand_name"),
            col("option_type").as("prd_option_type"), col("sort_key"))
          .persist())
        val statusDim = graft.functions.F.inlineDim(s,
          Seq("scode", "slabel"),
          Seq(Seq("SALE", "판매중"), Seq("STOP", "판매중지")))
        val typeDim = graft.functions.F.inlineDim(s,
          Seq("tcode", "tlabel"),
          Seq(Seq(0, "단일"), Seq(1, "옵션"), Seq(2, "추가구성")))
        // the sentinel: all-9s at the realized max key's width (>= every
        // real key); single-row aggregate broadcast, mirroring q97's form
        val mx = prd.agg(max(col("sort_key")).as("__mx"))
        opt
          .withColumn("product_id", split(col("option_id"), "-").getItem(0))
          .join(prd, Seq("product_id"), "left")
          .join(primary, Seq("option_id"), "left")
          .join(itm.select(col("item_id"), col("category_name1"),
            col("category_name2"), col("category_name3"),
            col("category_name4")), Seq("item_id"), "left")
          .join(bundleNames, Seq("option_id"), "left")
          .join(broadcast(statusDim), col("option_status") === col("scode"),
            "left")
          .join(broadcast(typeDim), col("option_type") === col("tcode"),
            "left")
          .crossJoin(broadcast(mx))
          .select(col("product_id"), col("option_id"), col("model_code"),
            col("model_id"), col("product_name"), col("product_keyword"),
            col("option_group"), col("option_name"), col("brand_name"),
            col("category_name1"), col("category_name2"),
            col("category_name3"), col("category_name4"),
            col("bundle_option_ids"), col("bundle_option_names"),
            col("slabel").as("option_status"),
            when(col("prd_option_type") === "대표", lit("대표"))
              .otherwise(col("tlabel")).as("option_type"),
            col("option_quantity"), col("option_price"), col("register_dt"),
            coalesce(col("sort_key"),
              expr("cast(repeat('9', length(cast(__mx AS STRING))) AS BIGINT)"))
              .as("sort_key"))
      }))

    // ---- coupang option master (reference: marts/product/
    // coupang__option_master.sql:8-40): vendor enrichment, the
    // LEFT(bundle_product_ids, 6) item join (first component's product id
    // — component ids are 6 chars by construction), the literal status
    // CASE, and the two-part sort key (deleted flag × vendor_seq, then
    // product_status).
    r.register(Model("coupang_option_master", Seq("core_item_dedup"), View,
      ctx => {
      val s = ctx.session
      val itm = ctx.ref("core_item_dedup")
      // `rel` below re-derives from this deduped frame, so the lineitem
      // window would run twice — persist to compute it once (lazy; the
      // dedup order is total, recompute is value-identical)
      val opt = persistTopN(ctx,
        graft.functions.F.qualifyTopN(
        Tables.lineitem(s, sfDir).select(
          (lit(100000) + pmod(col("l_partkey"), lit(400))).cast("string")
            .as("product_id"),
          concat(lit("CP"), col("l_partkey"), lit("-"),
            pmod(col("l_linenumber"), lit(3))).as("option_id"),
          when(pmod(col("l_partkey"), lit(12)) === 0, nullStr)
            .otherwise(element_at(array(lit("AIR"), lit("TRUCK"),
              lit("SHIP"), lit("RAIL")),
              (pmod(col("l_suppkey"), lit(4)) + 1).cast("int")))
            .as("brand_name"),
          concat(lit("CProd "), pmod(col("l_partkey"), lit(80)))
            .as("product_name"),
          concat(lit("COpt "), pmod(col("l_suppkey"), lit(9)))
            .as("option_name"),
          when(pmod(col("l_orderkey"), lit(11)) === 0, lit(null).cast("int"))
            .otherwise(pmod(col("l_orderkey"), lit(3)).cast("int"))
            .as("product_status_code"),
          (pmod(col("l_orderkey"), lit(7)) === 0).as("is_deleted"),
          concat(lit("CAT-"), pmod(col("l_partkey"), lit(12)))
            .as("category_name"),
          pmod(col("l_suppkey"), lit(20)).as("vendor_id"),
          floor(col("l_extendedprice")).cast("long").as("sales_price"),
          to_date(col("l_shipdate")).as("register_dt"),
          date_add(to_date(col("l_shipdate")),
            pmod(col("l_orderkey"), lit(14)).cast("int")).as("modify_dt"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("__src_seq"),
          col("l_suppkey").as("__tb1")),
        // duplicate (l_orderkey, l_linenumber) pairs exist — content
        // tie-breaks make the dedup deterministic (partkey is fixed by the
        // option_id partition; suppkey + price + dates cover the rest)
        Seq(col("option_id")),
        Seq(col("__src_seq"), col("__tb1"), col("sales_price"),
          col("register_dt"), col("modify_dt")))
        .drop("__src_seq", "__tb1"))
      val vdr = graft.functions.F.qualifyTopN(
        Tables.supplier(s, sfDir).select(
          pmod(col("s_suppkey"), lit(20)).as("vendor_id"),
          col("s_name").as("vendor_name"),
          when(pmod(col("s_suppkey"), lit(5)) === 0, lit(null).cast("int"))
            .otherwise(pmod(col("s_suppkey"), lit(8)).cast("int"))
            .as("vendor_seq")),
        Seq(col("vendor_id")), Seq(col("vendor_name")))
      // relation cpg_opt_to_sbn_ids: option → bundle string whose first
      // component id is 6 chars (LEFT(…, 6) below is the reference's own
      // first-component extraction)
      val rel = opt.filter(pmod(length(col("option_id")), lit(3)) === 0)
        .select(col("option_id"),
          concat((lit(200000) + pmod(
            expr("cast(regexp_extract(option_id, 'CP([0-9]+)-', 1) AS BIGINT)")
              * 11 + 3, lit(400)))
            .cast("string"), lit("-0001:1")).as("bundle_product_ids"))
      opt
        .join(broadcast(vdr), Seq("vendor_id"), "left")
        .join(rel, Seq("option_id"), "left")
        .join(itm.select(col("product_id").as("__ipid"),
            col("team_name"), col("brand_name").as("itm_brand_name")),
          substring(col("bundle_product_ids"), 1, 6) === col("__ipid"),
          "left")
        .select(col("product_id"), col("option_id"), col("team_name"),
          coalesce(col("itm_brand_name"), col("brand_name")).as("brand_name"),
          col("product_name"), col("option_name"),
          when(col("product_status_code") === 0, lit("판매중"))
            .when(col("product_status_code") === 1, lit("품절"))
            .when(col("product_status_code") === 2, lit("숨김상품"))
            .otherwise(nullStr).as("product_status"),
          col("is_deleted"), col("category_name"), col("vendor_name"),
          col("sales_price"), col("register_dt"), col("modify_dt"),
          (when(col("is_deleted"), lit(2)).otherwise(lit(1)) * 100
            + coalesce(col("vendor_seq"), lit(99))).as("sort_key1"),
          coalesce(col("product_status_code"), lit(9)).as("sort_key2"))
    }))

    // ---- smartstore option master (reference: marts/product/
    // smartstore__option_master.sql:16-44): option rows enriched through
    // the channel dim, the FULL smartstore product-master DAG model, and
    // the product-type map; sort_key1 falls back to the REPEAT('9')
    // sentinel sized by MAX(prd.sort_key) over the JOIN RESULT — spelled
    // as a broadcast single-row aggregate over the ids-only join (same
    // value as the reference's MAX() OVER (), no global window).
    r.register(Model("smartstore_option_master",
      Seq("smartstore_product_master"), View, ctx => {
        val s = ctx.session
        val p = col("p_partkey")
        // two options per part row — every column a function of (p, i), so
        // the feed is deterministic without a dedup window
        val opt = Tables.part(s, sfDir)
          .select(p, col("p_name"), col("p_retailprice"),
            explode(array(lit(0), lit(1))).as("i"))
          .select(
            when(pmod(p, lit(10)) === 0, -p).otherwise(p).as("product_id"),
            (p * 10 + col("i")).as("option_id"),
            pmod(p + col("i"), lit(7)).as("channel_seq"),
            col("p_name").as("product_name"),
            when(pmod(p + col("i"), lit(11)) === 0, nullStr)
              .otherwise(concat(lit("OPT"), pmod(p + col("i"), lit(5))))
              .as("option_name"),
            pmod(p + col("i"), lit(4)).cast("int").as("product_type"),
            when(pmod(p, lit(13)) === 0, nullStr)
              .otherwise(concat(lit("SPC"), pmod(p, lit(500))))
              .as("seller_product_code"),
            concat(lit("SOC"), pmod(p * 10 + col("i"), lit(700)))
              .as("seller_option_code"),
            floor(col("p_retailprice")).cast("long").as("sales_price"),
            (pmod(p, lit(20)) * 100).as("option_price"),
            expr("date_add(DATE '1995-01-01', cast(p_partkey % 700 AS INT))")
              .as("first_payment_dt"),
            expr("date_add(DATE '1995-01-01', cast(p_partkey % 700 " +
              "+ (p_partkey + i) % 60 AS INT))").as("last_payment_dt"))
        val chl = graft.functions.F.qualifyTopN(
          Tables.nation(s, sfDir).select(
            pmod(col("n_nationkey"), lit(7)).as("channel_seq"),
            concat(lit("T"), pmod(col("n_nationkey"), lit(5)))
              .as("team_name"),
            col("n_name").as("brand_name")),
          Seq(col("channel_seq")), Seq(col("brand_name")))
        val prd = ctx.ref("smartstore_product_master")
          .select(col("product_id").as("m_product_id"),
            col("sort_key").as("m_sort_key"))
        val ptype = graft.functions.F.inlineDim(s, Seq("code", "label"),
          Seq(Seq(0, "단품상품"), Seq(1, "옵션상품"), Seq(2, "추가상품")))
        // MAX over the join result, without a global window: the ids-only
        // left join carries exactly the sort_keys the full join would
        val mx = opt.select(col("product_id"))
          .join(prd, col("product_id") === col("m_product_id"), "left")
          .agg(max(col("m_sort_key")).as("__mx"))
        opt
          .join(broadcast(chl), Seq("channel_seq"), "left")
          .join(prd, col("product_id") === col("m_product_id"), "left")
          .join(broadcast(ptype.withColumnRenamed("label", "ptype_label")),
            col("product_type") === col("code"), "left")
          .crossJoin(broadcast(mx))
          .select(col("product_id"), col("option_id"), col("team_name"),
            col("brand_name"), col("product_name"), col("option_name"),
            col("ptype_label").as("product_type"),
            col("seller_product_code"), col("seller_option_code"),
            col("sales_price"), col("option_price"),
            col("first_payment_dt"), col("last_payment_dt"),
            coalesce(col("m_sort_key"),
              expr("cast(repeat('9', length(cast(__mx AS STRING)))" +
                " AS BIGINT)")).as("sort_key1"),
            col("product_type").as("sort_key2"))
      }))
  }
}
