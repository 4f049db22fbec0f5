package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.F
import graft.operators.Allocation

/** The per-channel insight-daily family and their report-daily marts
  * (reference: intermediate/ads/google_ads/google_ads__insight_daily.sql,
  * meta_ads/meta_ads__insight_daily.sql, coupang_ads/coupang_ads__insight_
  * daily.sql; marts/ads/google_ads__report_daily.sql, meta_ads__report_
  * daily.sql, coupang_ads__report_daily.sql).
  *
  * Structural patterns this file adds to the registry:
  *
  *  - the ranged-relation COALESCE ladder: a validity-windowed bundle
  *    relation joined at THREE ad levels (`ymd BETWEEN start AND end` at
  *    campaign/adgroup/ad), the most specific level winning, with an
  *    account-brand fallback and a literal default as the last resort
  *    (google/meta/coupang insight_daily step 1);
  *  - re-aggregation to the (ymd, ad, device) grain with ANY_VALUE on the
  *    functionally-dependent bundle before the explode, so the div/mod
  *    allocation happens once per ad-day, not once per raw event row;
  *  - the bundle div/mod explode with a conditional renewal-mapping join
  *    (`component = new AND ymd < renewal_date` → the old id), one
  *    allocation per metric column;
  *  - option-suffix stripping inside a relation (`'id:qty'` components
  *    reduced to `id` via a transform + array_join, coupang);
  *  - the two-feed union (PA + NCA) where one side carries NULL counter
  *    columns and a creative→option repair join (coupang);
  *  - a VAT uplift computed in DECIMAL and rounded half-up at the money
  *    boundary (coupang `ad_cost * 1.1`);
  *  - the report-daily TVF shape: insight rows enriched through the ad
  *    master + product master + mapping dims, every dimension COALESCEd
  *    to its declared fallback label.
  *
  * Scale: every join is either a broadcast dim (accounts, mapping dims,
  * renewal) or an equi-join on the insight's own keys; the ranged ladder
  * joins are equi on ad ids with the BETWEEN as a residual filter —
  * non-overlapping validity windows keep them fan-out-free. The explode
  * happens after the daily re-aggregation, so its input is the compressed
  * ad-day grain.
  */
object InsightDaily {

  private val nullStr = lit(null).cast("string")
  private val nullLong = lit(null).cast("long")

  /** Stable product dim with STRING ids for the report marts (the insight
    * pipelines emit string product ids — bundle components). A projection
    * of ReportMarts.itemDim, so the synthesis has one source of truth.
    */
  private[models] def productDimStr(s: SparkSession, sfDir: String): DataFrame =
    ReportMarts.itemDim(s, sfDir).select(
      col("product_id").cast("string").as("product_id"),
      col("item_id"), col("item_seq").cast("long").as("item_seq"),
      col("team_name"), col("brand_name"),
      col("category_name1"), col("category_name2"), col("category_name3"),
      col("category_name4"), col("color"), col("product_name"))

  /** Shared renewal mapping (reference core__product_renewal_mapping():
    * product ids renamed at a date — rows before the renewal keep the OLD
    * id). Old ids live outside the part key space on purpose: the report
    * marts' product join must miss them and fall back.
    */
  private[models] def renewalDim(s: SparkSession): DataFrame =
    F.inlineDim(s, Seq("product_id_new", "product_id_old", "renewal_date_s"),
      Seq(Seq("7", "1000007", "1996-03-01"),
        Seq("13", "1000013", "1996-08-01"),
        Seq("21", "1000021", "1996-05-01")))
      .withColumn("renewal_date", col("renewal_date_s").cast("date"))
      .drop("renewal_date_s")

  /** The generic exploded-product allocation tail shared by all three
    * channels (reference *__insight_daily.sql `exploded_product_insight`):
    * split the bundle, renewal-map each component by ymd, and divide each
    * metric equally with the remainder on offset 0.
    */
  private def explodeAllocate(grouped: DataFrame, renewal: DataFrame,
                              keep: Seq[String],
                              metrics: Seq[String]): DataFrame = {
    val exploded = grouped.select(
      (keep.map(col) :+ col("ymd")) ++ Seq(
        size(split(col("bundle_product_ids"), ","))
          .cast("long").as("bundle_product_count"),
        posexplode(split(col("bundle_product_ids"), ","))
          .as(Seq("bundle_product_offset", "component"))) ++
        metrics.map(col): _*)
      .join(broadcast(renewal),
        col("component") === col("product_id_new") &&
          col("ymd") < col("renewal_date"), "left")
      .withColumn("product_id",
        coalesce(col("product_id_old"), col("component")))
    def divmod(c: String) =
      Allocation.divModAllocate(col(c), col("bundle_product_count"),
        col("bundle_product_offset")).as(c)
    exploded.select(
      keep.map(col) ++ Seq(col("product_id")) ++
        metrics.map(divmod) :+ col("ymd"): _*)
  }

  def install(r: ModelRegistry, sfDir: String): Unit = {
    installRelation(r, sfDir)
    installGoogle(r, sfDir)
    installMeta(r, sfDir)
    installCoupang(r, sfDir)
    installMarts(r, sfDir)
  }

  // ==== shared ranged relation ====

  /** Validity-windowed ad→bundle relation (reference relation__ad_id_to_
    * ranged_sbn_ids.sql consumed by google/meta insight_daily): the same
    * id spaces as `ad_sbn_relation`, each key carrying TWO non-overlapping
    * windows with different bundles — so the BETWEEN ladder join stays
    * fan-out-free while actually exercising the date slicing.
    */
  private def installRelation(r: ModelRegistry, sfDir: String): Unit = {
    r.register(Model("ranged_ad_relation", Nil, View, ctx => {
      val p = col("p_partkey")
      val gGrp = p * 7 + 1
      val mSet = p * 7 + 5
      val base = Tables.part(ctx.session, sfDir).select(
        element_at(array(lit("구글"), lit("메타")),
          (pmod(p, lit(2)) + 1).cast("int")).as("platform_name"),
        pmod(p, lit(3)).cast("int").as("ad_level"),
        when(pmod(p, lit(2)) === 0,
          when(pmod(p, lit(3)) === 0, pmod(p, lit(600)))
            .when(pmod(p, lit(3)) === 1, gGrp)
            .otherwise(gGrp * 10 + pmod(gGrp, lit(3))))
          .otherwise(
            when(pmod(p, lit(3)) === 0, pmod(p, lit(300)) * 2 + 1)
              .when(pmod(p, lit(3)) === 1, mSet)
              .otherwise(mSet * 10 + pmod(mSet, lit(3))))
          .cast("long").as("ad_id"),
        concat((pmod(p, lit(2000)) + 1).cast("string"), lit(","),
          (pmod(p, lit(2000)) + 2).cast("string")).as("bundle_a"),
        (pmod(p, lit(2000)) + 3).cast("string").as("bundle_b"))
        .groupBy(col("platform_name"), col("ad_level"), col("ad_id"))
        .agg(min(col("bundle_a")).as("bundle_a"),
          min(col("bundle_b")).as("bundle_b"))
      base.select(col("platform_name"), col("ad_level"), col("ad_id"),
        explode(array(
          struct(col("bundle_a").as("bundle_product_ids"),
            lit("1995-01-01").cast("date").as("start_date"),
            lit("1996-06-30").cast("date").as("end_date")),
          struct(col("bundle_b").as("bundle_product_ids"),
            lit("1996-07-01").cast("date").as("start_date"),
            lit("1997-12-31").cast("date").as("end_date")))).as("w"))
        .select(col("platform_name"), col("ad_level"), col("ad_id"),
          col("w.bundle_product_ids").as("bundle_product_ids"),
          col("w.start_date").as("start_date"),
          col("w.end_date").as("end_date"))
    }))
  }

  /** Ladder join shared by google/meta: most-specific ranged level wins,
    * then account brand, then the '200000' default.
    */
  private def rangedLadder(insight: DataFrame, rel: DataFrame,
                           account: DataFrame, accountKey: String,
                           levelKeys: Seq[(Int, String)]): DataFrame = {
    val joined = levelKeys.foldLeft(insight.alias("i")) {
      case (acc, (level, key)) =>
        val lv = rel.filter(col("ad_level") === level)
          .select(col("ad_id").as(s"__rel${level}_id"),
            col("bundle_product_ids").as(s"__rel${level}_bundle"),
            col("start_date").as(s"__rel${level}_s"),
            col("end_date").as(s"__rel${level}_e"))
        acc.join(lv, col(key) === col(s"__rel${level}_id") &&
          col("ymd").between(col(s"__rel${level}_s"),
            col(s"__rel${level}_e")), "left")
    }
    joined.join(broadcast(account),
      col(accountKey) === account("__acc_id"), "left")
      .withColumn("bundle_product_ids",
        coalesce(
          (levelKeys.map(lk => col(s"__rel${lk._1}_bundle")) ++
            Seq(col("__acc_brand"), lit("200000"))): _*))
  }

  // ==== google (q129) ====

  private def installGoogle(r: ModelRegistry, sfDir: String): Unit = {
    // insight events ride the gads_ad id space (ok ≡ 1 mod 7, ad_id =
    // ok*10 + ok%3) so the report mart's master join lands; every derived
    // key is a function of ad_id, keeping the pre-explode ANY_VALUE
    // deterministic
    r.register(Model("gads_insight", Nil, Incremental("ymd"), ctx => {
      val ok = col("l_orderkey")
      Tables.lineitem(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 1).select(
          (ok * 10 + pmod(ok, lit(3))).cast("long").as("ad_id"),
          ok.cast("long").as("adgroup_id"),
          pmod(ok, lit(600)).cast("long").as("campaign_id"),
          pmod(ok, lit(25)).cast("long").as("customer_id"),
          element_at(array(lit("P"), lit("M"), lit("X")),
            (pmod(col("l_linenumber"), lit(3)) + 1).cast("int"))
            .as("device_type"),
          (pmod(col("l_partkey"), lit(1000)) * 3).cast("long")
            .as("impression_count"),
          pmod(col("l_suppkey"), lit(40)).cast("long").as("click_count"),
          floor(col("l_extendedprice") * 0.01).cast("long").as("ad_cost"),
          to_date(col("l_shipdate")).as("ymd"))
    }))

    // account brands: customer ids 20-24 miss → the '200000' default path
    r.register(Model("gads_account_brand", Nil, View, ctx =>
      Tables.nation(ctx.session, sfDir).filter(col("n_nationkey") < 20)
        .select(col("n_nationkey").cast("long").as("__acc_id"),
          when(pmod(col("n_nationkey"), lit(3)) === 0, nullStr)
            .otherwise(concat(lit("200000"),
              pmod(col("n_nationkey"), lit(9)) + 1)).as("__acc_brand"))))

    // google_ads__insight_daily.sql:20-95
    r.register(Model("google_insight_daily",
      Seq("gads_insight", "ranged_ad_relation", "gads_account_brand"),
      Incremental("ymd"), ctx => {
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")
        val ins = ctx.ref("gads_insight")
          .filter(col("ymd").between(startD, endD))
        val rel = ctx.ref("ranged_ad_relation")
          .filter(col("platform_name") === "구글")
        val laddered = rangedLadder(ins, rel,
          ctx.ref("gads_account_brand"), "customer_id",
          Seq(2 -> "ad_id", 1 -> "adgroup_id", 0 -> "campaign_id"))
        val grouped = laddered
          .groupBy(col("ymd"), col("ad_id"), col("device_type"))
          // bundle is a function of (ad_id, ymd): every derived join key
          // comes from ad_id's orderkey, so first() is deterministic
          .agg(first(col("bundle_product_ids")).as("bundle_product_ids"),
            sum(col("impression_count")).as("impression_count"),
            sum(col("click_count")).as("click_count"),
            sum(col("ad_cost")).as("ad_cost"))
        explodeAllocate(grouped, renewalDim(ctx.session),
          keep = Seq("ad_id", "device_type"),
          metrics = Seq("impression_count", "click_count", "ad_cost"))
      }))
  }

  // ==== meta (q130) ====

  private def installMeta(r: ModelRegistry, sfDir: String): Unit = {
    r.register(Model("meta_insight", Nil, Incremental("ymd"), ctx => {
      val ok = col("l_orderkey")
      Tables.lineitem(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 5).select(
          (ok * 10 + pmod(ok, lit(3))).cast("long").as("ad_id"),
          ok.cast("long").as("adset_id"),
          (pmod(ok, lit(300)) * 2 + 1).cast("long").as("campaign_id"),
          pmod(ok, lit(25)).cast("long").as("account_id"),
          (pmod(col("l_partkey"), lit(900)) * 2).cast("long")
            .as("impression_count"),
          pmod(col("l_partkey"), lit(500)).cast("long").as("reach_count"),
          pmod(col("l_suppkey"), lit(35)).cast("long").as("click_count"),
          pmod(col("l_suppkey"), lit(20)).cast("long")
            .as("link_click_count"),
          floor(col("l_extendedprice") * 0.02).cast("long").as("ad_cost"),
          to_date(col("l_shipdate")).as("ymd"))
    }))

    r.register(Model("meta_account_brand", Nil, View, ctx =>
      Tables.nation(ctx.session, sfDir).filter(col("n_nationkey") < 18)
        .select(col("n_nationkey").cast("long").as("__acc_id"),
          when(pmod(col("n_nationkey"), lit(4)) === 0, nullStr)
            .otherwise(concat(lit("200000"),
              pmod(col("n_nationkey"), lit(8)) + 1)).as("__acc_brand"))))

    // meta_ads__insight_daily.sql:20-100 (no device axis; reach and
    // link-click ride along through the allocation)
    r.register(Model("meta_insight_daily",
      Seq("meta_insight", "ranged_ad_relation", "meta_account_brand"),
      Incremental("ymd"), ctx => {
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")
        val ins = ctx.ref("meta_insight")
          .filter(col("ymd").between(startD, endD))
        val rel = ctx.ref("ranged_ad_relation")
          .filter(col("platform_name") === "메타")
        val laddered = rangedLadder(ins, rel,
          ctx.ref("meta_account_brand"), "account_id",
          Seq(2 -> "ad_id", 1 -> "adset_id", 0 -> "campaign_id"))
        val grouped = laddered.groupBy(col("ymd"), col("ad_id"))
          .agg(first(col("bundle_product_ids")).as("bundle_product_ids"),
            sum(col("impression_count")).as("impression_count"),
            sum(col("reach_count")).as("reach_count"),
            sum(col("click_count")).as("click_count"),
            sum(col("link_click_count")).as("link_click_count"),
            sum(col("ad_cost")).as("ad_cost"))
        explodeAllocate(grouped, renewalDim(ctx.session),
          keep = Seq("ad_id"),
          metrics = Seq("impression_count", "reach_count", "click_count",
            "link_click_count", "ad_cost"))
      }))
  }

  // ==== coupang (q131) ====

  private def installCoupang(r: ModelRegistry, sfDir: String): Unit = {
    // PA report rows: vendor derives from campaign so the post-union
    // re-aggregation's ANY_VALUE(bundle) stays keyed by the group
    r.register(Model("cads_report_pa", Nil, Incremental("ymd"), ctx => {
      val ok = col("l_orderkey")
      Tables.lineitem(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 6).select(
          (pmod(ok, lit(300)) * 3).cast("long").as("campaign_id"),
          pmod(col("l_partkey"), lit(400)).cast("long").as("option_id"),
          pmod(col("l_linenumber"), lit(4)).cast("int")
            .as("placement_group"),
          pmod(pmod(ok, lit(300)), lit(15)).cast("long").as("vendor_id"),
          (pmod(col("l_partkey"), lit(800)) * 2).cast("long")
            .as("impression_count"),
          pmod(col("l_suppkey"), lit(30)).cast("long").as("click_count"),
          floor(col("l_extendedprice") * 0.01).cast("long").as("ad_cost"),
          pmod(col("l_suppkey"), lit(5)).cast("long").as("conv_count"),
          pmod(col("l_suppkey"), lit(3)).cast("long")
            .as("direct_conv_count"),
          floor(col("l_extendedprice") * 0.1).cast("long")
            .as("conv_amount"),
          floor(col("l_extendedprice") * 0.05).cast("long")
            .as("direct_conv_amount"),
          to_date(col("l_shipdate")).as("ymd"))
    }))

    // NCA rows carry a creative id and sometimes a NULL option — repaired
    // through the creative→option map
    r.register(Model("cads_report_nca", Nil, Incremental("ymd"), ctx => {
      val ok = col("l_orderkey")
      Tables.lineitem(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 3).select(
          (pmod(ok, lit(300)) * 3).cast("long").as("campaign_id"),
          when(pmod(col("l_suppkey"), lit(3)) === 0, nullLong)
            .otherwise(pmod(col("l_partkey"), lit(400)).cast("long"))
            .as("option_id"),
          (pmod(col("l_partkey"), lit(250)) + 1000).cast("long")
            .as("creative_id"),
          pmod(col("l_linenumber"), lit(4)).cast("int")
            .as("placement_group"),
          pmod(pmod(ok, lit(300)), lit(15)).cast("long").as("vendor_id"),
          (pmod(col("l_partkey"), lit(600)) * 2).cast("long")
            .as("impression_count"),
          pmod(col("l_suppkey"), lit(25)).cast("long").as("click_count"),
          floor(col("l_extendedprice") * 0.008).cast("long").as("ad_cost"),
          to_date(col("l_shipdate")).as("ymd"))
    }))

    r.register(Model("cads_creative", Nil, View, ctx =>
      Tables.part(ctx.session, sfDir).filter(col("p_partkey") < 250)
        .select((col("p_partkey") + 1000).cast("long").as("creative_id"),
          pmod(col("p_partkey"), lit(400)).cast("long")
            .as("creative_option_id"))))

    // option → bundle relation with ':qty' suffixes stripped (reference
    // coupang_ads__insight_daily.sql:24-36 cpg_opt_to_sbn_ids)
    r.register(Model("cpg_opt_rel", Nil, View, ctx =>
      Tables.part(ctx.session, sfDir).filter(col("p_partkey") < 400)
        .select(col("p_partkey").cast("long").as("rel_option_id"),
          when(pmod(col("p_partkey"), lit(5)) === 0, nullStr)
            .otherwise(expr(
              "array_join(transform(split(concat(" +
                "cast(pmod(p_partkey, 2000) + 1 as string), ':2,', " +
                "cast(pmod(p_partkey, 2000) + 5 as string)), ','), " +
                "x -> split(x, ':')[0]), ',')"))
            .as("rel_bundle"))))

    r.register(Model("cads_vendor_brand", Nil, View, ctx =>
      Tables.nation(ctx.session, sfDir).filter(col("n_nationkey") < 15)
        .select(col("n_nationkey").cast("long").as("__acc_id"),
          when(pmod(col("n_nationkey"), lit(4)) === 0, nullStr)
            .otherwise(concat(lit("20000"),
              pmod(col("n_nationkey"), lit(9)) + 1)).as("__acc_brand"))))

    // coupang_ads__insight_daily.sql:38-170: PA + NCA harmonized (NCA conv
    // columns NULL), VAT uplift in DECIMAL, option→bundle with vendor
    // fallback, re-aggregate, explode
    r.register(Model("cads_insight_daily",
      Seq("cads_report_pa", "cads_report_nca", "cads_creative",
        "cpg_opt_rel", "cads_vendor_brand"),
      Incremental("ymd"), ctx => {
        val startD = lit(ctx.params("ds_start_date")).cast("date")
        val endD = lit(ctx.params("ds_end_date")).cast("date")
        val rel = ctx.ref("cpg_opt_rel")
        val vdr = ctx.ref("cads_vendor_brand")
        val vat = round(col("ad_cost").cast("decimal(18,0)") *
          lit(new java.math.BigDecimal("1.1")), 0).cast("long")

        val pa = ctx.ref("cads_report_pa")
          .filter(col("ymd").between(startD, endD))
          .join(rel, col("option_id") === col("rel_option_id"), "left")
          .join(broadcast(vdr), col("vendor_id") === col("__acc_id"), "left")
          .select(col("campaign_id"), col("option_id"),
            col("placement_group"),
            coalesce(col("rel_bundle"), col("__acc_brand"), lit("200000"))
              .as("bundle_product_ids"),
            col("impression_count"), col("click_count"),
            vat.as("ad_cost"),
            col("conv_count"), col("direct_conv_count"),
            col("conv_amount"), col("direct_conv_amount"), col("ymd"))

        val creative = ctx.ref("cads_creative")
          .withColumnRenamed("creative_id", "cr_creative_id")
        val nca = ctx.ref("cads_report_nca")
          .filter(col("ymd").between(startD, endD))
          .join(broadcast(creative),
            col("creative_id") === col("cr_creative_id"), "left")
          .withColumn("option_id",
            coalesce(col("option_id"), col("creative_option_id")))
          .join(rel, col("option_id") === col("rel_option_id"), "left")
          .join(broadcast(vdr), col("vendor_id") === col("__acc_id"), "left")
          .select(col("campaign_id"), col("option_id"),
            col("placement_group"),
            coalesce(col("rel_bundle"), col("__acc_brand"), lit("200000"))
              .as("bundle_product_ids"),
            col("impression_count"), col("click_count"),
            vat.as("ad_cost"),
            nullLong.as("conv_count"), nullLong.as("direct_conv_count"),
            nullLong.as("conv_amount"), nullLong.as("direct_conv_amount"),
            col("ymd"))

        val grouped = pa.unionByName(nca)
          .groupBy(col("ymd"), col("campaign_id"), col("option_id"),
            col("placement_group"))
          // bundle = f(option_id, vendor) and vendor = f(campaign_id),
          // both group keys → first() deterministic
          .agg(first(col("bundle_product_ids")).as("bundle_product_ids"),
            sum(col("impression_count")).as("impression_count"),
            sum(col("click_count")).as("click_count"),
            sum(col("ad_cost")).as("ad_cost"),
            sum(col("conv_count")).as("conv_count"),
            sum(col("direct_conv_count")).as("direct_conv_count"),
            sum(col("conv_amount")).as("conv_amount"),
            sum(col("direct_conv_amount")).as("direct_conv_amount"))
        explodeAllocate(grouped, renewalDim(ctx.session),
          keep = Seq("campaign_id", "option_id", "placement_group"),
          metrics = Seq("impression_count", "click_count", "ad_cost",
            "conv_count", "direct_conv_count", "conv_amount",
            "direct_conv_amount"))
      }))
  }

  // ==== report-daily marts (q132-q134) ====

  private def installMarts(r: ModelRegistry, sfDir: String): Unit = {
    def prodJoin(df: DataFrame, prod: DataFrame): DataFrame =
      df.join(prod, Seq("product_id"), "left")

    def prodCols: Seq[Column] = Seq(
      col("item_id"),
      coalesce(col("item_seq"), lit(99999999L)).as("item_seq"),
      coalesce(col("team_name"), lit("담당팀 없음")).as("team_name"),
      coalesce(col("brand_name"), lit("브랜드 없음")).as("brand_name"),
      coalesce(col("category_name1"), lit("-")).as("category_name1"),
      coalesce(col("category_name2"), lit("-")).as("category_name2"),
      coalesce(col("category_name3"), lit("-")).as("category_name3"),
      coalesce(col("category_name4"), lit("-")).as("category_name4"),
      coalesce(col("color"), lit("-")).as("color"),
      coalesce(col("product_name"), lit("-")).as("product_name"))

    // google_ads__report_daily.sql:17-62
    r.register(Model("google_report_daily",
      Seq("google_insight_daily", "google_ad_master"), View, ctx => {
        val device = F.inlineDim(ctx.session, Seq("code", "label"),
          Seq(Seq("P", "PC"), Seq("M", "모바일")))
        val ins = ctx.ref("google_insight_daily").alias("i")
        val master = ctx.ref("google_ad_master")
          .select(col("ad_id").as("m_ad_id"), col("customer_id"),
            col("account_name"), col("campaign_id"), col("campaign_name"),
            col("campaign_type"), col("adgroup_id"), col("adgroup_name"),
            col("adgroup_type"), col("ad_name"), col("ad_type"),
            col("ad_status"))
        val prod = productDimStr(ctx.session, sfDir)
        prodJoin(ins
          .join(broadcast(device), col("i.device_type") === col("code"),
            "left")
          .join(master, col("i.ad_id") === col("m_ad_id"), "left"), prod)
          .select(Seq(
            col("customer_id"), col("account_name"), col("campaign_id"),
            col("campaign_name"),
            coalesce(col("campaign_type"), lit("캠페인 없음"))
              .as("campaign_type"),
            col("adgroup_id"), col("adgroup_name"),
            coalesce(col("adgroup_type"), lit("그룹 없음"))
              .as("adgroup_type"),
            col("i.ad_id").as("ad_id"), col("ad_name"),
            coalesce(col("ad_type"), lit("유형 없음")).as("ad_type"),
            coalesce(col("ad_status"), lit("알 수 없음")).as("ad_status"),
            col("product_id")) ++ prodCols ++ Seq(
            coalesce(col("label"), lit("-")).as("device_type"),
            col("impression_count"), col("click_count"), col("ad_cost"),
            col("ymd")): _*)
      }))

    // meta_ads__report_daily.sql:17-56
    r.register(Model("meta_report_daily",
      Seq("meta_insight_daily", "meta_ad_master"), View, ctx => {
        val ins = ctx.ref("meta_insight_daily").alias("i")
        val master = ctx.ref("meta_ad_master")
          .select(col("ad_id").as("m_ad_id"), col("account_id"),
            col("account_name"), col("campaign_id"), col("campaign_name"),
            col("objective"), col("adset_id"), col("adset_name"),
            col("ad_name"), col("effective_status"))
        val prod = productDimStr(ctx.session, sfDir)
        prodJoin(ins.join(master, col("i.ad_id") === col("m_ad_id"), "left"),
          prod)
          .select(Seq(
            col("account_id"), col("account_name"), col("campaign_id"),
            col("campaign_name"),
            coalesce(col("objective"), lit("-")).as("objective"),
            col("adset_id"), col("adset_name"),
            col("i.ad_id").as("ad_id"), col("ad_name"),
            coalesce(col("effective_status"), lit("-"))
              .as("effective_status"),
            col("product_id")) ++ prodCols ++ Seq(
            col("impression_count"), col("reach_count"), col("click_count"),
            col("link_click_count"), col("ad_cost"), col("ymd")): _*)
      }))

    // coupang_ads__report_daily.sql:17-75 — campaign master + the coupang
    // option dim with its conditional CONCAT display name
    r.register(Model("cads_option_dim", Nil, View, ctx =>
      Tables.part(ctx.session, sfDir).filter(col("p_partkey") < 400)
        .select(col("p_partkey").cast("long").as("o_option_id"),
          concat(lit("CP"), col("p_partkey")).as("o_product_name"),
          when(pmod(col("p_partkey"), lit(3)) === 0, nullStr)
            .otherwise(concat(lit("OPT"), pmod(col("p_partkey"), lit(7))))
            .as("o_option_name"),
          concat(lit("CAT"), pmod(col("p_partkey"), lit(9)))
            .as("o_category_name"))))

    r.register(Model("cads_report_daily",
      Seq("cads_insight_daily", "cads_campaign_master", "cads_option_dim"),
      View, ctx => {
        val placement = F.inlineDim(ctx.session, Seq("code", "label"),
          Seq(Seq(0, "검색"), Seq(1, "비검색"), Seq(2, "외부")))
        val ins = ctx.ref("cads_insight_daily").alias("i")
        val master = ctx.ref("cads_campaign_master")
          .select(col("campaign_id").as("m_campaign_id"), col("vendor_id"),
            col("vendor_name"), col("vendor_alias"), col("vendor_type"),
            col("campaign_name"), col("campaign_type"), col("goal_type"),
            col("is_active"), col("is_deleted"))
        val opt = ctx.ref("cads_option_dim")
        val prod = productDimStr(ctx.session, sfDir)
        prodJoin(ins
          .join(broadcast(placement),
            col("i.placement_group") === col("code"), "left")
          .join(master, col("i.campaign_id") === col("m_campaign_id"),
            "left")
          .join(broadcast(opt), col("i.option_id") === col("o_option_id"),
            "left"), prod)
          .select(Seq(
            col("vendor_id"), col("vendor_name"), col("vendor_alias"),
            col("vendor_type"),
            col("i.campaign_id").as("campaign_id"), col("campaign_name"),
            coalesce(col("campaign_type"), lit("캠페인 없음"))
              .as("campaign_type"),
            coalesce(col("goal_type"), lit("-")).as("goal_type"),
            col("is_active"), col("is_deleted"),
            col("product_id")) ++ prodCols ++ Seq(
            col("i.option_id").as("option_id"),
            when(col("o_option_name").isNotNull,
              concat(col("o_product_name"), lit(" / "),
                col("o_option_name")))
              .otherwise(col("o_product_name")).as("option_name"),
            col("o_category_name").as("category_name_cpg"),
            coalesce(col("label"), lit("-")).as("placement_group"),
            col("impression_count"), col("click_count"), col("ad_cost"),
            col("conv_count"), col("direct_conv_count"),
            col("conv_amount"), col("direct_conv_amount"),
            col("ymd")): _*)
      }))
  }
}
