package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables

/** Ad-platform master marts — the reference's `intermediate/ads` master
  * dbt family (dbt_bigquery/models/intermediate/ads/google_ads/
  * google_ads__campaign_master.sql:22-52, google_ads__adgroup_master.sql:
  * 26-73, google_ads__ad_master.sql:39-105, meta_ads/meta_ads__campaign_
  * master.sql:18-41, meta_ads__adset_master.sql:18-55, meta_ads__ad_
  * master.sql:24-82, coupang_ads/coupang_ads__campaign_master.sql:22-53,
  * coupang_ads__adgroup_master.sql:22-58, searchad/searchad__adgroup_
  * master.sql:14-55).
  *
  * Shared semantics across all nine masters:
  *  - code → (seq, label) mapping dims (the reference's `*_mapping()`
  *    macros, e.g. macros/mapping/google_ads.sql);
  *  - multi-level status resolution: the *worst* status along the
  *    campaign → adgroup/adset → ad chain wins, computed as
  *    `GREATEST(COALESCE(seq, -1)...)` then mapped back to a label;
  *  - level-COALESCE of `bundle_product_ids` from the ad→sbn relation
  *    (ad level 2, then adgroup/adset level 1, then campaign level 0);
  *  - arithmetic sort-key ladders `IF(deleted, 2, 1) * w + COALESCE(seq,
  *    99) * w' + ...`.
  *
  * Spark-first design: the mapping dims are compile-time literal tables,
  * so lookups are literal-`Map` expressions (`try_element_at(typedLit(m),
  * key)`) — pure whole-stage-codegen projections, no joins, no shuffles —
  * where the reference LEFT JOINs each mapping CTE up to seven times per
  * master. The only joins left are the genuine data joins (campaign ↔
  * account dim, ad ↔ adgroup), which AQE plans as broadcast or shuffle
  * joins by actual size. The dim entries are public so the DuckDB oracles
  * replay the same ladders from one source of truth.
  */
object AdsMasters {

  /** String-coded mapping dim: (code, seq, label). Seq values keep the
    * reference's numbering even where we carry a subset of codes.
    */
  final case class StrDim(entries: Seq[(String, Int, String)]) {
    def codes: Seq[String] = entries.map(_._1)
    def seqOf(c: Column): Column =
      try_element_at(typedLit(entries.map(e => (e._1, e._2)).toMap), c)
    def labelOf(c: Column): Column =
      try_element_at(typedLit(entries.map(e => (e._1, e._3)).toMap), c)
    def labelBySeq(c: Column): Column =
      try_element_at(typedLit(entries.map(e => (e._2, e._3)).toMap),
        c.cast("int"))
    def codeBySeq(c: Column): Column =
      try_element_at(typedLit(entries.map(e => (e._2, e._1)).toMap),
        c.cast("int"))
  }

  /** Int-coded mapping dim (coupang goal/vendor types, searchad types). */
  final case class IntDim(entries: Seq[(Int, Int, String)]) {
    def codes: Seq[Int] = entries.map(_._1)
    def seqOf(c: Column): Column =
      try_element_at(typedLit(entries.map(e => (e._1, e._2)).toMap),
        c.cast("int"))
    def labelOf(c: Column): Column =
      try_element_at(typedLit(entries.map(e => (e._1, e._3)).toMap),
        c.cast("int"))
    def labelBySeq(c: Column): Column =
      try_element_at(typedLit(entries.map(e => (e._2, e._3)).toMap),
        c.cast("int"))
  }

  // ---- google (macros/mapping/google_ads.sql; seqs are the reference's) ----
  val googleCampaignType: StrDim = StrDim(Seq(
    ("DISPLAY", 1, "디스플레이"), ("PERFORMANCE_MAX", 6, "실적 최대화"),
    ("SEARCH", 7, "검색"), ("SHOPPING", 8, "쇼핑"), ("VIDEO", 13, "동영상")))
  val googleBidStrategy: StrDim = StrDim(Seq(
    ("MANUAL_CPC", 6, "수동 CPC"), ("MAXIMIZE_CONVERSIONS", 9, "전환 수 최대화"),
    ("TARGET_ROAS", 19, "목표 ROAS"), ("TARGET_SPEND", 20, "목표 지출")))
  val googleAdgroupType: StrDim = StrDim(Seq(
    ("DISPLAY_STANDARD", 0, "표준 디스플레이"), ("SEARCH_STANDARD", 4, "표준 검색"),
    ("SHOPPING_PRODUCT_ADS", 6, "쇼핑 제품 광고"),
    ("VIDEO_RESPONSIVE", 15, "반응형 동영상")))
  val googleAdType: StrDim = StrDim(Seq(
    ("IMAGE_AD", 13, "이미지 광고"), ("RESPONSIVE_SEARCH_AD", 19, "반응형 검색 광고"),
    ("SHOPPING_PRODUCT_AD", 21, "쇼핑 제품 광고"), ("TEXT_AD", 24, "텍스트 광고"),
    ("VIDEO_AD", 28, "동영상 광고")))
  val googleStatus: StrDim = StrDim(Seq(
    ("ENABLED", 0, "운영 가능"), ("PAUSED", 1, "일시중지됨"),
    ("REMOVED", 2, "삭제됨"), ("UNKNOWN", 3, "알 수 없음")))

  // ---- meta (macros/mapping/meta_ads.sql) ----
  val metaObjective: StrDim = StrDim(Seq(
    ("OUTCOME_AWARENESS", 0, "인지도"), ("OUTCOME_ENGAGEMENT", 1, "참여"),
    ("OUTCOME_LEADS", 2, "리드"), ("OUTCOME_SALES", 3, "판매"),
    ("OUTCOME_TRAFFIC", 4, "트래픽"), ("LINK_CLICKS", 11, "링크 클릭")))
  val metaStatus: StrDim = StrDim(Seq(
    ("ACTIVE", 0, "활성"), ("PAUSED", 1, "일시 중지"), ("DELETED", 2, "삭제됨"),
    ("ARCHIVED", 3, "보관됨"), ("WITH_ISSUES", 11, "문제 발생")))

  // ---- coupang ads (macros/mapping/coupang_ads.sql) ----
  val coupangVendorType: IntDim = IntDim(Seq(
    (0, 0, "Wing"), (1, 1, "서플라이어 허브")))
  val coupangGoalType: IntDim = IntDim(Seq(
    (0, 0, "매출 성장"), (1, 1, "신규 구매 고객 확보"), (2, 2, "인지도 상승")))

  // ---- searchad (macros/mapping/searchad.sql) ----
  val searchadCampaignType: IntDim = IntDim(Seq(
    (1, 0, "파워링크"), (2, 1, "쇼핑검색"), (3, 2, "파워컨텐츠"),
    (4, 3, "브랜드검색/신제품검색"), (5, 4, "플레이스"), (101, 5, "웹사이트 전환")))
  val searchadAdgroupType: IntDim = IntDim(Seq(
    (1, 0, "파워링크"), (2, 1, "쇼핑검색-쇼핑몰 상품형"), (3, 2, "파워컨텐츠-정보형"),
    (5, 4, "브랜드검색-일반형"), (101, 11, "성과형-클릭 수 최대화"),
    (102, 12, "성과형-전환 수 최대화")))

  private def pick(vals: Seq[String], key: Column, n: Int): Column =
    element_at(array(vals.map(lit): _*), (pmod(key, lit(n)) + 1).cast("int"))

  /** Worst-status seq along a chain: GREATEST(COALESCE(seq(c), -1)...). */
  private def worstSeq(dim: StrDim, codes: Column*): Column =
    greatest(codes.map(c => coalesce(dim.seqOf(c), lit(-1))): _*)

  def install(r: ModelRegistry, sfDir: String): Unit = {
    installGoogle(r, sfDir)
    installMeta(r, sfDir)
    installCoupang(r, sfDir)
    installSearchad(r, sfDir)

    // ad→sbn relation rows (reference source('relation', 'ad_id_to_sbn_ids')
    // consumed by google_ads__ad_master.sql:103-108 / meta_ads__ad_master.sql
    // :9-15,76-81): ad_level 0=campaign, 1=adgroup/adset, 2=ad; ids target
    // the matching platform id space so each COALESCE level gets hits. The
    // level-0 mod wraps at larger SFs, so the model re-asserts the relation's
    // (platform, level, ad_id) uniqueness contract with a MIN-reduce — a left
    // join to it must never fan out the master rows.
    r.register(Model("ad_sbn_relation", Nil, View, ctx => {
      val p = col("p_partkey")
      val gGrp = p * 7 + 1 // google adgroup ids are orderkeys ≡ 1 (mod 7)
      val mSet = p * 7 + 5 // meta adset ids are orderkeys ≡ 5 (mod 7)
      Tables.part(ctx.session, sfDir).select(
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
        concat(lit("B"), pmod(p, lit(500)), lit(",B"), pmod(p, lit(500)) + 1)
          .as("bundle_product_ids"))
        .groupBy(col("platform_name"), col("ad_level"), col("ad_id"))
        .agg(min(col("bundle_product_ids")).as("bundle_product_ids"))
    }))
  }

  // ==== google_ads ====

  private def installGoogle(r: ModelRegistry, sfDir: String): Unit = {
    r.register(Model("gads_account", Nil, View, ctx =>
      Tables.nation(ctx.session, sfDir).filter(col("n_nationkey") < 20)
        .select(
          col("n_nationkey").cast("long").as("customer_id"),
          concat(lit("GACC"), col("n_nationkey")).as("account_name"),
          pmod(col("n_nationkey"), lit(7)).cast("int").as("account_seq"))))

    r.register(Model("gads_campaign", Nil, View, ctx => {
      val c = col("c_custkey")
      Tables.customer(ctx.session, sfDir).filter(c < 600).select(
        c.cast("long").as("campaign_id"),
        pmod(c, lit(25)).cast("long").as("customer_id"),
        concat(lit("GCMP"), c).as("campaign_name"),
        // ODD_TYPE is deliberately unmapped → label NULL, ladder seq 99
        when(pmod(c, lit(17)) === 0, lit("ODD_TYPE"))
          .otherwise(pick(googleCampaignType.codes, c, 5)).as("campaign_type"),
        pick(googleStatus.codes, c, 4).as("campaign_status"),
        when(pmod(c, lit(7)) === 0, lit(null).cast("string"))
          .otherwise(pick(googleBidStrategy.codes, c, 4))
          .as("bidding_strategy"),
        floor(col("c_acctbal")).cast("long").as("campaign_budget"),
        (pmod(c, lit(1000)) * 3).cast("long").as("impression_count_30d"),
        pmod(c, lit(80)).cast("long").as("click_count_30d"),
        floor(col("c_acctbal") * 0.1).cast("long").as("ad_cost_30d"),
        date_add(lit("1995-01-01").cast("date"),
          pmod(c, lit(700)).cast("int")).as("created_at"))
    }))

    r.register(Model("gads_adgroup", Nil, View, ctx => {
      val ok = col("o_orderkey")
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 1).select(
          ok.cast("long").as("adgroup_id"),
          pmod(col("o_custkey"), lit(600)).cast("long").as("campaign_id"),
          pmod(col("o_custkey"), lit(25)).cast("long").as("customer_id"),
          concat(lit("GGRP"), ok).as("adgroup_name"),
          when(pmod(ok, lit(13)) === 0, lit(null).cast("string"))
            .otherwise(pick(googleAdgroupType.codes, ok, 4))
            .as("adgroup_type"),
          pick(googleStatus.codes.take(3), ok, 3).as("adgroup_status"),
          pmod(ok, lit(5000)).cast("long").as("target_cpa"),
          (pmod(ok, lit(800)) * 2).cast("long").as("impression_count_30d"),
          pmod(ok, lit(60)).cast("long").as("click_count_30d"),
          floor(col("o_totalprice") * 0.02).cast("long").as("ad_cost_30d"))
    }))

    // ads ride the adgroup slice (ok ≡ 1 mod 7) so every ad has a live
    // adgroup except the forced ok%11 misses, which exercise the NULL path
    r.register(Model("gads_ad", Nil, View, ctx => {
      val ok = col("o_orderkey")
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 1).select(
          (ok * 10 + pmod(ok, lit(3))).cast("long").as("ad_id"),
          when(pmod(ok, lit(11)) === 0, lit(-1L))
            .otherwise(ok.cast("long")).as("adgroup_id"),
          pmod(col("o_custkey"), lit(600)).cast("long").as("campaign_id"),
          pmod(col("o_custkey"), lit(25)).cast("long").as("customer_id"),
          concat(lit("GAD"), ok).as("ad_name"),
          when(pmod(ok, lit(19)) === 0, lit(null).cast("string"))
            .otherwise(pick(googleAdType.codes, ok, 5)).as("ad_type"),
          pick(googleStatus.codes, ok + 1, 4).as("ad_status"),
          (pmod(ok, lit(700)) * 2).cast("long").as("impression_count_30d"),
          pmod(ok, lit(40)).cast("long").as("click_count_30d"),
          floor(col("o_totalprice") * 0.01).cast("long").as("ad_cost_30d"))
    }))

    // google_ads__campaign_master.sql:22-52
    r.register(Model("google_campaign_master",
      Seq("gads_campaign", "gads_account"), View, ctx => {
        val cmp = ctx.ref("gads_campaign").alias("c")
        val acc = ctx.ref("gads_account").alias("a")
        cmp.join(broadcast(acc),
            col("c.customer_id") === col("a.customer_id"), "left")
          .select(
            col("c.customer_id").as("customer_id"),
            col("a.account_name").as("account_name"),
            col("c.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            googleCampaignType.labelOf(col("c.campaign_type"))
              .as("campaign_type"),
            googleStatus.labelOf(col("c.campaign_status"))
              .as("campaign_status"),
            googleBidStrategy.labelOf(col("c.bidding_strategy"))
              .as("bidding_strategy"),
            col("c.campaign_budget"), col("c.impression_count_30d"),
            col("c.click_count_30d"), col("c.ad_cost_30d"),
            col("c.created_at"),
            (when(col("c.campaign_status") === "REMOVED", lit(2))
              .otherwise(lit(1)) * 10000 +
              coalesce(col("a.account_seq"), lit(99)) * 100 +
              coalesce(googleCampaignType.seqOf(col("c.campaign_type")),
                lit(99))).cast("long").as("sort_key"))
      }))

    // google_ads__adgroup_master.sql:26-73 — status_fin = worst of
    // campaign/adgroup status, mapped back to label and code
    r.register(Model("google_adgroup_master",
      Seq("gads_adgroup", "gads_campaign", "gads_account"), View, ctx => {
        val grp = ctx.ref("gads_adgroup").alias("g")
        val cmp = ctx.ref("gads_campaign").alias("c")
        val acc = ctx.ref("gads_account").alias("a")
        val fin = worstSeq(googleStatus,
          col("c.campaign_status"), col("g.adgroup_status"))
        grp
          .join(broadcast(acc),
            col("g.customer_id") === col("a.customer_id"), "left")
          .join(cmp, col("g.campaign_id") === col("c.campaign_id"), "left")
          .select(
            col("g.customer_id").as("customer_id"),
            col("a.account_name").as("account_name"),
            col("g.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            googleCampaignType.labelOf(col("c.campaign_type"))
              .as("campaign_type"),
            googleBidStrategy.labelOf(col("c.bidding_strategy"))
              .as("bidding_strategy"),
            col("g.adgroup_id").as("adgroup_id"),
            col("g.adgroup_name").as("adgroup_name"),
            googleAdgroupType.labelOf(col("g.adgroup_type"))
              .as("adgroup_type"),
            googleStatus.labelBySeq(fin).as("adgroup_status"),
            col("g.target_cpa"), col("g.impression_count_30d"),
            col("g.click_count_30d"), col("g.ad_cost_30d"),
            col("c.created_at").as("created_at"),
            (when(googleStatus.codeBySeq(fin) === "REMOVED", lit(2))
              .otherwise(lit(1)) * 1000000 +
              coalesce(col("a.account_seq"), lit(99)) * 10000 +
              coalesce(googleCampaignType.seqOf(col("c.campaign_type")),
                lit(99)) * 100 +
              coalesce(googleAdgroupType.seqOf(col("g.adgroup_type")),
                lit(99))).cast("long").as("sort_key"))
      }))

    // google_ads__ad_master.sql:39-105 — 3-level status + bundle COALESCE
    r.register(Model("google_ad_master",
      Seq("gads_ad", "gads_adgroup", "gads_campaign", "gads_account",
        "ad_sbn_relation"), View, ctx => {
        val ad = ctx.ref("gads_ad").alias("d")
        val grp = ctx.ref("gads_adgroup").alias("g")
        val cmp = ctx.ref("gads_campaign").alias("c")
        val acc = ctx.ref("gads_account").alias("a")
        val rel = ctx.ref("ad_sbn_relation")
          .filter(col("platform_name") === "구글")
        def level(l: Int, as: String) = rel.filter(col("ad_level") === l)
          .select(col("ad_id").as(s"${as}_id"),
            col("bundle_product_ids").as(s"${as}_bundle")).alias(as)
        val fin = worstSeq(googleStatus, col("c.campaign_status"),
          col("g.adgroup_status"), col("d.ad_status"))
        ad
          .join(broadcast(acc),
            col("d.customer_id") === col("a.customer_id"), "left")
          .join(cmp, col("d.campaign_id") === col("c.campaign_id"), "left")
          .join(grp, col("d.adgroup_id") === col("g.adgroup_id"), "left")
          .join(level(0, "rc"), col("d.campaign_id") === col("rc_id"), "left")
          .join(level(1, "rg"), col("d.adgroup_id") === col("rg_id"), "left")
          .join(level(2, "rd"), col("d.ad_id") === col("rd_id"), "left")
          .select(
            col("d.customer_id").as("customer_id"),
            col("a.account_name").as("account_name"),
            col("d.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            googleCampaignType.labelOf(col("c.campaign_type"))
              .as("campaign_type"),
            googleBidStrategy.labelOf(col("c.bidding_strategy"))
              .as("bidding_strategy"),
            col("d.adgroup_id").as("adgroup_id"),
            col("g.adgroup_name").as("adgroup_name"),
            googleAdgroupType.labelOf(col("g.adgroup_type"))
              .as("adgroup_type"),
            col("d.ad_id").as("ad_id"),
            col("d.ad_name").as("ad_name"),
            googleAdType.labelOf(col("d.ad_type")).as("ad_type"),
            googleStatus.labelBySeq(fin).as("ad_status"),
            coalesce(col("rd_bundle"), col("rg_bundle"), col("rc_bundle"))
              .as("bundle_product_ids"),
            col("d.impression_count_30d"), col("d.click_count_30d"),
            col("d.ad_cost_30d"),
            col("c.created_at").as("created_at"),
            (when(googleStatus.codeBySeq(fin) === "REMOVED", lit(2))
              .otherwise(lit(1)) * 100000000L +
              coalesce(col("a.account_seq"), lit(99)) * 1000000L +
              coalesce(googleCampaignType.seqOf(col("c.campaign_type")),
                lit(99)) * 10000L +
              coalesce(googleAdgroupType.seqOf(col("g.adgroup_type")),
                lit(99)) * 100L +
              coalesce(googleAdType.seqOf(col("d.ad_type")), lit(99)))
              .cast("long").as("sort_key"))
      }))
  }

  // ==== meta_ads ====

  private def installMeta(r: ModelRegistry, sfDir: String): Unit = {
    r.register(Model("meta_account", Nil, View, ctx =>
      Tables.nation(ctx.session, sfDir).filter(col("n_nationkey") < 18)
        .select(
          col("n_nationkey").cast("long").as("account_id"),
          concat(lit("MACC"), col("n_nationkey")).as("account_name"),
          pmod(col("n_nationkey"), lit(6)).cast("int").as("account_seq"))))

    r.register(Model("meta_campaign", Nil, View, ctx => {
      val c = col("c_custkey")
      Tables.customer(ctx.session, sfDir)
        .filter(pmod(c, lit(2)) === 1).select(
          c.cast("long").as("campaign_id"),
          pmod(c, lit(25)).cast("long").as("account_id"),
          concat(lit("MCMP"), c).as("campaign_name"),
          when(pmod(c, lit(23)) === 0, lit("ODD_OBJ"))
            .otherwise(pick(metaObjective.codes, c, 6)).as("objective"),
          pick(metaStatus.codes, c, 5).as("effective_status"),
          date_add(lit("1995-03-01").cast("date"),
            pmod(c, lit(600)).cast("int")).as("created_at"))
    }))

    r.register(Model("meta_adset", Nil, View, ctx => {
      val ok = col("o_orderkey")
      val cid = pmod(col("o_custkey"), lit(300)) * 2 + 1
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 5).select(
          ok.cast("long").as("adset_id"),
          cid.cast("long").as("campaign_id"),
          // account derives from the campaign id so the adset master's
          // two-key campaign join (account AND campaign) finds its row
          pmod(cid, lit(25)).cast("long").as("account_id"),
          concat(lit("MSET"), ok).as("adset_name"),
          pick(metaStatus.codes.take(4), ok, 4).as("effective_status"),
          (pmod(ok, lit(2000)) * 100).cast("long").as("daily_budget"),
          // NULL adset created_at exercises COALESCE(adset, cmp) fallback
          when(pmod(ok, lit(5)) === 0, lit(null).cast("date"))
            .otherwise(date_add(lit("1995-06-01").cast("date"),
              pmod(ok, lit(400)).cast("int"))).as("created_at"))
    }))

    r.register(Model("meta_ad", Nil, View, ctx => {
      val ok = col("o_orderkey")
      val cid = pmod(col("o_custkey"), lit(300)) * 2 + 1
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 5).select(
          (ok * 10 + pmod(ok, lit(3))).cast("long").as("ad_id"),
          when(pmod(ok, lit(13)) === 0, lit(-1L))
            .otherwise(ok.cast("long")).as("adset_id"),
          cid.cast("long").as("campaign_id"),
          pmod(cid, lit(25)).cast("long").as("account_id"),
          concat(lit("MAD"), ok).as("ad_name"),
          pick(metaStatus.codes.take(4), ok + 1, 4).as("effective_status"),
          when(pmod(ok, lit(3)) === 0, lit(null).cast("date"))
            .otherwise(date_add(lit("1995-09-01").cast("date"),
              pmod(ok, lit(300)).cast("int"))).as("created_at"))
    }))

    // meta_ads__campaign_master.sql:18-41
    r.register(Model("meta_campaign_master",
      Seq("meta_campaign", "meta_account"), View, ctx => {
        val cmp = ctx.ref("meta_campaign").alias("c")
        val acc = ctx.ref("meta_account").alias("a")
        cmp.join(broadcast(acc),
            col("c.account_id") === col("a.account_id"), "left")
          .select(
            col("c.account_id").as("account_id"),
            col("a.account_name").as("account_name"),
            col("c.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            metaObjective.labelOf(col("c.objective")).as("objective"),
            metaStatus.labelOf(col("c.effective_status"))
              .as("effective_status"),
            col("c.created_at"),
            (when(col("c.effective_status") === "DELETED", lit(2))
              .otherwise(lit(1)) * 10000 +
              coalesce(col("a.account_seq"), lit(99)) * 100 +
              coalesce(metaObjective.seqOf(col("c.objective")), lit(99)))
              .cast("long").as("sort_key"))
      }))

    // meta_ads__adset_master.sql:18-55 — note the two-key campaign join
    // (account_id AND campaign_id) and the created_at COALESCE
    r.register(Model("meta_adset_master",
      Seq("meta_adset", "meta_campaign", "meta_account"), View, ctx => {
        val as_ = ctx.ref("meta_adset").alias("s")
        val cmp = ctx.ref("meta_campaign").alias("c")
        val acc = ctx.ref("meta_account").alias("a")
        val fin = worstSeq(metaStatus,
          col("c.effective_status"), col("s.effective_status"))
        as_
          .join(broadcast(acc),
            col("s.account_id") === col("a.account_id"), "left")
          .join(cmp, col("s.account_id") === col("c.account_id") &&
            col("s.campaign_id") === col("c.campaign_id"), "left")
          .select(
            col("s.account_id").as("account_id"),
            col("a.account_name").as("account_name"),
            col("s.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            metaObjective.labelOf(col("c.objective")).as("objective"),
            col("s.adset_id").as("adset_id"),
            col("s.adset_name").as("adset_name"),
            metaStatus.labelBySeq(fin).as("effective_status"),
            col("s.daily_budget"),
            coalesce(col("s.created_at"), col("c.created_at"))
              .as("created_at"),
            (when(metaStatus.codeBySeq(fin) === "DELETED", lit(2))
              .otherwise(lit(1)) * 10000 +
              coalesce(col("a.account_seq"), lit(99)) * 100 +
              coalesce(metaObjective.seqOf(col("c.objective")), lit(99)))
              .cast("long").as("sort_key"))
      }))

    // meta_ads__ad_master.sql:24-82 — 3-level status, bundle COALESCE,
    // created_at COALESCE(ad, adset, cmp)
    r.register(Model("meta_ad_master",
      Seq("meta_ad", "meta_adset", "meta_campaign", "meta_account",
        "ad_sbn_relation"), View, ctx => {
        val ad = ctx.ref("meta_ad").alias("d")
        val as_ = ctx.ref("meta_adset").alias("s")
        val cmp = ctx.ref("meta_campaign").alias("c")
        val acc = ctx.ref("meta_account").alias("a")
        val rel = ctx.ref("ad_sbn_relation")
          .filter(col("platform_name") === "메타")
        def level(l: Int, as: String) = rel.filter(col("ad_level") === l)
          .select(col("ad_id").as(s"${as}_id"),
            col("bundle_product_ids").as(s"${as}_bundle")).alias(as)
        val fin = worstSeq(metaStatus, col("c.effective_status"),
          col("s.effective_status"), col("d.effective_status"))
        ad
          .join(broadcast(acc),
            col("d.account_id") === col("a.account_id"), "left")
          .join(cmp, col("d.campaign_id") === col("c.campaign_id"), "left")
          .join(as_, col("d.adset_id") === col("s.adset_id"), "left")
          .join(level(0, "rc"), col("d.campaign_id") === col("rc_id"), "left")
          .join(level(1, "rs"), col("d.adset_id") === col("rs_id"), "left")
          .join(level(2, "rd"), col("d.ad_id") === col("rd_id"), "left")
          .select(
            col("d.account_id").as("account_id"),
            col("a.account_name").as("account_name"),
            col("d.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            metaObjective.labelOf(col("c.objective")).as("objective"),
            col("d.adset_id").as("adset_id"),
            col("s.adset_name").as("adset_name"),
            col("d.ad_id").as("ad_id"),
            col("d.ad_name").as("ad_name"),
            metaStatus.labelBySeq(fin).as("effective_status"),
            coalesce(col("rd_bundle"), col("rs_bundle"), col("rc_bundle"))
              .as("bundle_product_ids"),
            coalesce(col("d.created_at"), col("s.created_at"),
              col("c.created_at")).as("created_at"),
            (when(metaStatus.codeBySeq(fin) === "DELETED", lit(2))
              .otherwise(lit(1)) * 10000 +
              coalesce(col("a.account_seq"), lit(99)) * 100 +
              coalesce(metaObjective.seqOf(col("c.objective")), lit(99)))
              .cast("long").as("sort_key"))
      }))
  }

  // ==== coupang_ads ====

  private def installCoupang(r: ModelRegistry, sfDir: String): Unit = {
    r.register(Model("cads_vendor", Nil, View, ctx =>
      Tables.nation(ctx.session, sfDir).filter(col("n_nationkey") < 15)
        .select(
          col("n_nationkey").cast("long").as("vendor_id"),
          concat(lit("VD"), col("n_nationkey")).as("vendor_name"),
          when(pmod(col("n_nationkey"), lit(4)) === 0,
            lit(null).cast("string"))
            .otherwise(concat(lit("VA"), col("n_nationkey")))
            .as("vendor_alias"),
          pmod(col("n_nationkey"), lit(5)).cast("int").as("vendor_seq"))))

    r.register(Model("cads_campaign", Nil, View, ctx => {
      val c = col("c_custkey")
      Tables.customer(ctx.session, sfDir)
        .filter(pmod(c, lit(3)) === 0).select(
          c.cast("long").as("campaign_id"),
          pmod(c, lit(25)).cast("long").as("vendor_id"),
          concat(lit("CCMP"), c).as("campaign_name"),
          pmod(c, lit(3)).cast("int").as("vendor_type"), // 2 is unmapped
          // unmapped campaign_type codes pass through raw via
          // COALESCE(label, code) — coupang_ads__campaign_master.sql:33
          when(pmod(c, lit(11)) === 0, lit("XPA")).otherwise(lit("PA"))
            .as("campaign_type"),
          pmod(c, lit(4)).cast("int").as("goal_type"), // 3 is unmapped
          (pmod(c, lit(2)) === 0).as("is_active"),
          (pmod(c, lit(13)) === 0).as("is_deleted"),
          pmod(c, lit(400)).cast("long").as("roas_target"),
          date_add(lit("1995-02-01").cast("date"),
            pmod(c, lit(500)).cast("int")).as("created_at"),
          date_add(lit("1996-02-01").cast("date"),
            pmod(c, lit(300)).cast("int")).as("updated_at"))
    }))

    r.register(Model("cads_adgroup", Nil, View, ctx => {
      val ok = col("o_orderkey")
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 6).select(
          ok.cast("long").as("adgroup_id"),
          (pmod(col("o_custkey"), lit(300)) * 3).cast("long")
            .as("campaign_id"),
          pmod(col("o_custkey"), lit(25)).cast("long").as("vendor_id"),
          concat(lit("CGRP"), ok).as("adgroup_name"),
          pmod(ok, lit(3)).cast("int").as("goal_type"),
          (pmod(ok, lit(2)) === 0).as("is_active"),
          (pmod(ok, lit(17)) === 0).as("is_deleted"),
          pmod(ok, lit(500)).cast("long").as("roas_target"),
          date_add(lit("1995-04-01").cast("date"),
            pmod(ok, lit(500)).cast("int")).as("created_at"),
          date_add(lit("1996-04-01").cast("date"),
            pmod(ok, lit(200)).cast("int")).as("updated_at"))
    }))

    // coupang_ads__campaign_master.sql:22-53 — boolean is_deleted drives
    // the sort ladder; unmapped campaign_type falls back to the raw code
    r.register(Model("cads_campaign_master",
      Seq("cads_campaign", "cads_vendor"), View, ctx => {
        val cmp = ctx.ref("cads_campaign").alias("c")
        val vdr = ctx.ref("cads_vendor").alias("v")
        cmp.join(broadcast(vdr),
            col("c.vendor_id") === col("v.vendor_id"), "left")
          .select(
            col("c.vendor_id").as("vendor_id"),
            col("v.vendor_name").as("vendor_name"),
            col("v.vendor_alias").as("vendor_alias"),
            coupangVendorType.labelOf(col("c.vendor_type"))
              .as("vendor_type"),
            col("c.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            coalesce(try_element_at(typedLit(Map("PA" -> "상품광고")),
              col("c.campaign_type")), col("c.campaign_type"))
              .as("campaign_type"),
            coupangGoalType.labelOf(col("c.goal_type")).as("goal_type"),
            col("c.is_active"), col("c.is_deleted"), col("c.roas_target"),
            col("c.created_at"), col("c.updated_at"),
            (when(col("c.is_deleted"), lit(2)).otherwise(lit(1)) * 1000 +
              coalesce(col("v.vendor_seq"), lit(99)) * 10 +
              coalesce(coupangGoalType.seqOf(col("c.goal_type")), lit(9)))
              .cast("long").as("sort_key"))
      }))

    // coupang_ads__adgroup_master.sql:22-58 — vendor_type comes from the
    // CAMPAIGN row, goal/deleted/sort from the adgroup row
    r.register(Model("cads_adgroup_master",
      Seq("cads_adgroup", "cads_campaign", "cads_vendor"), View, ctx => {
        val grp = ctx.ref("cads_adgroup").alias("g")
        val cmp = ctx.ref("cads_campaign").alias("c")
        val vdr = ctx.ref("cads_vendor").alias("v")
        grp
          .join(cmp, col("g.campaign_id") === col("c.campaign_id"), "left")
          .join(broadcast(vdr),
            col("g.vendor_id") === col("v.vendor_id"), "left")
          .select(
            col("g.vendor_id").as("vendor_id"),
            col("v.vendor_name").as("vendor_name"),
            col("v.vendor_alias").as("vendor_alias"),
            coupangVendorType.labelOf(col("c.vendor_type"))
              .as("vendor_type"),
            col("g.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            coalesce(try_element_at(typedLit(Map("PA" -> "상품광고")),
              col("c.campaign_type")), col("c.campaign_type"))
              .as("campaign_type"),
            col("g.adgroup_id").as("adgroup_id"),
            col("g.adgroup_name").as("adgroup_name"),
            coupangGoalType.labelOf(col("g.goal_type")).as("goal_type"),
            col("g.is_active"), col("g.is_deleted"), col("g.roas_target"),
            col("g.created_at"), col("g.updated_at"),
            (when(col("g.is_deleted"), lit(2)).otherwise(lit(1)) * 1000 +
              coalesce(col("v.vendor_seq"), lit(99)) * 10 +
              coalesce(coupangGoalType.seqOf(col("g.goal_type")), lit(9)))
              .cast("long").as("sort_key"))
      }))
  }

  // ==== searchad adgroup master ====

  private def installSearchad(r: ModelRegistry, sfDir: String): Unit = {
    r.register(Model("nsa_account", Nil, View, ctx =>
      Tables.nation(ctx.session, sfDir).filter(col("n_nationkey") < 20)
        .select(
          col("n_nationkey").cast("long").as("customer_id"),
          concat(lit("NACC"), col("n_nationkey")).as("account_name"),
          element_at(array(lit("일반"), lit("대행")),
            (pmod(col("n_nationkey"), lit(2)) + 1).cast("int"))
            .as("account_type"),
          pmod(col("n_nationkey"), lit(7)).cast("int").as("account_seq"),
          // brand fallback for the contract-daily bundle ladder (q138)
          when(pmod(col("n_nationkey"), lit(3)) === 0,
            lit(null).cast("string"))
            .otherwise(concat(lit("200000"),
              pmod(col("n_nationkey"), lit(9)) + 1))
            .as("bundle_brand_ids"))))

    r.register(Model("nsa_campaign", Nil, View, ctx => {
      val c = col("c_custkey")
      Tables.customer(ctx.session, sfDir).filter(c < 500).select(
        c.cast("long").as("campaign_id"),
        pmod(c, lit(25)).cast("long").as("customer_id"),
        concat(lit("NCMP"), c).as("campaign_name"),
        element_at(
          array(searchadCampaignType.codes.map(i => lit(i)): _*),
          (pmod(c, lit(6)) + 1).cast("int")).cast("int")
          .as("campaign_type"),
        // NULL when c%9==0 exercises COALESCE(c AND g, g) passthrough
        when(pmod(c, lit(9)) === 0, lit(null).cast("boolean"))
          .otherwise(pmod(c, lit(3)) > 0).as("is_enabled"),
        // q135 campaign-master columns (searchad__campaign_master.sql)
        (pmod(c, lit(21)) === 0).as("is_deleted"),
        date_add(lit("1995-02-01").cast("date"),
          pmod(c, lit(650)).cast("int")).as("created_at"),
        when(pmod(c, lit(21)) === 0,
          date_add(lit("1996-03-01").cast("date"),
            pmod(c, lit(250)).cast("int")))
          .otherwise(lit(null).cast("date")).as("deleted_at"))
    }))

    r.register(Model("nsa_adgroup", Nil, View, ctx => {
      val ok = col("o_orderkey")
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 4).select(
          ok.cast("long").as("adgroup_id"),
          pmod(col("o_custkey"), lit(500)).cast("long").as("campaign_id"),
          pmod(col("o_custkey"), lit(25)).cast("long").as("customer_id"),
          concat(lit("NGRP"), ok).as("adgroup_name"),
          element_at(
            array(searchadAdgroupType.codes.map(i => lit(i)): _*),
            (pmod(ok, lit(6)) + 1).cast("int")).cast("int")
            .as("adgroup_type"),
          pmod(ok, lit(10000)).cast("long").as("bid_amount"),
          (pmod(ok, lit(2)) === 0).as("is_enabled"),
          (pmod(ok, lit(19)) === 0).as("is_deleted"),
          date_add(lit("1995-05-01").cast("date"),
            pmod(ok, lit(600)).cast("int")).as("created_at"),
          when(pmod(ok, lit(19)) === 0,
            date_add(lit("1996-05-01").cast("date"),
              pmod(ok, lit(300)).cast("int")))
            .otherwise(lit(null).cast("date")).as("deleted_at"))
    }))

    // searchad__adgroup_master.sql:14-55 — Kleene is_enabled resolution:
    // COALESCE(cmp.is_enabled AND grp.is_enabled, grp.is_enabled)
    r.register(Model("nsa_adgroup_master",
      Seq("nsa_adgroup", "nsa_campaign", "nsa_account"), View, ctx => {
        val grp = ctx.ref("nsa_adgroup").alias("g")
        val cmp = ctx.ref("nsa_campaign").alias("c")
        val acc = ctx.ref("nsa_account").alias("a")
        grp
          .join(broadcast(acc),
            col("g.customer_id") === col("a.customer_id"), "left")
          .join(cmp, col("g.campaign_id") === col("c.campaign_id"), "left")
          .select(
            col("g.customer_id").as("customer_id"),
            col("a.account_name").as("account_name"),
            col("a.account_type").as("account_type"),
            col("g.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            searchadCampaignType.labelOf(col("c.campaign_type"))
              .as("campaign_type"),
            col("g.adgroup_id").as("adgroup_id"),
            col("g.adgroup_name").as("adgroup_name"),
            searchadAdgroupType.labelOf(col("g.adgroup_type"))
              .as("adgroup_type"),
            col("g.bid_amount"),
            coalesce(col("c.is_enabled") && col("g.is_enabled"),
              col("g.is_enabled")).as("is_enabled"),
            col("g.is_deleted"),
            col("g.created_at"), col("g.deleted_at"),
            (when(col("g.is_deleted"), lit(2)).otherwise(lit(1)) * 1000000L +
              coalesce(col("a.account_seq"), lit(99)) * 10000L +
              coalesce(searchadCampaignType.seqOf(col("c.campaign_type")),
                lit(99)) * 100L +
              coalesce(searchadAdgroupType.seqOf(col("g.adgroup_type")),
                lit(99))).cast("long").as("sort_key"))
      }))
  }
}
