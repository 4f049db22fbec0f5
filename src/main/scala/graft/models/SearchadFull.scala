package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Allocation
import AdsMasters._

/** The full searchad (naver) master marts and the day-expanded contract
  * fact (reference: intermediate/ads/searchad/searchad__campaign_master
  * .sql, searchad__ad_master.sql, searchad__contract_master.sql,
  * searchad__contract_daily.sql).
  *
  * Structural patterns this file adds to the registry:
  *
  *  - the product-relation-FIRST bundle COALESCE (ad_master resolves
  *    `rel_prd` before the three ad levels — searchad__ad_master.sql:95);
  *  - the three-input Kleene enable ladder `COALESCE(cmp AND grp AND ad,
  *    ad)` (searchad__ad_master.sql:104);
  *  - contract day expansion: a date-range fact exploded to one row per
  *    exposure day with the cost equal-split and the remainder on day 0
  *    (searchad__contract_daily.sql:147-160);
  *  - adgroup-level DAILY bundle rules distilled from ad-level ranged
  *    rules: rules joined to the contract's day scaffold, components
  *    trimmed/NULLIF'd, the '200000' sentinel dropped, then re-aggregated
  *    per (adgroup, day) with a SORTED distinct STRING_AGG — the
  *    deterministic spelling of BigQuery's unordered STRING_AGG(DISTINCT)
  *    (searchad__contract_daily.sql:166-214);
  *  - the 6-level bundle COALESCE (daily-prd, ranged-grp, ranged-cmp,
  *    daily-brd, account brand, default) with the prd/brd split on the
  *    bundle's '2' prefix (searchad__contract_daily.sql:218-250).
  *
  * Scale: the day explode is bounded (each contract spans <= 10 days by
  * construction; at the reference this is capped by the contract term),
  * the rules/dates join is an equi-join on adgroup with a residual date
  * filter, and the daily re-aggregation shuffles on the same
  * (adgroup, ymd) key the final join consumes — one exchange, reused.
  */
object SearchadFull {

  private val nullStr = lit(null).cast("string")
  private val nullDate = lit(null).cast("date")

  // mapping dims (macros/mapping/searchad.sql; seqs are the reference's)
  val saAdType: IntDim = IntDim(Seq(
    (1, 0, "파워링크-단일형 소재"), (2, 1, "쇼핑검색-상품형 소재"),
    (3, 2, "파워컨텐츠-정보형 소재"), (5, 4, "브랜드검색-일반형 소재"),
    (101, 13, "성과형-네이티브 이미지"), (103, 15, "성과형-동영상")))
  val saCampaignAdType: IntDim = IntDim(Seq(
    (1, 0, "파워링크-단일형 소재"), (2, 1, "쇼핑검색-상품형 소재"),
    (3, 2, "파워컨텐츠-정보형 소재"), (4, 3, "브랜드검색-일반형 소재"),
    (5, 4, "플레이스-플레이스 검색 소재"), (101, 5, "웹사이트 전환")))
  val saContractType: IntDim = IntDim(Seq(
    (0, 0, "브랜드검색-신제품검색형 소재"), (1, 1, "브랜드검색-일반형 소재")))

  def install(r: ModelRegistry, sfDir: String): Unit = {
    installFeeds(r, sfDir)
    installMasters(r, sfDir)
    installContractDaily(r, sfDir)
  }

  // ==== feeds ====

  private def installFeeds(r: ModelRegistry, sfDir: String): Unit = {
    // ads ride the nsa_adgroup slice (ok ≡ 4 mod 7); every varying column
    // uses a modulus coprime to 7
    r.register(Model("nsa_ad", Nil, View, ctx => {
      val ok = col("o_orderkey")
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 4).select(
          (ok * 10 + pmod(ok, lit(3))).cast("long").as("ad_id"),
          when(pmod(ok, lit(11)) === 0, lit(-1L))
            .otherwise(ok.cast("long")).as("adgroup_id"),
          pmod(col("o_custkey"), lit(25)).cast("long").as("customer_id"),
          concat(lit("NAD"), ok).as("title"),
          when(pmod(ok, lit(5)) === 0, nullStr)
            .otherwise(concat(lit("DESC"), pmod(ok, lit(100))))
            .as("description"),
          when(pmod(ok, lit(23)) === 0, lit(999))
            .otherwise(element_at(
              array(saAdType.codes.map(i => lit(i)): _*),
              (pmod(ok, lit(6)) + 1).cast("int"))).cast("int")
            .as("ad_type"),
          when(pmod(ok, lit(17)) === 0, nullStr)
            .otherwise(concat(lit("SMT"), pmod(ok, lit(800))))
            .as("product_id"),
          pmod(ok, lit(10000)).cast("long").as("bid_amount"),
          (pmod(ok, lit(2)) === 0).as("is_enabled"),
          (pmod(ok, lit(19)) === 0).as("is_deleted"),
          concat(lit("https://pc/"), ok).as("landing_url_pc"),
          when(pmod(ok, lit(13)) === 0, nullStr)
            .otherwise(concat(lit("https://m/"), ok))
            .as("landing_url_mobile"),
          date_add(lit("1995-04-01").cast("date"),
            pmod(ok, lit(600)).cast("int")).as("created_at"),
          when(pmod(ok, lit(19)) === 0,
            date_add(lit("1996-04-01").cast("date"),
              pmod(ok, lit(200)).cast("int")))
            .otherwise(nullDate).as("deleted_at"))
    }))

    // contracts (ok ≡ 2 mod 7); adgroup_id = ok + 2 lands in the adgroup
    // slice's residue class but only sometimes on a real orderkey — the
    // misses exercise the NULL campaign path
    r.register(Model("nsa_contract", Nil, View, ctx => {
      val ok = col("o_orderkey")
      val od = to_date(col("o_orderdate"))
      Tables.orders(ctx.session, sfDir)
        .filter(pmod(ok, lit(7)) === 2).select(
          ok.cast("long").as("contract_id"),
          (ok + 2).cast("long").as("adgroup_id"),
          pmod(col("o_custkey"), lit(25)).cast("long").as("customer_id"),
          concat(lit("NCT"), ok).as("contract_name"),
          pmod(ok, lit(3)).cast("int").as("contract_type"),
          floor(col("o_totalprice")).cast("long").as("contract_amount"),
          when(pmod(ok, lit(4)) === 0,
            floor(col("o_totalprice") * 0.1).cast("long"))
            .otherwise(lit(null).cast("long")).as("refund_amount"),
          od.as("contract_start_date"),
          date_add(od, pmod(ok, lit(30)).cast("int"))
            .as("contract_end_date"),
          when(pmod(ok, lit(13)) === 0, nullDate)
            .otherwise(date_add(od, 2)).as("exposure_start_date"),
          when(pmod(ok, lit(13)) === 0, nullDate)
            .otherwise(date_add(od, (pmod(ok, lit(10)) + 2).cast("int")))
            .as("exposure_end_date"),
          when(pmod(ok, lit(11)) === 0, date_add(od, 5))
            .otherwise(nullDate).as("cancel_date"))
    }))

    // the naver ad→bundle relation, ranged (two non-overlapping windows;
    // window B sometimes degenerates to the '200000' sentinel) and its
    // non-ranged projection for the ad master
    r.register(Model("nsa_ranged_relation", Nil, View, ctx => {
      val p = col("p_partkey")
      val g = p * 7 + 4
      val base = Tables.part(ctx.session, sfDir).select(
        pmod(p, lit(3)).cast("int").as("ad_level"),
        when(pmod(p, lit(3)) === 0, pmod(p, lit(500)))
          .when(pmod(p, lit(3)) === 1, g)
          .otherwise(g * 10 + pmod(g, lit(3))).cast("long").as("ad_id"),
        // the space after the comma exercises the TRIM in the daily rule
        concat((pmod(p, lit(2000)) + 1).cast("string"), lit(", "),
          (pmod(p, lit(2000)) + 2).cast("string")).as("bundle_a"),
        when(pmod(p, lit(9)) === 0, lit("200000"))
          .otherwise((pmod(p, lit(2000)) + 3).cast("string"))
          .as("bundle_b"))
        .groupBy(col("ad_level"), col("ad_id"))
        .agg(min(col("bundle_a")).as("bundle_a"),
          min(col("bundle_b")).as("bundle_b"))
      base.select(col("ad_level"), col("ad_id"),
        explode(array(
          struct(col("bundle_a").as("bundle_product_ids"),
            lit("1995-01-01").cast("date").as("start_date"),
            lit("1996-06-30").cast("date").as("end_date")),
          struct(col("bundle_b").as("bundle_product_ids"),
            lit("1996-07-01").cast("date").as("start_date"),
            lit("1997-12-31").cast("date").as("end_date")))).as("w"))
        .select(col("ad_level"), col("ad_id"),
          col("w.bundle_product_ids").as("bundle_product_ids"),
          col("w.start_date").as("start_date"),
          col("w.end_date").as("end_date"))
    }))

    r.register(Model("nsa_sbn_relation", Nil, View, ctx => {
      val p = col("p_partkey")
      val g = p * 7 + 4
      Tables.part(ctx.session, sfDir).select(
        pmod(p, lit(3)).cast("int").as("ad_level"),
        when(pmod(p, lit(3)) === 0, pmod(p, lit(500)))
          .when(pmod(p, lit(3)) === 1, g)
          .otherwise(g * 10 + pmod(g, lit(3))).cast("long").as("ad_id"),
        concat((pmod(p, lit(2000)) + 1).cast("string"), lit(","),
          (pmod(p, lit(2000)) + 2).cast("string")).as("bundle_product_ids"))
        .groupBy(col("ad_level"), col("ad_id"))
        .agg(min(col("bundle_product_ids")).as("bundle_product_ids"))
    }))

    // non-ranged smt product relation for the ad master (reference
    // source('relation', 'smt_prd_to_sbn_ids'))
    r.register(Model("sa_prd_relation", Nil, View, ctx =>
      Tables.part(ctx.session, sfDir).select(
        concat(lit("SMT"), col("p_partkey")).as("product_id"),
        concat((lit(100000) + pmod(col("p_partkey"), lit(80)))
            .cast("string"), lit(","),
          (lit(100100) + pmod(col("p_partkey") * 3, lit(80)))
            .cast("string")).as("bundle_product_ids"))))

    // ranged product relation for the contract daily: the q118 smt ranged
    // relation plus a '2'-prefixed brand slice (reference splits
    // smt_prd_to_ranged_sbn_ids by STARTS_WITH(bundle, '2'))
    r.register(Model("sa_prd_ranged_relation",
      Seq("smt_prd_ranged_relation"), View, ctx => {
        val brands = Tables.part(ctx.session, sfDir)
          .filter(pmod(col("p_partkey"), lit(13)) === 0)
          .select(
            concat(lit("SMT"), pmod(col("p_partkey"), lit(800)))
              .as("product_id"),
            concat(lit("20000"), pmod(col("p_partkey"), lit(9)) + 1)
              .as("bundle_product_ids"))
          // several parts fold onto one product id at larger SFs — keep
          // the relation's one-brand-row-per-product contract
          .groupBy(col("product_id"))
          .agg(min(col("bundle_product_ids")).as("bundle_product_ids"))
          .select(col("product_id"), col("bundle_product_ids"),
            lit("1990-01-01").cast("date").as("start_date"),
            lit("2999-12-31").cast("date").as("end_date"))
        ctx.ref("smt_prd_ranged_relation").unionByName(brands)
      }))
  }

  // ==== masters (q135-q137) ====

  private def installMasters(r: ModelRegistry, sfDir: String): Unit = {
    // searchad__campaign_master.sql:19-48
    r.register(Model("sa_campaign_master",
      Seq("nsa_campaign", "nsa_account"), View, ctx => {
        val cmp = ctx.ref("nsa_campaign").alias("c")
        val acc = ctx.ref("nsa_account").alias("a")
        cmp.join(broadcast(acc),
            col("c.customer_id") === col("a.customer_id"), "left")
          .select(
            col("c.customer_id").as("customer_id"),
            col("a.account_name").as("account_name"),
            col("a.account_type").as("account_type"),
            col("c.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            searchadCampaignType.labelOf(col("c.campaign_type"))
              .as("campaign_type"),
            saCampaignAdType.labelOf(col("c.campaign_type")).as("ad_type"),
            col("c.is_enabled"), col("c.is_deleted"),
            col("c.created_at"), col("c.deleted_at"),
            (when(col("c.is_deleted"), lit(2)).otherwise(lit(1)) * 10000L +
              coalesce(col("a.account_seq"), lit(99)) * 100L +
              coalesce(searchadCampaignType.seqOf(col("c.campaign_type")),
                lit(99))).cast("long").as("sort_key"))
      }))

    // searchad__ad_master.sql:34-117: rel_prd FIRST in the bundle
    // COALESCE, the 3-input Kleene enable, the 5-level sort ladder
    r.register(Model("sa_ad_master",
      Seq("nsa_ad", "nsa_adgroup", "nsa_campaign", "nsa_account",
        "nsa_sbn_relation", "sa_prd_relation"), View, ctx => {
        val ad = ctx.ref("nsa_ad").alias("d")
        val grp = ctx.ref("nsa_adgroup").alias("g")
        val cmp = ctx.ref("nsa_campaign").alias("c")
        val acc = ctx.ref("nsa_account").alias("a")
        val rel = ctx.ref("nsa_sbn_relation")
        def level(l: Int, as: String) = rel.filter(col("ad_level") === l)
          .select(col("ad_id").as(s"${as}_id"),
            col("bundle_product_ids").as(s"${as}_bundle"))
        val prd = ctx.ref("sa_prd_relation")
          .select(col("product_id").as("rp_id"),
            col("bundle_product_ids").as("rp_bundle"))
        ad
          .join(broadcast(acc),
            col("d.customer_id") === col("a.customer_id"), "left")
          .join(grp, col("d.adgroup_id") === col("g.adgroup_id"), "left")
          .join(cmp, col("g.campaign_id") === col("c.campaign_id"), "left")
          .join(level(0, "rc"), col("g.campaign_id") === col("rc_id"),
            "left")
          .join(level(1, "rg"), col("d.adgroup_id") === col("rg_id"),
            "left")
          .join(level(2, "rd"), col("d.ad_id") === col("rd_id"), "left")
          .join(prd, col("d.product_id") === col("rp_id"), "left")
          .select(
            col("d.customer_id").as("customer_id"),
            col("a.account_name").as("account_name"),
            col("a.account_type").as("account_type"),
            col("g.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            searchadCampaignType.labelOf(col("c.campaign_type"))
              .as("campaign_type"),
            col("d.adgroup_id").as("adgroup_id"),
            col("g.adgroup_name").as("adgroup_name"),
            searchadAdgroupType.labelOf(col("g.adgroup_type"))
              .as("adgroup_type"),
            col("d.ad_id").as("ad_id"),
            col("d.title").as("title"),
            col("d.description").as("description"),
            saAdType.labelOf(col("d.ad_type")).as("ad_type"),
            col("d.product_id").as("mall_product_id"),
            coalesce(col("rp_bundle"), col("rd_bundle"), col("rg_bundle"),
              col("rc_bundle")).as("bundle_product_ids"),
            col("d.bid_amount").as("bid_amount"),
            coalesce(col("c.is_enabled") && col("g.is_enabled") &&
              col("d.is_enabled"), col("d.is_enabled")).as("is_enabled"),
            col("d.is_deleted").as("is_deleted"),
            col("d.landing_url_pc").as("landing_url_pc"),
            col("d.landing_url_mobile").as("landing_url_mobile"),
            col("d.created_at").as("created_at"),
            col("d.deleted_at").as("deleted_at"),
            (when(col("d.is_deleted"), lit(2)).otherwise(lit(1))
                * 100000000L +
              coalesce(col("a.account_seq"), lit(99)) * 1000000L +
              coalesce(searchadCampaignType.seqOf(col("c.campaign_type")),
                lit(99)) * 10000L +
              coalesce(searchadAdgroupType.seqOf(col("g.adgroup_type")),
                lit(99)) * 100L +
              coalesce(saAdType.seqOf(col("d.ad_type")), lit(99)))
              .cast("long").as("sort_key"))
      }))

    // searchad__contract_master.sql:23-69
    r.register(Model("sa_contract_master",
      Seq("nsa_contract", "nsa_adgroup", "nsa_campaign", "nsa_account"),
      View, ctx => {
        val con = ctx.ref("nsa_contract").alias("s")
        val grp = ctx.ref("nsa_adgroup").alias("g")
        val cmp = ctx.ref("nsa_campaign").alias("c")
        val acc = ctx.ref("nsa_account").alias("a")
        con
          .join(broadcast(acc),
            col("s.customer_id") === col("a.customer_id"), "left")
          .join(grp, col("s.adgroup_id") === col("g.adgroup_id"), "left")
          .join(cmp, col("g.campaign_id") === col("c.campaign_id"), "left")
          .select(
            col("s.customer_id").as("customer_id"),
            col("a.account_name").as("account_name"),
            col("a.account_type").as("account_type"),
            col("g.campaign_id").as("campaign_id"),
            col("c.campaign_name").as("campaign_name"),
            searchadCampaignType.labelOf(col("c.campaign_type"))
              .as("campaign_type"),
            col("s.adgroup_id").as("adgroup_id"),
            col("g.adgroup_name").as("adgroup_name"),
            searchadAdgroupType.labelOf(col("g.adgroup_type"))
              .as("adgroup_type"),
            col("s.contract_id").as("contract_id"),
            col("s.contract_name").as("contract_name"),
            saContractType.labelOf(col("s.contract_type"))
              .as("contract_type"),
            col("s.contract_amount").as("contract_amount"),
            col("s.contract_start_date").as("contract_start_date"),
            col("s.contract_end_date").as("contract_end_date"),
            col("s.exposure_start_date").as("exposure_start_date"),
            col("s.exposure_end_date").as("exposure_end_date"),
            col("s.cancel_date").as("cancel_date"),
            (when(col("s.cancel_date").isNull, lit(1)).otherwise(lit(2))
                * 10000000L +
              coalesce(col("a.account_seq"), lit(99)) * 100000L +
              coalesce(searchadCampaignType.seqOf(col("c.campaign_type")),
                lit(99)) * 1000L +
              coalesce(searchadAdgroupType.seqOf(col("g.adgroup_type")),
                lit(99)) * 10L +
              coalesce(saContractType.seqOf(col("s.contract_type")),
                lit(9))).cast("long").as("sort_key"))
      }))
  }

  // ==== contract daily (q138) ====

  private def installContractDaily(r: ModelRegistry, sfDir: String): Unit = {
    r.register(Model("sa_contract_daily",
      Seq("nsa_contract", "nsa_ad", "nsa_adgroup", "nsa_account",
        "nsa_ranged_relation", "sa_prd_ranged_relation"),
      Incremental("ymd"), ctx => {
        // Step 1-2: day-expand each exposed contract, cost equal-split
        // with the remainder on the first day
        val base = ctx.ref("nsa_contract")
          .filter(col("exposure_start_date").isNotNull &&
            col("exposure_end_date").isNotNull)
          .select(col("contract_id"), col("adgroup_id"), col("customer_id"),
            (col("contract_amount") - coalesce(col("refund_amount"),
              lit(0L))).as("ad_cost"),
            col("exposure_start_date"),
            (datediff(col("exposure_end_date"),
              col("exposure_start_date")) + 1).cast("long")
              .as("date_count"))
        // `dates` and `attached` both consume this day-exploded frame
        // with different prunings, which de-canonicalizes the copies and
        // defeats ReuseExchange — persist (memory, lazy) so the contract
        // scan + explode run once. (An r13 note rejected a reliable
        // CHECKPOINT here — a disk write — which is indeed slower; the
        // in-memory persist is the right grain.)
        val expand = base
          .select(col("contract_id"), col("adgroup_id"), col("customer_id"),
            col("ad_cost"), col("exposure_start_date"), col("date_count"),
            explode(sequence(lit(0),
              (col("date_count") - 1).cast("int"))).as("date_offset"))
          .select(col("contract_id"), col("adgroup_id"), col("customer_id"),
            Allocation.divModAllocate(col("ad_cost"), col("date_count"),
              col("date_offset")).as("ad_cost"),
            expr("date_add(exposure_start_date, date_offset)").as("ymd"))
          .persist()
        ctx.track(expand)
        val dates = expand.select(col("adgroup_id"), col("ymd")).distinct()

        // Step 3: adgroup-level ranged rules from ad-level rules
        val ad = ctx.ref("nsa_ad")
          .select(col("ad_id").as("r_ad_id"),
            col("adgroup_id").as("r_adgroup_id"),
            col("product_id").as("r_product_id"))
        val relAd = ctx.ref("nsa_ranged_relation")
          .filter(col("ad_level") === 2)
        val prdRel = ctx.ref("sa_prd_ranged_relation")
        val rulesAd = ad.join(relAd,
            col("r_ad_id") === col("ad_id"), "inner")
          .select(col("r_adgroup_id").as("adgroup_id"),
            col("bundle_product_ids"), col("start_date"), col("end_date"))
        val rulesPrd = ad.join(
            prdRel.filter(!col("bundle_product_ids").startsWith("2")),
            col("r_product_id") === col("product_id"), "inner")
          .select(col("r_adgroup_id").as("adgroup_id"),
            col("bundle_product_ids"), col("start_date"), col("end_date"))
        val rulesBrd = ad.join(
            prdRel.filter(col("bundle_product_ids").startsWith("2")),
            col("r_product_id") === col("product_id"), "inner")
          .select(col("r_adgroup_id").as("adgroup_id"),
            col("bundle_product_ids"), col("start_date"), col("end_date"))
        val rules = rulesAd.unionByName(rulesPrd).unionByName(rulesBrd)

        val dailyIds = rules
          .filter(col("bundle_product_ids").isNotNull)
          .join(dates, Seq("adgroup_id"))
          .filter(col("ymd").between(col("start_date"), col("end_date")))
          .select(col("adgroup_id"), col("ymd"),
            explode(split(col("bundle_product_ids"), ",")).as("raw"))
          .select(col("adgroup_id"), col("ymd"),
            expr("nullif(trim(raw), '')").as("bundle_product_id"))
          .filter(col("bundle_product_id") =!= "200000")

        // sorted distinct STRING_AGG: deterministic in both engines. The
        // prd/brd split happens AFTER one shared aggregation (prefix flag
        // as a group key), so the expensive rules⨝dates subtree is built
        // once and Spark's ReuseExchange shares it between the branches.
        val dailyAll = dailyIds
          .withColumn("is_brd", col("bundle_product_id").startsWith("2"))
          .groupBy(col("adgroup_id"), col("ymd"), col("is_brd"))
          .agg(array_join(array_sort(collect_set(col("bundle_product_id"))),
            ",").as("bundle_product_ids"))
          // two grain-split consumers below — persist the shared aggregate
          .persist()
        ctx.track(dailyAll)
        val dailyPrd = dailyAll.filter(!col("is_brd"))
          .select(col("adgroup_id").as("dp_adgroup_id"),
            col("ymd").as("dp_ymd"),
            col("bundle_product_ids").as("dp_bundle"))
        val dailyBrd = dailyAll.filter(col("is_brd"))
          .select(col("adgroup_id").as("db_adgroup_id"),
            col("ymd").as("db_ymd"),
            col("bundle_product_ids").as("db_bundle"))

        // Step 4: attach bundles — daily-prd, ranged level1, ranged
        // level0, daily-brd, account brand, default
        val grp = ctx.ref("nsa_adgroup")
          .select(col("adgroup_id").as("g_adgroup_id"),
            col("campaign_id").as("g_campaign_id"))
        val rel0 = ctx.ref("nsa_ranged_relation")
          .filter(col("ad_level") === 0)
          .select(col("ad_id").as("r0_id"),
            col("bundle_product_ids").as("r0_bundle"),
            col("start_date").as("r0_s"), col("end_date").as("r0_e"))
        val rel1 = ctx.ref("nsa_ranged_relation")
          .filter(col("ad_level") === 1)
          .select(col("ad_id").as("r1_id"),
            col("bundle_product_ids").as("r1_bundle"),
            col("start_date").as("r1_s"), col("end_date").as("r1_e"))
        val acc = ctx.ref("nsa_account")
          .select(col("customer_id").as("a_customer_id"),
            col("bundle_brand_ids"))
        val attached = expand
          .join(grp, col("adgroup_id") === col("g_adgroup_id"), "left")
          .join(rel0, col("g_campaign_id") === col("r0_id") &&
            col("ymd").between(col("r0_s"), col("r0_e")), "left")
          .join(rel1, col("adgroup_id") === col("r1_id") &&
            col("ymd").between(col("r1_s"), col("r1_e")), "left")
          .join(dailyPrd, col("adgroup_id") === col("dp_adgroup_id") &&
            col("ymd") === col("dp_ymd"), "left")
          .join(dailyBrd, col("adgroup_id") === col("db_adgroup_id") &&
            col("ymd") === col("db_ymd"), "left")
          .join(broadcast(acc),
            col("customer_id") === col("a_customer_id"), "left")
          .select(col("contract_id"), col("adgroup_id"),
            coalesce(col("dp_bundle"), col("r1_bundle"), col("r0_bundle"),
              col("db_bundle"), col("bundle_brand_ids"), lit("200000"))
              .as("bundle_product_ids"),
            col("ad_cost"), col("ymd"))

        // Step 5: explode + renewal + equal-split allocation
        val renewal = InsightDaily.renewalDim(ctx.session)
        val exploded = attached.select(col("contract_id"),
            col("adgroup_id"), col("ad_cost"), col("ymd"),
            size(split(col("bundle_product_ids"), ","))
              .cast("long").as("bundle_product_count"),
            posexplode(split(col("bundle_product_ids"), ","))
              .as(Seq("bundle_product_offset", "component")))
          .join(broadcast(renewal),
            col("component") === col("product_id_new") &&
              col("ymd") < col("renewal_date"), "left")
        exploded.select(col("contract_id"), col("adgroup_id"),
          coalesce(col("product_id_old"), col("component"))
            .as("product_id"),
          Allocation.divModAllocate(col("ad_cost"),
            col("bundle_product_count"), col("bundle_product_offset"))
            .as("ad_cost"),
          col("ymd"))
      }))
  }
}
