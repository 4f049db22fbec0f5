package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Coverage pin: every reference dbt model and every reference staging
  * domain (`models.sql`) is cited somewhere in `src/main/scala` — so a
  * refactor that drops a port (or its citation) fails loudly instead of
  * silently shrinking coverage.
  */
class CoverageSpec extends AnyFunSuite {

  private val refRoot = Paths.get("/root/reference")

  private def walk(p: Path): Seq[Path] =
    if (!Files.exists(p)) Seq.empty
    else {
      val stream = Files.walk(p)
      try stream.iterator.asScala.toSeq finally stream.close()
    }

  private lazy val sources: String = {
    val root = Paths.get("src/main/scala")
    walk(root).filter(_.toString.endsWith(".scala"))
      .map(f => new String(Files.readAllBytes(f), "UTF-8"))
      .mkString("\n")
  }

  test("every reference dbt model is cited in the source tree") {
    val models = walk(refRoot.resolve("dbt_bigquery/models"))
      .filter(_.toString.endsWith(".sql"))
      .map(_.getFileName.toString.stripSuffix(".sql"))
    assume(models.nonEmpty, "reference checkout not present")
    val missing = models.filterNot(sources.contains)
    assert(missing.isEmpty,
      s"uncited dbt models: ${missing.mkString(", ")}")
  }

  test("every reference dbt_postgres model is cited in the source tree") {
    // The PG project mirrors dbt_bigquery model-for-model today (61 names,
    // all shared), so the BigQuery citations already cover it — this walk
    // pins that: a future PG-ONLY model in the reference fails here
    // instead of slipping past the BigQuery-side check.
    val models = walk(refRoot.resolve("dbt_postgres/models"))
      .filter(_.toString.endsWith(".sql"))
      .map(_.getFileName.toString.stripSuffix(".sql"))
    assume(models.nonEmpty, "reference checkout not present")
    val missing = models.filterNot(sources.contains)
    assert(missing.isEmpty,
      s"uncited dbt_postgres models: ${missing.mkString(", ")}")
  }

  /** Reference dbt model instance → the registered model that PORTS it
    * (not merely cites it). Values: (registry model, anchor entry model) —
    * the anchor is a model a declared SparkEntry query runs via
    * `registry.run`, and the port must be in the anchor's transitive dep
    * closure, so every instance below is exercised by the oracle gate.
    */
  private val instancePorts: Map[String, (String, String)] = Map(
    "core__opex_daily" -> ("opex_daily", "opex_daily"),
    "coupang_ads__adgroup_master" ->
      ("cads_adgroup_master", "cads_adgroup_master"),
    "coupang_ads__campaign_master" ->
      ("cads_campaign_master", "cads_campaign_master"),
    "coupang_ads__insight_daily" ->
      ("cads_insight_daily", "cads_insight_daily"),
    "dable__report_daily" -> ("dable_report_daily", "dable_report_daily"),
    "google_ads__ad_master" -> ("google_ad_master", "google_ad_master"),
    "google_ads__adgroup_master" ->
      ("google_adgroup_master", "google_adgroup_master"),
    "google_ads__campaign_master" ->
      ("google_campaign_master", "google_campaign_master"),
    "google_ads__insight_daily" ->
      ("google_insight_daily", "google_insight_daily"),
    "meta_ads__ad_master" -> ("meta_ad_master", "meta_ad_master"),
    "meta_ads__adset_master" -> ("meta_adset_master", "meta_adset_master"),
    "meta_ads__campaign_master" ->
      ("meta_campaign_master", "meta_campaign_master"),
    "meta_ads__insight_daily" ->
      ("meta_insight_daily", "meta_insight_daily"),
    "relation__ad_id_to_ranged_sbn_ids" ->
      ("ranged_ad_relation", "google_insight_daily"),
    "relation__smt_prd_to_ranged_sbn_ids" ->
      ("smt_prd_ranged_relation", "smt_prd_ranged_relation"),
    "searchad__ad_master" -> ("sa_ad_master", "sa_ad_master"),
    "searchad__adgroup_master" ->
      ("nsa_adgroup_master", "nsa_adgroup_master"),
    "searchad__campaign_master" ->
      ("sa_campaign_master", "sa_campaign_master"),
    "searchad__contract_daily" ->
      ("sa_contract_daily", "sa_contract_daily"),
    "searchad__contract_master" ->
      ("sa_contract_master", "sa_contract_master"),
    "searchad__insight_daily" -> ("searchad_insight", "searchad_report_daily"),
    "naver_shp__stock_sales" -> ("nsh_stock_sales", "nsh_stock_sales"),
    "relation__nsh_prd_to_grp_id" ->
      ("nsh_prd_to_grp_id", "nsh_prd_to_grp_id"),
    "core__brand_master" -> ("core_brand_master", "core_brand_master"),
    "core__product_master" -> ("core_product_master", "searchad_report_daily"),
    "cj__invoice" -> ("cj_invoice", "cj_invoice"),
    "cj__invoice_order" -> ("cj_invoice_order", "cj_invoice_order"),
    "core__sales_daily" -> ("core_sales_daily", "profit_mom"),
    "coupang_rfm__order_count" ->
      ("coupang_order_count", "coupang_order_count"),
    "coupang_rfm__sales_daily" ->
      ("coupang_sales_daily", "coupang_sales_daily"),
    "sabangnet__order_count" ->
      ("sabangnet_order_count", "sabangnet_order_count"),
    "sabangnet__sales_daily" ->
      ("sabangnet_sales_daily", "sabangnet_sales_daily"),
    "relation__smt_opt_to_sbn_ids" ->
      ("smt_opt_to_sbn_ids", "smt_opt_to_sbn_ids"),
    "smartstore__order_count" ->
      ("smartstore_order_count", "smartstore_order_count"),
    "smartstore__sales_daily" ->
      ("smartstore_sales_daily", "smartstore_sales_daily"),
    "core__sold_qty_30d_daily" -> ("sold_qty_30d", "stock_report"),
    "core__stock_qty_batch" ->
      ("core_stock_qty_batch", "core_stock_qty_batch"),
    "core__stock_time_batch" -> ("stock_time_batch", "stock_time_batch"),
    "cj_eflexs__stock_qty_batch" ->
      ("cj_eflexs_stock_qty_batch", "cj_eflexs_stock_qty_batch"),
    "coupang_rfm__stock_qty_batch" ->
      ("coupang_rfm_stock_qty_batch", "coupang_rfm_stock_qty_batch"),
    "ecount__stock_qty_batch" ->
      ("ecount_stock_qty_batch", "core_stock_qty_batch"),
    "analytics__adreport_daily" -> ("adreport_daily", "adreport_daily"),
    "coupang_ads__report_daily" -> ("cads_report_daily", "cads_report_daily"),
    "google_ads__report_daily" ->
      ("google_report_daily", "google_report_daily"),
    "meta_ads__report_daily" -> ("meta_report_daily", "meta_report_daily"),
    "searchad__report_daily" ->
      ("searchad_report_daily", "searchad_report_daily"),
    "coupang__option_master" ->
      ("coupang_option_master", "coupang_option_master"),
    "sabangnet__option_master" ->
      ("sabangnet_option_master", "sabangnet_option_master"),
    "sabangnet__product_master" ->
      ("sabangnet_product_master", "sabangnet_product_master"),
    "smartstore__option_master" ->
      ("smartstore_option_master", "smartstore_option_master"),
    "smartstore__product_master" ->
      ("smartstore_product_master", "smartstore_product_master"),
    "analytics__order_count" -> ("order_count", "order_count_mom"),
    "analytics__order_count_mom" -> ("order_count_mom", "order_count_mom"),
    "analytics__profit_base" -> ("profit_base", "profit_mom"),
    "analytics__profit_daily" ->
      ("order_profit_daily", "order_profit_daily"),
    "analytics__profit_mom" -> ("profit_mom", "profit_mom"),
    "analytics__profit_monthly" -> ("profit_monthly", "profit_monthly"),
    "analytics__sales_target" -> ("sales_target", "sales_target"),
    "analytics__total_order" -> ("total_order", "total_order"),
    "analytics__stock_cost_mom" -> ("stock_cost_mom", "stock_cost_mom"),
    "analytics__stock_report" -> ("stock_report", "stock_report"),
    "analytics__stock_report_ds" -> ("stock_report_ds", "stock_report_ds"),
    "analytics__stock_time_ds" -> ("stock_time_ds", "stock_time_ds"))

  /** The port+topo proof shared by the BigQuery and Postgres walks:
    * every enumerated reference instance must map to a registered model
    * that an oracle-anchored entry model transitively depends on.
    */
  private def assertInstancePorts(models: Seq[String]): Unit = {
    val unmapped = models.filterNot(instancePorts.contains)
    assert(unmapped.isEmpty,
      s"reference instances with no declared port: ${unmapped.mkString(", ")}")
    val r = graft.models.Analytics.registry("/root/testdata/sf0.001")
    val names = r.names.toSet
    val bad = models.map(m => m -> instancePorts(m)).collect {
      case (ref, (port, anchor)) if !names.contains(port) =>
        s"$ref -> $port (not registered)"
      case (ref, (port, anchor)) if !names.contains(anchor) =>
        s"$ref -> anchor $anchor (not registered)"
      case (ref, (port, anchor)) if !r.topo(anchor).contains(port) =>
        s"$ref -> $port not in topo($anchor)"
    }
    assert(bad.isEmpty, s"broken ports:\n  ${bad.mkString("\n  ")}")
  }

  test("every reference dbt model instance is PORTED, registered, and " +
    "reachable from an anchored entry model") {
    val models = walk(refRoot.resolve("dbt_bigquery/models"))
      .filter(_.toString.endsWith(".sql"))
      .map(_.getFileName.toString.stripSuffix(".sql"))
    assume(models.nonEmpty, "reference checkout not present")
    assertInstancePorts(models)
  }

  test("every reference dbt_postgres model instance is PORTED, " +
    "registered, and reachable from an anchored entry model") {
    // round-10 directive 4: the PG side previously had only the
    // citation pin above; this walk gives its instances the same
    // structural port+topo proof as dbt_bigquery (the 61 PG models are
    // a subset of the 63 BQ names today — a future PG-only model fails
    // the instancePorts lookup here instead of hiding behind a citation)
    val models = walk(refRoot.resolve("dbt_postgres/models"))
      .filter(_.toString.endsWith(".sql"))
      .map(_.getFileName.toString.stripSuffix(".sql"))
    assume(models.nonEmpty, "reference checkout not present")
    assertInstancePorts(models)
  }

  test("PG-only dialect divergences are pinned to their ports") {
    // the three places dbt_postgres/linkmerce-PG genuinely diverges from
    // the BigQuery project, each pinned: the reference file must still
    // carry the divergent construct AND the covering port must exist.
    // 1. plain UNION (distinct) where the BQ side re-aggregates —
    //    stock_cost_mom; engine semantics declared as q148
    val ucm = refRoot.resolve(
      "dbt_postgres/models/marts/stock/analytics__stock_cost_mom.sql")
    assume(Files.exists(ucm), "reference checkout not present")
    val ucmTxt = new String(Files.readAllBytes(ucm), "UTF-8")
    assert("(?i)\\bUNION\\b(?!\\s+ALL)".r.findFirstIn(ucmTxt).nonEmpty,
      "reference divergence moved: no plain UNION left in stock_cost_mom")
    assert(SparkEntry.queries.contains("q148_pg_union_dedup"),
      "plain-UNION semantics lost their declared query")
    // 2. native MEDIAN in the PG searchad staging (BQ spells it
    //    PERCENTILE_CONT) — declared as q149
    val med = refRoot.resolve(
      "src/linkmerce/core/searchad/center/report/models.sql")
    val medTxt = new String(Files.readAllBytes(med), "UTF-8")
    assert("(?i)median".r.findFirstIn(medTxt).nonEmpty,
      "reference divergence moved: MEDIAN gone from searchad report")
    assert(SparkEntry.queries.contains("q149_pg_median"),
      "MEDIAN semantics lost their declared query")
    // 3. the partitioned_table materialization's batched rebuild
    //    (macros/partitioned_tables.sql) — D7's rebuildPartitionsBatched
    val macroF = refRoot.resolve("dbt_postgres/macros/partitioned_tables.sql")
    assert(Files.exists(macroF), "reference macro moved")
    assert(sources.contains("rebuildPartitionsBatched") &&
      sources.contains("partitioned_tables.sql"),
      "batched partition rebuild port or its citation dropped")
  }

  test("every reference staging domain is cited in the source tree") {
    val core = refRoot.resolve("src/linkmerce/core")
    val domains = walk(core)
      .filter(_.getFileName.toString == "models.sql")
      .map(p => core.relativize(p.getParent).toString)
    assume(domains.nonEmpty, "reference checkout not present")
    val missing = domains.filterNot(sources.contains)
    assert(missing.isEmpty,
      s"uncited staging domains: ${missing.mkString(", ")}")
  }
}
