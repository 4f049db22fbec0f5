package graft

import graft.models.AdsMasters._

/** DuckDB oracle SQL for the ad-platform master marts (q100-q108). Every
  * CASE ladder is generated from the same `AdsMasters` dim Seqs the Spark
  * models consume — one source of truth per mapping, so a dim edit cannot
  * silently diverge the two engines.
  */
private[graft] object MastersOracles {

  private def sList(vals: Seq[String]): String =
    vals.map(v => s"'$v'").mkString("[", ", ", "]")
  private def iList(vals: Seq[Int]): String =
    vals.mkString("[", ", ", "]")

  // StrDim ladders
  private def lbl(d: StrDim, e: String): String =
    "CASE " + e +
      d.entries.map { case (c, _, l) => s" WHEN '$c' THEN '$l'" }.mkString +
      " END"
  private def seqc(d: StrDim, e: String): String =
    "CASE " + e +
      d.entries.map { case (c, s, _) => s" WHEN '$c' THEN $s" }.mkString +
      " END"
  private def lblBySeq(d: StrDim, e: String): String =
    "CASE " + e +
      d.entries.map { case (_, s, l) => s" WHEN $s THEN '$l'" }.mkString +
      " END"
  private def codeBySeq(d: StrDim, e: String): String =
    "CASE " + e +
      d.entries.map { case (c, s, _) => s" WHEN $s THEN '$c'" }.mkString +
      " END"
  /** Worst-status seq: GREATEST(COALESCE(seq(e), -1)...). */
  private def fin(d: StrDim, exprs: String*): String =
    "GREATEST(" +
      exprs.map(e => s"COALESCE(${seqc(d, e)}, -1)").mkString(", ") + ")"

  // IntDim ladders
  private def lblI(d: IntDim, e: String): String =
    "CASE " + e +
      d.entries.map { case (c, _, l) => s" WHEN $c THEN '$l'" }.mkString +
      " END"
  private def seqI(d: IntDim, e: String): String =
    "CASE " + e +
      d.entries.map { case (c, s, _) => s" WHEN $c THEN $s" }.mkString +
      " END"

  // ---- synthesized sources (mirror AdsMasters.install* exactly) ----

  private val gacc =
    """SELECT CAST(n_nationkey AS BIGINT) AS customer_id,
      |    'GACC' || CAST(n_nationkey AS VARCHAR) AS account_name,
      |    CAST(n_nationkey % 7 AS INTEGER) AS account_seq
      |  FROM nation WHERE n_nationkey < 20""".stripMargin

  private val gcmp =
    s"""SELECT CAST(c_custkey AS BIGINT) AS campaign_id,
       |    CAST(c_custkey % 25 AS BIGINT) AS customer_id,
       |    'GCMP' || CAST(c_custkey AS VARCHAR) AS campaign_name,
       |    CASE WHEN c_custkey % 17 = 0 THEN 'ODD_TYPE'
       |      ELSE (${sList(googleCampaignType.codes)})[c_custkey % 5 + 1]
       |      END AS campaign_type,
       |    (${sList(googleStatus.codes)})[c_custkey % 4 + 1]
       |      AS campaign_status,
       |    CASE WHEN c_custkey % 7 = 0 THEN NULL
       |      ELSE (${sList(googleBidStrategy.codes)})[c_custkey % 4 + 1]
       |      END AS bidding_strategy,
       |    CAST(FLOOR(c_acctbal) AS BIGINT) AS campaign_budget,
       |    CAST(c_custkey % 1000 * 3 AS BIGINT) AS impression_count_30d,
       |    CAST(c_custkey % 80 AS BIGINT) AS click_count_30d,
       |    CAST(FLOOR(c_acctbal * 0.1) AS BIGINT) AS ad_cost_30d,
       |    DATE '1995-01-01' + CAST(c_custkey % 700 AS INTEGER) AS created_at
       |  FROM customer WHERE c_custkey < 600""".stripMargin

  private val ggrp =
    s"""SELECT CAST(o_orderkey AS BIGINT) AS adgroup_id,
       |    CAST(o_custkey % 600 AS BIGINT) AS campaign_id,
       |    CAST(o_custkey % 25 AS BIGINT) AS customer_id,
       |    'GGRP' || CAST(o_orderkey AS VARCHAR) AS adgroup_name,
       |    CASE WHEN o_orderkey % 13 = 0 THEN NULL
       |      ELSE (${sList(googleAdgroupType.codes)})[o_orderkey % 4 + 1]
       |      END AS adgroup_type,
       |    (${sList(googleStatus.codes.take(3))})[o_orderkey % 3 + 1]
       |      AS adgroup_status,
       |    CAST(o_orderkey % 5000 AS BIGINT) AS target_cpa,
       |    CAST(o_orderkey % 800 * 2 AS BIGINT) AS impression_count_30d,
       |    CAST(o_orderkey % 60 AS BIGINT) AS click_count_30d,
       |    CAST(FLOOR(o_totalprice * 0.02) AS BIGINT) AS ad_cost_30d
       |  FROM orders WHERE o_orderkey % 7 = 1""".stripMargin

  private val gad =
    s"""SELECT CAST(o_orderkey * 10 + o_orderkey % 3 AS BIGINT) AS ad_id,
       |    CAST(CASE WHEN o_orderkey % 11 = 0 THEN -1 ELSE o_orderkey END
       |      AS BIGINT) AS adgroup_id,
       |    CAST(o_custkey % 600 AS BIGINT) AS campaign_id,
       |    CAST(o_custkey % 25 AS BIGINT) AS customer_id,
       |    'GAD' || CAST(o_orderkey AS VARCHAR) AS ad_name,
       |    CASE WHEN o_orderkey % 19 = 0 THEN NULL
       |      ELSE (${sList(googleAdType.codes)})[o_orderkey % 5 + 1]
       |      END AS ad_type,
       |    (${sList(googleStatus.codes)})[(o_orderkey + 1) % 4 + 1]
       |      AS ad_status,
       |    CAST(o_orderkey % 700 * 2 AS BIGINT) AS impression_count_30d,
       |    CAST(o_orderkey % 40 AS BIGINT) AS click_count_30d,
       |    CAST(FLOOR(o_totalprice * 0.01) AS BIGINT) AS ad_cost_30d
       |  FROM orders WHERE o_orderkey % 7 = 1""".stripMargin

  private val rel =
    """SELECT platform_name, ad_level, ad_id,
      |    MIN(bundle_product_ids) AS bundle_product_ids
      |  FROM (
      |    SELECT (['구글', '메타'])[p_partkey % 2 + 1] AS platform_name,
      |      CAST(p_partkey % 3 AS INTEGER) AS ad_level,
      |      CAST(CASE WHEN p_partkey % 2 = 0 THEN
      |          CASE p_partkey % 3 WHEN 0 THEN p_partkey % 600
      |            WHEN 1 THEN p_partkey * 7 + 1
      |            ELSE (p_partkey * 7 + 1) * 10 + (p_partkey * 7 + 1) % 3 END
      |        ELSE
      |          CASE p_partkey % 3 WHEN 0 THEN p_partkey % 300 * 2 + 1
      |            WHEN 1 THEN p_partkey * 7 + 5
      |            ELSE (p_partkey * 7 + 5) * 10 + (p_partkey * 7 + 5) % 3 END
      |        END AS BIGINT) AS ad_id,
      |      'B' || CAST(p_partkey % 500 AS VARCHAR) || ',B' ||
      |        CAST(p_partkey % 500 + 1 AS VARCHAR) AS bundle_product_ids
      |    FROM part) t
      |  GROUP BY 1, 2, 3""".stripMargin

  private val macc =
    """SELECT CAST(n_nationkey AS BIGINT) AS account_id,
      |    'MACC' || CAST(n_nationkey AS VARCHAR) AS account_name,
      |    CAST(n_nationkey % 6 AS INTEGER) AS account_seq
      |  FROM nation WHERE n_nationkey < 18""".stripMargin

  private val mcmp =
    s"""SELECT CAST(c_custkey AS BIGINT) AS campaign_id,
       |    CAST(c_custkey % 25 AS BIGINT) AS account_id,
       |    'MCMP' || CAST(c_custkey AS VARCHAR) AS campaign_name,
       |    CASE WHEN c_custkey % 23 = 0 THEN 'ODD_OBJ'
       |      ELSE (${sList(metaObjective.codes)})[c_custkey % 6 + 1]
       |      END AS objective,
       |    (${sList(metaStatus.codes)})[c_custkey % 5 + 1]
       |      AS effective_status,
       |    DATE '1995-03-01' + CAST(c_custkey % 600 AS INTEGER) AS created_at
       |  FROM customer WHERE c_custkey % 2 = 1""".stripMargin

  private val mset =
    s"""SELECT CAST(o_orderkey AS BIGINT) AS adset_id,
       |    CAST(o_custkey % 300 * 2 + 1 AS BIGINT) AS campaign_id,
       |    CAST((o_custkey % 300 * 2 + 1) % 25 AS BIGINT) AS account_id,
       |    'MSET' || CAST(o_orderkey AS VARCHAR) AS adset_name,
       |    (${sList(metaStatus.codes.take(4))})[o_orderkey % 4 + 1]
       |      AS effective_status,
       |    CAST(o_orderkey % 2000 * 100 AS BIGINT) AS daily_budget,
       |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
       |      ELSE DATE '1995-06-01' + CAST(o_orderkey % 400 AS INTEGER)
       |      END AS created_at
       |  FROM orders WHERE o_orderkey % 7 = 5""".stripMargin

  private val mad =
    s"""SELECT CAST(o_orderkey * 10 + o_orderkey % 3 AS BIGINT) AS ad_id,
       |    CAST(CASE WHEN o_orderkey % 13 = 0 THEN -1 ELSE o_orderkey END
       |      AS BIGINT) AS adset_id,
       |    CAST(o_custkey % 300 * 2 + 1 AS BIGINT) AS campaign_id,
       |    CAST((o_custkey % 300 * 2 + 1) % 25 AS BIGINT) AS account_id,
       |    'MAD' || CAST(o_orderkey AS VARCHAR) AS ad_name,
       |    (${sList(metaStatus.codes.take(4))})[(o_orderkey + 1) % 4 + 1]
       |      AS effective_status,
       |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
       |      ELSE DATE '1995-09-01' + CAST(o_orderkey % 300 AS INTEGER)
       |      END AS created_at
       |  FROM orders WHERE o_orderkey % 7 = 5""".stripMargin

  private val cvdr =
    """SELECT CAST(n_nationkey AS BIGINT) AS vendor_id,
      |    'VD' || CAST(n_nationkey AS VARCHAR) AS vendor_name,
      |    CASE WHEN n_nationkey % 4 = 0 THEN NULL
      |      ELSE 'VA' || CAST(n_nationkey AS VARCHAR) END AS vendor_alias,
      |    CAST(n_nationkey % 5 AS INTEGER) AS vendor_seq
      |  FROM nation WHERE n_nationkey < 15""".stripMargin

  private val ccmp =
    """SELECT CAST(c_custkey AS BIGINT) AS campaign_id,
      |    CAST(c_custkey % 25 AS BIGINT) AS vendor_id,
      |    'CCMP' || CAST(c_custkey AS VARCHAR) AS campaign_name,
      |    CAST(c_custkey % 3 AS INTEGER) AS vendor_type,
      |    CASE WHEN c_custkey % 11 = 0 THEN 'XPA' ELSE 'PA' END
      |      AS campaign_type,
      |    CAST(c_custkey % 4 AS INTEGER) AS goal_type,
      |    c_custkey % 2 = 0 AS is_active,
      |    c_custkey % 13 = 0 AS is_deleted,
      |    CAST(c_custkey % 400 AS BIGINT) AS roas_target,
      |    DATE '1995-02-01' + CAST(c_custkey % 500 AS INTEGER) AS created_at,
      |    DATE '1996-02-01' + CAST(c_custkey % 300 AS INTEGER) AS updated_at
      |  FROM customer WHERE c_custkey % 3 = 0""".stripMargin

  private val cgrp =
    """SELECT CAST(o_orderkey AS BIGINT) AS adgroup_id,
      |    CAST(o_custkey % 300 * 3 AS BIGINT) AS campaign_id,
      |    CAST(o_custkey % 25 AS BIGINT) AS vendor_id,
      |    'CGRP' || CAST(o_orderkey AS VARCHAR) AS adgroup_name,
      |    CAST(o_orderkey % 3 AS INTEGER) AS goal_type,
      |    o_orderkey % 2 = 0 AS is_active,
      |    o_orderkey % 17 = 0 AS is_deleted,
      |    CAST(o_orderkey % 500 AS BIGINT) AS roas_target,
      |    DATE '1995-04-01' + CAST(o_orderkey % 500 AS INTEGER) AS created_at,
      |    DATE '1996-04-01' + CAST(o_orderkey % 200 AS INTEGER) AS updated_at
      |  FROM orders WHERE o_orderkey % 7 = 6""".stripMargin

  private val nacc =
    """SELECT CAST(n_nationkey AS BIGINT) AS customer_id,
      |    'NACC' || CAST(n_nationkey AS VARCHAR) AS account_name,
      |    (['일반', '대행'])[n_nationkey % 2 + 1] AS account_type,
      |    CAST(n_nationkey % 7 AS INTEGER) AS account_seq
      |  FROM nation WHERE n_nationkey < 20""".stripMargin

  private val ncmp =
    s"""SELECT CAST(c_custkey AS BIGINT) AS campaign_id,
       |    CAST(c_custkey % 25 AS BIGINT) AS customer_id,
       |    'NCMP' || CAST(c_custkey AS VARCHAR) AS campaign_name,
       |    CAST((${iList(searchadCampaignType.codes)})[c_custkey % 6 + 1]
       |      AS INTEGER) AS campaign_type,
       |    CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_custkey % 3 > 0 END
       |      AS is_enabled
       |  FROM customer WHERE c_custkey < 500""".stripMargin

  private val ngrp =
    s"""SELECT CAST(o_orderkey AS BIGINT) AS adgroup_id,
       |    CAST(o_custkey % 500 AS BIGINT) AS campaign_id,
       |    CAST(o_custkey % 25 AS BIGINT) AS customer_id,
       |    'NGRP' || CAST(o_orderkey AS VARCHAR) AS adgroup_name,
       |    CAST((${iList(searchadAdgroupType.codes)})[o_orderkey % 6 + 1]
       |      AS INTEGER) AS adgroup_type,
       |    CAST(o_orderkey % 10000 AS BIGINT) AS bid_amount,
       |    o_orderkey % 2 = 0 AS is_enabled,
       |    o_orderkey % 19 = 0 AS is_deleted,
       |    DATE '1995-05-01' + CAST(o_orderkey % 600 AS INTEGER)
       |      AS created_at,
       |    CASE WHEN o_orderkey % 19 = 0
       |      THEN DATE '1996-05-01' + CAST(o_orderkey % 300 AS INTEGER)
       |      END AS deleted_at
       |  FROM orders WHERE o_orderkey % 7 = 4""".stripMargin

  // ---- master oracles ----

  def q100: String =
    s"""WITH gacc AS (
       |  $gacc),
       |gcmp AS (
       |  $gcmp)
       |SELECT c.customer_id, a.account_name, c.campaign_id, c.campaign_name,
       |  ${lbl(googleCampaignType, "c.campaign_type")} AS campaign_type,
       |  ${lbl(googleStatus, "c.campaign_status")} AS campaign_status,
       |  ${lbl(googleBidStrategy, "c.bidding_strategy")} AS bidding_strategy,
       |  c.campaign_budget, c.impression_count_30d, c.click_count_30d,
       |  c.ad_cost_30d, c.created_at,
       |  CAST((CASE WHEN c.campaign_status = 'REMOVED' THEN 2 ELSE 1 END)
       |      * 10000
       |    + COALESCE(a.account_seq, 99) * 100
       |    + COALESCE(${seqc(googleCampaignType, "c.campaign_type")}, 99)
       |    AS BIGINT) AS sort_key
       |FROM gcmp c LEFT JOIN gacc a ON c.customer_id = a.customer_id""".stripMargin

  def q101: String = {
    val f = fin(googleStatus, "c.campaign_status", "g.adgroup_status")
    s"""WITH gacc AS (
       |  $gacc),
       |gcmp AS (
       |  $gcmp),
       |ggrp AS (
       |  $ggrp)
       |SELECT g.customer_id, a.account_name, g.campaign_id, c.campaign_name,
       |  ${lbl(googleCampaignType, "c.campaign_type")} AS campaign_type,
       |  ${lbl(googleBidStrategy, "c.bidding_strategy")} AS bidding_strategy,
       |  g.adgroup_id, g.adgroup_name,
       |  ${lbl(googleAdgroupType, "g.adgroup_type")} AS adgroup_type,
       |  ${lblBySeq(googleStatus, f)} AS adgroup_status,
       |  g.target_cpa, g.impression_count_30d, g.click_count_30d,
       |  g.ad_cost_30d, c.created_at,
       |  CAST((CASE WHEN ${codeBySeq(googleStatus, f)} = 'REMOVED'
       |      THEN 2 ELSE 1 END) * 1000000
       |    + COALESCE(a.account_seq, 99) * 10000
       |    + COALESCE(${seqc(googleCampaignType, "c.campaign_type")}, 99)
       |      * 100
       |    + COALESCE(${seqc(googleAdgroupType, "g.adgroup_type")}, 99)
       |    AS BIGINT) AS sort_key
       |FROM ggrp g
       |LEFT JOIN gacc a ON g.customer_id = a.customer_id
       |LEFT JOIN gcmp c ON g.campaign_id = c.campaign_id""".stripMargin
  }

  def q102: String = {
    val f = fin(googleStatus,
      "c.campaign_status", "g.adgroup_status", "d.ad_status")
    s"""WITH gacc AS (
       |  $gacc),
       |gcmp AS (
       |  $gcmp),
       |ggrp AS (
       |  $ggrp),
       |gad AS (
       |  $gad),
       |rel AS (
       |  $rel)
       |SELECT d.customer_id, a.account_name, d.campaign_id, c.campaign_name,
       |  ${lbl(googleCampaignType, "c.campaign_type")} AS campaign_type,
       |  ${lbl(googleBidStrategy, "c.bidding_strategy")} AS bidding_strategy,
       |  d.adgroup_id, g.adgroup_name,
       |  ${lbl(googleAdgroupType, "g.adgroup_type")} AS adgroup_type,
       |  d.ad_id, d.ad_name,
       |  ${lbl(googleAdType, "d.ad_type")} AS ad_type,
       |  ${lblBySeq(googleStatus, f)} AS ad_status,
       |  COALESCE(rd.bundle_product_ids, rg.bundle_product_ids,
       |    rc.bundle_product_ids) AS bundle_product_ids,
       |  d.impression_count_30d, d.click_count_30d, d.ad_cost_30d,
       |  c.created_at,
       |  CAST((CASE WHEN ${codeBySeq(googleStatus, f)} = 'REMOVED'
       |      THEN 2 ELSE 1 END) * 100000000
       |    + COALESCE(a.account_seq, 99) * 1000000
       |    + COALESCE(${seqc(googleCampaignType, "c.campaign_type")}, 99)
       |      * 10000
       |    + COALESCE(${seqc(googleAdgroupType, "g.adgroup_type")}, 99) * 100
       |    + COALESCE(${seqc(googleAdType, "d.ad_type")}, 99)
       |    AS BIGINT) AS sort_key
       |FROM gad d
       |LEFT JOIN gacc a ON d.customer_id = a.customer_id
       |LEFT JOIN gcmp c ON d.campaign_id = c.campaign_id
       |LEFT JOIN ggrp g ON d.adgroup_id = g.adgroup_id
       |LEFT JOIN (SELECT * FROM rel
       |  WHERE platform_name = '구글' AND ad_level = 0) rc
       |  ON d.campaign_id = rc.ad_id
       |LEFT JOIN (SELECT * FROM rel
       |  WHERE platform_name = '구글' AND ad_level = 1) rg
       |  ON d.adgroup_id = rg.ad_id
       |LEFT JOIN (SELECT * FROM rel
       |  WHERE platform_name = '구글' AND ad_level = 2) rd
       |  ON d.ad_id = rd.ad_id""".stripMargin
  }

  def q103: String =
    s"""WITH macc AS (
       |  $macc),
       |mcmp AS (
       |  $mcmp)
       |SELECT c.account_id, a.account_name, c.campaign_id, c.campaign_name,
       |  ${lbl(metaObjective, "c.objective")} AS objective,
       |  ${lbl(metaStatus, "c.effective_status")} AS effective_status,
       |  c.created_at,
       |  CAST((CASE WHEN c.effective_status = 'DELETED' THEN 2 ELSE 1 END)
       |      * 10000
       |    + COALESCE(a.account_seq, 99) * 100
       |    + COALESCE(${seqc(metaObjective, "c.objective")}, 99)
       |    AS BIGINT) AS sort_key
       |FROM mcmp c LEFT JOIN macc a ON c.account_id = a.account_id""".stripMargin

  def q104: String = {
    val f = fin(metaStatus, "c.effective_status", "s.effective_status")
    s"""WITH macc AS (
       |  $macc),
       |mcmp AS (
       |  $mcmp),
       |mset AS (
       |  $mset)
       |SELECT s.account_id, a.account_name, s.campaign_id, c.campaign_name,
       |  ${lbl(metaObjective, "c.objective")} AS objective,
       |  s.adset_id, s.adset_name,
       |  ${lblBySeq(metaStatus, f)} AS effective_status,
       |  s.daily_budget,
       |  COALESCE(s.created_at, c.created_at) AS created_at,
       |  CAST((CASE WHEN ${codeBySeq(metaStatus, f)} = 'DELETED'
       |      THEN 2 ELSE 1 END) * 10000
       |    + COALESCE(a.account_seq, 99) * 100
       |    + COALESCE(${seqc(metaObjective, "c.objective")}, 99)
       |    AS BIGINT) AS sort_key
       |FROM mset s
       |LEFT JOIN macc a ON s.account_id = a.account_id
       |LEFT JOIN mcmp c ON s.account_id = c.account_id
       |  AND s.campaign_id = c.campaign_id""".stripMargin
  }

  def q105: String = {
    val f = fin(metaStatus,
      "c.effective_status", "s.effective_status", "d.effective_status")
    s"""WITH macc AS (
       |  $macc),
       |mcmp AS (
       |  $mcmp),
       |mset AS (
       |  $mset),
       |mad AS (
       |  $mad),
       |rel AS (
       |  $rel)
       |SELECT d.account_id, a.account_name, d.campaign_id, c.campaign_name,
       |  ${lbl(metaObjective, "c.objective")} AS objective,
       |  d.adset_id, s.adset_name, d.ad_id, d.ad_name,
       |  ${lblBySeq(metaStatus, f)} AS effective_status,
       |  COALESCE(rd.bundle_product_ids, rs.bundle_product_ids,
       |    rc.bundle_product_ids) AS bundle_product_ids,
       |  COALESCE(d.created_at, s.created_at, c.created_at) AS created_at,
       |  CAST((CASE WHEN ${codeBySeq(metaStatus, f)} = 'DELETED'
       |      THEN 2 ELSE 1 END) * 10000
       |    + COALESCE(a.account_seq, 99) * 100
       |    + COALESCE(${seqc(metaObjective, "c.objective")}, 99)
       |    AS BIGINT) AS sort_key
       |FROM mad d
       |LEFT JOIN macc a ON d.account_id = a.account_id
       |LEFT JOIN mcmp c ON d.campaign_id = c.campaign_id
       |LEFT JOIN mset s ON d.adset_id = s.adset_id
       |LEFT JOIN (SELECT * FROM rel
       |  WHERE platform_name = '메타' AND ad_level = 0) rc
       |  ON d.campaign_id = rc.ad_id
       |LEFT JOIN (SELECT * FROM rel
       |  WHERE platform_name = '메타' AND ad_level = 1) rs
       |  ON d.adset_id = rs.ad_id
       |LEFT JOIN (SELECT * FROM rel
       |  WHERE platform_name = '메타' AND ad_level = 2) rd
       |  ON d.ad_id = rd.ad_id""".stripMargin
  }

  def q106: String =
    s"""WITH cvdr AS (
       |  $cvdr),
       |ccmp AS (
       |  $ccmp)
       |SELECT c.vendor_id, v.vendor_name, v.vendor_alias,
       |  ${lblI(coupangVendorType, "c.vendor_type")} AS vendor_type,
       |  c.campaign_id, c.campaign_name,
       |  COALESCE(CASE c.campaign_type WHEN 'PA' THEN '상품광고' END,
       |    c.campaign_type) AS campaign_type,
       |  ${lblI(coupangGoalType, "c.goal_type")} AS goal_type,
       |  c.is_active, c.is_deleted, c.roas_target, c.created_at,
       |  c.updated_at,
       |  CAST((CASE WHEN c.is_deleted THEN 2 ELSE 1 END) * 1000
       |    + COALESCE(v.vendor_seq, 99) * 10
       |    + COALESCE(${seqI(coupangGoalType, "c.goal_type")}, 9)
       |    AS BIGINT) AS sort_key
       |FROM ccmp c LEFT JOIN cvdr v ON c.vendor_id = v.vendor_id""".stripMargin

  def q107: String =
    s"""WITH cvdr AS (
       |  $cvdr),
       |ccmp AS (
       |  $ccmp),
       |cgrp AS (
       |  $cgrp)
       |SELECT g.vendor_id, v.vendor_name, v.vendor_alias,
       |  ${lblI(coupangVendorType, "c.vendor_type")} AS vendor_type,
       |  g.campaign_id, c.campaign_name,
       |  COALESCE(CASE c.campaign_type WHEN 'PA' THEN '상품광고' END,
       |    c.campaign_type) AS campaign_type,
       |  g.adgroup_id, g.adgroup_name,
       |  ${lblI(coupangGoalType, "g.goal_type")} AS goal_type,
       |  g.is_active, g.is_deleted, g.roas_target, g.created_at,
       |  g.updated_at,
       |  CAST((CASE WHEN g.is_deleted THEN 2 ELSE 1 END) * 1000
       |    + COALESCE(v.vendor_seq, 99) * 10
       |    + COALESCE(${seqI(coupangGoalType, "g.goal_type")}, 9)
       |    AS BIGINT) AS sort_key
       |FROM cgrp g
       |LEFT JOIN ccmp c ON g.campaign_id = c.campaign_id
       |LEFT JOIN cvdr v ON g.vendor_id = v.vendor_id""".stripMargin

  def q108: String =
    s"""WITH nacc AS (
       |  $nacc),
       |ncmp AS (
       |  $ncmp),
       |ngrp AS (
       |  $ngrp)
       |SELECT g.customer_id, a.account_name, a.account_type,
       |  g.campaign_id, c.campaign_name,
       |  ${lblI(searchadCampaignType, "c.campaign_type")} AS campaign_type,
       |  g.adgroup_id, g.adgroup_name,
       |  ${lblI(searchadAdgroupType, "g.adgroup_type")} AS adgroup_type,
       |  g.bid_amount,
       |  COALESCE(c.is_enabled AND g.is_enabled, g.is_enabled) AS is_enabled,
       |  g.is_deleted, g.created_at, g.deleted_at,
       |  CAST((CASE WHEN g.is_deleted THEN 2 ELSE 1 END) * 1000000
       |    + COALESCE(a.account_seq, 99) * 10000
       |    + COALESCE(${seqI(searchadCampaignType, "c.campaign_type")}, 99)
       |      * 100
       |    + COALESCE(${seqI(searchadAdgroupType, "g.adgroup_type")}, 99)
       |    AS BIGINT) AS sort_key
       |FROM ngrp g
       |LEFT JOIN nacc a ON g.customer_id = a.customer_id
       |LEFT JOIN ncmp c ON g.campaign_id = c.campaign_id""".stripMargin
}
