package graft

import graft.models.AdsMasters.{searchadAdgroupType, searchadCampaignType, IntDim}
import graft.models.SearchadFull.{saAdType, saCampaignAdType, saContractType}
import graft.ReportOracles

/** DuckDB oracle SQL for the full searchad masters (q135-q137) and the
  * contract day-expansion fact (q138). CASE ladders are generated from the
  * same IntDim Seqs the Spark models consume.
  */
private[graft] object SearchadOracles {

  private def iList(vals: Seq[Int]): String =
    vals.mkString("[", ", ", "]")
  private def lblI(d: IntDim, e: String): String =
    "CASE " + e +
      d.entries.map { case (c, _, l) => s" WHEN $c THEN '$l'" }.mkString +
      " END"
  private def seqI(d: IntDim, e: String): String =
    "CASE " + e +
      d.entries.map { case (c, s, _) => s" WHEN $c THEN $s" }.mkString +
      " END"

  // ---- feeds (mirror AdsMasters.installSearchad + SearchadFull) ----

  private val nacc =
    """SELECT CAST(n_nationkey AS BIGINT) AS customer_id,
      |    'NACC' || CAST(n_nationkey AS VARCHAR) AS account_name,
      |    (['일반', '대행'])[n_nationkey % 2 + 1] AS account_type,
      |    CAST(n_nationkey % 7 AS INTEGER) AS account_seq,
      |    CASE WHEN n_nationkey % 3 = 0 THEN NULL
      |      ELSE '200000' || CAST(n_nationkey % 9 + 1 AS VARCHAR) END
      |      AS bundle_brand_ids
      |  FROM nation WHERE n_nationkey < 20""".stripMargin

  private val ncmp =
    s"""SELECT CAST(c_custkey AS BIGINT) AS campaign_id,
       |    CAST(c_custkey % 25 AS BIGINT) AS customer_id,
       |    'NCMP' || CAST(c_custkey AS VARCHAR) AS campaign_name,
       |    CAST((${iList(searchadCampaignType.codes)})[c_custkey % 6 + 1]
       |      AS INTEGER) AS campaign_type,
       |    CASE WHEN c_custkey % 9 = 0 THEN NULL
       |      ELSE c_custkey % 3 > 0 END AS is_enabled,
       |    c_custkey % 21 = 0 AS is_deleted,
       |    DATE '1995-02-01' + CAST(c_custkey % 650 AS INTEGER)
       |      AS created_at,
       |    CASE WHEN c_custkey % 21 = 0
       |      THEN DATE '1996-03-01' + CAST(c_custkey % 250 AS INTEGER)
       |      ELSE NULL END AS deleted_at
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
       |      ELSE NULL END AS deleted_at
       |  FROM orders WHERE o_orderkey % 7 = 4""".stripMargin

  private val nad =
    s"""SELECT CAST(o_orderkey * 10 + o_orderkey % 3 AS BIGINT) AS ad_id,
       |    CAST(CASE WHEN o_orderkey % 11 = 0 THEN -1 ELSE o_orderkey END
       |      AS BIGINT) AS adgroup_id,
       |    CAST(o_custkey % 25 AS BIGINT) AS customer_id,
       |    'NAD' || CAST(o_orderkey AS VARCHAR) AS title,
       |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
       |      ELSE 'DESC' || CAST(o_orderkey % 100 AS VARCHAR) END
       |      AS description,
       |    CAST(CASE WHEN o_orderkey % 23 = 0 THEN 999
       |      ELSE (${iList(saAdType.codes)})[o_orderkey % 6 + 1] END
       |      AS INTEGER) AS ad_type,
       |    CASE WHEN o_orderkey % 17 = 0 THEN NULL
       |      ELSE 'SMT' || CAST(o_orderkey % 800 AS VARCHAR) END
       |      AS product_id,
       |    CAST(o_orderkey % 10000 AS BIGINT) AS bid_amount,
       |    o_orderkey % 2 = 0 AS is_enabled,
       |    o_orderkey % 19 = 0 AS is_deleted,
       |    'https://pc/' || CAST(o_orderkey AS VARCHAR) AS landing_url_pc,
       |    CASE WHEN o_orderkey % 13 = 0 THEN NULL
       |      ELSE 'https://m/' || CAST(o_orderkey AS VARCHAR) END
       |      AS landing_url_mobile,
       |    DATE '1995-04-01' + CAST(o_orderkey % 600 AS INTEGER)
       |      AS created_at,
       |    CASE WHEN o_orderkey % 19 = 0
       |      THEN DATE '1996-04-01' + CAST(o_orderkey % 200 AS INTEGER)
       |      ELSE NULL END AS deleted_at
       |  FROM orders WHERE o_orderkey % 7 = 4""".stripMargin

  private val ncon =
    """SELECT CAST(o_orderkey AS BIGINT) AS contract_id,
      |    CAST(o_orderkey + 2 AS BIGINT) AS adgroup_id,
      |    CAST(o_custkey % 25 AS BIGINT) AS customer_id,
      |    'NCT' || CAST(o_orderkey AS VARCHAR) AS contract_name,
      |    CAST(o_orderkey % 3 AS INTEGER) AS contract_type,
      |    CAST(FLOOR(o_totalprice) AS BIGINT) AS contract_amount,
      |    CASE WHEN o_orderkey % 4 = 0
      |      THEN CAST(FLOOR(o_totalprice * 0.1) AS BIGINT)
      |      ELSE NULL END AS refund_amount,
      |    CAST(o_orderdate AS DATE) AS contract_start_date,
      |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INTEGER)
      |      AS contract_end_date,
      |    CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |      ELSE CAST(o_orderdate AS DATE) + 2 END AS exposure_start_date,
      |    CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |      ELSE CAST(o_orderdate AS DATE)
      |        + CAST(o_orderkey % 10 + 2 AS INTEGER) END
      |      AS exposure_end_date,
      |    CASE WHEN o_orderkey % 11 = 0 THEN CAST(o_orderdate AS DATE) + 5
      |      ELSE NULL END AS cancel_date
      |  FROM orders WHERE o_orderkey % 7 = 2""".stripMargin

  /** naver ranged relation base (shared by ranged + non-ranged CTEs). */
  private val nrelInner =
    """SELECT CAST(p_partkey % 3 AS INTEGER) AS ad_level,
      |        CAST(CASE p_partkey % 3 WHEN 0 THEN p_partkey % 500
      |          WHEN 1 THEN p_partkey * 7 + 4
      |          ELSE (p_partkey * 7 + 4) * 10 + (p_partkey * 7 + 4) % 3
      |          END AS BIGINT) AS ad_id,
      |        CAST(p_partkey % 2000 + 1 AS VARCHAR) || ', ' ||
      |          CAST(p_partkey % 2000 + 2 AS VARCHAR) AS bundle_a,
      |        CASE WHEN p_partkey % 9 = 0 THEN '200000'
      |          ELSE CAST(p_partkey % 2000 + 3 AS VARCHAR) END AS bundle_b
      |      FROM part""".stripMargin

  private val nranged =
    s"""SELECT ad_level, ad_id, bundle_a AS bundle_product_ids,
       |      DATE '1995-01-01' AS start_date, DATE '1996-06-30' AS end_date
       |    FROM (
       |      SELECT ad_level, ad_id, MIN(bundle_a) AS bundle_a
       |      FROM (
       |        $nrelInner) t_
       |      GROUP BY ad_level, ad_id) b_
       |  UNION ALL
       |  SELECT ad_level, ad_id, bundle_b,
       |      DATE '1996-07-01', DATE '1997-12-31'
       |    FROM (
       |      SELECT ad_level, ad_id, MIN(bundle_b) AS bundle_b
       |      FROM (
       |        $nrelInner) t_
       |      GROUP BY ad_level, ad_id) b_""".stripMargin

  private val nsbn =
    """SELECT ad_level, ad_id, MIN(bundle_product_ids)
      |      AS bundle_product_ids
      |  FROM (
      |    SELECT CAST(p_partkey % 3 AS INTEGER) AS ad_level,
      |      CAST(CASE p_partkey % 3 WHEN 0 THEN p_partkey % 500
      |        WHEN 1 THEN p_partkey * 7 + 4
      |        ELSE (p_partkey * 7 + 4) * 10 + (p_partkey * 7 + 4) % 3
      |        END AS BIGINT) AS ad_id,
      |      CAST(p_partkey % 2000 + 1 AS VARCHAR) || ',' ||
      |        CAST(p_partkey % 2000 + 2 AS VARCHAR) AS bundle_product_ids
      |    FROM part) t_
      |  GROUP BY ad_level, ad_id""".stripMargin

  private val saprd =
    """SELECT 'SMT' || CAST(p_partkey AS VARCHAR) AS product_id,
      |    CAST(100000 + p_partkey % 80 AS VARCHAR) || ',' ||
      |      CAST(100100 + p_partkey * 3 % 80 AS VARCHAR)
      |      AS bundle_product_ids
      |  FROM part""".stripMargin

  // ---- q135 campaign master ----

  def q135: String =
    s"""WITH nacc AS (
       |  $nacc),
       |ncmp AS (
       |  $ncmp)
       |SELECT c.customer_id, a.account_name, a.account_type,
       |  c.campaign_id, c.campaign_name,
       |  ${lblI(searchadCampaignType, "c.campaign_type")} AS campaign_type,
       |  ${lblI(saCampaignAdType, "c.campaign_type")} AS ad_type,
       |  c.is_enabled, c.is_deleted, c.created_at, c.deleted_at,
       |  CAST((CASE WHEN c.is_deleted THEN 2 ELSE 1 END) * 10000
       |    + COALESCE(a.account_seq, 99) * 100
       |    + COALESCE(${seqI(searchadCampaignType, "c.campaign_type")}, 99)
       |    AS BIGINT) AS sort_key
       |FROM ncmp c
       |LEFT JOIN nacc a ON c.customer_id = a.customer_id""".stripMargin

  // ---- q136 ad master ----

  def q136: String =
    s"""WITH nacc AS (
       |  $nacc),
       |ncmp AS (
       |  $ncmp),
       |ngrp AS (
       |  $ngrp),
       |nad AS (
       |  $nad),
       |nsbn AS (
       |  $nsbn),
       |saprd AS (
       |  $saprd)
       |SELECT d.customer_id, a.account_name, a.account_type,
       |  g.campaign_id, c.campaign_name,
       |  ${lblI(searchadCampaignType, "c.campaign_type")} AS campaign_type,
       |  d.adgroup_id, g.adgroup_name,
       |  ${lblI(searchadAdgroupType, "g.adgroup_type")} AS adgroup_type,
       |  d.ad_id, d.title, d.description,
       |  ${lblI(saAdType, "d.ad_type")} AS ad_type,
       |  d.product_id AS mall_product_id,
       |  COALESCE(rp.bundle_product_ids, rd.bundle_product_ids,
       |    rg.bundle_product_ids, rc.bundle_product_ids)
       |    AS bundle_product_ids,
       |  d.bid_amount,
       |  COALESCE(c.is_enabled AND g.is_enabled AND d.is_enabled,
       |    d.is_enabled) AS is_enabled,
       |  d.is_deleted, d.landing_url_pc, d.landing_url_mobile,
       |  d.created_at, d.deleted_at,
       |  CAST((CASE WHEN d.is_deleted THEN 2 ELSE 1 END) * 100000000
       |    + COALESCE(a.account_seq, 99) * 1000000
       |    + COALESCE(${seqI(searchadCampaignType, "c.campaign_type")}, 99)
       |      * 10000
       |    + COALESCE(${seqI(searchadAdgroupType, "g.adgroup_type")}, 99)
       |      * 100
       |    + COALESCE(${seqI(saAdType, "d.ad_type")}, 99)
       |    AS BIGINT) AS sort_key
       |FROM nad d
       |LEFT JOIN nacc a ON d.customer_id = a.customer_id
       |LEFT JOIN ngrp g ON d.adgroup_id = g.adgroup_id
       |LEFT JOIN ncmp c ON g.campaign_id = c.campaign_id
       |LEFT JOIN (SELECT * FROM nsbn WHERE ad_level = 0) rc
       |  ON g.campaign_id = rc.ad_id
       |LEFT JOIN (SELECT * FROM nsbn WHERE ad_level = 1) rg
       |  ON d.adgroup_id = rg.ad_id
       |LEFT JOIN (SELECT * FROM nsbn WHERE ad_level = 2) rd
       |  ON d.ad_id = rd.ad_id
       |LEFT JOIN saprd rp ON d.product_id = rp.product_id""".stripMargin

  // ---- q137 contract master ----

  def q137: String =
    s"""WITH nacc AS (
       |  $nacc),
       |ncmp AS (
       |  $ncmp),
       |ngrp AS (
       |  $ngrp),
       |ncon AS (
       |  $ncon)
       |SELECT s.customer_id, a.account_name, a.account_type,
       |  g.campaign_id, c.campaign_name,
       |  ${lblI(searchadCampaignType, "c.campaign_type")} AS campaign_type,
       |  s.adgroup_id, g.adgroup_name,
       |  ${lblI(searchadAdgroupType, "g.adgroup_type")} AS adgroup_type,
       |  s.contract_id, s.contract_name,
       |  ${lblI(saContractType, "s.contract_type")} AS contract_type,
       |  s.contract_amount, s.contract_start_date, s.contract_end_date,
       |  s.exposure_start_date, s.exposure_end_date, s.cancel_date,
       |  CAST((CASE WHEN s.cancel_date IS NULL THEN 1 ELSE 2 END)
       |      * 10000000
       |    + COALESCE(a.account_seq, 99) * 100000
       |    + COALESCE(${seqI(searchadCampaignType, "c.campaign_type")}, 99)
       |      * 1000
       |    + COALESCE(${seqI(searchadAdgroupType, "g.adgroup_type")}, 99)
       |      * 10
       |    + COALESCE(${seqI(saContractType, "s.contract_type")}, 9)
       |    AS BIGINT) AS sort_key
       |FROM ncon s
       |LEFT JOIN nacc a ON s.customer_id = a.customer_id
       |LEFT JOIN ngrp g ON s.adgroup_id = g.adgroup_id
       |LEFT JOIN ncmp c ON g.campaign_id = c.campaign_id""".stripMargin

  // ---- q138 contract daily ----

  def q138: String = {
    val smtRanged = ReportOracles.q118.replace("\n", "\n  ")
    s"""WITH ncon AS (
       |  $ncon),
       |nad AS (
       |  $nad),
       |ngrp AS (
       |  $ngrp),
       |nacc AS (
       |  $nacc),
       |nr AS (
       |  $nranged),
       |smtr AS (
       |  $smtRanged),
       |prd_ranged AS (
       |  SELECT * FROM smtr
       |  UNION ALL
       |  SELECT 'SMT' || CAST(pk AS VARCHAR) AS product_id,
       |    MIN(bundle) AS bundle_product_ids,
       |    DATE '1990-01-01' AS start_date, DATE '2999-12-31' AS end_date
       |  FROM (
       |    SELECT p_partkey % 800 AS pk,
       |      '20000' || CAST(p_partkey % 9 + 1 AS VARCHAR) AS bundle
       |    FROM part WHERE p_partkey % 13 = 0) b_
       |  GROUP BY pk),
       |cb AS (
       |  SELECT contract_id, adgroup_id, customer_id,
       |    contract_amount - COALESCE(refund_amount, 0) AS ad_cost,
       |    exposure_start_date,
       |    CAST(date_diff('day', exposure_start_date, exposure_end_date)
       |      + 1 AS BIGINT) AS date_count
       |  FROM ncon
       |  WHERE exposure_start_date IS NOT NULL
       |    AND exposure_end_date IS NOT NULL),
       |ce AS (
       |  SELECT contract_id, adgroup_id, customer_id,
       |    ad_cost // date_count
       |      + (CASE WHEN off = 0 THEN ad_cost % date_count ELSE 0 END)
       |      AS ad_cost,
       |    exposure_start_date + CAST(off AS INTEGER) AS ymd
       |  FROM (SELECT *, UNNEST(range(0, date_count)) AS off FROM cb) t_),
       |cd AS (SELECT DISTINCT adgroup_id, ymd FROM ce),
       |rules AS (
       |  SELECT d.adgroup_id, r.bundle_product_ids, r.start_date,
       |    r.end_date
       |  FROM nad d
       |  JOIN (SELECT * FROM nr WHERE ad_level = 2) r ON d.ad_id = r.ad_id
       |  UNION ALL
       |  SELECT d.adgroup_id, r.bundle_product_ids, r.start_date,
       |    r.end_date
       |  FROM nad d
       |  JOIN (SELECT * FROM prd_ranged
       |    WHERE NOT starts_with(bundle_product_ids, '2')) r
       |    ON d.product_id = r.product_id
       |  UNION ALL
       |  SELECT d.adgroup_id, r.bundle_product_ids, r.start_date,
       |    r.end_date
       |  FROM nad d
       |  JOIN (SELECT * FROM prd_ranged
       |    WHERE starts_with(bundle_product_ids, '2')) r
       |    ON d.product_id = r.product_id),
       |rawids AS (
       |  SELECT rules.adgroup_id, cd.ymd,
       |    UNNEST(string_split(rules.bundle_product_ids, ',')) AS rawb
       |  FROM rules
       |  JOIN cd ON rules.adgroup_id = cd.adgroup_id
       |    AND cd.ymd BETWEEN rules.start_date AND rules.end_date
       |  WHERE rules.bundle_product_ids IS NOT NULL),
       |dailyids AS (
       |  SELECT adgroup_id, ymd, NULLIF(TRIM(rawb), '')
       |    AS bundle_product_id
       |  FROM rawids),
       |dprd AS (
       |  SELECT adgroup_id, ymd,
       |    string_agg(DISTINCT bundle_product_id, ','
       |      ORDER BY bundle_product_id) AS bundle
       |  FROM dailyids
       |  WHERE bundle_product_id != '200000'
       |    AND NOT starts_with(bundle_product_id, '2')
       |  GROUP BY adgroup_id, ymd),
       |dbrd AS (
       |  SELECT adgroup_id, ymd,
       |    string_agg(DISTINCT bundle_product_id, ','
       |      ORDER BY bundle_product_id) AS bundle
       |  FROM dailyids
       |  WHERE bundle_product_id != '200000'
       |    AND starts_with(bundle_product_id, '2')
       |  GROUP BY adgroup_id, ymd),
       |bpc AS (
       |  SELECT ce.contract_id, ce.adgroup_id,
       |    COALESCE(dp.bundle, r1.bundle_product_ids,
       |      r0.bundle_product_ids, db.bundle, a.bundle_brand_ids,
       |      '200000') AS bundle_product_ids,
       |    ce.ad_cost, ce.ymd
       |  FROM ce
       |  LEFT JOIN ngrp g ON ce.adgroup_id = g.adgroup_id
       |  LEFT JOIN (SELECT * FROM nr WHERE ad_level = 0) r0
       |    ON g.campaign_id = r0.ad_id
       |    AND ce.ymd BETWEEN r0.start_date AND r0.end_date
       |  LEFT JOIN (SELECT * FROM nr WHERE ad_level = 1) r1
       |    ON ce.adgroup_id = r1.ad_id
       |    AND ce.ymd BETWEEN r1.start_date AND r1.end_date
       |  LEFT JOIN dprd dp ON ce.adgroup_id = dp.adgroup_id
       |    AND ce.ymd = dp.ymd
       |  LEFT JOIN dbrd db ON ce.adgroup_id = db.adgroup_id
       |    AND ce.ymd = db.ymd
       |  LEFT JOIN nacc a ON ce.customer_id = a.customer_id),
       |expl AS (
       |  SELECT contract_id, adgroup_id, ad_cost, ymd,
       |    CAST(len(string_split(bundle_product_ids, ',')) AS BIGINT)
       |      AS cnt,
       |    UNNEST(string_split(bundle_product_ids, ',')) AS component,
       |    UNNEST(range(0, len(string_split(bundle_product_ids, ','))))
       |      AS off
       |  FROM bpc),
       |ren(pnew, pold, rdate) AS (VALUES
       |  ('7', '1000007', DATE '1996-03-01'),
       |  ('13', '1000013', DATE '1996-08-01'),
       |  ('21', '1000021', DATE '1996-05-01'))
       |SELECT e.contract_id, e.adgroup_id,
       |  COALESCE(ren.pold, e.component) AS product_id,
       |  e.ad_cost // e.cnt
       |    + (CASE WHEN e.off = 0 THEN e.ad_cost % e.cnt ELSE 0 END)
       |    AS ad_cost,
       |  e.ymd
       |FROM expl e
       |LEFT JOIN ren ON e.component = ren.pnew AND e.ymd < ren.rdate"""
      .stripMargin
  }

  // ---- q143 searchad contract staging ----

  private def statusCase(pairs: Seq[(String, Int)]): String =
    "CASE status" +
      pairs.map { case (c, v) => s" WHEN '$c' THEN $v" }.mkString + " END"

  def q143: String = {
    val timePairs = graft.staging.SearchadContract.timeStatus
    val bnPairs = graft.staging.SearchadContract.brandNewStatus
    def sList(vals: Seq[String]): String =
      vals.map(v => s"'$v'").mkString("[", ", ", "]")
    def ts(days: Int, hours: String) =
      s"strftime(CAST(o_orderdate AS TIMESTAMP) + INTERVAL ($days) DAY" +
        s" + INTERVAL ($hours) HOUR, '%Y-%m-%d %H:%M:%S')"
    s"""WITH traw AS (
       |  SELECT 'TC' || CAST(o_orderkey AS VARCHAR) AS contract_id,
       |    'grp-' || CAST(o_orderkey % 500 AS VARCHAR) AS adgroup_id,
       |    CAST(o_custkey % 1000 AS INTEGER) AS customer_id,
       |    'CT' || CAST(o_orderkey AS VARCHAR) AS contract_name,
       |    (${sList(timePairs.map(_._1) :+ "ODD")})[o_orderkey % 7 + 1]
       |      AS status,
       |    CAST(FLOOR(o_totalprice) AS BIGINT) AS payment_amt,
       |    CASE WHEN o_orderkey % 4 = 0
       |      THEN CAST(FLOOR(o_totalprice * 0.05) AS BIGINT) END
       |      AS refund_amt,
       |    CAST(o_orderkey % 50 AS INTEGER) AS contract_qc,
       |    CAST(o_orderkey % 200 AS INTEGER) AS keyword_qc,
       |    CASE WHEN o_orderkey % 13 = 0 THEN '-'
       |      ELSE ${ts(0, "o_orderkey % 24")} END AS reg_tm,
       |    ${ts(0, "o_custkey % 24")} AS edit_tm,
       |    ${ts(0, "o_orderkey % 24")} AS start_dt,
       |    ${ts(30, "o_orderkey % 24")} AS end_dt,
       |    CASE WHEN o_orderkey % 9 = 0 THEN 'bad'
       |      ELSE ${ts(2, "o_orderkey % 24")} END AS expo_start,
       |    CASE WHEN o_orderkey % 9 = 0 THEN NULL
       |      ELSE ${ts(12, "o_orderkey % 24")} END AS expo_end,
       |    CASE WHEN o_orderkey % 11 = 0
       |      THEN ${ts(5, "o_orderkey % 24")} END AS cancel_tm
       |  FROM orders WHERE o_orderkey % 3 = 0),
       |bnraw AS (
       |  SELECT CASE WHEN o_orderkey % 17 = 0
       |      THEN 'TC' || CAST(o_orderkey + 2 AS VARCHAR)
       |      ELSE 'BC' || CAST(o_orderkey AS VARCHAR) END AS contract_id,
       |    'grp-' || CAST(o_orderkey % 500 AS VARCHAR) AS adgroup_id,
       |    CAST(o_custkey % 1000 AS INTEGER) AS customer_id,
       |    'BN' || CAST(o_orderkey AS VARCHAR) AS contract_name,
       |    (${sList(bnPairs.map(_._1) :+ "ODD")})[o_orderkey % 13 + 1]
       |      AS status,
       |    CAST(FLOOR(o_totalprice) AS BIGINT) AS payment_amt,
       |    CASE WHEN o_orderkey % 5 = 0
       |      THEN CAST(FLOOR(o_totalprice * 0.03) AS BIGINT) END
       |      AS refund_amt,
       |    CASE WHEN o_orderkey % 13 = 0 THEN '-'
       |      ELSE ${ts(0, "o_orderkey % 24")} END AS reg_tm,
       |    ${ts(0, "o_custkey % 24")} AS edit_tm,
       |    ${ts(0, "o_orderkey % 24")} AS start_dt,
       |    ${ts(45, "o_orderkey % 24")} AS end_dt,
       |    CASE WHEN o_orderkey % 9 = 0 THEN 'bad'
       |      ELSE ${ts(3, "o_orderkey % 24")} END AS expo_start,
       |    CASE WHEN o_orderkey % 9 = 0 THEN NULL
       |      ELSE ${ts(15, "o_orderkey % 24")} END AS expo_end,
       |    CASE WHEN o_orderkey % 7 = 0
       |      THEN ${ts(6, "o_orderkey % 24")} END AS cancel_tm
       |  FROM orders WHERE o_orderkey % 3 = 1),
       |tstage AS (
       |  SELECT contract_id, adgroup_id, customer_id, contract_name,
       |    0 AS contract_type,
       |    ${statusCase(timePairs)} AS contract_status,
       |    CAST(ROUND(CAST(payment_amt AS DECIMAL(18, 0)) * 1.1, 0)
       |      AS INTEGER) AS contract_amount,
       |    CAST(refund_amt AS INTEGER) AS refund_amount,
       |    contract_qc, keyword_qc,
       |    TRY_CAST(reg_tm AS TIMESTAMP) + INTERVAL 9 HOUR AS register_dt,
       |    TRY_CAST(edit_tm AS TIMESTAMP) + INTERVAL 9 HOUR AS edit_dt,
       |    CAST(CAST(start_dt AS TIMESTAMP) + INTERVAL 9 HOUR AS DATE)
       |      AS contract_start_date,
       |    CAST(CAST(end_dt AS TIMESTAMP) + INTERVAL 9 HOUR AS DATE)
       |      AS contract_end_date,
       |    CAST(TRY_CAST(expo_start AS TIMESTAMP) + INTERVAL 9 HOUR
       |      AS DATE) AS exposure_start_date,
       |    CAST(TRY_CAST(expo_end AS TIMESTAMP) + INTERVAL 9 HOUR
       |      AS DATE) AS exposure_end_date,
       |    CAST(TRY_CAST(cancel_tm AS TIMESTAMP) + INTERVAL 9 HOUR
       |      AS DATE) AS cancel_date
       |  FROM traw),
       |bnstage AS (
       |  SELECT contract_id, adgroup_id, customer_id, contract_name,
       |    1 AS contract_type,
       |    ${statusCase(bnPairs)} AS contract_status,
       |    CAST(payment_amt AS INTEGER) AS contract_amount,
       |    CAST(refund_amt AS INTEGER) AS refund_amount,
       |    CAST(NULL AS INTEGER) AS contract_qc,
       |    CAST(NULL AS INTEGER) AS keyword_qc,
       |    TRY_CAST(reg_tm AS TIMESTAMP) + INTERVAL 9 HOUR AS register_dt,
       |    TRY_CAST(edit_tm AS TIMESTAMP) + INTERVAL 9 HOUR AS edit_dt,
       |    CAST(CAST(start_dt AS TIMESTAMP) + INTERVAL 9 HOUR AS DATE)
       |      AS contract_start_date,
       |    CAST(CAST(end_dt AS TIMESTAMP) + INTERVAL 9 HOUR AS DATE)
       |      AS contract_end_date,
       |    CAST(TRY_CAST(expo_start AS TIMESTAMP) + INTERVAL 9 HOUR
       |      AS DATE) AS exposure_start_date,
       |    CAST(TRY_CAST(expo_end AS TIMESTAMP) + INTERVAL 9 HOUR
       |      AS DATE) AS exposure_end_date,
       |    CAST(TRY_CAST(cancel_tm AS TIMESTAMP) + INTERVAL 9 HOUR
       |      AS DATE) AS cancel_date
       |  FROM bnraw)
       |SELECT * EXCLUDE (rn) FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY contract_id
       |    ORDER BY contract_type) AS rn
       |  FROM (SELECT * FROM tstage UNION ALL SELECT * FROM bnstage) u_)
       |WHERE rn = 1""".stripMargin
  }
}
