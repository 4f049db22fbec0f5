package graft

/** DuckDB oracle SQL for the per-channel insight dailies (q129-q131) and
  * their report-daily marts (q132-q134). The mart oracles embed the
  * insight oracle and the matching `MastersOracles` mart as CTEs, so the
  * whole model chain replays end-to-end in DuckDB.
  */
private[graft] object InsightOracles {

  /** The validity-windowed ad→bundle relation (mirrors
    * `InsightDaily.installRelation`): the `ad_sbn_relation` id spaces, each
    * key exploded into two non-overlapping windows.
    */
  private val rangedRel =
    """SELECT platform_name, ad_level, ad_id, bundle_a AS bundle_product_ids,
      |      DATE '1995-01-01' AS start_date, DATE '1996-06-30' AS end_date
      |    FROM (
      |      SELECT platform_name, ad_level, ad_id,
      |        MIN(bundle_a) AS bundle_a, MIN(bundle_b) AS bundle_b
      |      FROM (
      |        SELECT (['구글', '메타'])[p_partkey % 2 + 1] AS platform_name,
      |          CAST(p_partkey % 3 AS INTEGER) AS ad_level,
      |          CAST(CASE WHEN p_partkey % 2 = 0 THEN
      |              CASE p_partkey % 3 WHEN 0 THEN p_partkey % 600
      |                WHEN 1 THEN p_partkey * 7 + 1
      |                ELSE (p_partkey * 7 + 1) * 10 + (p_partkey * 7 + 1) % 3
      |                END
      |            ELSE
      |              CASE p_partkey % 3 WHEN 0 THEN p_partkey % 300 * 2 + 1
      |                WHEN 1 THEN p_partkey * 7 + 5
      |                ELSE (p_partkey * 7 + 5) * 10 + (p_partkey * 7 + 5) % 3
      |                END
      |            END AS BIGINT) AS ad_id,
      |          CAST(p_partkey % 2000 + 1 AS VARCHAR) || ',' ||
      |            CAST(p_partkey % 2000 + 2 AS VARCHAR) AS bundle_a,
      |          CAST(p_partkey % 2000 + 3 AS VARCHAR) AS bundle_b
      |        FROM part) t_
      |      GROUP BY platform_name, ad_level, ad_id) b_
      |  UNION ALL
      |  SELECT platform_name, ad_level, ad_id, bundle_b,
      |      DATE '1996-07-01', DATE '1997-12-31'
      |    FROM (
      |      SELECT platform_name, ad_level, ad_id,
      |        MIN(bundle_b) AS bundle_b
      |      FROM (
      |        SELECT (['구글', '메타'])[p_partkey % 2 + 1] AS platform_name,
      |          CAST(p_partkey % 3 AS INTEGER) AS ad_level,
      |          CAST(CASE WHEN p_partkey % 2 = 0 THEN
      |              CASE p_partkey % 3 WHEN 0 THEN p_partkey % 600
      |                WHEN 1 THEN p_partkey * 7 + 1
      |                ELSE (p_partkey * 7 + 1) * 10 + (p_partkey * 7 + 1) % 3
      |                END
      |            ELSE
      |              CASE p_partkey % 3 WHEN 0 THEN p_partkey % 300 * 2 + 1
      |                WHEN 1 THEN p_partkey * 7 + 5
      |                ELSE (p_partkey * 7 + 5) * 10 + (p_partkey * 7 + 5) % 3
      |                END
      |            END AS BIGINT) AS ad_id,
      |          CAST(p_partkey % 2000 + 3 AS VARCHAR) AS bundle_b
      |        FROM part) t_
      |      GROUP BY platform_name, ad_level, ad_id) b_""".stripMargin

  private val renewal =
    """ren(pnew, pold, rdate) AS (VALUES
      |  ('7', '1000007', DATE '1996-03-01'),
      |  ('13', '1000013', DATE '1996-08-01'),
      |  ('21', '1000021', DATE '1996-05-01'))""".stripMargin

  /** Allocation tail: `metric // cnt + (off = 0 ? metric % cnt : 0)`. */
  private def divmod(c: String): String =
    s"e.$c // e.cnt + (CASE WHEN e.off = 0 THEN e.$c % e.cnt ELSE 0 END)" +
      s" AS $c"

  // ---- q129 google ----

  val q129: String =
    s"""WITH ins AS (
       |  SELECT l_orderkey * 10 + l_orderkey % 3 AS ad_id,
       |    l_orderkey AS adgroup_id,
       |    l_orderkey % 600 AS campaign_id,
       |    l_orderkey % 25 AS customer_id,
       |    (['P', 'M', 'X'])[l_linenumber % 3 + 1] AS device_type,
       |    CAST(l_partkey % 1000 * 3 AS BIGINT) AS impression_count,
       |    CAST(l_suppkey % 40 AS BIGINT) AS click_count,
       |    CAST(FLOOR(l_extendedprice * 0.01) AS BIGINT) AS ad_cost,
       |    CAST(l_shipdate AS DATE) AS ymd
       |  FROM lineitem WHERE l_orderkey % 7 = 1
       |    AND CAST(l_shipdate AS DATE)
       |      BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
       |rel AS (
       |  $rangedRel),
       |acc AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS acc_id,
       |    CASE WHEN n_nationkey % 3 = 0 THEN NULL
       |      ELSE '200000' || CAST(n_nationkey % 9 + 1 AS VARCHAR) END
       |      AS acc_brand
       |  FROM nation WHERE n_nationkey < 20),
       |lad AS (
       |  SELECT i.ymd, i.ad_id, i.device_type,
       |    COALESCE(r2.bundle_product_ids, r1.bundle_product_ids,
       |      r0.bundle_product_ids, acc.acc_brand, '200000')
       |      AS bundle_product_ids,
       |    i.impression_count, i.click_count, i.ad_cost
       |  FROM ins i
       |  LEFT JOIN (SELECT * FROM rel
       |    WHERE platform_name = '구글' AND ad_level = 2) r2
       |    ON i.ad_id = r2.ad_id
       |    AND i.ymd BETWEEN r2.start_date AND r2.end_date
       |  LEFT JOIN (SELECT * FROM rel
       |    WHERE platform_name = '구글' AND ad_level = 1) r1
       |    ON i.adgroup_id = r1.ad_id
       |    AND i.ymd BETWEEN r1.start_date AND r1.end_date
       |  LEFT JOIN (SELECT * FROM rel
       |    WHERE platform_name = '구글' AND ad_level = 0) r0
       |    ON i.campaign_id = r0.ad_id
       |    AND i.ymd BETWEEN r0.start_date AND r0.end_date
       |  LEFT JOIN acc ON i.customer_id = acc.acc_id),
       |grp AS (
       |  SELECT ymd, ad_id, device_type,
       |    ANY_VALUE(bundle_product_ids) AS bundle_product_ids,
       |    CAST(SUM(impression_count) AS BIGINT) AS impression_count,
       |    CAST(SUM(click_count) AS BIGINT) AS click_count,
       |    CAST(SUM(ad_cost) AS BIGINT) AS ad_cost
       |  FROM lad GROUP BY ymd, ad_id, device_type),
       |expl AS (
       |  SELECT ad_id, device_type, ymd, impression_count, click_count,
       |    ad_cost,
       |    CAST(len(string_split(bundle_product_ids, ',')) AS BIGINT)
       |      AS cnt,
       |    UNNEST(string_split(bundle_product_ids, ',')) AS component,
       |    UNNEST(range(0, len(string_split(bundle_product_ids, ','))))
       |      AS off
       |  FROM grp),
       |$renewal
       |SELECT e.ad_id, e.device_type,
       |  COALESCE(ren.pold, e.component) AS product_id,
       |  ${divmod("impression_count")},
       |  ${divmod("click_count")},
       |  ${divmod("ad_cost")},
       |  e.ymd
       |FROM expl e
       |LEFT JOIN ren ON e.component = ren.pnew AND e.ymd < ren.rdate"""
      .stripMargin

  // ---- q130 meta ----

  val q130: String =
    s"""WITH ins AS (
       |  SELECT l_orderkey * 10 + l_orderkey % 3 AS ad_id,
       |    l_orderkey AS adset_id,
       |    l_orderkey % 300 * 2 + 1 AS campaign_id,
       |    l_orderkey % 25 AS account_id,
       |    CAST(l_partkey % 900 * 2 AS BIGINT) AS impression_count,
       |    CAST(l_partkey % 500 AS BIGINT) AS reach_count,
       |    CAST(l_suppkey % 35 AS BIGINT) AS click_count,
       |    CAST(l_suppkey % 20 AS BIGINT) AS link_click_count,
       |    CAST(FLOOR(l_extendedprice * 0.02) AS BIGINT) AS ad_cost,
       |    CAST(l_shipdate AS DATE) AS ymd
       |  FROM lineitem WHERE l_orderkey % 7 = 5
       |    AND CAST(l_shipdate AS DATE)
       |      BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
       |rel AS (
       |  $rangedRel),
       |acc AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS acc_id,
       |    CASE WHEN n_nationkey % 4 = 0 THEN NULL
       |      ELSE '200000' || CAST(n_nationkey % 8 + 1 AS VARCHAR) END
       |      AS acc_brand
       |  FROM nation WHERE n_nationkey < 18),
       |lad AS (
       |  SELECT i.ymd, i.ad_id,
       |    COALESCE(r2.bundle_product_ids, r1.bundle_product_ids,
       |      r0.bundle_product_ids, acc.acc_brand, '200000')
       |      AS bundle_product_ids,
       |    i.impression_count, i.reach_count, i.click_count,
       |    i.link_click_count, i.ad_cost
       |  FROM ins i
       |  LEFT JOIN (SELECT * FROM rel
       |    WHERE platform_name = '메타' AND ad_level = 2) r2
       |    ON i.ad_id = r2.ad_id
       |    AND i.ymd BETWEEN r2.start_date AND r2.end_date
       |  LEFT JOIN (SELECT * FROM rel
       |    WHERE platform_name = '메타' AND ad_level = 1) r1
       |    ON i.adset_id = r1.ad_id
       |    AND i.ymd BETWEEN r1.start_date AND r1.end_date
       |  LEFT JOIN (SELECT * FROM rel
       |    WHERE platform_name = '메타' AND ad_level = 0) r0
       |    ON i.campaign_id = r0.ad_id
       |    AND i.ymd BETWEEN r0.start_date AND r0.end_date
       |  LEFT JOIN acc ON i.account_id = acc.acc_id),
       |grp AS (
       |  SELECT ymd, ad_id,
       |    ANY_VALUE(bundle_product_ids) AS bundle_product_ids,
       |    CAST(SUM(impression_count) AS BIGINT) AS impression_count,
       |    CAST(SUM(reach_count) AS BIGINT) AS reach_count,
       |    CAST(SUM(click_count) AS BIGINT) AS click_count,
       |    CAST(SUM(link_click_count) AS BIGINT) AS link_click_count,
       |    CAST(SUM(ad_cost) AS BIGINT) AS ad_cost
       |  FROM lad GROUP BY ymd, ad_id),
       |expl AS (
       |  SELECT ad_id, ymd, impression_count, reach_count, click_count,
       |    link_click_count, ad_cost,
       |    CAST(len(string_split(bundle_product_ids, ',')) AS BIGINT)
       |      AS cnt,
       |    UNNEST(string_split(bundle_product_ids, ',')) AS component,
       |    UNNEST(range(0, len(string_split(bundle_product_ids, ','))))
       |      AS off
       |  FROM grp),
       |$renewal
       |SELECT e.ad_id,
       |  COALESCE(ren.pold, e.component) AS product_id,
       |  ${divmod("impression_count")},
       |  ${divmod("reach_count")},
       |  ${divmod("click_count")},
       |  ${divmod("link_click_count")},
       |  ${divmod("ad_cost")},
       |  e.ymd
       |FROM expl e
       |LEFT JOIN ren ON e.component = ren.pnew AND e.ymd < ren.rdate"""
      .stripMargin

  // ---- q131 coupang ----

  val q131: String =
    s"""WITH pa AS (
       |  SELECT l_orderkey % 300 * 3 AS campaign_id,
       |    CAST(l_partkey % 400 AS BIGINT) AS option_id,
       |    CAST(l_linenumber % 4 AS INTEGER) AS placement_group,
       |    CAST(l_orderkey % 300 % 15 AS BIGINT) AS vendor_id,
       |    CAST(l_partkey % 800 * 2 AS BIGINT) AS impression_count,
       |    CAST(l_suppkey % 30 AS BIGINT) AS click_count,
       |    CAST(FLOOR(l_extendedprice * 0.01) AS BIGINT) AS ad_cost,
       |    CAST(l_suppkey % 5 AS BIGINT) AS conv_count,
       |    CAST(l_suppkey % 3 AS BIGINT) AS direct_conv_count,
       |    CAST(FLOOR(l_extendedprice * 0.1) AS BIGINT) AS conv_amount,
       |    CAST(FLOOR(l_extendedprice * 0.05) AS BIGINT)
       |      AS direct_conv_amount,
       |    CAST(l_shipdate AS DATE) AS ymd
       |  FROM lineitem WHERE l_orderkey % 7 = 6
       |    AND CAST(l_shipdate AS DATE)
       |      BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
       |nca AS (
       |  SELECT l_orderkey % 300 * 3 AS campaign_id,
       |    CASE WHEN l_suppkey % 3 = 0 THEN NULL
       |      ELSE CAST(l_partkey % 400 AS BIGINT) END AS option_id,
       |    CAST(l_partkey % 250 + 1000 AS BIGINT) AS creative_id,
       |    CAST(l_linenumber % 4 AS INTEGER) AS placement_group,
       |    CAST(l_orderkey % 300 % 15 AS BIGINT) AS vendor_id,
       |    CAST(l_partkey % 600 * 2 AS BIGINT) AS impression_count,
       |    CAST(l_suppkey % 25 AS BIGINT) AS click_count,
       |    CAST(FLOOR(l_extendedprice * 0.008) AS BIGINT) AS ad_cost,
       |    CAST(l_shipdate AS DATE) AS ymd
       |  FROM lineitem WHERE l_orderkey % 7 = 3
       |    AND CAST(l_shipdate AS DATE)
       |      BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
       |creative AS (
       |  SELECT CAST(p_partkey + 1000 AS BIGINT) AS cr_creative_id,
       |    CAST(p_partkey % 400 AS BIGINT) AS creative_option_id
       |  FROM part WHERE p_partkey < 250),
       |rel AS (
       |  SELECT CAST(p_partkey AS BIGINT) AS rel_option_id,
       |    CASE WHEN p_partkey % 5 = 0 THEN NULL
       |      ELSE array_to_string(list_transform(string_split(
       |        CAST(p_partkey % 2000 + 1 AS VARCHAR) || ':2,' ||
       |          CAST(p_partkey % 2000 + 5 AS VARCHAR), ','),
       |        x -> string_split(x, ':')[1]), ',') END AS rel_bundle
       |  FROM part WHERE p_partkey < 400),
       |vdr AS (
       |  SELECT CAST(n_nationkey AS BIGINT) AS v_id,
       |    CASE WHEN n_nationkey % 4 = 0 THEN NULL
       |      ELSE '20000' || CAST(n_nationkey % 9 + 1 AS VARCHAR) END
       |      AS v_brand
       |  FROM nation WHERE n_nationkey < 15),
       |pa2 AS (
       |  SELECT pa.campaign_id, pa.option_id, pa.placement_group,
       |    COALESCE(rel.rel_bundle, vdr.v_brand, '200000')
       |      AS bundle_product_ids,
       |    pa.impression_count, pa.click_count,
       |    CAST(ROUND(CAST(pa.ad_cost AS DECIMAL(18, 0)) * 1.1, 0)
       |      AS BIGINT) AS ad_cost,
       |    pa.conv_count, pa.direct_conv_count, pa.conv_amount,
       |    pa.direct_conv_amount, pa.ymd
       |  FROM pa
       |  LEFT JOIN rel ON pa.option_id = rel.rel_option_id
       |  LEFT JOIN vdr ON pa.vendor_id = vdr.v_id),
       |nca2 AS (
       |  SELECT nca.campaign_id,
       |    COALESCE(nca.option_id, cr.creative_option_id) AS option_id,
       |    nca.placement_group,
       |    COALESCE(rel.rel_bundle, vdr.v_brand, '200000')
       |      AS bundle_product_ids,
       |    nca.impression_count, nca.click_count,
       |    CAST(ROUND(CAST(nca.ad_cost AS DECIMAL(18, 0)) * 1.1, 0)
       |      AS BIGINT) AS ad_cost,
       |    CAST(NULL AS BIGINT) AS conv_count,
       |    CAST(NULL AS BIGINT) AS direct_conv_count,
       |    CAST(NULL AS BIGINT) AS conv_amount,
       |    CAST(NULL AS BIGINT) AS direct_conv_amount,
       |    nca.ymd
       |  FROM nca
       |  LEFT JOIN creative cr ON nca.creative_id = cr.cr_creative_id
       |  LEFT JOIN rel
       |    ON COALESCE(nca.option_id, cr.creative_option_id)
       |      = rel.rel_option_id
       |  LEFT JOIN vdr ON nca.vendor_id = vdr.v_id),
       |grp AS (
       |  SELECT ymd, campaign_id, option_id, placement_group,
       |    ANY_VALUE(bundle_product_ids) AS bundle_product_ids,
       |    CAST(SUM(impression_count) AS BIGINT) AS impression_count,
       |    CAST(SUM(click_count) AS BIGINT) AS click_count,
       |    CAST(SUM(ad_cost) AS BIGINT) AS ad_cost,
       |    CAST(SUM(conv_count) AS BIGINT) AS conv_count,
       |    CAST(SUM(direct_conv_count) AS BIGINT) AS direct_conv_count,
       |    CAST(SUM(conv_amount) AS BIGINT) AS conv_amount,
       |    CAST(SUM(direct_conv_amount) AS BIGINT) AS direct_conv_amount
       |  FROM (SELECT * FROM pa2 UNION ALL SELECT * FROM nca2) u_
       |  GROUP BY ymd, campaign_id, option_id, placement_group),
       |expl AS (
       |  SELECT campaign_id, option_id, placement_group, ymd,
       |    impression_count, click_count, ad_cost, conv_count,
       |    direct_conv_count, conv_amount, direct_conv_amount,
       |    CAST(len(string_split(bundle_product_ids, ',')) AS BIGINT)
       |      AS cnt,
       |    UNNEST(string_split(bundle_product_ids, ',')) AS component,
       |    UNNEST(range(0, len(string_split(bundle_product_ids, ','))))
       |      AS off
       |  FROM grp),
       |$renewal
       |SELECT e.campaign_id, e.option_id, e.placement_group,
       |  COALESCE(ren.pold, e.component) AS product_id,
       |  ${divmod("impression_count")},
       |  ${divmod("click_count")},
       |  ${divmod("ad_cost")},
       |  ${divmod("conv_count")},
       |  ${divmod("direct_conv_count")},
       |  ${divmod("conv_amount")},
       |  ${divmod("direct_conv_amount")},
       |  e.ymd
       |FROM expl e
       |LEFT JOIN ren ON e.component = ren.pnew AND e.ymd < ren.rdate"""
      .stripMargin

  // ---- report-daily marts ----

  private val prodDim =
    """SELECT CAST(p_partkey AS VARCHAR) AS product_id,
      |    'NA-' || lpad(CAST(p_partkey AS VARCHAR), 6, '0') || '-00'
      |      AS item_id,
      |    CAST(p_partkey % 97 AS BIGINT) AS item_seq,
      |    CASE WHEN p_partkey % 6 = 0 THEN NULL
      |      ELSE 'T' || CAST(p_partkey % 5 AS VARCHAR) END AS team_name,
      |    CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_brand END
      |      AS brand_name,
      |    split_part(p_type, ' ', 1) AS category_name1,
      |    p_brand AS category_name2,
      |    CASE WHEN p_partkey % 4 = 0 THEN NULL ELSE p_type END
      |      AS category_name3,
      |    'CTN' || CAST(p_partkey % 8 AS VARCHAR) AS category_name4,
      |    'COL' || CAST(p_partkey % 6 AS VARCHAR) AS color,
      |    p_name AS product_name
      |  FROM part""".stripMargin

  private val prodColsSql =
    """p.item_id AS item_id,
      |  COALESCE(p.item_seq, 99999999) AS item_seq,
      |  COALESCE(p.team_name, '담당팀 없음') AS team_name,
      |  COALESCE(p.brand_name, '브랜드 없음') AS brand_name,
      |  COALESCE(p.category_name1, '-') AS category_name1,
      |  COALESCE(p.category_name2, '-') AS category_name2,
      |  COALESCE(p.category_name3, '-') AS category_name3,
      |  COALESCE(p.category_name4, '-') AS category_name4,
      |  COALESCE(p.color, '-') AS color,
      |  COALESCE(p.product_name, '-') AS product_name""".stripMargin

  def q132: String = {
    val ins = q129.replace("\n", "\n  ")
    val mst = MastersOracles.q102.replace("\n", "\n  ")
    s"""WITH ins AS (
       |  $ins),
       |mst AS (
       |  $mst),
       |prod AS (
       |  $prodDim),
       |dev(code, label) AS (VALUES ('P', 'PC'), ('M', '모바일'))
       |SELECT m.customer_id AS customer_id, m.account_name AS account_name,
       |  m.campaign_id AS campaign_id, m.campaign_name AS campaign_name,
       |  COALESCE(m.campaign_type, '캠페인 없음') AS campaign_type,
       |  m.adgroup_id AS adgroup_id, m.adgroup_name AS adgroup_name,
       |  COALESCE(m.adgroup_type, '그룹 없음') AS adgroup_type,
       |  i.ad_id AS ad_id, m.ad_name AS ad_name,
       |  COALESCE(m.ad_type, '유형 없음') AS ad_type,
       |  COALESCE(m.ad_status, '알 수 없음') AS ad_status,
       |  i.product_id AS product_id,
       |  $prodColsSql,
       |  COALESCE(dev.label, '-') AS device_type,
       |  i.impression_count AS impression_count,
       |  i.click_count AS click_count, i.ad_cost AS ad_cost, i.ymd AS ymd
       |FROM ins i
       |LEFT JOIN dev ON i.device_type = dev.code
       |LEFT JOIN mst m ON i.ad_id = m.ad_id
       |LEFT JOIN prod p ON i.product_id = p.product_id""".stripMargin
  }

  def q133: String = {
    val ins = q130.replace("\n", "\n  ")
    val mst = MastersOracles.q105.replace("\n", "\n  ")
    s"""WITH ins AS (
       |  $ins),
       |mst AS (
       |  $mst),
       |prod AS (
       |  $prodDim)
       |SELECT m.account_id AS account_id, m.account_name AS account_name,
       |  m.campaign_id AS campaign_id, m.campaign_name AS campaign_name,
       |  COALESCE(m.objective, '-') AS objective,
       |  m.adset_id AS adset_id, m.adset_name AS adset_name,
       |  i.ad_id AS ad_id, m.ad_name AS ad_name,
       |  COALESCE(m.effective_status, '-') AS effective_status,
       |  i.product_id AS product_id,
       |  $prodColsSql,
       |  i.impression_count AS impression_count,
       |  i.reach_count AS reach_count, i.click_count AS click_count,
       |  i.link_click_count AS link_click_count, i.ad_cost AS ad_cost,
       |  i.ymd AS ymd
       |FROM ins i
       |LEFT JOIN mst m ON i.ad_id = m.ad_id
       |LEFT JOIN prod p ON i.product_id = p.product_id""".stripMargin
  }

  def q134: String = {
    val ins = q131.replace("\n", "\n  ")
    val mst = MastersOracles.q106.replace("\n", "\n  ")
    s"""WITH ins AS (
       |  $ins),
       |mst AS (
       |  $mst),
       |prod AS (
       |  $prodDim),
       |opt AS (
       |  SELECT CAST(p_partkey AS BIGINT) AS o_option_id,
       |    'CP' || CAST(p_partkey AS VARCHAR) AS o_product_name,
       |    CASE WHEN p_partkey % 3 = 0 THEN NULL
       |      ELSE 'OPT' || CAST(p_partkey % 7 AS VARCHAR) END
       |      AS o_option_name,
       |    'CAT' || CAST(p_partkey % 9 AS VARCHAR) AS o_category_name
       |  FROM part WHERE p_partkey < 400),
       |pl(code, label) AS (VALUES (0, '검색'), (1, '비검색'), (2, '외부'))
       |SELECT m.vendor_id AS vendor_id, m.vendor_name AS vendor_name,
       |  m.vendor_alias AS vendor_alias, m.vendor_type AS vendor_type,
       |  i.campaign_id AS campaign_id, m.campaign_name AS campaign_name,
       |  COALESCE(m.campaign_type, '캠페인 없음') AS campaign_type,
       |  COALESCE(m.goal_type, '-') AS goal_type,
       |  m.is_active AS is_active, m.is_deleted AS is_deleted,
       |  i.product_id AS product_id,
       |  $prodColsSql,
       |  i.option_id AS option_id,
       |  (CASE WHEN opt.o_option_name IS NOT NULL
       |    THEN opt.o_product_name || ' / ' || opt.o_option_name
       |    ELSE opt.o_product_name END) AS option_name,
       |  opt.o_category_name AS category_name_cpg,
       |  COALESCE(pl.label, '-') AS placement_group,
       |  i.impression_count AS impression_count,
       |  i.click_count AS click_count, i.ad_cost AS ad_cost,
       |  i.conv_count AS conv_count,
       |  i.direct_conv_count AS direct_conv_count,
       |  i.conv_amount AS conv_amount,
       |  i.direct_conv_amount AS direct_conv_amount, i.ymd AS ymd
       |FROM ins i
       |LEFT JOIN pl ON i.placement_group = pl.code
       |LEFT JOIN mst m ON i.campaign_id = m.campaign_id
       |LEFT JOIN opt ON i.option_id = opt.o_option_id
       |LEFT JOIN prod p ON i.product_id = p.product_id""".stripMargin
  }
}
