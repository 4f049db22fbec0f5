package graft

/** DuckDB oracle SQL for the product-mart family (q109-q113). Each oracle
  * replays the FULL model chain — synthesized sources, dedups, bundle
  * explosion, scale scalars, sentinels — in DuckDB, mirroring
  * `graft.models.ProductMarts` stage for stage.
  */
private[graft] object ProductOracles {

  /** source('core','item') — mirrors ProductMarts.coreItem. */
  private val itemCte =
    """item AS (
      |  SELECT
      |    CAST(([100000, 200000, 300000])[CAST(p_partkey % 3 AS INTEGER) + 1]
      |      + p_partkey % 400 AS VARCHAR) AS product_id,
      |    'NA-' || lpad(CAST(p_partkey AS VARCHAR), 6, '0') || '-00' AS item_id,
      |    p_partkey % 97 AS item_seq,
      |    CASE WHEN p_partkey % 6 = 0 THEN NULL
      |      ELSE 'T' || CAST(p_partkey % 5 AS VARCHAR) END AS team_name,
      |    CASE WHEN p_partkey % 7 = 0 THEN NULL
      |      WHEN p_partkey % 11 = 0 THEN '브랜드 없음'
      |      ELSE p_brand END AS brand_name,
      |    p_name AS product_name,
      |    string_split(p_type, ' ')[1] AS category_name1,
      |    p_brand AS category_name2,
      |    CASE WHEN p_partkey % 4 = 0 THEN NULL ELSE p_type END AS category_name3,
      |    'CTN' || CAST(p_partkey % 8 AS VARCHAR) AS category_name4,
      |    CASE WHEN p_partkey % 5 = 0 THEN NULL
      |      ELSE 'EA' || CAST(p_partkey % 4 AS VARCHAR) END AS unit_name
      |  FROM part)""".stripMargin

  /** coreMaster: one canonical row per product_id. */
  private val itmCte =
    """itm AS (
      |  SELECT * EXCLUDE (rn) FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY product_id
      |      ORDER BY item_seq, item_id) AS rn FROM item)
      |  WHERE rn = 1)""".stripMargin

  /** core__brand_master: double-QUALIFY dedup + global brand_seq. */
  private val brandCte =
    """brand AS (
      |  SELECT brand_id, item_id, item_seq, team_name, brand_name,
      |    CAST(ROW_NUMBER() OVER (ORDER BY team_name DESC NULLS LAST, brand_id)
      |      AS BIGINT) AS brand_seq
      |  FROM (
      |    SELECT product_id AS brand_id, item_id, item_seq, team_name, brand_name
      |    FROM (
      |      SELECT *,
      |        ROW_NUMBER() OVER (PARTITION BY product_id
      |          ORDER BY item_seq, item_id) AS rp,
      |        ROW_NUMBER() OVER (PARTITION BY brand_name
      |          ORDER BY item_seq, item_id) AS rb
      |      FROM item
      |      WHERE substr(product_id, 1, 1) = '2'
      |        AND brand_name IS NOT NULL AND brand_name <> '브랜드 없음') t
      |    WHERE rp = 1 AND rb = 1) d)""".stripMargin

  /** source('sabangnet','option') — mirrors ProductMarts.sbnOption. */
  private[graft] val sbnOptCte =
    """optraw AS (
      |  SELECT
      |    CAST(200000 + (l_partkey * 7 + 3) % 500 AS VARCHAR) || '-' ||
      |      lpad(CAST(l_linenumber % 4 + 1 AS VARCHAR), 4, '0') AS option_id,
      |    'G' || CAST(l_suppkey % 5 AS VARCHAR) AS option_group,
      |    'OPT ' || CAST(l_partkey % 50 AS VARCHAR) || ' / ' ||
      |      CAST(l_suppkey % 20 AS VARCHAR) AS option_name,
      |    CASE WHEN l_partkey % 10 = 0 THEN
      |        CAST(200000 + (l_partkey * 7 + 13) % 400 AS VARCHAR) || '-0001:2,' ||
      |        CAST(100000 + (l_partkey * 3 + 7) % 400 AS VARCHAR) || '-0002:1'
      |      WHEN l_partkey % 10 = 5 THEN
      |        CAST(200000 + (l_partkey * 7 + 13) % 400 AS VARCHAR) || '-0001'
      |      ELSE NULL END AS bundle_option_ids,
      |    (['SALE', 'STOP'])[CAST(l_orderkey % 2 AS INTEGER) + 1] AS option_status,
      |    CASE WHEN l_suppkey % 13 = 0 THEN NULL
      |      ELSE CAST(l_suppkey % 3 AS INTEGER) END AS option_type,
      |    l_orderkey % 3 + 1 AS option_quantity,
      |    CAST(FLOOR(l_extendedprice / 10) AS BIGINT) AS option_price,
      |    CAST(l_shipdate AS DATE) AS register_dt,
      |    l_orderkey * 10 + l_linenumber AS src_seq,
      |    l_partkey AS tb1, l_suppkey AS tb2,
      |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS tb3
      |  FROM lineitem),
      |opt AS (
      |  SELECT * EXCLUDE (rn, src_seq, tb1, tb2, tb3) FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY option_id
      |      ORDER BY src_seq, tb1, tb2, tb3, register_dt) AS rn FROM optraw)
      |  WHERE rn = 1)""".stripMargin

  /** source('sabangnet','product') — mirrors ProductMarts.sbnProduct. */
  private val sbnPrdCte =
    """prdraw AS (
      |  SELECT
      |    CAST(200000 + p_partkey % 400 AS VARCHAR) AS product_id,
      |    'M' || CAST(p_partkey % 50 AS VARCHAR) AS model_code,
      |    p_partkey % 500 AS model_id,
      |    p_name AS product_name,
      |    string_split(p_type, ' ')[1] AS product_keyword,
      |    CASE WHEN p_partkey % 9 = 0 THEN NULL ELSE p_brand END AS brand_name,
      |    (['SALE', 'STOP', 'CLOSE'])[CAST(p_partkey % 3 AS INTEGER) + 1]
      |      AS product_status,
      |    1990 + p_partkey % 30 AS manufacture_year,
      |    CAST(FLOOR(p_retailprice) AS BIGINT) AS sales_price,
      |    CAST(FLOOR(p_retailprice) AS BIGINT) * 3 // 5 AS org_price,
      |    CASE WHEN p_partkey % 4 = 0 THEN NULL
      |      ELSE 'img' || CAST(p_partkey AS VARCHAR) || '.jpg' END AS image_file,
      |    DATE '1995-01-01' AS register_dt,
      |    DATE '1995-01-01' + CAST(p_partkey % 700 AS INTEGER) AS modify_dt,
      |    p_partkey AS src_seq
      |  FROM part),
      |prd AS (
      |  SELECT * EXCLUDE (rn, src_seq) FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY product_id
      |      ORDER BY src_seq) AS rn FROM prdraw)
      |  WHERE rn = 1)""".stripMargin

  /** sabangnet primary-option chain: bundle explosion, item enrichment,
    * per-product QUALIFY, and the POWER(10, MAX(LENGTH)) scale scalar.
    */
  private val sbnPrimaryCte =
    """expl AS (
      |  SELECT string_split(option_id, '-')[1] AS product_id, option_id,
      |    option_type,
      |    UNNEST(string_split(COALESCE(bundle_option_ids, option_id), ','))
      |      AS component
      |  FROM opt),
      |expl2 AS (
      |  SELECT e.product_id, e.option_id, e.option_type, e.component,
      |    i.item_id, i.item_seq,
      |    COALESCE(TRY_CAST(string_split(e.component, ':')[2] AS BIGINT), 1)
      |      AS option_quantity
      |  FROM (SELECT *, string_split(component, '-')[1] AS component_pid
      |        FROM expl) e
      |  LEFT JOIN itm i ON e.component_pid = i.product_id),
      |prim AS (
      |  SELECT product_id, item_id, item_seq, option_type, option_count,
      |    option_quantity
      |  FROM (
      |    SELECT *,
      |      COUNT(*) OVER (PARTITION BY product_id) AS option_count,
      |      ROW_NUMBER() OVER (PARTITION BY product_id
      |        ORDER BY item_seq ASC NULLS LAST, option_quantity DESC,
      |          option_id, component) AS rn
      |    FROM expl2)
      |  WHERE rn = 1),
      |scl AS (
      |  SELECT CAST(POWER(10, MAX(LENGTH(CAST(option_quantity AS VARCHAR))))
      |    AS BIGINT) AS scale FROM prim)""".stripMargin

  /** The full sabangnet__product_master as a CTE named prdm (q111's SELECT
    * and q112's upstream).
    */
  private val sbnMasterCte =
    s"""$itemCte,
       |$itmCte,
       |$brandCte,
       |$sbnOptCte,
       |$sbnPrdCte,
       |$sbnPrimaryCte,
       |prdm AS (
       |  SELECT p.product_id, p.model_code, p.model_id, p.product_name,
       |    p.product_keyword, p.brand_name,
       |    i.category_name1, i.category_name2, i.category_name3,
       |    i.category_name4,
       |    CASE p.product_status WHEN 'SALE' THEN '판매중'
       |      WHEN 'STOP' THEN '판매중지' WHEN 'CLOSE' THEN '판매종료'
       |      END AS product_status,
       |    CASE WHEN c.product_id IS NOT NULL THEN '대표'
       |      ELSE CASE o.option_type WHEN 0 THEN '단일' WHEN 1 THEN '옵션'
       |        WHEN 2 THEN '추가구성' END END AS option_type,
       |    o.option_count, p.manufacture_year, p.sales_price, p.org_price,
       |    CASE WHEN p.image_file IS NOT NULL
       |      THEN 'https://img.example.com/100/' || p.image_file
       |      ELSE NULL END AS image_url,
       |    p.register_dt, p.modify_dt,
       |    (COALESCE(o.item_seq, COALESCE(b.item_seq, 99000000) + 999999)
       |        * s.scale * 10
       |      + (CASE WHEN c.product_id IS NOT NULL THEN 0
       |          ELSE COALESCE(o.option_type, 9) END) * s.scale
       |      + COALESCE(o.option_quantity, 0)) AS sort_key
       |  FROM prd p
       |  LEFT JOIN prim o ON p.product_id = o.product_id
       |  LEFT JOIN itm i ON o.item_id = i.item_id
       |  LEFT JOIN itm c ON p.product_id = c.product_id
       |  LEFT JOIN brand b ON p.brand_name = b.brand_name
       |  CROSS JOIN scl s)""".stripMargin

  val q109: String =
    s"""WITH
       |$itemCte,
       |$brandCte
       |SELECT brand_id, item_id, item_seq, team_name, brand_name, brand_seq
       |FROM brand""".stripMargin

  val q110: String =
    """WITH
      |prd AS (
      |  SELECT p_partkey AS product_id, p_partkey + 100000 AS product_no,
      |    CASE WHEN p_partkey % 8 = 0 THEN NULL
      |      ELSE 'C' || CAST(p_partkey % 50 AS VARCHAR) END AS catalog_id,
      |    p_partkey % 7 AS channel_seq,
      |    p_name AS product_name,
      |    (['SALE', 'SUSPENSION', 'OUTOFSTOCK', 'CLOSE'])
      |      [CAST(p_partkey % 4 AS INTEGER) + 1] AS status_type,
      |    (['ON', 'SUSPENSION'])[CAST(p_partkey % 2 AS INTEGER) + 1]
      |      AS display_type_code,
      |    CASE WHEN p_partkey % 9 = 0 THEN NULL
      |      ELSE CAST(p_partkey % 3 AS INTEGER) END AS delivery_type_code,
      |    p_partkey % 25 AS category_id,
      |    string_split(p_type, ' ')[1] AS tags,
      |    CAST(FLOOR(p_retailprice) AS BIGINT) AS price,
      |    CAST(FLOOR(p_retailprice) AS BIGINT) * 9 // 10 AS sales_price,
      |    p_partkey % 2 * 2500 AS delivery_fee,
      |    DATE '1994-06-01' AS register_dt,
      |    DATE '1994-06-01' + CAST(p_partkey % 500 AS INTEGER) AS modify_dt
      |  FROM part),
      |chl AS (
      |  SELECT * EXCLUDE (rn) FROM (
      |    SELECT n_nationkey % 7 AS channel_seq,
      |      'T' || CAST(n_nationkey % 5 AS VARCHAR) AS team_name,
      |      n_name AS brand_name,
      |      CASE WHEN n_nationkey % 4 = 0 THEN NULL
      |        ELSE CAST(n_nationkey % 10 AS INTEGER) END AS brand_seq,
      |      ROW_NUMBER() OVER (PARTITION BY n_nationkey % 7
      |        ORDER BY n_name) AS rn
      |    FROM nation)
      |  WHERE rn = 1),
      |cat AS (
      |  SELECT n_nationkey AS category_id,
      |    substr(n_name, 1, 3) AS category_name1,
      |    substr(n_name, 1, 5) AS category_name2,
      |    n_name AS category_name3,
      |    n_name || '-L4' AS category_name4
      |  FROM nation),
      |st(code, label, seq) AS (VALUES
      |  ('SALE', '판매중', 1), ('SUSPENSION', '판매중지', 2),
      |  ('OUTOFSTOCK', '품절', 3), ('CLOSE', '판매종료', 4)),
      |dp(code, label) AS (VALUES ('ON', '전시중'), ('SUSPENSION', '전시중지')),
      |dv(code, label) AS (VALUES (0, '택배'), (1, '직접배송'), (2, '방문수령'))
      |SELECT prd.product_id, prd.product_no, prd.catalog_id,
      |  chl.team_name, chl.brand_name, prd.product_name,
      |  st.label AS status_type,
      |  dp.label AS display_type,
      |  dv.label AS delivery_type,
      |  prd.category_id, cat.category_name1, cat.category_name2,
      |  cat.category_name3, cat.category_name4,
      |  prd.tags, prd.price, prd.sales_price, prd.delivery_fee,
      |  prd.register_dt, prd.modify_dt,
      |  (COALESCE(chl.brand_seq, 99) * 1000
      |    + COALESCE(prd.delivery_type_code, 99) * 10
      |    + COALESCE(st.seq, 9)) AS sort_key
      |FROM prd
      |LEFT JOIN chl ON prd.channel_seq = chl.channel_seq
      |LEFT JOIN st ON prd.status_type = st.code
      |LEFT JOIN dp ON prd.display_type_code = dp.code
      |LEFT JOIN dv ON prd.delivery_type_code = dv.code
      |LEFT JOIN cat ON prd.category_id = cat.category_id""".stripMargin

  val q111: String =
    s"""WITH
       |$sbnMasterCte
       |SELECT * FROM prdm""".stripMargin

  val q112: String =
    s"""WITH
       |$sbnMasterCte,
       |prim2 AS (
       |  SELECT option_id, item_id FROM (
       |    SELECT x.option_id, i.item_id,
       |      ROW_NUMBER() OVER (PARTITION BY x.option_id
       |        ORDER BY i.item_seq ASC NULLS LAST, i.item_id ASC NULLS LAST,
       |          x.component) AS rn
       |    FROM (
       |      SELECT option_id,
       |        UNNEST(string_split(COALESCE(bundle_option_ids, option_id), ','))
       |          AS component
       |      FROM opt) x
       |    LEFT JOIN itm i
       |      ON string_split(string_split(x.component, ':')[1], '-')[1]
       |        = i.product_id)
       |  WHERE rn = 1),
       |bn AS (
       |  SELECT option_id,
       |    STRING_AGG(cname, chr(10) ORDER BY off) AS bundle_option_names
       |  FROM (
       |    SELECT u.option_id, u.off,
       |      COALESCE(i.product_name || ' x ' ||
       |          COALESCE(string_split(u.component, ':')[2], '1'),
       |        '상품코드 불일치') AS cname
       |    FROM (
       |      SELECT option_id,
       |        UNNEST(string_split(bundle_option_ids, ',')) AS component,
       |        UNNEST(range(1, len(string_split(bundle_option_ids, ',')) + 1))
       |          AS off
       |      FROM opt WHERE bundle_option_ids IS NOT NULL) u
       |    LEFT JOIN itm i
       |      ON string_split(string_split(u.component, ':')[1], '-')[1]
       |        = i.product_id) z
       |  GROUP BY option_id),
       |mx AS (SELECT MAX(sort_key) AS mx FROM prdm)
       |SELECT string_split(o.option_id, '-')[1] AS product_id, o.option_id,
       |  p.model_code, p.model_id, p.product_name, p.product_keyword,
       |  o.option_group, o.option_name, p.brand_name,
       |  i.category_name1, i.category_name2, i.category_name3,
       |  i.category_name4,
       |  o.bundle_option_ids, bn.bundle_option_names,
       |  CASE o.option_status WHEN 'SALE' THEN '판매중'
       |    WHEN 'STOP' THEN '판매중지' END AS option_status,
       |  CASE WHEN p.option_type = '대표' THEN '대표'
       |    ELSE CASE o.option_type WHEN 0 THEN '단일' WHEN 1 THEN '옵션'
       |      WHEN 2 THEN '추가구성' END END AS option_type,
       |  o.option_quantity, o.option_price, o.register_dt,
       |  COALESCE(p.sort_key,
       |    CAST(repeat('9', LENGTH(CAST(mx.mx AS VARCHAR))) AS BIGINT))
       |    AS sort_key
       |FROM opt o
       |LEFT JOIN prdm p ON string_split(o.option_id, '-')[1] = p.product_id
       |LEFT JOIN prim2 pr ON o.option_id = pr.option_id
       |LEFT JOIN itm i ON pr.item_id = i.item_id
       |LEFT JOIN bn ON o.option_id = bn.option_id
       |CROSS JOIN mx""".stripMargin

  val q113: String =
    s"""WITH
       |$itemCte,
       |$itmCte,
       |coptraw AS (
       |  SELECT
       |    CAST(100000 + l_partkey % 400 AS VARCHAR) AS product_id,
       |    'CP' || CAST(l_partkey AS VARCHAR) || '-' ||
       |      CAST(l_linenumber % 3 AS VARCHAR) AS option_id,
       |    CASE WHEN l_partkey % 12 = 0 THEN NULL
       |      ELSE (['AIR', 'TRUCK', 'SHIP', 'RAIL'])
       |        [CAST(l_suppkey % 4 AS INTEGER) + 1] END AS brand_name,
       |    'CProd ' || CAST(l_partkey % 80 AS VARCHAR) AS product_name,
       |    'COpt ' || CAST(l_suppkey % 9 AS VARCHAR) AS option_name,
       |    CASE WHEN l_orderkey % 11 = 0 THEN NULL
       |      ELSE CAST(l_orderkey % 3 AS INTEGER) END AS product_status_code,
       |    l_orderkey % 7 = 0 AS is_deleted,
       |    'CAT-' || CAST(l_partkey % 12 AS VARCHAR) AS category_name,
       |    l_suppkey % 20 AS vendor_id,
       |    CAST(FLOOR(l_extendedprice) AS BIGINT) AS sales_price,
       |    CAST(l_shipdate AS DATE) AS register_dt,
       |    CAST(l_shipdate AS DATE) + CAST(l_orderkey % 14 AS INTEGER)
       |      AS modify_dt,
       |    l_orderkey * 10 + l_linenumber AS src_seq,
       |    l_suppkey AS tb1
       |  FROM lineitem),
       |copt AS (
       |  SELECT * EXCLUDE (rn, src_seq, tb1) FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY option_id
       |      ORDER BY src_seq, tb1, sales_price, register_dt, modify_dt)
       |      AS rn FROM coptraw)
       |  WHERE rn = 1),
       |vdr AS (
       |  SELECT * EXCLUDE (rn) FROM (
       |    SELECT s_suppkey % 20 AS vendor_id, s_name AS vendor_name,
       |      CASE WHEN s_suppkey % 5 = 0 THEN NULL
       |        ELSE CAST(s_suppkey % 8 AS INTEGER) END AS vendor_seq,
       |      ROW_NUMBER() OVER (PARTITION BY s_suppkey % 20
       |        ORDER BY s_name) AS rn
       |    FROM supplier)
       |  WHERE rn = 1),
       |rel AS (
       |  SELECT option_id,
       |    CAST(200000 + (CAST(regexp_extract(option_id, 'CP([0-9]+)-', 1)
       |      AS BIGINT) * 11 + 3) % 400 AS VARCHAR) || '-0001:1'
       |      AS bundle_product_ids
       |  FROM copt WHERE LENGTH(option_id) % 3 = 0)
       |SELECT o.product_id, o.option_id, i.team_name,
       |  COALESCE(i.brand_name, o.brand_name) AS brand_name,
       |  o.product_name, o.option_name,
       |  CASE o.product_status_code WHEN 0 THEN '판매중' WHEN 1 THEN '품절'
       |    WHEN 2 THEN '숨김상품' END AS product_status,
       |  o.is_deleted, o.category_name, v.vendor_name, o.sales_price,
       |  o.register_dt, o.modify_dt,
       |  ((CASE WHEN o.is_deleted THEN 2 ELSE 1 END) * 100
       |    + COALESCE(v.vendor_seq, 99)) AS sort_key1,
       |  COALESCE(o.product_status_code, 9) AS sort_key2
       |FROM copt o
       |LEFT JOIN vdr v ON o.vendor_id = v.vendor_id
       |LEFT JOIN rel r ON o.option_id = r.option_id
       |LEFT JOIN itm i ON substr(r.bundle_product_ids, 1, 6) = i.product_id"""
      .stripMargin

  /** q139: smartstore option master — embeds the full q110 product-master
    * replay; the REPEAT('9') sentinel is sized by MAX(sort_key) over the
    * option↔master join result.
    */
  def q139: String = {
    val pm = q110.replace("\n", "\n  ")
    s"""WITH opt AS (
       |  SELECT CASE WHEN p_partkey % 10 = 0 THEN -p_partkey
       |      ELSE p_partkey END AS product_id,
       |    p_partkey * 10 + i AS option_id,
       |    (p_partkey + i) % 7 AS channel_seq,
       |    p_name AS product_name,
       |    CASE WHEN (p_partkey + i) % 11 = 0 THEN NULL
       |      ELSE 'OPT' || CAST((p_partkey + i) % 5 AS VARCHAR) END
       |      AS option_name,
       |    CAST((p_partkey + i) % 4 AS INTEGER) AS product_type,
       |    CASE WHEN p_partkey % 13 = 0 THEN NULL
       |      ELSE 'SPC' || CAST(p_partkey % 500 AS VARCHAR) END
       |      AS seller_product_code,
       |    'SOC' || CAST((p_partkey * 10 + i) % 700 AS VARCHAR)
       |      AS seller_option_code,
       |    CAST(FLOOR(p_retailprice) AS BIGINT) AS sales_price,
       |    p_partkey % 20 * 100 AS option_price,
       |    DATE '1995-01-01' + CAST(p_partkey % 700 AS INTEGER)
       |      AS first_payment_dt,
       |    DATE '1995-01-01'
       |      + CAST(p_partkey % 700 + (p_partkey + i) % 60 AS INTEGER)
       |      AS last_payment_dt
       |  FROM part, (SELECT UNNEST([0, 1]) AS i) ii),
       |chl AS (
       |  SELECT * EXCLUDE (rn) FROM (
       |    SELECT n_nationkey % 7 AS channel_seq,
       |      'T' || CAST(n_nationkey % 5 AS VARCHAR) AS team_name,
       |      n_name AS brand_name,
       |      ROW_NUMBER() OVER (PARTITION BY n_nationkey % 7
       |        ORDER BY n_name) AS rn
       |    FROM nation)
       |  WHERE rn = 1),
       |pm AS (
       |  $pm),
       |prd AS (
       |  SELECT product_id AS m_product_id, sort_key AS m_sort_key
       |  FROM pm),
       |pt(code, label) AS (VALUES
       |  (0, '단품상품'), (1, '옵션상품'), (2, '추가상품')),
       |mx AS (
       |  SELECT MAX(prd.m_sort_key) AS mxv
       |  FROM opt LEFT JOIN prd ON opt.product_id = prd.m_product_id)
       |SELECT o.product_id, o.option_id, c.team_name, c.brand_name,
       |  o.product_name, o.option_name,
       |  pt.label AS product_type,
       |  o.seller_product_code, o.seller_option_code,
       |  o.sales_price, o.option_price,
       |  o.first_payment_dt, o.last_payment_dt,
       |  COALESCE(prd.m_sort_key,
       |    CAST(repeat('9', length(CAST(mx.mxv AS VARCHAR))) AS BIGINT))
       |    AS sort_key1,
       |  o.product_type AS sort_key2
       |FROM opt o
       |LEFT JOIN chl c ON o.channel_seq = c.channel_seq
       |LEFT JOIN prd ON o.product_id = prd.m_product_id
       |LEFT JOIN pt ON o.product_type = pt.code
       |CROSS JOIN mx""".stripMargin
  }
}
