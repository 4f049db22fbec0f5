package graft

/** DuckDB oracle SQL for the report/relation marts (q114-q121), mirroring
  * `graft.models.ReportMarts` stage for stage.
  */
private[graft] object ReportOracles {

  /** The q98-style item dim over part — mirrors ReportMarts.itemDim. */
  private val pitemCte =
    """pitem AS (
      |  SELECT p_partkey AS product_id,
      |    'NA-' || lpad(CAST(p_partkey AS VARCHAR), 6, '0') || '-00' AS item_id,
      |    p_partkey % 97 AS item_seq,
      |    CASE WHEN p_partkey % 6 = 0 THEN NULL
      |      ELSE 'T' || CAST(p_partkey % 5 AS VARCHAR) END AS team_name,
      |    CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_brand END AS brand_name,
      |    string_split(p_type, ' ')[1] AS category_name1,
      |    p_brand AS category_name2,
      |    CASE WHEN p_partkey % 4 = 0 THEN NULL ELSE p_type END AS category_name3,
      |    'CTN' || CAST(p_partkey % 8 AS VARCHAR) AS category_name4,
      |    'COL' || CAST(p_partkey % 6 AS VARCHAR) AS color,
      |    p_name AS product_name,
      |    CASE WHEN p_partkey % 5 = 0 THEN NULL
      |      ELSE 'EA' || CAST(p_partkey % 4 AS VARCHAR) END AS unit_name,
      |    CASE WHEN p_partkey % 5 = 0 THEN NULL
      |      ELSE p_partkey % 3 + 1 END AS unit_scale
      |  FROM part)""".stripMargin

  /** The shared enrichment projection (profit_monthly / stock_cost_mom). */
  private val itemFallbacks =
    """COALESCE(i.item_id, 'NA-AAAAAA-00') AS item_id,
      |  COALESCE(i.item_seq, 99999999) AS item_seq,
      |  COALESCE(i.team_name, '담당팀 없음') AS team_name,
      |  COALESCE(i.brand_name, '브랜드 없음') AS brand_name,
      |  COALESCE(i.category_name1, '-') AS category_name1,
      |  COALESCE(i.category_name2, '-') AS category_name2,
      |  COALESCE(i.category_name3, '-') AS category_name3,
      |  COALESCE(i.category_name4, '-') AS category_name4,
      |  COALESCE(i.color, '-') AS color,
      |  COALESCE(i.product_name, '매칭 불가 상품') AS product_name,
      |  COALESCE(CASE WHEN i.unit_name IS NULL THEN i.category_name3
      |    ELSE i.category_name3 || ' (' || i.unit_name || ')' END, '-')
      |    AS category_unit_name""".stripMargin

  val q114: String = {
    val shopRows = (0 until 20).map(i =>
      s"('S$i', '${if (i % 3 == 0) "오픈마켓" else "자사몰"}', '샵$i')")
      .mkString(", ")
    s"""WITH
       |$pitemCte,
       |oc AS (
       |  SELECT o_orderkey AS order_id, o_orderstatus AS order_status,
       |    o_orderkey % 5 + 1 AS order_quantity,
       |    CAST(o_orderdate AS DATE) AS order_date
       |  FROM orders
       |  WHERE CAST(o_orderdate AS DATE)
       |    BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
       |f AS (
       |  SELECT *, order_id % 2000 + 1 AS product_id,
       |    'S' || CAST(order_id % 20 AS VARCHAR) AS shop_id,
       |    order_quantity AS sku_quantity,
       |    order_id % 10000 AS payment_amount,
       |    order_id * 3 % 5000 AS supply_cost,
       |    order_id % 30 * 100 AS delivery_fee,
       |    order_id * 7 % 1000 AS ad_cost
       |  FROM oc),
       |m AS (
       |  SELECT CAST(DATE_TRUNC('month', order_date) AS DATE) AS order_ym,
       |    product_id, shop_id, order_status,
       |    CAST(SUM(sku_quantity) AS BIGINT) AS sku_quantity,
       |    CAST(SUM(payment_amount) AS BIGINT) AS payment_amount,
       |    CAST(SUM(supply_cost) AS BIGINT) AS supply_cost,
       |    CAST(SUM(delivery_fee) AS BIGINT) AS delivery_fee,
       |    CAST(SUM(payment_amount - supply_cost) AS BIGINT) AS margin_amount,
       |    CAST(SUM(ad_cost) AS BIGINT) AS ad_cost,
       |    CAST(SUM(payment_amount - supply_cost - delivery_fee - ad_cost)
       |      AS BIGINT) AS profit,
       |    MIN(order_date) AS order_start_date,
       |    MAX(order_date) AS order_end_date
       |  FROM f GROUP BY 1, 2, 3, 4),
       |shop(shop_id, shop_group, shop_alias) AS (VALUES $shopRows),
       |st(code, label) AS (VALUES ('O', '주문'), ('F', '완료'), ('P', '대기'))
       |SELECT m.product_id,
       |  $itemFallbacks,
       |  m.shop_id,
       |  COALESCE(shop.shop_group, '-') AS shop_group,
       |  COALESCE(shop.shop_alias, '-') AS shop_name,
       |  COALESCE(st.label, '알 수 없음') AS order_status,
       |  COALESCE(m.sku_quantity * COALESCE(i.unit_scale, 1), 0)
       |    AS unit_quantity,
       |  m.sku_quantity, m.payment_amount, m.supply_cost, m.delivery_fee,
       |  m.margin_amount, m.ad_cost, m.profit,
       |  m.order_start_date, m.order_end_date, m.order_ym
       |FROM m
       |LEFT JOIN pitem i ON m.product_id = i.product_id
       |LEFT JOIN shop ON m.shop_id = shop.shop_id
       |LEFT JOIN st ON m.order_status = st.code""".stripMargin
  }

  val q115: String =
    s"""WITH
       |$pitemCte,
       |qty AS (
       |  SELECT l_partkey AS product_code, CAST(l_shipdate AS DATE) AS ymd,
       |    ([10, 20, 30])[CAST(l_orderkey % 3 AS INTEGER) + 1] AS batch,
       |    CAST(l_quantity AS BIGINT) AS stock_qty
       |  FROM lineitem),
       |eco AS (
       |  SELECT product_code, string_split(option_id, '-')[1] AS product_id,
       |    org_price
       |  FROM (
       |    SELECT p_partkey AS product_code,
       |      CASE WHEN p_partkey % 15 = 0 THEN NULL
       |        WHEN p_partkey % 15 = 7 THEN ''
       |        ELSE CAST(p_partkey AS VARCHAR) || '-0001' END AS option_id,
       |      CAST(FLOOR(p_retailprice) AS BIGINT) AS org_price
       |    FROM part)
       |  WHERE COALESCE(option_id, '') <> ''),
       |win AS (
       |  SELECT q.*, e.product_id, e.org_price
       |  FROM qty q LEFT JOIN eco e USING (product_code)
       |  WHERE q.ymd BETWEEN
       |    CAST(DATE_TRUNC('month', DATE '1996-06-30' - INTERVAL 3 MONTH)
       |      AS DATE) AND DATE '1996-06-30'),
       |sel AS (
       |  SELECT * FROM (
       |    SELECT *,
       |      MAX(ymd) OVER (PARTITION BY DATE_TRUNC('month', ymd)) AS mx_ymd,
       |      MAX(batch) OVER (PARTITION BY ymd) AS mx_b
       |    FROM win)
       |  WHERE ymd = mx_ymd AND batch = mx_b),
       |scm AS (
       |  SELECT stock_ymd, product_id,
       |    CAST(SUM(stock_cost) AS BIGINT) AS stock_cost,
       |    CAST(DATE_TRUNC('month', stock_ymd) AS DATE) AS order_ym
       |  FROM (
       |    SELECT COALESCE(product_id, '200000') AS product_id,
       |      COALESCE(org_price, 0) * COALESCE(stock_qty, 0) AS stock_cost,
       |      ymd AS stock_ymd
       |    FROM sel)
       |  GROUP BY 1, 2),
       |sales AS (
       |  SELECT CAST(o_orderkey % 2000 + 1 AS VARCHAR) AS product_id,
       |    CAST(o_orderdate AS DATE) AS order_date
       |  FROM orders),
       |dsr AS (
       |  SELECT DISTINCT product_id, DATE '1996-06-30' AS stock_ymd,
       |    DATE '1996-06-01' AS order_ym
       |  FROM sales
       |  WHERE order_date BETWEEN DATE '1996-04-01' AND DATE '1996-06-30'),
       |lb AS (
       |  SELECT DISTINCT product_id, LAST_DAY(order_date) AS stock_ymd,
       |    CAST(DATE_TRUNC('month', order_date) AS DATE) AS order_ym
       |  FROM sales
       |  WHERE order_date BETWEEN DATE '1996-03-01' AND DATE '1996-05-31'),
       |scaffold AS (SELECT * FROM dsr UNION SELECT * FROM lb),
       |me AS (SELECT DISTINCT order_ym, stock_ymd AS month_stock_ymd FROM scm),
       |hs AS (SELECT DISTINCT product_id, order_ym FROM scm),
       |fb AS (
       |  SELECT s.product_id, CAST(0 AS BIGINT) AS stock_cost,
       |    COALESCE(me.month_stock_ymd, s.stock_ymd) AS stock_ymd, s.order_ym
       |  FROM scaffold s
       |  LEFT JOIN hs ON s.product_id = hs.product_id
       |    AND s.order_ym = hs.order_ym
       |  LEFT JOIN me ON s.order_ym = me.order_ym
       |  WHERE hs.product_id IS NULL),
       |fact AS (
       |  SELECT product_id, stock_cost, stock_ymd, order_ym FROM scm
       |  UNION ALL SELECT * FROM fb),
       |dow(dw, name_ko) AS (VALUES (1, '(일)'), (2, '(월)'), (3, '(화)'),
       |  (4, '(수)'), (5, '(목)'), (6, '(금)'), (7, '(토)'))
       |SELECT fact.product_id,
       |  $itemFallbacks,
       |  fact.stock_cost, fact.stock_ymd, fact.order_ym,
       |  '[ ' || strftime(fact.stock_ymd, '%y/%m/%d') || d.name_ko || ' ]'
       |    AS stock_date_label
       |FROM fact
       |LEFT JOIN (SELECT *, CAST(product_id AS VARCHAR) AS pid_s FROM pitem) i
       |  ON fact.product_id = i.pid_s
       |LEFT JOIN dow d ON dayofweek(fact.stock_ymd) + 1 = d.dw""".stripMargin

  /** stock_time_batch CTE (mirrors the q96 model). */
  private val stbCte =
    """stb AS (
      |  SELECT ymd, batch, MAX(updated_at) AS max_updated_at,
      |    MAX(CASE WHEN group_id = 0 THEN updated_at END)
      |      AS ecount_max_updated_at,
      |    MAX(CASE WHEN group_id = 1 THEN updated_at END)
      |      AS cj_eflexs_max_updated_at,
      |    MAX(CASE WHEN group_id = 2 THEN updated_at END)
      |      AS coupang_rfm_max_updated_at
      |  FROM (
      |    SELECT CAST(ts AS DATE) AS ymd,
      |      CASE WHEN hour(ts) < 17 THEN 10 ELSE 20 END AS batch,
      |      CAST(user_id % 3 AS INTEGER) AS group_id, ts AS updated_at
      |    FROM events)
      |  GROUP BY ymd, batch)""".stripMargin

  val q116: String =
    s"""WITH
       |$stbCte,
       |prim AS (
       |  SELECT ymd AS report_date, batch AS report_batch,
       |    ymd - 30 AS order_start_date, ymd - 1 AS order_end_date,
       |    max_updated_at, ecount_max_updated_at, cj_eflexs_max_updated_at,
       |    coupang_rfm_max_updated_at
       |  FROM stb
       |  WHERE ymd = DATE '2024-01-31'
       |    AND batch = (SELECT MAX(batch) FROM stb
       |                 WHERE ymd = DATE '2024-01-31')),
       |fall AS (
       |  SELECT ymd AS report_date, batch AS report_batch,
       |    ymd - 30 AS order_start_date, ymd - 1 AS order_end_date,
       |    max_updated_at, ecount_max_updated_at, cj_eflexs_max_updated_at,
       |    coupang_rfm_max_updated_at
       |  FROM stb
       |  WHERE ymd = DATE '2024-01-30'
       |    AND batch = (SELECT MAX(batch) FROM stb
       |                 WHERE ymd = DATE '2024-01-30'))
       |SELECT * FROM prim
       |UNION ALL
       |SELECT * FROM fall WHERE NOT EXISTS (SELECT 1 FROM prim)""".stripMargin

  val q117: String =
    """WITH
      |cat2 AS (
      |  SELECT category_id, category_id % 5 AS category_id1,
      |    category_id % 25 AS category_id2, category_id % 100 AS category_id3,
      |    category_id AS category_id4,
      |    CAST(category_id % 4 + 1 AS INTEGER) AS depth
      |  FROM (SELECT DISTINCT p_partkey % 200 AS category_id FROM part)),
      |grp(mapping_seq, group_id, mapping_id, mapping_keyword, mapping_depth)
      |  AS (VALUES
      |  (1, 'G-A', 7, NULL, 4), (2, 'G-B', 19, 'al', 4),
      |  (3, 'G-C', 55, NULL, 3), (4, 'G-D', 31, 'an', 3),
      |  (5, 'G-E', 77, NULL, 3), (6, 'G-F', 13, NULL, 2),
      |  (7, 'G-G', 21, 're', 2), (8, 'G-H', 2, NULL, 1),
      |  (9, 'G-I', 4, 'ol', 1), (10, 'G-J', 3, NULL, 1)),
      |smt AS (
      |  SELECT p.p_partkey AS product_id, p.p_name AS product_name,
      |    c.category_id, c.category_id1, c.category_id2, c.category_id3,
      |    c.category_id4, c.depth AS category_depth
      |  FROM (
      |    SELECT p_partkey, p_name,
      |      CASE WHEN p_partkey % 17 = 0 THEN NULL
      |        ELSE p_partkey % 200 END AS cid0,
      |      p_partkey % 100 AS cid3f
      |    FROM part) p
      |  JOIN cat2 c ON COALESCE(p.cid0, p.cid3f) = c.category_id),
      |stk AS (
      |  SELECT s.product_id,
      |    'STK ' || CAST(s.product_id % 9 AS VARCHAR) AS product_name,
      |    c.category_id, c.category_id1, c.category_id2, c.category_id3,
      |    c.category_id4, c.depth AS category_depth
      |  FROM (SELECT DISTINCT 400000 + o_orderkey % 300 AS product_id
      |        FROM orders) s
      |  JOIN cat2 c ON s.product_id % 200 = c.category_id),
      |prd AS (SELECT * FROM smt UNION ALL SELECT * FROM stk),
      |d4 AS (
      |  SELECT p.*, g.group_id AS g, g.mapping_seq AS sq
      |  FROM prd p
      |  LEFT JOIN (SELECT * FROM grp WHERE mapping_depth = 4) g
      |    ON p.category_depth = 4 AND p.category_id4 = g.mapping_id
      |      AND (g.mapping_keyword IS NULL OR
      |        strpos(lower(p.product_name), lower(trim(g.mapping_keyword))) > 0)),
      |d3 AS (
      |  SELECT p.* EXCLUDE (g, sq), COALESCE(p.g, g2.group_id) AS g,
      |    COALESCE(p.sq, g2.mapping_seq) AS sq
      |  FROM d4 p
      |  LEFT JOIN (SELECT * FROM grp WHERE mapping_depth = 3) g2
      |    ON p.g IS NULL AND p.category_depth >= 3
      |      AND p.category_id3 = g2.mapping_id
      |      AND (g2.mapping_keyword IS NULL OR
      |        strpos(lower(p.product_name), lower(trim(g2.mapping_keyword))) > 0)),
      |d2 AS (
      |  SELECT p.* EXCLUDE (g, sq), COALESCE(p.g, g2.group_id) AS g,
      |    COALESCE(p.sq, g2.mapping_seq) AS sq
      |  FROM d3 p
      |  LEFT JOIN (SELECT * FROM grp WHERE mapping_depth = 2) g2
      |    ON p.g IS NULL AND p.category_depth >= 2
      |      AND p.category_id2 = g2.mapping_id
      |      AND (g2.mapping_keyword IS NULL OR
      |        strpos(lower(p.product_name), lower(trim(g2.mapping_keyword))) > 0)),
      |d1 AS (
      |  SELECT p.* EXCLUDE (g, sq), COALESCE(p.g, g2.group_id) AS g,
      |    COALESCE(p.sq, g2.mapping_seq) AS sq
      |  FROM d2 p
      |  LEFT JOIN (SELECT * FROM grp WHERE mapping_depth = 1) g2
      |    ON p.g IS NULL AND p.category_id1 = g2.mapping_id
      |      AND (g2.mapping_keyword IS NULL OR
      |        strpos(lower(p.product_name), lower(trim(g2.mapping_keyword))) > 0))
      |SELECT product_id, category_id, group_id FROM (
      |  SELECT product_id, category_id, g AS group_id,
      |    ROW_NUMBER() OVER (PARTITION BY product_id
      |      ORDER BY sq NULLS LAST, g) AS rn
      |  FROM d1 WHERE g IS NOT NULL)
      |WHERE rn = 1""".stripMargin

  val q118: String =
    """WITH rel AS (
      |  SELECT 'SMT' || CAST(p_partkey AS VARCHAR) AS product_id,
      |    CASE WHEN p_partkey % 7 = 0 THEN '100081,100088'
      |      WHEN p_partkey % 7 = 1 THEN '100088'
      |      ELSE CAST(100000 + p_partkey % 80 AS VARCHAR) || ',' ||
      |        CAST(100100 + p_partkey * 3 % 80 AS VARCHAR) END
      |      AS bundle_product_ids
      |  FROM part),
      |flagged AS (
      |  SELECT *, list_contains(string_split(bundle_product_ids, ','),
      |    '100088') AS has_sentinel
      |  FROM rel)
      |SELECT product_id, bundle_product_ids, start_date, end_date FROM (
      |  SELECT product_id, bundle_product_ids,
      |    DATE '1990-01-01' AS start_date, DATE '2999-12-31' AS end_date
      |  FROM flagged WHERE NOT has_sentinel
      |  UNION ALL
      |  SELECT product_id, bundle_product_ids,
      |    DATE '1990-01-01', DATE '1996-06-09'
      |  FROM flagged WHERE has_sentinel
      |  UNION ALL
      |  SELECT product_id,
      |    CASE WHEN bundle_product_ids = '100088'
      |      THEN '100081,100082,100083,100084,100085,100086,100087'
      |      ELSE NULLIF(array_to_string(list_filter(
      |        string_split(bundle_product_ids, ','), x -> x <> '100088'),
      |        ','), '') END,
      |    DATE '1996-06-10', DATE '2999-12-31'
      |  FROM flagged WHERE has_sentinel)
      |WHERE start_date <= end_date""".stripMargin

  val q119: String =
    """WITH rep AS (
      |  SELECT o_orderkey % 40 AS campaign_id,
      |    o_orderkey % 500 + 1 AS expose_count,
      |    o_orderkey * 3 % 300 + 1 AS impression_count,
      |    o_orderkey % 50 AS click_count,
      |    o_orderkey * 7 % 90000 AS ad_cost,
      |    o_orderkey % 5 AS conv_count,
      |    CAST(o_orderdate AS DATE) AS ymd
      |  FROM orders
      |  WHERE CAST(o_orderdate AS DATE)
      |    BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'),
      |rel AS (
      |  SELECT n_nationkey * 3 % 40 AS campaign_id,
      |    CAST(100000 + n_nationkey % 50 AS VARCHAR) || ',' ||
      |      CAST(100050 + n_nationkey * 7 % 50 AS VARCHAR)
      |      AS bundle_product_ids,
      |    DATE '1995-01-01' AS start_date,
      |    DATE '1995-01-01' + CAST(n_nationkey * 200 AS INTEGER) AS end_date
      |  FROM nation),
      |daily AS (
      |  SELECT r.campaign_id,
      |    COALESCE(rel.bundle_product_ids, '200000') AS bundle_product_ids,
      |    r.expose_count, r.impression_count, r.click_count, r.ad_cost,
      |    r.conv_count, r.ymd
      |  FROM rep r
      |  LEFT JOIN rel ON r.campaign_id = rel.campaign_id
      |    AND r.ymd BETWEEN rel.start_date AND rel.end_date),
      |reagg AS (
      |  SELECT ymd, campaign_id,
      |    ANY_VALUE(bundle_product_ids) AS bundle_product_ids,
      |    CAST(SUM(expose_count) AS BIGINT) AS expose_count,
      |    CAST(SUM(impression_count) AS BIGINT) AS impression_count,
      |    CAST(SUM(click_count) AS BIGINT) AS click_count,
      |    CAST(SUM(ad_cost) AS BIGINT) AS ad_cost,
      |    CAST(SUM(conv_count) AS BIGINT) AS conv_count
      |  FROM daily GROUP BY ymd, campaign_id),
      |expl AS (
      |  SELECT campaign_id, ymd, expose_count, impression_count, click_count,
      |    ad_cost, conv_count,
      |    CAST(len(string_split(bundle_product_ids, ',')) AS BIGINT) AS cnt,
      |    UNNEST(string_split(bundle_product_ids, ',')) AS component,
      |    UNNEST(range(0, len(string_split(bundle_product_ids, ',')))) AS off
      |  FROM reagg),
      |ren(pnew, pold, rdate) AS (VALUES
      |  ('100003', '100503', DATE '1996-03-01'),
      |  ('100017', '100517', DATE '1996-07-01'),
      |  ('100061', '100561', DATE '1996-05-01'))
      |SELECT e.campaign_id,
      |  COALESCE(ren.pold, e.component) AS product_id,
      |  e.expose_count // e.cnt +
      |    (CASE WHEN e.off = 0 THEN e.expose_count % e.cnt ELSE 0 END)
      |    AS expose_count,
      |  e.impression_count // e.cnt +
      |    (CASE WHEN e.off = 0 THEN e.impression_count % e.cnt ELSE 0 END)
      |    AS impression_count,
      |  e.click_count // e.cnt +
      |    (CASE WHEN e.off = 0 THEN e.click_count % e.cnt ELSE 0 END)
      |    AS click_count,
      |  e.ad_cost // e.cnt +
      |    (CASE WHEN e.off = 0 THEN e.ad_cost % e.cnt ELSE 0 END) AS ad_cost,
      |  e.conv_count // e.cnt +
      |    (CASE WHEN e.off = 0 THEN e.conv_count % e.cnt ELSE 0 END)
      |    AS conv_count,
      |  e.ymd
      |FROM expl e
      |LEFT JOIN ren ON e.component = ren.pnew AND e.ymd < ren.rdate"""
      .stripMargin

  val q120: String =
    """WITH lois AS (
      |  SELECT REPLACE('LP-' || CAST(o_orderkey AS VARCHAR), '-', '')
      |      AS invoice_no,
      |    COALESCE(CASE WHEN o_orderkey % 11 = 0 THEN NULL
      |      ELSE 'ORD' || CAST(o_orderkey AS VARCHAR) END, 'none')
      |      AS order_id,
      |    o_orderkey % 5000 AS delivery_fee, 0 AS box_cost
      |  FROM orders
      |  WHERE o_orderkey % 2 = 0 AND CAST(o_orderdate AS DATE)
      |    BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
      |ef AS (
      |  SELECT 'EF' || CAST(o_orderkey AS VARCHAR) AS invoice_no,
      |    'ORD' || CAST(o_orderkey AS VARCHAR) AS order_id,
      |    o_orderkey % 3000 AS delivery_fee, o_orderkey % 700 AS box_cost
      |  FROM orders
      |  WHERE o_orderkey % 3 = 0 AND CAST(o_orderdate AS DATE)
      |    BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
      |pi AS (
      |  SELECT invoice_no, order_id,
      |    CAST(SUM(delivery_fee) AS BIGINT) AS delivery_fee,
      |    CAST(SUM(box_cost) AS BIGINT) AS box_cost
      |  FROM (SELECT * FROM lois UNION ALL SELECT * FROM ef)
      |  GROUP BY invoice_no, order_id)
      |SELECT invoice_no,
      |  CAST(SUM(delivery_fee) AS BIGINT) AS delivery_fee,
      |  CAST(SUM(box_cost) AS BIGINT) AS box_cost
      |FROM pi GROUP BY invoice_no""".stripMargin

  val q121: String =
    """WITH qty AS (
      |  SELECT l_partkey AS product_code, CAST(l_shipdate AS DATE) AS ymd,
      |    ([10, 20, 30])[CAST(l_orderkey % 3 AS INTEGER) + 1] AS batch,
      |    CAST(l_quantity AS BIGINT) AS stock_qty
      |  FROM lineitem),
      |prim AS (
      |  SELECT product_code, batch,
      |    CAST(SUM(stock_qty) AS BIGINT) AS stock_qty,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    DATE '1996-06-15' AS report_date
      |  FROM qty
      |  WHERE ymd = DATE '1996-06-15'
      |    AND batch = (SELECT MAX(batch) FROM qty
      |                 WHERE ymd = DATE '1996-06-15')
      |  GROUP BY product_code, batch),
      |fall AS (
      |  SELECT product_code, batch,
      |    CAST(SUM(stock_qty) AS BIGINT) AS stock_qty,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    DATE '1996-06-14' AS report_date
      |  FROM qty
      |  WHERE ymd = DATE '1996-06-14'
      |    AND batch = (SELECT MAX(batch) FROM qty
      |                 WHERE ymd = DATE '1996-06-14')
      |  GROUP BY product_code, batch)
      |SELECT * FROM prim
      |UNION ALL
      |SELECT * FROM fall WHERE NOT EXISTS (SELECT 1 FROM prim)""".stripMargin
}
