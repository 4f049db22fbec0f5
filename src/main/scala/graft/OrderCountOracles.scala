package graft

/** DuckDB oracle SQL for the per-channel order-count models (q122-q124),
  * mirroring `graft.models.OrderCounts` stage for stage.
  */
private[graft] object OrderCountOracles {

  /** source('core','order_status') — mirrors OrderCounts.coreStatus. */
  private[graft] val coreStatusCte =
    """cst AS (
      |  SELECT
      |    CASE WHEN o_orderkey % 30 = 0 THEN
      |        (CASE WHEN o_orderkey % 60 = 0
      |          THEN 'X' || CAST(o_orderkey AS VARCHAR)
      |          ELSE CAST(o_orderkey AS VARCHAR) END)
      |      ELSE 'ORD' || CAST(o_orderkey AS VARCHAR) END AS order_id,
      |    CASE WHEN o_orderkey % 30 = 0 THEN '스마트스토어'
      |      ELSE '기타' END AS shop_name,
      |    CAST(o_orderkey % 4 + 1 AS INTEGER) AS order_status,
      |    CAST(o_orderdate AS DATE) AS order_date
      |  FROM orders WHERE o_orderkey % 6 = 0)""".stripMargin

  val q122: String =
    s"""WITH
       |$coreStatusCte,
       |ord AS (
       |  SELECT l.l_orderkey AS order_id,
       |    l.l_orderkey * 10 + l.l_linenumber AS product_order_id,
       |    l.l_suppkey % 7 AS channel_seq,
       |    CAST(200000 + (l.l_partkey * 7 + 3) % 500 AS VARCHAR) || '-' ||
       |      lpad(CAST(l.l_linenumber % 4 + 1 AS VARCHAR), 4, '0')
       |      AS option_id,
       |    CASE WHEN l.l_orderkey % 9 = 0 THEN 7
       |      ELSE CAST(l.l_orderkey % 3 AS INTEGER) END AS delivery_type,
       |    COALESCE(CASE WHEN l.l_orderkey % 13 = 0 THEN NULL
       |      ELSE CAST(l.l_quantity AS BIGINT) END, 0) AS order_quantity,
       |    CAST(o.o_orderdate AS DATE) AS order_date,
       |    ([0, 5, 6, 7, 8])
       |      [CAST((l.l_partkey + l.l_orderkey) % 5 AS INTEGER) + 1]
       |      AS smt_raw
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE CAST(o.o_orderdate AS DATE)
       |    BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
       |ssmt AS (SELECT product_order_id, MAX(smt_raw) AS status_smt
       |  FROM ord GROUP BY 1),
       |scor AS (
       |  SELECT CAST(order_id AS BIGINT) AS order_id,
       |    MAX(order_status) AS status_cor
       |  FROM cst
       |  WHERE order_date BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
       |    AND shop_name = '스마트스토어'
       |    AND regexp_matches(order_id, '^[0-9]+$$')
       |  GROUP BY 1),
       |rel AS (
       |  SELECT option_id,
       |    CASE WHEN p % 5 = 0 THEN
       |        CAST(100000 + p % 300 AS VARCHAR) || ':1,' ||
       |        CAST(900000 + p * 3 % 300 AS VARCHAR) || ':1'
       |      WHEN p % 5 = 1 THEN
       |        CAST(100000 + p * 7 % 300 AS VARCHAR) || ':2'
       |      END AS bundle_product_ids
       |  FROM (SELECT DISTINCT option_id,
       |      TRY_CAST(string_split(option_id, '-')[1] AS BIGINT) AS p
       |    FROM ord)
       |  WHERE p % 5 IN (0, 1)),
       |chl(channel_seq, brand_id) AS (VALUES
       |  (0, NULL), (1, '200201'), (2, '200202'), (3, NULL), (4, '200204'),
       |  (5, '200205'), (6, NULL)),
       |b AS (
       |  SELECT ord.order_id, ord.product_order_id,
       |    COALESCE(rel.bundle_product_ids, chl.brand_id, '200000')
       |      AS bundle,
       |    CASE WHEN scor.status_cor IS NOT NULL THEN scor.status_cor
       |      WHEN ssmt.status_smt = 7 THEN 1
       |      WHEN ssmt.status_smt = 5 THEN 2
       |      WHEN ssmt.status_smt IN (6, 8) THEN 3
       |      ELSE 0 END AS order_status,
       |    CASE WHEN ord.delivery_type = 7 THEN 7 ELSE 0 END
       |      AS delivery_type,
       |    ord.order_quantity, ord.order_date
       |  FROM ord
       |  LEFT JOIN rel USING (option_id)
       |  LEFT JOIN chl ON ord.channel_seq = chl.channel_seq
       |  LEFT JOIN ssmt USING (product_order_id)
       |  LEFT JOIN scor ON ord.order_id = scor.order_id),
       |e AS (
       |  SELECT order_id, product_order_id,
       |    string_split(component, ':')[1] AS product_id,
       |    CASE WHEN order_status = 0 AND substr(component, 1, 1) = '9'
       |      THEN 3 ELSE order_status END AS order_status,
       |    delivery_type, order_quantity, order_date
       |  FROM (SELECT *, UNNEST(string_split(bundle, ',')) AS component
       |        FROM b))
       |SELECT order_id, product_order_id, order_date, product_id,
       |  delivery_type, order_status,
       |  CAST(SUM(order_quantity) AS BIGINT) AS order_quantity
       |FROM e GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin

  val q123: String =
    s"""WITH
       |$coreStatusCte,
       |${ProductOracles.sbnOptCte},
       |ord AS (
       |  SELECT l.l_orderkey * 10 + l.l_linenumber AS order_seq,
       |    CASE WHEN l.l_orderkey % 29 = 0
       |      THEN '병원출고' || CAST(l.l_orderkey AS VARCHAR)
       |      ELSE 'ORD' || CAST(l.l_orderkey AS VARCHAR) END AS order_id,
       |    'ORD' || CAST(l.l_orderkey AS VARCHAR) || '-' ||
       |      CAST(l.l_linenumber AS VARCHAR) AS product_order_id,
       |    l.l_suppkey % 5 AS account_no,
       |    CAST(200000 + (l.l_partkey * 7 + 3) % 500 AS VARCHAR) || '-' ||
       |      lpad(CAST(l.l_linenumber % 4 + 1 AS VARCHAR), 4, '0')
       |      AS option_id,
       |    COALESCE(CASE WHEN l.l_orderkey % 17 = 0 THEN NULL
       |      ELSE CAST(l.l_quantity AS BIGINT) END, 0) AS order_quantity,
       |    CAST(l.l_quantity AS BIGINT) * 10 AS sku_quantity,
       |    CAST(o.o_orderdate AS DATE) AS order_date,
       |    ([7, 8, 9, 10, 11, 12, 21, 22, 23, 24, 25, 26, 999])
       |      [CAST((l.l_partkey * 3 + l.l_linenumber) % 13 AS INTEGER) + 1]
       |      AS inv_raw
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE CAST(o.o_orderdate AS DATE)
       |    BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
       |acc(account_no, shop_id) AS (VALUES
       |  (0, 'shop0055'), (1, 'shop0100'), (2, 'chop0022'), (3, 'shop0666'),
       |  (4, 'shop0200')),
       |inv AS (SELECT order_seq, MAX(inv_raw) AS sbn FROM ord GROUP BY 1),
       |scor AS (
       |  SELECT order_id, MAX(order_status) AS status_cor
       |  FROM cst
       |  WHERE order_date BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
       |    AND shop_name <> '스마트스토어'
       |  GROUP BY 1),
       |detail AS (
       |  SELECT ord.order_id, ord.product_order_id,
       |    CASE WHEN starts_with(ord.order_id, '병원출고') THEN 'chop9022'
       |      ELSE acc.shop_id END AS shop_id,
       |    string_split(ord.option_id, '-')[1] AS product_id,
       |    CASE
       |      WHEN ord.option_id = '200345-0001' AND ord.sku_quantity >= 100
       |        THEN '200330-0001:1'
       |      WHEN ord.option_id = '200377-0001' AND ord.sku_quantity >= 100
       |        THEN '200741-0001:1'
       |      WHEN opt.bundle_option_ids IS NULL THEN NULL
       |      WHEN opt.bundle_option_ids = '200345-0001:100'
       |        THEN '200330-0001:1'
       |      WHEN opt.bundle_option_ids = '200377-0001:100'
       |        THEN '200741-0001:1'
       |      ELSE opt.bundle_option_ids END AS bundle_option_ids,
       |    CASE WHEN scor.status_cor IS NOT NULL THEN scor.status_cor
       |      WHEN inv.sbn IN (9, 12, 25, 26) THEN 1
       |      WHEN inv.sbn IN (8, 11, 21, 22, 23, 24) THEN 2
       |      WHEN inv.sbn IN (7, 10, 999) THEN 3
       |      ELSE 0 END AS order_status,
       |    ord.order_quantity, ord.order_date
       |  FROM ord
       |  LEFT JOIN acc ON ord.account_no = acc.account_no
       |  LEFT JOIN opt ON ord.option_id = opt.option_id
       |  LEFT JOIN inv ON ord.order_seq = inv.order_seq
       |  LEFT JOIN scor ON ord.order_id = scor.order_id
       |  WHERE acc.shop_id NOT IN ('shop0055', 'chop0022', 'chop0027',
       |    'chop0028', 'chop0029')),
       |ruled AS (SELECT * FROM detail WHERE shop_id <> 'chop9022'),
       |nb AS (
       |  SELECT order_id, product_order_id, shop_id, product_id,
       |    order_status, order_quantity, order_date
       |  FROM ruled WHERE bundle_option_ids IS NULL),
       |ex AS (
       |  SELECT order_id, product_order_id, shop_id,
       |    string_split(component, '-')[1] AS product_id,
       |    order_status, order_quantity, order_date
       |  FROM (SELECT *, UNNEST(string_split(bundle_option_ids, ','))
       |          AS component
       |        FROM ruled WHERE bundle_option_ids IS NOT NULL))
       |SELECT order_id, product_order_id, order_date, product_id, shop_id,
       |  order_status, CAST(SUM(order_quantity) AS BIGINT) AS order_quantity
       |FROM (SELECT * FROM nb UNION ALL SELECT * FROM ex)
       |GROUP BY 1, 2, 3, 4, 5, 6""".stripMargin

  val q124: String =
    """WITH sales AS (
      |  SELECT 'CO' || CAST(l_orderkey AS VARCHAR) AS order_id,
      |    'CP' || CAST(l_partkey AS VARCHAR) || '-' ||
      |      CAST(l_linenumber % 3 AS VARCHAR) AS option_id,
      |    l_suppkey % 20 AS vendor_id,
      |    ([0, 1, 3, 6])
      |      [CAST((l_orderkey + l_partkey) % 4 AS INTEGER) + 1]
      |      AS settlement_type,
      |    CAST(l_quantity AS BIGINT) - 26 AS order_quantity,
      |    CAST(l_shipdate AS DATE) AS sales_date
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE)
      |    BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
      |rocket AS (
      |  SELECT order_id, option_id, vendor_id,
      |    MAX(settlement_type) AS order_status,
      |    CAST(SUM(order_quantity) AS BIGINT) AS order_quantity,
      |    MAX(sales_date) AS sales_date
      |  FROM sales GROUP BY 1, 2, 3),
      |rel AS (
      |  SELECT option_id,
      |    CASE WHEN p % 9 = 0 THEN
      |        CAST(900000 + p * 11 % 200 AS VARCHAR) || ':1'
      |      ELSE CAST(200000 + (p * 11 + 3) % 400 AS VARCHAR) || ':1'
      |      END AS bundle_product_ids
      |  FROM (SELECT DISTINCT option_id,
      |      CAST(regexp_extract(option_id, 'CP([0-9]+)-', 1) AS BIGINT) AS p
      |    FROM sales)
      |  WHERE p % 3 = 0),
      |vdr(vendor_id, bundle_brand_ids) AS (VALUES
      |  (0, NULL), (1, '200501'), (2, '200502'), (3, '200503'), (4, NULL),
      |  (5, '200505'), (6, '200506'), (7, '200507'), (8, NULL),
      |  (9, '200509'), (10, '200510'), (11, '200511'), (12, NULL),
      |  (13, '200513'), (14, '200514'), (15, '200515'), (16, NULL),
      |  (17, '200517'), (18, '200518'), (19, '200519')),
      |b AS (
      |  SELECT r.order_id,
      |    COALESCE(rel.bundle_product_ids, vdr.bundle_brand_ids, '200000')
      |      AS bundle,
      |    r.order_status, r.order_quantity, r.sales_date AS order_date
      |  FROM rocket r
      |  LEFT JOIN rel USING (option_id)
      |  LEFT JOIN vdr ON r.vendor_id = vdr.vendor_id
      |  WHERE r.sales_date BETWEEN DATE '1996-01-03' AND DATE '1996-06-26'
      |    AND r.order_quantity <> 0),
      |e AS (
      |  SELECT order_id, string_split(component, ':')[1] AS product_id,
      |    CASE WHEN order_status = 0 AND substr(component, 1, 1) = '9'
      |      THEN 6 ELSE LEAST(order_status, 3) END AS order_status,
      |    order_quantity, order_date
      |  FROM (SELECT *, UNNEST(string_split(bundle, ',')) AS component
      |        FROM b))
      |SELECT order_id, order_date, product_id, order_status,
      |  CAST(SUM(order_quantity) AS BIGINT) AS order_quantity
      |FROM e GROUP BY 1, 2, 3, 4""".stripMargin
}
