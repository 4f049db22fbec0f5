package graft

/** DuckDB oracle for the smartstore sales-daily mart (q239), mirroring
  * `graft.models.SmtSales` stage for stage — the fixture CTEs shared with
  * q122's order-count oracle, the CJ CTEs shared with q128's, both
  * allocation stages in `Allocation.weightedAllocate`'s exact arithmetic.
  */
private[graft] object SmtSalesOracle {

  val q239: String =
    s"""WITH
       |${OrderCountOracles.coreStatusCte},
       |dlvraw(delivery_group, min_unit_raw, tier_fee, extra_cost,
       |       n_arrival_fee, n_arrival_add) AS (VALUES
       |  ('G0', 10, 3000, 950, 2500, 100),
       |  ('G0', NULL, 2500, 900, 3000, 150),
       |  ('G0', 50, 3500, 800, 2000, 120),
       |  ('G1', 20, 4000, 600, 4500, 200),
       |  ('G1', NULL, 2000, 1000, 1800, 80),
       |  ('G2', 5, 5000, 500, 5200, 260)),
       |dlv AS (
       |  SELECT delivery_group,
       |    COALESCE(min_unit_raw, 1) AS min_unit,
       |    CASE WHEN MAX(min_unit_raw) OVER (PARTITION BY delivery_group)
       |        = min_unit_raw THEN 9999
       |      ELSE LEAD(min_unit_raw) OVER (PARTITION BY delivery_group
       |        ORDER BY min_unit_raw ASC NULLS FIRST) END AS max_unit,
       |    tier_fee, extra_cost, n_arrival_fee, n_arrival_add
       |  FROM dlvraw),
       |eco AS (
       |  SELECT string_split(option_id, '-')[1] AS product_id,
       |    org_price AS eco_org
       |  FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY option_id
       |      ORDER BY expiration_date ASC, product_code DESC) AS rn
       |    FROM (
       |      SELECT CAST(200000 + (p_partkey * 7 + 3) % 500 AS VARCHAR)
       |          || '-' || lpad(CAST(p_partkey % 4 + 1 AS VARCHAR), 4, '0')
       |          AS option_id,
       |        DATE '1995-01-01' + CAST(p_partkey % 50 AS INTEGER)
       |          AS expiration_date,
       |        p_partkey AS product_code,
       |        CAST(FLOOR(p_retailprice) AS BIGINT) * 2 // 3 AS org_price
       |      FROM part)
       |    WHERE substr(option_id, length(option_id) - 4, 5) = '-0001')
       |  WHERE rn = 1),
       |itm AS (
       |  SELECT * EXCLUDE (rn, seq) FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY product_id
       |      ORDER BY seq) AS rn
       |    FROM (
       |      SELECT CAST(200000 + (p_partkey * 7 + 3) % 500 AS VARCHAR)
       |          AS product_id,
       |        CASE WHEN p_partkey % 6 = 0 THEN NULL
       |          ELSE CAST(FLOOR(p_retailprice) AS BIGINT) END AS itm_org,
       |        CASE WHEN p_partkey % 4 = 0 THEN NULL
       |          ELSE p_partkey % 200 END AS extra_cost,
       |        CASE WHEN p_partkey % 5 = 0 THEN NULL
       |          ELSE 'G' || CAST(p_partkey % 3 AS VARCHAR) END
       |          AS delivery_group,
       |        CASE WHEN p_partkey % 7 = 0 THEN NULL
       |          ELSE p_partkey % 3 * 1500 END AS itm_delivery_fee,
       |        p_partkey AS seq
       |      FROM part))
       |  WHERE rn = 1),
       |unitdim(product_id, unit) AS (VALUES
       |  ('200036', 100), ('200119', 100), ('200222', 100)),
       |ordraw AS (
       |  SELECT l.l_orderkey AS order_id,
       |    l.l_orderkey * 10 + l.l_linenumber AS product_order_id,
       |    l.l_suppkey % 7 AS channel_seq,
       |    CAST(200000 + (l.l_partkey * 7 + 3) % 500 AS VARCHAR) || '-' ||
       |      lpad(CAST(l.l_linenumber % 4 + 1 AS VARCHAR), 4, '0')
       |      AS option_id,
       |    CASE WHEN l.l_orderkey % 9 = 0 THEN 7
       |      ELSE CAST(l.l_orderkey % 3 AS INTEGER) END AS delivery_type_raw,
       |    COALESCE(CASE WHEN l.l_orderkey % 13 = 0 THEN NULL
       |      ELSE CAST(l.l_quantity AS BIGINT) END, 0) AS order_quantity,
       |    CASE WHEN l.l_orderkey % 23 = 0 THEN NULL
       |      ELSE CAST(FLOOR(l.l_extendedprice / 10) AS BIGINT) END
       |      AS unit_price,
       |    CASE WHEN l.l_orderkey % 11 = 0 THEN NULL
       |      ELSE l.l_partkey % 900 END AS option_price,
       |    CASE WHEN l.l_orderkey % 7 = 0
       |      THEN CAST(FLOOR(l.l_extendedprice / 100) AS BIGINT)
       |      ELSE NULL END AS seller_discount_amount,
       |    COALESCE(CASE WHEN l.l_orderkey % 19 = 0 THEN NULL
       |      ELSE CAST(FLOOR(l.l_extendedprice / 12) AS BIGINT) END, 0)
       |      AS supply_amount,
       |    CASE WHEN l.l_orderkey % 2 = 0
       |        THEN 'LP' || CAST(l.l_orderkey AS VARCHAR)
       |      WHEN l.l_orderkey % 3 = 0
       |        THEN 'EF' || CAST(l.l_orderkey AS VARCHAR)
       |      ELSE NULL END AS invoice_no_raw,
       |    ([0, 5, 6, 7, 8])
       |      [CAST((l.l_partkey + l.l_orderkey) % 5 AS INTEGER) + 1]
       |      AS smt_raw,
       |    CAST(o.o_orderdate AS DATE) AS order_date
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE CAST(o.o_orderdate AS DATE)
       |    BETWEEN DATE '1996-02-01' AND DATE '1996-04-30'),
       |ssmt AS (SELECT product_order_id, MAX(smt_raw) AS status_smt
       |  FROM ordraw GROUP BY 1),
       |scor AS (
       |  SELECT CAST(order_id AS BIGINT) AS order_id,
       |    MAX(order_status) AS status_cor
       |  FROM cst
       |  WHERE order_date BETWEEN DATE '1996-02-01' AND DATE '1996-04-30'
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
       |    FROM ordraw)
       |  WHERE p % 5 IN (0, 1)),
       |chl(channel_seq, brand_id) AS (VALUES
       |  (0, NULL), (1, '200201'), (2, '200202'), (3, NULL), (4, '200204'),
       |  (5, '200205'), (6, NULL)),
       |b AS (
       |  SELECT o.order_id, o.product_order_id,
       |    COALESCE(o.invoice_no_raw, '-') AS invoice_no,
       |    COALESCE(rel.bundle_product_ids, chl.brand_id, '200000')
       |      AS bundle_product_ids,
       |    CASE WHEN o.delivery_type_raw = 7 THEN 7 ELSE 0 END
       |      AS delivery_type,
       |    CASE WHEN scor.status_cor IS NOT NULL THEN scor.status_cor
       |      WHEN ssmt.status_smt = 7 THEN 1
       |      WHEN ssmt.status_smt = 5 THEN 2
       |      WHEN ssmt.status_smt IN (6, 8) THEN 3
       |      ELSE 0 END AS order_status,
       |    o.order_quantity,
       |    (COALESCE(o.unit_price, 0) + COALESCE(o.option_price, 0))
       |      * o.order_quantity
       |      - COALESCE(o.seller_discount_amount, 0) AS payment_amount,
       |    o.supply_amount, o.order_date
       |  FROM ordraw o
       |  LEFT JOIN rel USING (option_id)
       |  LEFT JOIN chl ON o.channel_seq = chl.channel_seq
       |  LEFT JOIN ssmt USING (product_order_id)
       |  LEFT JOIN scor ON o.order_id = scor.order_id),
       |ex AS (
       |  SELECT order_id, product_order_id, invoice_no,
       |    string_split(bundle_product, ':')[1] AS product_id,
       |    delivery_type,
       |    CASE WHEN order_status = 0 AND substr(bundle_product, 1, 1) = '9'
       |      THEN 6 ELSE order_status END AS order_status,
       |    COALESCE(TRY_CAST(string_split(bundle_product, ':')[2] AS BIGINT),
       |      1) * order_quantity AS sku_quantity,
       |    payment_amount, supply_amount, order_date
       |  FROM (SELECT *, UNNEST(string_split(bundle_product_ids, ','))
       |          AS bundle_product
       |        FROM b)),
       |costed AS (
       |  SELECT u.order_id, u.product_order_id, u.invoice_no, u.product_id,
       |    u.delivery_type, u.order_status, u.sku_quantity,
       |    u.payment_amount, u.supply_amount,
       |    COALESCE(e.eco_org, i.itm_org, 0) + COALESCE(i.extra_cost, 0)
       |      AS org_price,
       |    COALESCE(i.delivery_group, '-') AS delivery_group,
       |    COALESCE(i.itm_delivery_fee, 0) AS item_delivery_fee,
       |    u.order_date,
       |    CASE WHEN u.order_status = 6 THEN 0
       |      ELSE (COALESCE(e.eco_org, i.itm_org, 0)
       |        + COALESCE(i.extra_cost, 0)) * u.sku_quantity END
       |      AS cost_amount
       |  FROM ex u
       |  LEFT JOIN eco e ON u.product_id = e.product_id
       |  LEFT JOIN itm i ON u.product_id = i.product_id),
       |m30 AS (
       |  SELECT *,
       |    CAST(SUM(cost_amount) OVER (PARTITION BY product_order_id)
       |      AS BIGINT) AS cs,
       |    ROW_NUMBER() OVER (PARTITION BY product_order_id
       |      ORDER BY product_id, sku_quantity, order_status,
       |        payment_amount, supply_amount) AS rn
       |  FROM costed),
       |m31 AS (
       |  SELECT *,
       |    COALESCE(ROUND(CAST(CAST(payment_amount * cost_amount AS DOUBLE)
       |      / CAST(NULLIF(cs, 0) AS DOUBLE) AS DECIMAL(38,10)), 0), 0)
       |      AS pay_raw,
       |    COALESCE(ROUND(CAST(CAST(supply_amount * cost_amount AS DOUBLE)
       |      / CAST(NULLIF(cs, 0) AS DOUBLE) AS DECIMAL(38,10)), 0), 0)
       |      AS sup_raw
       |  FROM m30),
       |alloc3 AS (
       |  SELECT order_id, invoice_no, product_id, delivery_type,
       |    order_status, sku_quantity,
       |    CAST(CASE WHEN rn = 1
       |      THEN CAST(payment_amount AS DECIMAL(38,0))
       |        - SUM(pay_raw) OVER (PARTITION BY product_order_id) + pay_raw
       |      ELSE pay_raw END AS BIGINT) AS payment_amount,
       |    CAST(CASE WHEN rn = 1
       |      THEN CAST(supply_amount AS DECIMAL(38,0))
       |        - SUM(sup_raw) OVER (PARTITION BY product_order_id) + sup_raw
       |      ELSE sup_raw END AS BIGINT) AS supply_amount,
       |    org_price, delivery_group, item_delivery_fee, order_date,
       |    cost_amount
       |  FROM m31),
       |cjlois AS (
       |  SELECT REPLACE('LP-' || CAST(o_orderkey AS VARCHAR), '-', '')
       |      AS invoice_no,
       |    COALESCE(CASE WHEN o_orderkey % 11 = 0 THEN NULL
       |      ELSE 'ORD' || CAST(o_orderkey AS VARCHAR) END, 'none')
       |      AS order_id,
       |    o_orderkey % 5000 AS delivery_fee, 0 AS box_cost
       |  FROM orders
       |  WHERE o_orderkey % 2 = 0 AND CAST(o_orderdate AS DATE)
       |    BETWEEN DATE '1996-01-25' AND DATE '1996-05-07'),
       |cjef AS (
       |  SELECT 'EF' || CAST(o_orderkey AS VARCHAR) AS invoice_no,
       |    'ORD' || CAST(o_orderkey AS VARCHAR) AS order_id,
       |    o_orderkey % 3000 AS delivery_fee, o_orderkey % 700 AS box_cost
       |  FROM orders
       |  WHERE o_orderkey % 3 = 0 AND CAST(o_orderdate AS DATE)
       |    BETWEEN DATE '1996-01-25' AND DATE '1996-05-07'),
       |cjpi AS (
       |  SELECT invoice_no, order_id,
       |    CAST(SUM(delivery_fee) AS BIGINT) AS delivery_fee,
       |    CAST(SUM(box_cost) AS BIGINT) AS box_cost
       |  FROM (SELECT * FROM cjlois UNION ALL SELECT * FROM cjef)
       |  GROUP BY 1, 2),
       |cjinv AS (
       |  SELECT invoice_no, CAST(SUM(delivery_fee) AS BIGINT) AS cj_inv_fee,
       |    CAST(SUM(box_cost) AS BIGINT) AS cj_inv_box
       |  FROM cjpi GROUP BY 1),
       |cjord AS (
       |  SELECT order_id, CAST(SUM(delivery_fee) AS BIGINT) AS cj_ord_fee,
       |    CAST(SUM(box_cost) AS BIGINT) AS cj_ord_box
       |  FROM cjpi WHERE order_id <> 'none' GROUP BY 1),
       |withcj AS (
       |  SELECT u.order_id, u.invoice_no, u.product_id, u.delivery_type,
       |    u.order_status, u.sku_quantity, u.payment_amount,
       |    u.supply_amount,
       |    u.org_price * u.sku_quantity AS supply_cost,
       |    u.delivery_group,
       |    u.sku_quantity * COALESCE(un.unit, 1) AS delivery_quantity,
       |    COALESCE(ci.cj_inv_fee, co.cj_ord_fee, u.item_delivery_fee, 0)
       |      AS delivery_fee,
       |    COALESCE(ci.cj_inv_box, co.cj_ord_box, 0) AS box_cost,
       |    u.order_date, u.cost_amount
       |  FROM alloc3 u
       |  LEFT JOIN cjinv ci ON u.invoice_no = ci.invoice_no
       |  LEFT JOIN cjord co
       |    ON 'ORD' || CAST(u.order_id AS VARCHAR) = co.order_id
       |  LEFT JOIN unitdim un ON u.product_id = un.product_id),
       |grpagg AS (
       |  SELECT order_id, invoice_no, delivery_group,
       |    MAX(delivery_type) AS delivery_type,
       |    MAX(delivery_fee) AS delivery_fee,
       |    CAST(SUM(box_cost) AS BIGINT) AS box_cost,
       |    COALESCE(CAST(SUM(delivery_quantity) AS BIGINT), 0)
       |      AS delivery_quantity
       |  FROM withcj GROUP BY 1, 2, 3),
       |resolved AS (
       |  SELECT g.order_id, g.invoice_no,
       |    CASE WHEN d.delivery_group IS NULL THEN g.delivery_fee
       |      WHEN g.delivery_fee > 0 THEN g.delivery_fee +
       |        (CASE WHEN g.box_cost > 0 THEN g.box_cost
       |          ELSE d.extra_cost END)
       |      WHEN g.delivery_type = 7 THEN d.n_arrival_fee +
       |        d.n_arrival_add * (g.delivery_quantity - d.min_unit)
       |      ELSE d.tier_fee + d.extra_cost END AS delivery_fee
       |  FROM grpagg g LEFT JOIN dlv d ON g.delivery_group = d.delivery_group
       |    AND g.delivery_quantity BETWEEN d.min_unit AND d.max_unit),
       |maxfee AS (
       |  SELECT order_id, invoice_no, delivery_fee AS order_delivery_fee
       |  FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY order_id, invoice_no
       |      ORDER BY ABS(delivery_fee) DESC, delivery_fee DESC) AS rn
       |    FROM resolved)
       |  WHERE rn = 1),
       |attached AS (
       |  SELECT w.*, m.order_delivery_fee
       |  FROM withcj w LEFT JOIN maxfee m
       |    ON w.order_id = m.order_id AND w.invoice_no = m.invoice_no),
       |m70 AS (
       |  SELECT *,
       |    CAST(SUM(cost_amount) OVER (PARTITION BY order_id, invoice_no)
       |      AS BIGINT) AS cs7,
       |    ROW_NUMBER() OVER (PARTITION BY order_id, invoice_no
       |      ORDER BY product_id, sku_quantity, payment_amount,
       |        supply_amount, order_status) AS rn7
       |  FROM attached),
       |m71 AS (
       |  SELECT *,
       |    COALESCE(ROUND(CAST(CAST(order_delivery_fee * cost_amount
       |      AS DOUBLE) / CAST(NULLIF(cs7, 0) AS DOUBLE)
       |      AS DECIMAL(38,10)), 0), 0) AS dlv_raw
       |  FROM m70),
       |alloc7 AS (
       |  SELECT product_id, delivery_type, order_status, sku_quantity,
       |    payment_amount, supply_amount, supply_cost,
       |    CAST(CASE WHEN rn7 = 1
       |      THEN CAST(order_delivery_fee AS DECIMAL(38,0))
       |        - SUM(dlv_raw) OVER (PARTITION BY order_id, invoice_no)
       |        + dlv_raw
       |      ELSE dlv_raw END AS BIGINT) AS delivery_fee,
       |    order_date
       |  FROM m71)
       |SELECT order_date, product_id, delivery_type, order_status,
       |  CAST(SUM(sku_quantity) AS BIGINT) AS sku_quantity,
       |  CAST(SUM(payment_amount) AS BIGINT) AS payment_amount,
       |  CAST(SUM(supply_amount) AS BIGINT) AS supply_amount,
       |  CAST(SUM(supply_cost) AS BIGINT) AS supply_cost,
       |  CAST(SUM(delivery_fee) AS BIGINT) AS delivery_fee
       |FROM alloc7
       |GROUP BY 1, 2, 3, 4""".stripMargin
}
