package graft

/** DuckDB oracle for the sabangnet sales-daily mart (q128), mirroring
  * `graft.models.SbnSales` stage for stage — both allocation stages use
  * `Allocation.weightedAllocate`'s exact arithmetic.
  */
private[graft] object SbnSalesOracle {

  val q128: String =
    s"""WITH
       |${OrderCountOracles.coreStatusCte},
       |${ProductOracles.sbnOptCte},
       |dlvraw(delivery_group, min_unit_raw, tier_fee, coolant_cost,
       |       label_cost, wrap_cost, box_cost) AS (VALUES
       |  ('G0', 10, 3000, 300, 200, 50, 400),
       |  ('G0', NULL, 2500, 500, NULL, 100, 300),
       |  ('G0', 50, 3500, 700, 100, NULL, NULL),
       |  ('G1', 20, 4000, 300, 300, NULL, NULL),
       |  ('G1', NULL, 2000, NULL, NULL, NULL, 1000),
       |  ('G2', 5, 5000, NULL, NULL, 250, 250)),
       |dlv AS (
       |  SELECT delivery_group,
       |    COALESCE(min_unit_raw, 1) AS min_unit,
       |    CASE WHEN MAX(min_unit_raw) OVER (PARTITION BY delivery_group)
       |        = min_unit_raw THEN 9999
       |      ELSE LEAD(min_unit_raw) OVER (PARTITION BY delivery_group
       |        ORDER BY min_unit_raw ASC NULLS FIRST) END AS max_unit,
       |    COALESCE(tier_fee, 0) AS tier_delivery_fee,
       |    (COALESCE(coolant_cost, 0) + COALESCE(label_cost, 0)
       |      + COALESCE(wrap_cost, 0) + COALESCE(box_cost, 0)) AS extra_cost
       |  FROM dlvraw),
       |eco AS (
       |  SELECT option_id, org_price FROM (
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
       |      FROM part))
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
       |acc(account_no, shop_id, commission_bp) AS (VALUES
       |  (0, 'shop0055', 1000), (1, 'shop0100', 1200), (2, 'chop0022', 1500),
       |  (3, 'shop0666', 2000), (4, 'shop0200', 800)),
       |ordraw AS (
       |  SELECT l.l_orderkey * 10 + l.l_linenumber AS order_seq,
       |    COALESCE(CASE WHEN l.l_orderkey % 29 = 0
       |        THEN '병원출고' || CAST(l.l_orderkey AS VARCHAR)
       |      WHEN l.l_orderkey % 31 = 0 THEN NULL
       |      ELSE 'ORD' || CAST(l.l_orderkey AS VARCHAR) END, '-')
       |      AS order_id,
       |    l.l_suppkey % 5 AS account_no,
       |    CAST(200000 + (l.l_partkey * 7 + 3) % 500 AS VARCHAR) || '-' ||
       |      lpad(CAST(l.l_linenumber % 4 + 1 AS VARCHAR), 4, '0')
       |      AS option_id,
       |    CAST(l.l_partkey % 997 AS VARCHAR) AS product_id_shop,
       |    COALESCE(CASE WHEN l.l_orderkey % 17 = 0 THEN NULL
       |      ELSE CAST(l.l_quantity AS BIGINT) END, 0) AS order_quantity,
       |    CAST(l.l_quantity AS BIGINT) * 10 AS sku_quantity_raw,
       |    COALESCE(CASE WHEN l.l_orderkey % 23 = 0 THEN NULL
       |      ELSE CAST(FLOOR(l.l_extendedprice / 10) AS BIGINT) END, 0)
       |      AS payment_amount,
       |    CASE WHEN l.l_orderkey % 2 = 0
       |        THEN 'LP' || CAST(l.l_orderkey AS VARCHAR)
       |      WHEN l.l_orderkey % 3 = 0
       |        THEN 'EF' || CAST(l.l_orderkey AS VARCHAR)
       |      ELSE NULL END AS invoice_no_raw,
       |    ([7, 8, 9, 10, 11, 12, 21, 22, 23, 24, 25, 26, 999])
       |      [CAST((l.l_partkey * 3 + l.l_linenumber) % 13 AS INTEGER) + 1]
       |      AS inv_raw,
       |    CAST(o.o_orderdate AS DATE) AS order_date
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  WHERE CAST(o.o_orderdate AS DATE)
       |    BETWEEN DATE '1996-02-01' AND DATE '1996-04-30'),
       |inv AS (
       |  SELECT order_seq, ANY_VALUE(invoice_no_raw) AS invoice_no,
       |    MAX(inv_raw) AS status_sbn_raw
       |  FROM ordraw GROUP BY 1),
       |scor AS (
       |  SELECT order_id, MAX(order_status) AS status_cor
       |  FROM cst
       |  WHERE order_date BETWEEN DATE '1996-02-01' AND DATE '1996-04-30'
       |    AND shop_name <> '스마트스토어'
       |  GROUP BY 1),
       |detail AS (
       |  SELECT o.*, a.shop_id AS shop_id0, a.commission_bp,
       |    p.bundle_option_ids AS bundle0,
       |    COALESCE(i.invoice_no, '-') AS invoice_no, i.status_sbn_raw,
       |    c.status_cor
       |  FROM ordraw o
       |  LEFT JOIN acc a ON o.account_no = a.account_no
       |  LEFT JOIN opt p ON o.option_id = p.option_id
       |  LEFT JOIN inv i ON o.order_seq = i.order_seq
       |  LEFT JOIN scor c ON o.order_id = c.order_id
       |  WHERE a.shop_id NOT IN ('shop0055', 'chop0022', 'chop0027',
       |    'chop0028', 'chop0029')),
       |ruled AS (
       |  SELECT * FROM (
       |    SELECT order_seq, order_id, invoice_no, account_no,
       |      CASE WHEN starts_with(order_id, '병원출고') THEN 'chop9022'
       |        ELSE shop_id0 END AS shop_id,
       |      string_split(option_id, '-')[1] AS product_id,
       |      option_id,
       |      CASE WHEN option_id = '200345-0001' AND sku_quantity_raw >= 100
       |          THEN '200330-0001:1'
       |        WHEN option_id = '200377-0001' AND sku_quantity_raw >= 100
       |          THEN '200741-0001:1'
       |        WHEN bundle0 IS NULL THEN NULL
       |        WHEN bundle0 = '200345-0001:100' THEN '200330-0001:1'
       |        WHEN bundle0 = '200377-0001:100' THEN '200741-0001:1'
       |        ELSE bundle0 END AS bundle_option_ids,
       |      CASE WHEN status_cor IS NOT NULL THEN status_cor
       |        WHEN status_sbn_raw IN (9, 12, 25, 26) THEN 1
       |        WHEN status_sbn_raw IN (8, 11, 21, 22, 23, 24) THEN 2
       |        WHEN status_sbn_raw IN (7, 10, 999) THEN 3
       |        ELSE 0 END AS order_status,
       |      order_quantity,
       |      CASE WHEN option_id IN ('200330-0001', '200741-0001')
       |        THEN order_quantity ELSE sku_quantity_raw END AS sku_quantity,
       |      CASE WHEN shop_id0 = 'shop0666' AND
       |          SUM(payment_amount) OVER (PARTITION BY account_no, order_id)
       |            < 19800
       |        THEN SUM(payment_amount)
       |          OVER (PARTITION BY account_no, order_id) + 3000
       |        WHEN ROW_NUMBER() OVER (PARTITION BY account_no, order_id
       |            ORDER BY order_seq, option_id, product_id_shop,
       |              sku_quantity_raw, payment_amount) = 1
       |        THEN COALESCE(SUM(payment_amount)
       |          OVER (PARTITION BY account_no, order_id), 0)
       |        ELSE 0 END AS payment_amount,
       |      CASE WHEN shop_id0 = 'shop0200' AND product_id_shop = '123'
       |          AND order_date BETWEEN DATE '1996-03-01'
       |            AND DATE '1996-03-31'
       |        THEN 1000 ELSE commission_bp END AS eff_bp,
       |      order_date
       |    FROM detail) t
       |  WHERE shop_id <> 'chop9022'),
       |ruled2 AS (
       |  SELECT *, CAST((payment_amount * (10000 - eff_bp) + 5000) // 10000
       |    AS BIGINT) AS supply_amount
       |  FROM ruled),
       |nb AS (
       |  SELECT order_seq, order_id, invoice_no, account_no, shop_id,
       |    product_id, option_id, order_status, sku_quantity,
       |    payment_amount, supply_amount, order_date
       |  FROM ruled2 WHERE bundle_option_ids IS NULL),
       |ex0 AS (
       |  SELECT order_seq, order_id, invoice_no, account_no, shop_id,
       |    order_status, order_quantity, payment_amount, supply_amount,
       |    order_date,
       |    UNNEST(string_split(bundle_option_ids, ',')) AS bundle_option
       |  FROM ruled2 WHERE bundle_option_ids IS NOT NULL),
       |ex AS (
       |  SELECT order_seq, order_id, invoice_no, account_no, shop_id,
       |    string_split(bundle_option, '-')[1] AS product_id,
       |    string_split(bundle_option, ':')[1] AS option_id,
       |    order_status,
       |    COALESCE(TRY_CAST(string_split(bundle_option, ':')[2] AS BIGINT),
       |      1) * order_quantity AS sku_quantity,
       |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY account_no, order_id
       |        ORDER BY order_seq, bundle_option, order_quantity,
       |          payment_amount, supply_amount) = 1
       |      THEN MAX(payment_amount)
       |        OVER (PARTITION BY account_no, order_id)
       |      ELSE 0 END AS payment_amount,
       |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY account_no, order_id
       |        ORDER BY order_seq, bundle_option, order_quantity,
       |          payment_amount, supply_amount) = 1
       |      THEN MAX(supply_amount)
       |        OVER (PARTITION BY account_no, order_id)
       |      ELSE 0 END AS supply_amount,
       |    order_date
       |  FROM ex0),
       |costed AS (
       |  SELECT u.order_id, u.invoice_no, u.account_no, u.shop_id,
       |    u.product_id, u.order_status, u.sku_quantity,
       |    u.payment_amount, u.supply_amount,
       |    COALESCE(e.org_price, i.itm_org, 0) + COALESCE(i.extra_cost, 0)
       |      AS org_price,
       |    COALESCE(i.delivery_group, '-') AS delivery_group,
       |    COALESCE(i.itm_delivery_fee, 0) AS item_delivery_fee,
       |    u.order_date, u.option_id
       |  FROM (SELECT * EXCLUDE (order_seq) FROM nb
       |        UNION ALL SELECT * EXCLUDE (order_seq) FROM ex) u
       |  LEFT JOIN eco e ON u.option_id = e.option_id
       |  LEFT JOIN itm i ON u.product_id = i.product_id),
       |costed2 AS (
       |  SELECT *, org_price * sku_quantity AS cost_amount,
       |    COUNT(*) OVER (PARTITION BY account_no, order_id)
       |      AS bundle_product_count,
       |    CAST(SUM(payment_amount)
       |      OVER (PARTITION BY account_no, order_id) AS BIGINT) AS tp,
       |    CAST(SUM(supply_amount)
       |      OVER (PARTITION BY account_no, order_id) AS BIGINT) AS ts
       |  FROM costed),
       |m50 AS (
       |  SELECT *,
       |    CAST(SUM(cost_amount) OVER (PARTITION BY account_no, order_id)
       |      AS BIGINT) AS cs,
       |    ROW_NUMBER() OVER (PARTITION BY account_no, order_id
       |      ORDER BY product_id, option_id, sku_quantity, order_status,
       |        invoice_no) AS rn
       |  FROM costed2 WHERE bundle_product_count > 1),
       |m51 AS (
       |  SELECT *,
       |    COALESCE(ROUND(CAST(CAST(tp * cost_amount AS DOUBLE)
       |      / CAST(NULLIF(cs, 0) AS DOUBLE) AS DECIMAL(38,10)), 0), 0)
       |      AS pay_raw,
       |    COALESCE(ROUND(CAST(CAST(ts * cost_amount AS DOUBLE)
       |      / CAST(NULLIF(cs, 0) AS DOUBLE) AS DECIMAL(38,10)), 0), 0)
       |      AS sup_raw
       |  FROM m50),
       |m5 AS (
       |  SELECT order_id, invoice_no, shop_id, product_id, order_status,
       |    sku_quantity,
       |    CAST(CASE WHEN rn = 1
       |      THEN CAST(tp AS DECIMAL(38,0))
       |        - SUM(pay_raw) OVER (PARTITION BY account_no, order_id)
       |        + pay_raw
       |      ELSE pay_raw END AS BIGINT) AS payment_amount,
       |    CAST(CASE WHEN rn = 1
       |      THEN CAST(ts AS DECIMAL(38,0))
       |        - SUM(sup_raw) OVER (PARTITION BY account_no, order_id)
       |        + sup_raw
       |      ELSE sup_raw END AS BIGINT) AS supply_amount,
       |    org_price, delivery_group, item_delivery_fee, order_date,
       |    cost_amount
       |  FROM m51),
       |s5 AS (
       |  SELECT order_id, invoice_no, shop_id, product_id, order_status,
       |    sku_quantity, payment_amount, supply_amount, org_price,
       |    delivery_group, item_delivery_fee, order_date, cost_amount
       |  FROM costed2 WHERE bundle_product_count = 1),
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
       |  SELECT u.order_id, u.invoice_no, u.shop_id, u.product_id,
       |    u.order_status, u.sku_quantity, u.payment_amount,
       |    u.supply_amount,
       |    u.org_price * u.sku_quantity AS supply_cost,
       |    u.org_price, u.delivery_group,
       |    u.sku_quantity * COALESCE(un.unit, 1) AS delivery_quantity,
       |    COALESCE(ci.cj_inv_fee, co.cj_ord_fee, u.item_delivery_fee, 0)
       |      AS delivery_fee,
       |    COALESCE(ci.cj_inv_box, co.cj_ord_box, 0) AS box_cost,
       |    u.order_date, u.cost_amount
       |  FROM (SELECT * FROM s5 UNION ALL SELECT * FROM m5) u
       |  LEFT JOIN cjinv ci ON u.invoice_no = ci.invoice_no
       |  LEFT JOIN cjord co ON u.order_id = co.order_id
       |  LEFT JOIN unitdim un ON u.product_id = un.product_id),
       |grpagg AS (
       |  SELECT order_id, invoice_no, delivery_group,
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
       |      ELSE d.tier_delivery_fee + d.extra_cost END AS delivery_fee
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
       |  SELECT w.*, m.order_delivery_fee,
       |    COUNT(*) OVER (PARTITION BY w.order_id, w.invoice_no)
       |      AS bundle_invoice_count
       |  FROM withcj w LEFT JOIN maxfee m
       |    ON w.order_id = m.order_id AND w.invoice_no = m.invoice_no),
       |m90 AS (
       |  SELECT *,
       |    CAST(SUM(cost_amount) OVER (PARTITION BY order_id, invoice_no)
       |      AS BIGINT) AS cs9,
       |    ROW_NUMBER() OVER (PARTITION BY order_id, invoice_no
       |      ORDER BY product_id, sku_quantity, payment_amount,
       |        supply_amount, order_status) AS rn9
       |  FROM attached WHERE bundle_invoice_count > 1),
       |m91 AS (
       |  SELECT *,
       |    COALESCE(ROUND(CAST(CAST(order_delivery_fee * cost_amount
       |      AS DOUBLE) / CAST(NULLIF(cs9, 0) AS DOUBLE)
       |      AS DECIMAL(38,10)), 0), 0) AS dlv_raw
       |  FROM m90),
       |m9 AS (
       |  SELECT order_id, shop_id, product_id, order_status, sku_quantity,
       |    payment_amount, supply_amount, supply_cost,
       |    CAST(CASE WHEN rn9 = 1
       |      THEN CAST(order_delivery_fee AS DECIMAL(38,0))
       |        - SUM(dlv_raw) OVER (PARTITION BY order_id, invoice_no)
       |        + dlv_raw
       |      ELSE dlv_raw END AS BIGINT) AS delivery_fee,
       |    order_date
       |  FROM m91),
       |s9 AS (
       |  SELECT order_id, shop_id, product_id, order_status, sku_quantity,
       |    payment_amount, supply_amount, supply_cost,
       |    order_delivery_fee AS delivery_fee, order_date
       |  FROM attached WHERE bundle_invoice_count = 1)
       |SELECT order_date, product_id, shop_id, order_status,
       |  CAST(SUM(sku_quantity) AS BIGINT) AS sku_quantity,
       |  CAST(SUM(payment_amount) AS BIGINT) AS payment_amount,
       |  CAST(SUM(supply_amount) AS BIGINT) AS supply_amount,
       |  CAST(SUM(supply_cost) AS BIGINT) AS supply_cost,
       |  CAST(SUM(delivery_fee) AS BIGINT) AS delivery_fee
       |FROM (SELECT * FROM s9 UNION ALL SELECT * FROM m9)
       |GROUP BY 1, 2, 3, 4""".stripMargin
}
