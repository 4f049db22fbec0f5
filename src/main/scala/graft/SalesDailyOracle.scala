package graft

/** DuckDB oracle for the coupang rocket sales-daily mart (q125), mirroring
  * `graft.models.SalesDaily` stage for stage — including
  * `Allocation.weightedAllocate`'s exact arithmetic (double ratio →
  * DECIMAL(38,10) snapshot → ROUND 0 → remainder to the first row).
  */
private[graft] object SalesDailyOracle {

  val q125: String =
    """WITH
      |dlvraw(delivery_group, min_unit_raw, coolant_cost, label_cost,
      |       wrap_cost, box_cost) AS (VALUES
      |  ('G0', 10, 300, 200, 50, 400),
      |  ('G0', NULL, 500, NULL, 100, 300),
      |  ('G0', 50, 700, 100, NULL, NULL),
      |  ('G1', 20, 300, 300, NULL, NULL),
      |  ('G1', NULL, NULL, NULL, NULL, 1000),
      |  ('G2', 5, NULL, NULL, 250, 250)),
      |dlv AS (
      |  SELECT delivery_group,
      |    COALESCE(min_unit_raw, 1) AS min_unit,
      |    CASE WHEN MAX(min_unit_raw) OVER (PARTITION BY delivery_group)
      |        = min_unit_raw THEN 9999
      |      ELSE LEAD(min_unit_raw) OVER (PARTITION BY delivery_group
      |        ORDER BY min_unit_raw ASC NULLS FIRST) END AS max_unit,
      |    (COALESCE(coolant_cost, 0) + COALESCE(label_cost, 0)
      |      + COALESCE(wrap_cost, 0) + COALESCE(box_cost, 0)) AS extra_cost
      |  FROM dlvraw),
      |eco AS (
      |  SELECT string_split(option_id, '-')[1] AS product_id, org_price
      |  FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY option_id
      |      ORDER BY expiration_date ASC, product_code DESC) AS rn
      |    FROM (
      |      SELECT CAST(200000 + p_partkey % 400 AS VARCHAR) || '-0001'
      |          AS option_id,
      |        DATE '1995-01-01' + CAST(p_partkey % 50 AS INTEGER)
      |          AS expiration_date,
      |        p_partkey AS product_code,
      |        CAST(FLOOR(p_retailprice) AS BIGINT) * 2 // 3 AS org_price
      |      FROM part))
      |  WHERE rn = 1),
      |itm AS (
      |  SELECT * EXCLUDE (rn) FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY product_id
      |      ORDER BY seq) AS rn
      |    FROM (
      |      SELECT CAST(200000 + p_partkey % 400 AS VARCHAR) AS product_id,
      |        CASE WHEN p_partkey % 6 = 0 THEN NULL
      |          ELSE CAST(FLOOR(p_retailprice) AS BIGINT) END AS itm_org,
      |        CASE WHEN p_partkey % 4 = 0 THEN NULL
      |          ELSE p_partkey % 200 END AS extra_cost,
      |        CASE WHEN p_partkey % 5 = 0 THEN NULL
      |          ELSE 'G' || CAST(p_partkey % 3 AS VARCHAR) END
      |          AS delivery_group,
      |        p_partkey AS seq
      |      FROM part))
      |  WHERE rn = 1),
      |unitdim(product_id, unit) AS (VALUES
      |  ('200036', 100), ('200119', 100), ('200222', 100)),
      |salesraw AS (
      |  SELECT 'CO' || CAST(l_orderkey AS VARCHAR) AS order_id,
      |    'CP' || CAST(l_partkey AS VARCHAR) || '-' ||
      |      CAST(l_linenumber % 3 AS VARCHAR) AS option_id,
      |    l_partkey % 20 AS vendor_id,
      |    ([0, 1, 3, 6])
      |      [CAST((l_orderkey + l_partkey) % 4 AS INTEGER) + 1]
      |      AS settlement_type,
      |    CAST(l_quantity AS BIGINT) AS order_quantity,
      |    CASE WHEN l_suppkey % 11 = 0 THEN NULL
      |      ELSE CAST(FLOOR(l_extendedprice / 100) AS BIGINT) END
      |      AS unit_price,
      |    l_orderkey % 7 * 3 AS coupang_discount,
      |    l_suppkey % 11 AS seller_discount,
      |    CAST(FLOOR(l_extendedprice) AS BIGINT) * 4 // 5
      |      AS settlement_amount,
      |    CAST(l_shipdate AS DATE) AS sales_date
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE)
      |    BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
      |sales AS (
      |  SELECT order_id, option_id,
      |    MAX(vendor_id) AS vendor_id,
      |    MAX(settlement_type) AS order_status,
      |    CAST(SUM(order_quantity) AS BIGINT) AS order_quantity,
      |    CAST(SUM(COALESCE(unit_price, 0) * COALESCE(order_quantity, 0)
      |      - COALESCE(coupang_discount, 0) - COALESCE(seller_discount, 0))
      |      AS BIGINT) AS sales_amount,
      |    CAST(SUM(settlement_amount) AS BIGINT) AS settlement_amount,
      |    MAX(sales_date) AS sales_date
      |  FROM salesraw GROUP BY 1, 2),
      |shipraw AS (
      |  SELECT 'CO' || CAST(l_orderkey AS VARCHAR) AS order_id,
      |    'CP' || CAST(l_partkey AS VARCHAR) || '-' ||
      |      CAST(l_linenumber % 3 AS VARCHAR) AS option_id,
      |    l_partkey % 20 AS vendor_id,
      |    CASE WHEN l_suppkey % 13 = 0 THEN NULL
      |      ELSE l_suppkey * 3 % 500 END AS warehousing_fee,
      |    l_suppkey % 100 AS discount_amount,
      |    CASE WHEN l_orderkey % 17 = 0 THEN NULL
      |      ELSE l_orderkey % 50 END AS extra_fee,
      |    CAST(l_shipdate AS DATE) AS sales_date
      |  FROM lineitem
      |  WHERE (l_orderkey + l_linenumber) % 3 = 0
      |    AND CAST(l_shipdate AS DATE)
      |      BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'),
      |shipping AS (
      |  SELECT order_id, option_id,
      |    MAX(vendor_id) AS vendor_id,
      |    CAST(SUM(COALESCE(warehousing_fee, 0) - COALESCE(discount_amount, 0)
      |      + COALESCE(extra_fee, 0)) AS BIGINT) AS delivery_fee,
      |    MAX(sales_date) AS sales_date
      |  FROM shipraw GROUP BY 1, 2),
      |merged AS (
      |  SELECT sales_date, order_id, option_id,
      |    MAX(vendor_id) AS vendor_id,
      |    CASE WHEN MAX(sales_status) IS NULL THEN 7
      |      ELSE LEAST(MAX(sales_status), 3) END AS order_status,
      |    CAST(SUM(COALESCE(order_quantity, 0)) AS BIGINT)
      |      AS order_quantity,
      |    CAST(SUM(COALESCE(sales_amount, 0)) AS BIGINT) AS sales_amount,
      |    CAST(SUM(COALESCE(settlement_amount, 0)) AS BIGINT)
      |      AS settlement_amount,
      |    CAST(SUM(COALESCE(delivery_fee, 0)) AS BIGINT) AS delivery_fee
      |  FROM (
      |    SELECT COALESCE(sl.order_id, sh.order_id) AS order_id,
      |      COALESCE(sl.option_id, sh.option_id) AS option_id,
      |      COALESCE(sl.vendor_id, sh.vendor_id) AS vendor_id,
      |      sl.order_status AS sales_status,
      |      sl.order_quantity, sl.sales_amount, sl.settlement_amount,
      |      sh.delivery_fee,
      |      COALESCE(sl.sales_date, sh.sales_date) AS sales_date
      |    FROM sales sl
      |    FULL OUTER JOIN shipping sh
      |      ON sl.order_id = sh.order_id AND sl.option_id = sh.option_id)
      |  GROUP BY 1, 2, 3),
      |rel AS (
      |  SELECT option_id,
      |    CASE WHEN p % 9 = 0 THEN
      |        CAST(900000 + p * 11 % 200 AS VARCHAR) || ':1'
      |      ELSE CAST(200000 + (p * 11 + 3) % 400 AS VARCHAR) || ':1,' ||
      |        CAST(210000 + p * 7 % 300 AS VARCHAR) || ':2'
      |      END AS bundle_product_ids
      |  FROM (SELECT DISTINCT option_id,
      |      CAST(regexp_extract(option_id, 'CP([0-9]+)-', 1) AS BIGINT) AS p
      |    FROM merged)
      |  WHERE p % 3 = 0),
      |vdr(vendor_id, bundle_brand_ids) AS (VALUES
      |  (0, NULL), (1, '200501'), (2, '200502'), (3, '200503'), (4, NULL),
      |  (5, '200505'), (6, '200506'), (7, '200507'), (8, NULL),
      |  (9, '200509'), (10, '200510'), (11, '200511'), (12, NULL),
      |  (13, '200513'), (14, '200514'), (15, '200515'), (16, NULL),
      |  (17, '200517'), (18, '200518'), (19, '200519')),
      |bundled AS (
      |  SELECT m.order_id, m.option_id,
      |    COALESCE(rel.bundle_product_ids, vdr.bundle_brand_ids, '200000')
      |      AS bundle_product_ids,
      |    m.order_status, m.order_quantity,
      |    m.sales_amount AS payment_amount,
      |    m.settlement_amount AS supply_amount,
      |    m.delivery_fee,
      |    m.sales_date AS order_date
      |  FROM merged m
      |  LEFT JOIN rel USING (option_id)
      |  LEFT JOIN vdr ON m.vendor_id = vdr.vendor_id
      |  WHERE m.sales_date BETWEEN DATE '1996-01-03' AND DATE '1996-06-26'
      |    AND NOT (m.order_quantity = 0 AND m.delivery_fee = 0)),
      |expl AS (
      |  SELECT order_id, option_id, order_quantity,
      |    payment_amount, supply_amount, delivery_fee, order_date,
      |    component,
      |    string_split(component, ':')[1] AS product_id,
      |    COALESCE(TRY_CAST(string_split(component, ':')[2] AS BIGINT), 1)
      |      * order_quantity AS sku_quantity,
      |    CASE WHEN order_status = 0 AND substr(component, 1, 1) = '9'
      |      THEN 6 ELSE order_status END AS order_status
      |  FROM (SELECT *, UNNEST(string_split(bundle_product_ids, ','))
      |          AS component
      |        FROM bundled)),
      |priced AS (
      |  SELECT e.*,
      |    COALESCE(eco.org_price, itm.itm_org, 0)
      |      + COALESCE(itm.extra_cost, 0) AS org_price,
      |    itm.delivery_group
      |  FROM expl e
      |  LEFT JOIN eco ON e.product_id = eco.product_id
      |  LEFT JOIN itm ON e.product_id = itm.product_id),
      |banded AS (
      |  SELECT p.order_id, p.option_id, p.product_id, p.order_status,
      |    p.sku_quantity, p.payment_amount, p.supply_amount,
      |    p.org_price * p.sku_quantity AS supply_cost,
      |    p.delivery_fee, p.order_date, p.component,
      |    dlv.extra_cost AS band_extra_cost,
      |    CASE WHEN p.order_status = 6 THEN 0
      |      ELSE p.org_price * p.sku_quantity END AS cost_amount
      |  FROM (
      |    SELECT pr.*, u.unit
      |    FROM priced pr LEFT JOIN unitdim u ON pr.product_id = u.product_id
      |  ) p
      |  LEFT JOIN dlv ON p.delivery_group = dlv.delivery_group
      |    AND (p.sku_quantity * COALESCE(p.unit, 1))
      |      BETWEEN dlv.min_unit AND dlv.max_unit),
      |extra AS (
      |  SELECT * EXCLUDE (band_extra_cost),
      |    COALESCE(MAX(band_extra_cost)
      |      OVER (PARTITION BY order_id, option_id), 0) + delivery_fee
      |      AS delivery_fee2,
      |    COUNT(*) OVER (PARTITION BY order_id, option_id)
      |      AS bundle_product_count
      |  FROM banded),
      |multi0 AS (
      |  SELECT *,
      |    CAST(SUM(cost_amount) OVER (PARTITION BY order_id, option_id)
      |      AS BIGINT) AS cost_sum,
      |    ROW_NUMBER() OVER (PARTITION BY order_id, option_id
      |      ORDER BY product_id, component) AS rn
      |  FROM extra WHERE bundle_product_count > 1),
      |multi1 AS (
      |  SELECT *,
      |    COALESCE(ROUND(CAST(CAST(payment_amount * cost_amount AS DOUBLE)
      |      / CAST(NULLIF(cost_sum, 0) AS DOUBLE) AS DECIMAL(38,10)), 0), 0)
      |      AS pay_raw,
      |    COALESCE(ROUND(CAST(CAST(supply_amount * cost_amount AS DOUBLE)
      |      / CAST(NULLIF(cost_sum, 0) AS DOUBLE) AS DECIMAL(38,10)), 0), 0)
      |      AS sup_raw,
      |    COALESCE(ROUND(CAST(CAST(delivery_fee2 * cost_amount AS DOUBLE)
      |      / CAST(NULLIF(cost_sum, 0) AS DOUBLE) AS DECIMAL(38,10)), 0), 0)
      |      AS dlv_raw
      |  FROM multi0),
      |multi AS (
      |  SELECT order_id, product_id, order_status, sku_quantity,
      |    CAST(CASE WHEN rn = 1
      |      THEN CAST(payment_amount AS DECIMAL(38,0))
      |        - SUM(pay_raw) OVER (PARTITION BY order_id, option_id)
      |        + pay_raw
      |      ELSE pay_raw END AS BIGINT) AS payment_amount,
      |    CAST(CASE WHEN rn = 1
      |      THEN CAST(supply_amount AS DECIMAL(38,0))
      |        - SUM(sup_raw) OVER (PARTITION BY order_id, option_id)
      |        + sup_raw
      |      ELSE sup_raw END AS BIGINT) AS supply_amount,
      |    supply_cost,
      |    CAST(CASE WHEN rn = 1
      |      THEN CAST(delivery_fee2 AS DECIMAL(38,0))
      |        - SUM(dlv_raw) OVER (PARTITION BY order_id, option_id)
      |        + dlv_raw
      |      ELSE dlv_raw END AS BIGINT) AS delivery_fee,
      |    order_date
      |  FROM multi1),
      |singles AS (
      |  SELECT order_id, product_id, order_status, sku_quantity,
      |    payment_amount, supply_amount, supply_cost,
      |    delivery_fee2 AS delivery_fee, order_date
      |  FROM extra WHERE bundle_product_count = 1)
      |SELECT order_date, product_id, order_status,
      |  CAST(SUM(sku_quantity) AS BIGINT) AS sku_quantity,
      |  CAST(SUM(payment_amount) AS BIGINT) AS payment_amount,
      |  CAST(SUM(supply_amount) AS BIGINT) AS supply_amount,
      |  CAST(SUM(supply_cost) AS BIGINT) AS supply_cost,
      |  CAST(SUM(delivery_fee) AS BIGINT) AS delivery_fee
      |FROM (SELECT * FROM singles UNION ALL SELECT * FROM multi)
      |GROUP BY 1, 2, 3""".stripMargin

  val q126: String =
    """WITH li AS (
      |  SELECT l_partkey % 120 AS product_id,
      |    CAST(l_shipdate AS DATE) AS payment_date,
      |    (l_orderkey * 13 + l_linenumber) % 86400 AS created_sec,
      |    l_orderkey * 10 + l_linenumber AS src_seq,
      |    CASE WHEN l_orderkey % 19 = 0 THEN 0
      |      ELSE (l_partkey % 50 + 1) * 100 + l_orderkey % 7 END
      |      AS sales_price,
      |    5000 - (l_orderkey * 7 + l_partkey * 3) % 4000 AS stock_quantity,
      |    l_partkey, l_suppkey, l_orderkey
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE)
      |    BETWEEN DATE '1996-03-01' - 28 AND DATE '1996-03-31' + 8),
      |base AS (
      |  SELECT product_id, sales_price, stock_quantity, payment_date FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY product_id, payment_date
      |      ORDER BY created_sec, src_seq, l_partkey, l_suppkey) AS rn
      |    FROM li)
      |  WHERE rn = 1),
      |det AS (
      |  SELECT product_id, option_id, COALESCE(option_price, 0)
      |      AS option_price, stock_quantity, payment_date
      |  FROM (
      |    SELECT *, ROW_NUMBER() OVER (
      |      PARTITION BY product_id, option_id, payment_date
      |      ORDER BY created_sec, src_seq, l_suppkey, stock_quantity) AS rn
      |    FROM (
      |      SELECT product_id, product_id * 10 + l_suppkey % 2 AS option_id,
      |        CASE WHEN l_suppkey % 7 = 0 THEN NULL
      |          ELSE l_suppkey % 30 * 10 END AS option_price,
      |        4000 - (l_orderkey * 11 + l_suppkey) % 3500
      |          AS stock_quantity,
      |        payment_date, created_sec, src_seq, l_suppkey
      |      FROM li WHERE l_partkey % 3 <> 0))
      |  WHERE rn = 1),
      |ost AS (
      |  SELECT d.product_id, d.option_id,
      |    b.sales_price + d.option_price AS sales_price,
      |    d.stock_quantity,
      |    LEAD(d.stock_quantity) OVER (
      |      PARTITION BY d.product_id, d.option_id
      |      ORDER BY d.payment_date) AS nq,
      |    d.payment_date,
      |    LEAD(d.payment_date) OVER (
      |      PARTITION BY d.product_id, d.option_id
      |      ORDER BY d.payment_date) AS nd
      |  FROM det d LEFT JOIN base b
      |    ON d.product_id = b.product_id
      |      AND d.payment_date = b.payment_date),
      |pst AS (
      |  SELECT product_id, product_id AS option_id, sales_price,
      |    stock_quantity,
      |    LEAD(stock_quantity) OVER (PARTITION BY product_id
      |      ORDER BY payment_date) AS nq,
      |    payment_date,
      |    LEAD(payment_date) OVER (PARTITION BY product_id
      |      ORDER BY payment_date) AS nd
      |  FROM base b
      |  WHERE NOT EXISTS (SELECT 1 FROM det d
      |    WHERE b.product_id = d.product_id
      |      AND b.payment_date = d.payment_date)),
      |tot AS (
      |  SELECT product_id, option_id, sales_price,
      |    stock_quantity - nq AS payment_count,
      |    (stock_quantity - nq) * sales_price AS payment_amount,
      |    payment_date
      |  FROM (SELECT * FROM pst UNION ALL SELECT * FROM ost)
      |  WHERE sales_price > 0 AND stock_quantity >= nq
      |    AND stock_quantity - nq < 10000 AND payment_date = nd - 1),
      |stat AS (
      |  SELECT cur.payment_date, cur.product_id, cur.option_id,
      |    COUNT(NULLIF(prev.payment_count, 0)) AS effective_days_in,
      |    percentile_cont(0.25) WITHIN GROUP (ORDER BY
      |      CAST(NULLIF(prev.payment_count, 0) AS DOUBLE)) AS q1,
      |    percentile_cont(0.5) WITHIN GROUP (ORDER BY
      |      CAST(NULLIF(prev.payment_count, 0) AS DOUBLE)) AS q2,
      |    percentile_cont(0.75) WITHIN GROUP (ORDER BY
      |      CAST(NULLIF(prev.payment_count, 0) AS DOUBLE)) AS q3
      |  FROM tot cur LEFT JOIN tot prev
      |    ON cur.product_id = prev.product_id
      |      AND cur.option_id = prev.option_id
      |      AND prev.payment_date >= cur.payment_date - 28
      |      AND prev.payment_date <> cur.payment_date
      |      AND prev.payment_date <= cur.payment_date + 7
      |  GROUP BY 1, 2, 3)
      |SELECT b.product_id, b.option_id, b.sales_price, b.payment_count,
      |  b.payment_amount, b.payment_date
      |FROM tot b JOIN stat s ON b.payment_date = s.payment_date
      |  AND b.product_id = s.product_id AND b.option_id = s.option_id
      |WHERE b.payment_date BETWEEN DATE '1996-03-01' AND DATE '1996-03-31'
      |  AND (CASE WHEN b.payment_count < 100 THEN TRUE
      |    WHEN s.effective_days_in < 3 THEN b.payment_count < 1000
      |    WHEN s.effective_days_in < 7 THEN b.payment_count < GREATEST(
      |      CAST(ROUND(CAST(s.q2 * 10 AS DECIMAL(38,10)), 0) AS BIGINT),
      |      100)
      |    ELSE b.payment_count < GREATEST(
      |      CAST(ROUND(CAST(s.q3 + (s.q3 - s.q1) * 5 AS DECIMAL(38,10)), 0)
      |        AS BIGINT), 100) END)""".stripMargin
}
