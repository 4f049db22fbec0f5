package graft

/** DuckDB oracle SQL for the batch stock-quantity family (q140-q142). */
private[graft] object StockBatchOracles {

  private val tsRange =
    """updated_at >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND updated_at < TIMESTAMP '1996-12-31 00:00:00'
      |      + INTERVAL 1 DAY""".stripMargin

  private val ecoInv =
    s"""SELECT 'EC' || CAST(l_partkey % 900 AS VARCHAR) AS product_code,
       |    CAST(l_quantity AS BIGINT) AS quantity,
       |    CAST(l_shipdate AS TIMESTAMP)
       |      + INTERVAL (l_suppkey % 24) HOUR AS updated_at
       |  FROM lineitem WHERE l_orderkey % 6 = 2""".stripMargin

  private val ecoPrd =
    """SELECT 'EC' || CAST(p_partkey AS VARCHAR) AS product_code,
      |    CASE WHEN p_partkey % 6 = 0 THEN ''
      |      WHEN p_partkey % 5 = 0 THEN NULL
      |      ELSE CAST(p_partkey % 800 AS VARCHAR) || '-' ||
      |        CAST(p_partkey % 3 AS VARCHAR) END AS option_id,
      |    CASE WHEN p_partkey % 7 = 0 THEN 'BAD'
      |      ELSE strftime(DATE '1996-01-01'
      |        + CAST(p_partkey % 200 AS INTEGER), '%Y%m%d') END
      |      AS expiration_date,
      |    CASE WHEN p_partkey % 17 = 0 THEN NULL
      |      ELSE CAST(DATE '1996-01-01' + CAST(p_partkey % 300 AS INTEGER)
      |        AS TIMESTAMP) + INTERVAL (p_partkey % 24) HOUR END
      |      AS updated_at
      |  FROM part WHERE p_partkey < 900""".stripMargin

  private val cjStock =
    """SELECT 'IT' || CAST(l_partkey % 600 AS VARCHAR) AS item_code,
      |    CASE WHEN l_suppkey % 4 = 0 THEN NULL
      |      ELSE CAST(l_shipdate AS DATE) + 30 END AS validate_date,
      |    CAST(l_quantity AS BIGINT) AS usable_quantity,
      |    CAST(l_shipdate AS TIMESTAMP)
      |      + INTERVAL (l_suppkey % 24) HOUR AS updated_at
      |  FROM lineitem WHERE l_orderkey % 5 = 0""".stripMargin

  private val coreItem =
    """SELECT CASE WHEN p_partkey % 16 = 0 THEN NULL
      |      ELSE CAST(p_partkey % 800 AS VARCHAR) END AS product_id,
      |    CASE WHEN p_partkey % 9 = 0 THEN NULL
      |      ELSE 'IT' || CAST(p_partkey % 600 AS VARCHAR) || ', IT' ||
      |        CAST((p_partkey + 7) % 600 AS VARCHAR) END
      |      AS eflexs_item_code
      |  FROM part WHERE p_partkey < 500""".stripMargin

  private val cpgInv =
    """SELECT CAST(l_partkey % 400 AS BIGINT) AS option_id,
      |    CAST(l_quantity AS BIGINT) AS stock_quantity,
      |    CAST(l_shipdate AS TIMESTAMP)
      |      + INTERVAL (l_suppkey % 24) HOUR AS updated_at
      |  FROM lineitem WHERE l_orderkey % 4 = 1""".stripMargin

  private val cpgExp =
    """SELECT CAST(p_partkey AS BIGINT) AS exp_option_id,
      |    CAST(DATE '1992-01-01' + CAST(p_partkey % 100 AS INTEGER)
      |      AS TIMESTAMP) AS start_time,
      |    CAST(DATE '1992-01-01' + CAST(p_partkey % 100 + 2000 AS INTEGER)
      |      AS TIMESTAMP) AS end_time,
      |    DATE '1996-01-01' + CAST(p_partkey % 200 AS INTEGER)
      |      AS expiration_date
      |  FROM part WHERE p_partkey < 400""".stripMargin

  private val cpgRel =
    """SELECT CAST(p_partkey AS BIGINT) AS rel_option_id,
      |    CASE WHEN p_partkey % 5 = 0 THEN NULL
      |      ELSE CAST(p_partkey % 800 AS VARCHAR) || ':2,' ||
      |        CAST((p_partkey + 7) % 800 AS VARCHAR) END
      |      AS bundle_product_ids
      |  FROM part WHERE p_partkey < 400""".stripMargin

  /** cj source model (also a CTE of q142). */
  private val cjModel =
    s"""WITH cj AS (
       |  $cjStock),
       |itm AS (
       |  $coreItem),
       |mapping AS (
       |  SELECT DISTINCT TRIM(item_code) AS item_code, product_id
       |  FROM (
       |    SELECT product_id,
       |      UNNEST(string_split(COALESCE(eflexs_item_code, ''), ','))
       |        AS item_code
       |    FROM itm WHERE product_id IS NOT NULL) t_
       |  WHERE TRIM(item_code) != '')
       |SELECT ymd, batch, product_id, expiration_date,
       |  CAST(SUM(usable_quantity) AS BIGINT) AS stock_quantity
       |FROM (
       |  SELECT CAST(cj.updated_at AS DATE) AS ymd,
       |    CASE WHEN date_part('hour', cj.updated_at) < 17 THEN 10
       |      ELSE 20 END AS batch,
       |    COALESCE(m.product_id, '200000') AS product_id,
       |    COALESCE(cj.validate_date, DATE '2999-12-31')
       |      AS expiration_date,
       |    cj.usable_quantity
       |  FROM cj
       |  LEFT JOIN mapping m ON cj.item_code = m.item_code
       |  WHERE cj.$tsRange) t_
       |GROUP BY ymd, batch, product_id, expiration_date""".stripMargin

  /** coupang source model (also a CTE of q142). */
  private val cpgModel =
    s"""WITH inv AS (
       |  $cpgInv),
       |ex AS (
       |  $cpgExp),
       |rel AS (
       |  $cpgRel)
       |SELECT ymd, batch, product_id, expiration_date,
       |  CAST(SUM(stock_quantity) AS BIGINT) AS stock_quantity
       |FROM (
       |  SELECT CAST(updated_at AS DATE) AS ymd,
       |    CASE WHEN date_part('hour', updated_at) < 17 THEN 10
       |      ELSE 20 END AS batch,
       |    COALESCE(string_split(product, ':')[1], '200000') AS product_id,
       |    COALESCE(expiration_date, DATE '2999-12-31')
       |      AS expiration_date,
       |    stock_quantity
       |      * COALESCE(TRY_CAST(string_split(product, ':')[2] AS BIGINT),
       |        1) AS stock_quantity
       |  FROM (
       |    SELECT inv.option_id, inv.stock_quantity, inv.updated_at,
       |      ex.expiration_date,
       |      UNNEST(COALESCE(string_split(rel.bundle_product_ids, ','),
       |        [NULL])) AS product
       |    FROM inv
       |    LEFT JOIN ex ON inv.option_id = ex.exp_option_id
       |      AND inv.updated_at BETWEEN ex.start_time AND ex.end_time
       |    LEFT JOIN rel ON ex.exp_option_id = rel.rel_option_id
       |    WHERE inv.updated_at >= TIMESTAMP '1996-01-01 00:00:00'
       |      AND inv.updated_at < TIMESTAMP '1996-12-31 00:00:00'
       |        + INTERVAL 1 DAY) AS j_
       |  ) t_
       |GROUP BY ymd, batch, product_id, expiration_date""".stripMargin

  def q140: String = cjModel

  def q141: String = cpgModel

  def q142: String = {
    val cj = cjModel.replace("\n", "\n  ")
    val cpg = cpgModel.replace("\n", "\n  ")
    s"""WITH ecoinv AS (
       |  $ecoInv),
       |ecoq AS (
       |  SELECT CAST(updated_at AS DATE) AS ymd,
       |    CASE WHEN date_part('hour', updated_at) < 17 THEN 10 ELSE 20
       |      END AS batch,
       |    product_code,
       |    CAST(SUM(quantity) AS BIGINT) AS stock_quantity
       |  FROM ecoinv
       |  WHERE $tsRange
       |  GROUP BY 1, 2, 3),
       |ecopraw AS (
       |  $ecoPrd),
       |ecop AS (
       |  SELECT product_code,
       |    COALESCE(string_split(NULLIF(option_id, ''), '-')[1], '200000')
       |      AS product_id,
       |    NULLIF(option_id, '') AS option_id,
       |    COALESCE(TRY_CAST(try_strptime(expiration_date, '%Y%m%d')
       |      AS DATE), DATE '2999-12-31') AS expiration_date,
       |    updated_at
       |  FROM ecopraw),
       |sku AS (
       |  SELECT product_id AS s_product_id,
       |    expiration_date AS s_expiration_date,
       |    product_code AS s_product_code
       |  FROM (
       |    SELECT product_id, expiration_date, product_code,
       |      ROW_NUMBER() OVER (PARTITION BY product_id, expiration_date
       |        ORDER BY updated_at DESC NULLS LAST, product_code,
       |          option_id) AS rn
       |    FROM ecop WHERE option_id IS NOT NULL) t_
       |  WHERE rn = 1),
       |cjq AS (
       |  $cj),
       |cpgq AS (
       |  $cpg),
       |unioned AS (
       |  SELECT e.ymd, e.batch,
       |    COALESCE(p.product_code, '') AS product_code,
       |    0 AS group_id, e.stock_quantity
       |  FROM ecoq e
       |  LEFT JOIN ecop p ON e.product_code = p.product_code
       |  UNION ALL
       |  SELECT c.ymd, c.batch,
       |    COALESCE(s.s_product_code, '') AS product_code,
       |    1 AS group_id, c.stock_quantity
       |  FROM cjq c
       |  LEFT JOIN sku s ON c.product_id = s.s_product_id
       |    AND c.expiration_date = s.s_expiration_date
       |  UNION ALL
       |  SELECT g.ymd, g.batch,
       |    COALESCE(s.s_product_code, '') AS product_code,
       |    2 AS group_id, g.stock_quantity
       |  FROM cpgq g
       |  LEFT JOIN sku s ON g.product_id = s.s_product_id
       |    AND g.expiration_date = s.s_expiration_date)
       |SELECT ymd, batch, product_code,
       |  CAST(SUM(stock_quantity) AS BIGINT) AS stock_qty,
       |  CAST(SUM(CASE WHEN group_id = 0 THEN stock_quantity END)
       |    AS BIGINT) AS ecount_stock_qty,
       |  CAST(SUM(CASE WHEN group_id = 1 THEN stock_quantity END)
       |    AS BIGINT) AS cj_eflexs_stock_qty,
       |  CAST(SUM(CASE WHEN group_id = 2 THEN stock_quantity END)
       |    AS BIGINT) AS coupang_rfm_stock_qty
       |FROM unioned
       |GROUP BY ymd, batch, product_code""".stripMargin
  }
}
