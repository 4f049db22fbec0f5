package graft

/** DuckDB oracle for the smartstore→sabangnet option matcher (q127),
  * mirroring `graft.models.SmtOptRelation` — including the runtime-built
  * quantity-placeholder regex (escape via backreference replacement,
  * anchored markers → '[^/]*', interior markers → a ' / ' segment).
  */
private[graft] object SmtOptOracle {

  val q127: String = {
    val addRows = (0 until 20).map(n =>
      s"('G${n % 5}', '그룹$n', '본품 $n', '${210000 + n}-0001')")
      .mkString(", ")
    s"""WITH
       |${ProductOracles.sbnOptCte},
       |optraw0 AS (
       |  SELECT 'SMT' || CAST(l_partkey * 10 + l_linenumber AS VARCHAR)
       |      AS option_id,
       |    CAST(l_partkey % 400 AS INTEGER) AS product_id,
       |    CAST(l_partkey % 3 AS INTEGER) AS product_type,
       |    CASE WHEN l_partkey % 3 = 2
       |      THEN '[G' || CAST(l_partkey % 5 AS VARCHAR) || '] 본품 ' ||
       |        CAST(l_partkey % 20 AS VARCHAR)
       |      ELSE 'PRD ' || CAST(l_partkey % 20 AS VARCHAR) END
       |      AS product_name,
       |    CASE WHEN (l_suppkey * 7 + l_orderkey) % 23 = 0
       |        THEN '그룹' || CAST(l_partkey % 20 AS VARCHAR) || ' : 본품 '
       |          || CAST(l_partkey % 20 AS VARCHAR)
       |      WHEN l_suppkey % 4 = 0
       |        THEN '색상' || CAST(l_suppkey % 4 AS VARCHAR) || ' / ' ||
       |          CAST(l_orderkey % 5 + 1 AS VARCHAR) || '개입'
       |      WHEN l_suppkey % 4 = 1
       |        THEN CAST(l_orderkey % 5 + 1 AS VARCHAR) || '개입 색상' ||
       |          CAST(l_suppkey % 4 AS VARCHAR)
       |      WHEN l_suppkey % 4 = 2
       |        THEN '(세트) ' || CAST(l_orderkey % 5 + 1 AS VARCHAR) ||
       |          '개입'
       |      ELSE '단일 ' || CAST(l_suppkey % 6 AS VARCHAR) END
       |      AS option_name,
       |    l_orderkey * 10 + l_linenumber AS src_seq,
       |    l_suppkey AS tb1
       |  FROM lineitem),
       |sopt AS (
       |  SELECT * EXCLUDE (rn, src_seq, tb1) FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY option_id
       |      ORDER BY src_seq, tb1, option_name) AS rn FROM optraw0)
       |  WHERE rn = 1),
       |exist AS (
       |  SELECT option_id,
       |    CASE WHEN n % 8 = 0
       |      THEN CAST(100000 + n % 300 AS VARCHAR) || ',' ||
       |        CAST(100300 + n * 3 % 300 AS VARCHAR)
       |      ELSE CAST(100000 + n * 7 % 300 AS VARCHAR) END
       |      AS bundle_product_ids
       |  FROM (SELECT option_id,
       |      TRY_CAST(regexp_extract(option_id, 'SMT([0-9]+)', 1) AS BIGINT)
       |        AS n
       |    FROM sopt)
       |  WHERE n % 4 = 0),
       |wo AS (
       |  SELECT * FROM sopt
       |  WHERE NOT EXISTS (SELECT 1 FROM exist e
       |    WHERE e.option_id = sopt.option_id)),
       |mapid AS (
       |  SELECT product_id_shop,
       |    CAST(200000 + CAST(product_id_shop AS BIGINT) AS VARCHAR)
       |      || '-0001' AS option_id_sbn
       |  FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY product_id_shop
       |      ORDER BY seq) AS rn
       |    FROM (SELECT CAST(p_partkey % 400 AS VARCHAR) AS product_id_shop,
       |        p_partkey AS seq
       |      FROM part WHERE p_partkey % 5 = 0))
       |  WHERE rn = 1),
       |t0 AS (
       |  SELECT w.option_id AS option_id_smt, m.option_id_sbn
       |  FROM wo w JOIN mapid m
       |    ON CAST(w.product_id AS VARCHAR) = m.product_id_shop
       |  WHERE w.product_type = 0),
       |mapname0 AS (
       |  SELECT * EXCLUDE (rn) FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY product_id_shop, sku_name ORDER BY seq) AS rn
       |    FROM (
       |      SELECT CAST(p_partkey % 400 AS VARCHAR) AS product_id_shop,
       |        p_partkey AS seq,
       |        UNNEST(['단일 ' || CAST(p_partkey % 6 AS VARCHAR),
       |          CASE WHEN p_partkey % 3 = 0
       |            THEN '색상' || CAST(p_partkey % 4 AS VARCHAR)
       |              || ' / $$수량$$'
       |          WHEN p_partkey % 3 = 1
       |            THEN '$$수량$$ 색상' || CAST(p_partkey % 4 AS VARCHAR)
       |          ELSE '(세트) $$수량$$' END]) AS sku_name
       |      FROM part))
       |  WHERE rn = 1),
       |mapname AS (
       |  SELECT product_id_shop, sku_name,
       |    CAST(200000 + CAST(product_id_shop AS BIGINT) AS VARCHAR)
       |      || '-0002' AS option_id_sbn,
       |    replace(
       |      regexp_replace(
       |        regexp_replace(
       |          regexp_replace(
       |            replace(sku_name, '$$수량$$', '__수량__'),
       |            '([\\*\\+\\?\\$$\\^\\.\\[\\]\\{\\}\\(\\)\\|])',
       |            '\\\\\\1', 'g'),
       |          '^__수량__', '[^/]*'),
       |        '__수량__$$', '[^/]*'),
       |      '__수량__', '[^/]* / [^/]*') AS pat
       |  FROM mapname0),
       |t1 AS (
       |  SELECT w.option_id AS option_id_smt, m.option_id_sbn
       |  FROM wo w JOIN mapname m
       |    ON CAST(w.product_id AS VARCHAR) = m.product_id_shop
       |      AND (CASE WHEN contains(m.sku_name, '$$수량$$')
       |        THEN regexp_matches(w.option_name, m.pat)
       |        ELSE w.option_name = m.sku_name END)
       |  WHERE w.product_type = 1),
       |addprd(group_id, group_name, opt_name, option_id_sbn) AS (VALUES
       |  $addRows),
       |t2 AS (
       |  SELECT w.option_id AS option_id_smt, a.option_id_sbn
       |  FROM (
       |    SELECT option_id, option_name,
       |      regexp_extract(product_name, '^\\[([^\\]]+)\\]', 1) AS grp,
       |      trim(regexp_replace(product_name, '^\\[[^\\]]+\\]', ''))
       |        AS base_name
       |    FROM wo WHERE product_type = 2) w
       |  JOIN addprd a
       |    ON (w.grp = a.group_id AND w.base_name = a.opt_name)
       |      OR (replace(w.option_name, ' ', '') =
       |        replace(a.group_name, ' ', '') || ':' ||
       |        replace(a.opt_name, ' ', ''))),
       |auto AS (
       |  SELECT u.option_id_smt, u.option_id_sbn,
       |    regexp_replace(
       |      COALESCE(o.bundle_option_ids, u.option_id_sbn || ':1'),
       |      '-[0-9]{4}', '', 'g') AS bundle_product_ids
       |  FROM (SELECT * FROM t0 UNION ALL SELECT * FROM t1
       |        UNION ALL SELECT * FROM t2) u
       |  LEFT JOIN opt o ON u.option_id_sbn = o.option_id),
       |best AS (
       |  SELECT option_id_smt AS option_id, bundle_product_ids FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY option_id_smt
       |      ORDER BY len(string_split(bundle_product_ids, ',')),
       |        option_id_sbn, bundle_product_ids) AS rn
       |    FROM auto)
       |  WHERE rn = 1)
       |SELECT option_id, bundle_product_ids FROM exist
       |UNION ALL
       |SELECT option_id, bundle_product_ids FROM best""".stripMargin
  }
}
