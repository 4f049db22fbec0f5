package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The smartstore→sabangnet option matcher (reference: intermediate/sales/
  * smartstore/relation__smt_opt_to_sbn_ids.sql:1-124): options with no
  * curated relation row are auto-matched through three strategies keyed by
  * product_type, then the best match (fewest bundle components) wins:
  *
  *  - type 0: id mapping — the shop's product id maps straight to
  *    '<product>-0001';
  *  - type 1: name mapping — the sku sheet's name matches literally,
  *    UNLESS it contains the '$수량$' (quantity) placeholder, in which
  *    case a REGEX is built from the template at runtime: placeholder →
  *    marker, regex specials escaped with a backreference replacement,
  *    anchored markers become '[^/]*', interior markers a whole ' / '
  *    segment — and the option name matches against that per-row pattern;
  *  - type 2: add-product mapping — the '[group]'-bracketed product name
  *    matches (group, name), OR the space-stripped option name equals
  *    'group:option' (an OR join over a ~20-row broadcast dim).
  *
  * Auto matches pull the sabangnet option's bundle string (falling back to
  * '<option>:1') and strip '-NNNN' option suffixes down to product grain.
  */
object SmtOptRelation {

  def install(r: ModelRegistry, sfDir: String): Unit = {

    r.register(Model("smt_opt_to_sbn_ids", Nil, View, ctx => {
      val s = ctx.session
      val optRaw = Tables.lineitem(s, sfDir).select(
        concat(lit("SMT"), col("l_partkey") * 10 + col("l_linenumber"))
          .as("option_id"),
        pmod(col("l_partkey"), lit(400)).cast("int").as("product_id"),
        pmod(col("l_partkey"), lit(3)).cast("int").as("product_type"),
        when(pmod(col("l_partkey"), lit(3)) === 2,
          concat(lit("[G"), pmod(col("l_partkey"), lit(5)), lit("] 본품 "),
            pmod(col("l_partkey"), lit(20))))
          .otherwise(concat(lit("PRD "), pmod(col("l_partkey"), lit(20))))
          .as("product_name"),
        // four option-name shapes the matcher understands, plus the rare
        // 'group : name' form the space-stripped equality exists for
        when(pmod(col("l_suppkey") * 7 + col("l_orderkey"), lit(23)) === 0,
          concat(lit("그룹"), pmod(col("l_partkey"), lit(20)),
            lit(" : 본품 "), pmod(col("l_partkey"), lit(20))))
          .when(pmod(col("l_suppkey"), lit(4)) === 0,
            concat(lit("색상"), pmod(col("l_suppkey"), lit(4)), lit(" / "),
              pmod(col("l_orderkey"), lit(5)) + 1, lit("개입")))
          .when(pmod(col("l_suppkey"), lit(4)) === 1,
            concat(pmod(col("l_orderkey"), lit(5)) + 1, lit("개입 색상"),
              pmod(col("l_suppkey"), lit(4))))
          .when(pmod(col("l_suppkey"), lit(4)) === 2,
            concat(lit("(세트) "), pmod(col("l_orderkey"), lit(5)) + 1,
              lit("개입")))
          .otherwise(concat(lit("단일 "), pmod(col("l_suppkey"), lit(6))))
          .as("option_name"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("__src_seq"),
        col("l_suppkey").as("__tb1"))
      // duplicate (l_orderkey, l_linenumber) pairs exist in the fixture;
      // option_name is the only column suppkey (not the partition key)
      // drives, so it joins the dedup order
      // six consumers downstream (existing, the anti-join builder, and
      // the three strategy branches) each get a differently-pruned copy
      // of this windowed dedup — checkpoint so it computes once
      val opt = graft.functions.F.checkpointShared(
        graft.functions.F.qualifyTopN(optRaw, Seq(col("option_id")),
          Seq(col("__src_seq"), col("__tb1"), col("option_name")))
          .drop("__src_seq", "__tb1"))

      // curated relation rows pass through untouched
      val optNum = expr(
        "try_cast(regexp_extract(option_id, 'SMT([0-9]+)', 1) AS BIGINT)")
      val existing = opt.select(col("option_id"), optNum.as("__n"))
        .filter(pmod(col("__n"), lit(4)) === 0)
        .select(col("option_id"),
          when(pmod(col("__n"), lit(8)) === 0,
            concat((lit(100000) + pmod(col("__n"), lit(300))).cast("string"),
              lit(","),
              (lit(100300) + pmod(col("__n") * 3, lit(300))).cast("string")))
            .otherwise((lit(100000) + pmod(col("__n") * 7, lit(300)))
              .cast("string"))
            .as("bundle_product_ids"))

      // shared by the four strategy consumers; each re-runs the anti join
      // over the CHECKPOINTED opt — cheap enough that a second checkpoint
      // write costs more than the repeats it would save (measured)
      val without = opt.join(existing.select(col("option_id")),
        Seq("option_id"), "left_anti")

      // type 0: id mapping (the reference filters shop_id = 'shop0055';
      // the synthesized sheet is that shop's slice)
      val mapId = graft.functions.F.qualifyTopN(
        Tables.part(s, sfDir)
          .filter(pmod(col("p_partkey"), lit(5)) === 0)
          .select(pmod(col("p_partkey"), lit(400)).cast("string")
            .as("product_id_shop"), col("p_partkey").as("__seq")),
        Seq(col("product_id_shop")), Seq(col("__seq")))
        .select(col("product_id_shop"),
          concat((lit(200000)
            + expr("cast(product_id_shop AS BIGINT)")).cast("string"),
            lit("-0001")).as("option_id_sbn"))
      val t0 = without.filter(col("product_type") === 0)
        .join(mapId,
          col("product_id").cast("string") === col("product_id_shop"))
        .select(col("option_id").as("option_id_smt"), col("option_id_sbn"))

      // type 1: name mapping — literal, or the template-built regex. The
      // escape chain mirrors the reference byte for byte: placeholder →
      // marker, specials escaped via backreference, anchors → '[^/]*',
      // interior markers → a whole ' / ' segment.
      val skuTemplate = when(pmod(col("p_partkey"), lit(3)) === 0,
        concat(lit("색상"), pmod(col("p_partkey"), lit(4)),
          lit(" / $수량$")))
        .when(pmod(col("p_partkey"), lit(3)) === 1,
          concat(lit("$수량$ 색상"), pmod(col("p_partkey"), lit(4))))
        .otherwise(lit("(세트) $수량$"))
      val mapName = graft.functions.F.qualifyTopN(
        Tables.part(s, sfDir).select(
          pmod(col("p_partkey"), lit(400)).cast("string")
            .as("product_id_shop"),
          col("p_partkey").as("__seq"),
          explode(array(
            concat(lit("단일 "), pmod(col("p_partkey"), lit(6))),
            skuTemplate)).as("sku_name")),
        Seq(col("product_id_shop"), col("sku_name")), Seq(col("__seq")))
        .select(col("product_id_shop"), col("sku_name"),
          concat((lit(200000)
            + expr("cast(product_id_shop AS BIGINT)")).cast("string"),
            lit("-0002")).as("option_id_sbn"))
      val marked = expr("replace(sku_name, '$수량$', '__수량__')")
      val escaped = regexp_replace(marked,
        lit("([\\*\\+\\?\\$\\^\\.\\[\\]\\{\\}\\(\\)\\|])"), lit("\\\\$1"))
      val startAnchored = regexp_replace(escaped, lit("^__수량__"),
        lit("[^/]*"))
      val endAnchored = regexp_replace(startAnchored, lit("__수량__$"),
        lit("[^/]*"))
      val named = mapName
        .withColumn("__pat3", endAnchored)
        .withColumn("__pat",
          expr("replace(__pat3, '__수량__', '[^/]* / [^/]*')"))
        .drop("__pat3")
      // regex evaluation runs on DISTINCT (product, option_name) pairs,
      // not raw option rows — option names repeat heavily, and a
      // non-foldable RLIKE pattern compiles per evaluation; the dedup cuts
      // compiles by the name-repetition factor, then an equi-join fans the
      // matches back out
      val t1opts = without.filter(col("product_type") === 1)
      val matchedNames = t1opts
        .select(col("product_id").cast("string").as("product_id_shop"),
          col("option_name")).distinct()
        .join(named, Seq("product_id_shop"))
        .filter(when(col("sku_name").contains("$수량$"),
          expr("option_name RLIKE __pat"))
          .otherwise(col("option_name") === col("sku_name")))
        .select(col("product_id_shop"), col("option_name"),
          col("option_id_sbn"))
      val t1 = t1opts
        .join(matchedNames,
          col("product_id").cast("string") === col("product_id_shop") &&
            t1opts("option_name") === matchedNames("option_name"))
        .select(col("option_id").as("option_id_smt"), col("option_id_sbn"))

      // type 2: add-product mapping — bracket-group + name, OR the
      // space-stripped 'group:option' equality (OR join over a 20-row
      // broadcast dim → a bounded nested loop by design)
      val addPrd = graft.functions.F.inlineDim(s,
        Seq("group_id", "group_name", "opt_name", "option_id_sbn"),
        (0 until 20).map(n => Seq(s"G${n % 5}", s"그룹$n", s"본품 $n",
          s"${210000 + n}-0001")))
      // space-normalizations HOISTED out of the OR-join condition
      // (round-15): inside the BNLJ predicate they re-ran per (row ×
      // dim-row) — 20 regex evaluations per option row; projected here
      // they run once per row / once per dim row. replace() is the
      // literal form of regexp_replace(x, " ", "") — same values, no
      // regex engine.
      val t2src = without.filter(col("product_type") === 2)
        .select(col("option_id"), col("option_name"),
          regexp_extract(col("product_name"), "^\\[([^\\]]+)\\]", 1)
            .as("grp"),
          trim(regexp_replace(col("product_name"), "^\\[[^\\]]+\\]", ""))
            .as("base_name"),
          expr("replace(option_name, ' ', '')").as("__opt_norm"))
      val addPrdNorm = addPrd.withColumn("__dim_norm",
        expr("concat(replace(group_name, ' ', ''), ':', " +
          "replace(opt_name, ' ', ''))"))
      val t2 = t2src.join(broadcast(addPrdNorm),
          (col("grp") === col("group_id") &&
            col("base_name") === col("opt_name")) ||
            (col("__opt_norm") === col("__dim_norm")))
        .select(col("option_id").as("option_id_smt"), col("option_id_sbn"))

      // auto matches: pull the sabangnet bundle (fallback '<option>:1'),
      // strip '-NNNN' suffixes, keep the tightest bundle per option
      val sbn = ProductMarts.sbnOption(s, sfDir)
        .select(col("option_id").as("option_id_sbn"),
          col("bundle_option_ids"))
      val auto = t0.unionByName(t1).unionByName(t2)
        .join(sbn, Seq("option_id_sbn"), "left")
        .select(col("option_id_smt"), col("option_id_sbn"),
          regexp_replace(
            coalesce(col("bundle_option_ids"),
              concat(col("option_id_sbn"), lit(":1"))),
            "-[0-9]{4}", "").as("bundle_product_ids"))
      val best = graft.functions.F.qualifyTopN(auto,
        Seq(col("option_id_smt")),
        Seq(size(split(col("bundle_product_ids"), ",")),
          col("option_id_sbn"), col("bundle_product_ids")))
        .select(col("option_id_smt").as("option_id"),
          col("bundle_product_ids"))

      existing.unionByName(best)
    }))
  }
}
