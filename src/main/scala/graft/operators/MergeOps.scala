package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upsert / MERGE semantics without a transactional table format.
  *
  * The reference's load path is `INSERT … ON CONFLICT` with per-column
  * strategies (reference: core/smartstore/api/order/models.sql:189-200
  * `DO UPDATE SET c = COALESCE(EXCLUDED.c, c)`, `LEAST/GREATEST`;
  * extensions/bigquery.py:441-468 and extensions/postgres.py:554-581 —
  * strategy DSL `replace/ignore/greatest/least/source_first/target_first`).
  *
  * Spark shape: MERGE-as-join. `target FULL OUTER JOIN source ON keys`,
  * matched rows combined per-column by strategy, unmatched source rows
  * inserted, unmatched target rows kept. This is exactly what a Delta MERGE
  * compiles to physically (a full-outer shuffle join on the keys), so the
  * scale profile is identical: one shuffle on the PK, broadcast if the
  * source batch is small.
  *
  * MERGE requires unique source keys (SURVEY §"What's hard": the reference
  * pre-dedups with ROW_NUMBER before upsert) — `upsert` pre-dedups the
  * source with `keepFirst` ordering for exactly that reason.
  */
object MergeOps {

  sealed trait Strategy
  /** take source value unconditionally (ON CONFLICT DO UPDATE SET c = EXCLUDED.c) */
  case object Replace extends Strategy
  /** keep target value (ON CONFLICT DO NOTHING for this column) */
  case object Ignore extends Strategy
  /** greatest(source, target) — `last = GREATEST(...)` */
  case object Greatest extends Strategy
  /** least(source, target) — `first = LEAST(...)` */
  case object Least extends Strategy
  /** COALESCE(EXCLUDED.c, c) — source value unless null */
  case object SourceFirst extends Strategy
  /** COALESCE(c, EXCLUDED.c) — fill target nulls only */
  case object TargetFirst extends Strategy

  /** MERGE target←source on `keys`. `strategies` maps non-key columns to a
    * per-column conflict strategy; unlisted columns default to `default`.
    * `dedupOrder`: deterministic source pre-dedup order (first row per key
    * wins, matching ON CONFLICT first-seen semantics).
    */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String],
             strategies: Map[String, Strategy] = Map.empty,
             default: Strategy = SourceFirst,
             dedupOrder: Seq[Column] = Nil): DataFrame = {
    val valueCols = target.columns.filterNot(keys.contains).toSeq
    require(source.columns.toSet == target.columns.toSet,
      s"schema mismatch: ${source.columns.toSeq} vs ${target.columns.toSeq}")

    val dedupedSource =
      if (dedupOrder.nonEmpty)
        graft.functions.F.qualifyTopN(source, keys.map(source(_)), dedupOrder)
      else source.dropDuplicates(keys)

    val t = target.alias("t")
    val s = dedupedSource.alias("s")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, cond, "full_outer")

    val matched = keys.map(k => col(s"s.$k").isNotNull).reduce(_ && _) &&
      keys.map(k => col(s"t.$k").isNotNull).reduce(_ && _)
    val sOnly = keys.map(k => col(s"t.$k").isNull).reduce(_ && _)

    def merged(c: String): Column = {
      val sc = col(s"s.$c"); val tc = col(s"t.$c")
      val onMatch = strategies.getOrElse(c, default) match {
        case Replace     => sc
        case Ignore      => tc
        case Greatest    => greatest(sc, tc)
        case Least       => least(sc, tc)
        case SourceFirst => coalesce(sc, tc)
        case TargetFirst => coalesce(tc, sc)
      }
      when(matched, onMatch).when(sOnly, sc).otherwise(tc).as(c)
    }
    val keyCols = keys.map(k => coalesce(col(s"t.$k"), col(s"s.$k")).as(k))
    joined.select(keyCols ++ valueCols.map(merged): _*)
  }

  /** Schema evolution for MERGE (Delta's `mergeSchema`/autoMerge shape):
    * widen target and source to the UNION schema, each side's missing
    * columns added as typed nulls. A new source column materializes on
    * existing target rows as NULL; a source batch missing a column
    * leaves target values untouched (null source + the SourceFirst
    * coalesce). A same-name column with a DIFFERENT type fails loudly —
    * silent cross-type casts are how upserts corrupt tables. Column
    * order is target-first then new source columns, so an evolving
    * table's layout is stable across batches.
    */
  def alignSchemas(target: DataFrame, source: DataFrame)
      : (DataFrame, DataFrame) = {
    val tf = target.schema.map(f => f.name -> f.dataType).toMap
    val sf = source.schema.map(f => f.name -> f.dataType).toMap
    // a re-cased column ('score' vs 'Score') is NOT evolution: under the
    // default case-insensitive resolution, withColumn would REPLACE the
    // existing column with typed nulls — destroying target data — so any
    // case-only name drift fails before a single expression is built
    val caseDrift = for {
      t <- tf.keySet; s <- sf.keySet
      if t != s && t.equalsIgnoreCase(s)
    } yield s"$t vs $s"
    require(caseDrift.isEmpty,
      s"schema evolution cannot re-case a column: ${caseDrift.toSeq.sorted
        .mkString(", ")}")
    val conflicts = tf.keySet.intersect(sf.keySet)
      .filter(n => tf(n) != sf(n))
    require(conflicts.isEmpty,
      s"schema evolution cannot change a column's type: " +
        conflicts.toSeq.sorted.map(n => s"$n (${tf(n)} vs ${sf(n)})")
          .mkString(", "))
    val order = target.schema.map(_.name) ++
      source.schema.map(_.name).filterNot(tf.contains)
    def widen(df: DataFrame, have: Map[String, org.apache.spark.sql.types.DataType],
              other: Map[String, org.apache.spark.sql.types.DataType]): DataFrame = {
      val widened = other.keys.filterNot(have.contains)
        .foldLeft(df)((d, n) => d.withColumn(n, lit(null).cast(other(n))))
      widened.select(order.map(col): _*)
    }
    (widen(target, tf, sf), widen(source, sf, tf))
  }

  /** [[upsert]] behind the additive-evolution gate the MERGE sinks share:
    * widen both sides to the union schema when `evolveSchema`, else let
    * [[upsert]]'s exact-schema check fail loudly on drift.
    */
  def upsertAligned(target: DataFrame, source: DataFrame, keys: Seq[String],
                    strategies: Map[String, Strategy],
                    evolveSchema: Boolean): DataFrame = {
    val (t, s) =
      if (evolveSchema) alignSchemas(target, source) else (target, source)
    upsert(t, s, keys, strategies)
  }

  /** Insert-ignore (D2): `INSERT … ON CONFLICT DO NOTHING` — keep all target
    * rows, add only source rows whose key is absent (113 uses in the
    * reference, e.g. core/smartstore/api/order/models.sql:82,136,167).
    * Implemented as left-anti + union: one shuffle, no full-outer needed.
    */
  def insertIgnore(target: DataFrame, source: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val newRows = source.dropDuplicates(keys)
      .join(target.select(keys.map(col): _*), keys, "left_anti")
    target.unionByName(newRows.select(target.columns.map(col).toSeq: _*))
  }

  /** Apply a CDC change batch to a snapshot: `changes` carries the
    * snapshot's columns plus an op column ('I'/'U'/'D') and a sequence
    * column; per key only the HIGHEST-seq change wins (a debezium-style
    * feed replays compactly), then D drops the row, I/U contribute the
    * change row, untouched base rows pass through. The batch-side dual
    * of the generational MERGE sink ([[graft.sources.Sinks.upsertParquet]]
    * applies I/U durably; this operator also folds deletes and is the
    * pure-DataFrame form an oracle can state in SQL).
    *
    * Scale: one window over the CHANGE BATCH keyed by the merge key
    * (batch-sized, not snapshot-sized), one anti equi-join against the
    * snapshot, one union — the snapshot is never shuffled beyond the
    * join key.
    *
    * Determinism requires (key, seq) unique within the batch — enforced:
    * a duplicate would make "latest" ambiguous and the result
    * partition-dependent.
    */
  def applyCdcBatch(base: DataFrame, changes: DataFrame, keys: Seq[String],
                    opCol: String = "op", seqCol: String = "seq")
      : DataFrame = {
    // validation stays LAZY (no job at construction time — plan builds
    // and pipeline composition must stay free), DISTRIBUTED, and covers
    // the FULL batch: the violation flags are per-KEY window aggregates,
    // so losing rows (rn > 1, pruned from the output) still feed them
    // and the group's winner raises for ANY violation in its group. The
    // round-9 form rewrote opCol per row, which the optimizer was free
    // to evaluate only for rows surviving the latest-wins filter — a bad
    // op on a superseded change slid through silently.
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy((keys.map(col) :+ col(seqCol)): _*)
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    val flagged = changes
      .withColumn("__dup", count(lit(1)).over(wDup))
      .withColumn("__anyDup", max(col("__dup")).over(wKey))
      // explicit NULL arm: !isin(...) on NULL is NULL, not true
      .withColumn("__badOp", max(when(
        col(opCol).isNull || !col(opCol).isin("I", "U", "D"),
        coalesce(col(opCol).cast("string"), lit("NULL")))).over(wKey))
    val w = wKey.orderBy(col(seqCol).desc)
    val latest = flagged.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn(opCol,
        when(col("__anyDup") > 1, raise_error(concat(
          lit(s"applyCdcBatch: duplicate (${keys.mkString(",")}, " +
            s"$seqCol) in batch for key "),
          concat_ws(",", keys.map(k => col(k).cast("string")): _*))))
          .when(col("__badOp").isNotNull, raise_error(concat(
            lit(s"applyCdcBatch: op must be I/U/D, got "),
            col("__badOp"))))
          .otherwise(col(opCol)))
      .drop("__rn", "__dup", "__anyDup", "__badOp")
    val untouched = base.join(latest.select(keys.map(col): _*),
      keys, "left_anti")
    untouched.unionByName(
      latest.filter(col(opCol) =!= "D").drop(opCol, seqCol))
  }
}
