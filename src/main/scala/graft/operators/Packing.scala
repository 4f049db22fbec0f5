package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.F

/** Sequence packing for LLM pretraining: concatenate the token stream of a
  * deterministically-ordered corpus and split it at fixed `budget`-token
  * boundaries (the GPT/T5 "pack then chunk" shape — documents may span
  * pack boundaries; no token is padded or dropped). No reference analog;
  * this is one of the training-data-pipeline operators the engine adds
  * beyond the reference surface.
  */
object Packing {

  /** One row per (document, pack) segment: which training pack(s) each doc
    * lands in, where inside the doc the segment starts, and at which offset
    * of the pack it sits. Token positions come from a GLOBAL exclusive
    * prefix sum over the id order — computed distributed, exactly like
    * [[F.globalRowNumber]]: range-repartition on the order key, per-bucket
    * window sum, per-bucket token offsets from a broadcast count table.
    * The checkpoint pins one partitioner sample for both consumers (see
    * globalRowNumber's scaladoc for why persist() is not enough).
    *
    * Zero-token docs are dropped (they occupy no positions in the stream).
    * The stream order is ascending `idCol`, which must be unique — a total
    * order is what makes the packing cross-engine deterministic.
    *
    * Output: doc_id, n_tokens, pack_id (0-based), seg_start (0-based token
    * offset inside the doc), seg_tokens, pack_off (token offset inside the
    * pack). A doc longer than `budget` explodes into every pack it crosses.
    */
  def packSequences(df: DataFrame, idCol: Column, textCol: Column,
                    budget: Long, buckets: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    val toks = df.select(idCol.as("doc_id"),
        TextAnalysis.tokenCountWs(textCol).cast("long").as("__tok"))
      .filter(col("__tok") > 0)
    val ranged = toks.repartitionByRange(buckets, col("doc_id"))
      .withColumn("__bucket", spark_partition_id())
    val w = Window.partitionBy(col("__bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // localCheckpoint(true): one materialized evaluation for both
    // consumers, lost block = error (never a partitioner resample), no
    // disk round-trip (round-15; see F.checkpointShared)
    val summed = ranged
      .withColumn("__cum", sum(col("__tok")).over(w)).localCheckpoint(true)
    val counts = summed.groupBy(col("__bucket"))
      .agg(sum(col("__tok")).as("__cnt"))
    val offsets = counts.alias("a")
      .join(counts.alias("b"), col("b.__bucket") < col("a.__bucket"), "left")
      .groupBy(col("a.__bucket").as("__bucket"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__offset"))
    val positioned = summed.join(broadcast(offsets), "__bucket")
      .select(col("doc_id"), col("__tok").as("n_tokens"),
        (col("__cum") + col("__offset") - col("__tok")).as("__start"))
    positioned
      .withColumn("pack_id", explode(sequence(
        floor(col("__start") / budget),
        floor((col("__start") + col("n_tokens") - 1) / budget))))
      .select(col("doc_id"), col("n_tokens"), col("pack_id"),
        (greatest(col("__start"), col("pack_id") * budget) - col("__start"))
          .as("seg_start"),
        (least(col("__start") + col("n_tokens"), (col("pack_id") + 1) * budget)
          - greatest(col("__start"), col("pack_id") * budget)).as("seg_tokens"),
        (greatest(col("__start"), col("pack_id") * budget)
          - col("pack_id") * budget).as("pack_off"))
  }

  /** Token-window document chunking with overlap — the RAG / long-context
    * ingestion shape (fixed-size windows that stride by
    * `chunkTokens - overlap`, so consecutive chunks share `overlap`
    * tokens of context). Where [[packSequences]] concatenates the corpus
    * into training packs, this keeps every chunk inside its own document.
    *
    * Chunk count per doc is `1 + ceil(max(0, n - chunkTokens) / step)`:
    * one chunk always exists, and the final chunk ends exactly at the
    * last token (no degenerate tail chunk that is a pure suffix of its
    * predecessor). Tokens are whitespace words; blank docs yield one
    * empty chunk (callers filter on `n_tokens`).
    *
    * Scale: `split` + `sequence`/`posexplode` + `slice` — all codegen'd
    * array ops, zero shuffle, embarrassingly parallel; output volume is
    * input tokens × (1 + overlap/step) by construction.
    */
  def chunkByTokens(df: DataFrame, idCol: Column, textCol: Column,
                    chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap / $chunkTokens")
    val step = chunkTokens - overlap
    val toks = when(length(trim(textCol)) === 0, array())
      .otherwise(split(trim(textCol), "\\s+"))
    val base = df.select(idCol.as("doc_id"), toks.as("__toks"),
      size(toks).cast("long").as("n_doc_tokens"))
    val nChunks = lit(1L) +
      floor((greatest(col("n_doc_tokens") - chunkTokens, lit(0L)) +
        (step - 1)) / step).cast("long")
    base
      .select(col("doc_id"), col("__toks"), col("n_doc_tokens"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"), col("n_doc_tokens"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * step + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"),
        least(col("n_doc_tokens") - col("chunk_idx") * step,
          lit(chunkTokens.toLong)).as("n_tokens"))
  }
}
