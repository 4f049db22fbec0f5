package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Packing, Sampling, TextAnalysis}
import graft.sources.Sinks

/** Capstone: the whole pretraining-data curation surface composed into
  * one pipeline over the fixture corpus — quality gate → near-dup
  * cluster survivors → DSIR importance filter → corpus mixing → sequence
  * packing → deterministic shuffle-shard → sharded parquet layout.
  * Every stage consumes the previous stage's survivors; the spec pins
  * the invariants a training job depends on (monotone filtering, pack
  * budgets, replayable shard files, rerun determinism).
  */
class PipelineE2ESpec extends SparkSpec {

  test("curation pipeline composes end-to-end with stable invariants") {
    val docs = Tables.documents(spark, sf001)
    val total = docs.count()
    assert(total > 0)

    // 1. quality gate (Gopher rules, corpus-appropriate floors)
    val gated = docs.join(
      TextAnalysis.gopherFilter(docs, col("doc_id"), col("text"),
          minWords = 10, minStopwords = 1)
        .filter(col("keep")).select("doc_id"),
      "doc_id")
    val nGated = gated.count()
    assert(nGated > 0 && nGated <= total)

    // 2. near-dup clusters -> one survivor per cluster
    val survivors = gated.join(
      Dedup.dedupClusters(gated, col("doc_id"), col("text"))
        .filter(col("is_survivor")).select("doc_id"),
      "doc_id")
    val nSurv = survivors.count()
    assert(nSurv > 0 && nSurv <= nGated, "dedup only removes")

    // 3. DSIR importance weights; keep docs at or above the corpus mean
    val weighted = Sampling.importanceWeights(survivors, col("doc_id"),
      col("text"), col("source").isin("src1", "src2", "src3"),
      buckets = 256)
    val mean = weighted.agg(avg(col("dsir_logweight")).as("m"))
    val selected = survivors.join(
      weighted.filter(col("dsir_logweight").isNotNull)
        .crossJoin(broadcast(mean))
        .filter(col("dsir_logweight") >= col("m"))
        .select("doc_id"),
      "doc_id")
    val nSel = selected.count()
    assert(nSel > 0 && nSel <= nSurv)

    // 4. corpus mixing: upweight the en slice
    val mixed = Sampling.corpusMix(selected, col("doc_id"), col("lang"),
      weights = Seq("en" -> 1.0, "ko" -> 0.5, "ja" -> 0.5, "de" -> 0.5,
        "fr" -> 0.5))
    val nMixed = mixed.count()
    assert(nMixed > 0)

    // 5. sequence packing under a fixed token budget
    val packs = Packing.packSequences(mixed, col("doc_id"), col("text"),
      budget = 256)
    val packStats = packs.groupBy(col("pack_id"))
      .agg(sum(col("seg_tokens")).as("tok"))
    assert(packStats.filter(col("tok") > 256).count() == 0,
      "no pack exceeds its token budget")

    // 6. deterministic shuffle-shard + sharded parquet layout
    val sharded = Sampling.shuffleShardAuto(mixed, col("doc_id"),
      targetRowsPerShard = 16)
    val dir = java.nio.file.Files.createTempDirectory("e2e")
      .toFile.getAbsolutePath
    Sinks.writeTrainingShards(sharded, s"$dir/shards")
    val back = spark.read.parquet(s"$dir/shards")
    assert(back.count() == nMixed, "shard layout preserves every row")
    assert(back.select("shard").distinct().count() > 1,
      "auto-sizing produced multiple shards")

    // rerun determinism: the pipeline is RNG-free end to end
    val again = Sampling.shuffleShardAuto(mixed.repartition(7),
        col("doc_id"), targetRowsPerShard = 16)
      .select("doc_id", "shard", "pos").collect().toSet
    assert(again == sharded.select("doc_id", "shard", "pos")
      .collect().toSet, "content-hash pipeline: partitioning-invariant")
  }
}
