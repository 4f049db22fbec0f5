package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming layer.
  *
  * The reference is strictly batch (SURVEY §2.9) — its natural streaming
  * extension is the OrderStatus change feed (reference:
  * core/smartstore/api/order/extract.py:170-271, a cursor loop over
  * `lastChangedDate`). Here that shape is generalized over the `events`
  * stream table: event-time watermarking, windowed aggregation, and
  * stateful sessionization — the three primitives a change-feed pipeline
  * needs. All operators take/return DataFrames so they run identically on
  * `readStream` sources and on batch frames in tests.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark;
  * sessionization state is one small struct per active key, dropped on
  * timeout. Both shuffle once on the grouping key.
  */
object Streams {

  /** Watermarked tumbling-window counts/sums per event type.
    * Late rows beyond `watermark` are dropped by the engine, bounding state.
    */
  def windowedEventStats(events: DataFrame, watermark: String = "1 hour",
                         windowLen: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      // value sums snapshot through DECIMAL so the aggregate is
      // order-independent — exact at any parallelism (and replayable in an
      // external SQL oracle); the output stays double. (28,6) holds
      // |value| < 1e22 — far past double's 2^53 integer-exact range, so
      // the widening can't silently null-and-drop a large event the way a
      // narrower decimal would under non-ANSI cast
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,6)")).cast("double")
          .as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Windowed corpus-quality monitor — the observability stream an
    * ingestion pipeline runs NEXT TO its curation batch jobs: per
    * event-time window, document volume, mean quality statistics, and
    * the Gopher-gate keep rate, so an upstream regression (a scraper
    * change collapsing mean word length, a spam wave cratering the keep
    * rate) pages BEFORE it poisons a training mix. The per-doc statistics
    * are the SAME codegen'd columns the batch gate uses
    * ([[graft.operators.TextAnalysis.gopherStatColumns]]); the watermark
    * bounds window state, and the identical frame logic runs on a batch
    * frame for backfill.
    */
  def qualityMonitor(docs: DataFrame, tsCol: String = "ts",
                     textCol: String = "text",
                     minWords: Int = 50, minStopwords: Int = 2,
                     watermark: String = "1 hour",
                     windowLen: String = "10 minutes"): DataFrame = {
    import graft.operators.TextAnalysis
    docs.select(
        (col(tsCol) +: TextAnalysis.gopherStatColumns(col(textCol))): _*)
      .withColumn("keep", TextAnalysis.gopherKeep(
        minWords = minWords, minStopwords = minStopwords))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_words")), 4).as("avg_words"),
        round(avg(col("mean_word_len")), 4).as("avg_word_len"),
        round(sum(when(col("keep"), 1L).otherwise(0L)) / count(lit(1)), 4)
          .as("keep_rate"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("n_docs"), col("avg_words"), col("avg_word_len"),
        col("keep_rate"))
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp, n_events: Long,
                           sum_value: Double)

  /** Stateful sessionization via mapGroupsWithState: a session closes after
    * `gapMs` of user inactivity in EVENT time (event-time timeout fires when
    * the watermark passes last_event + gap — processing-time timeouts would
    * busy-loop empty micro-batches and tie session life to wall clock).
    * Emits the currently-open session on each update and the final session
    * on timeout; state is one small struct per active user, dropped on
    * close, so state size is bounded by concurrently-active users. The
    * batch equivalent (gap-based island detection) is sessionizeBatch.
    */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"${math.max(gapMs / 1000, 1)} seconds")
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, Session](
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Session(userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.sum)
          } else {
            val evs = rows.toSeq
            val tsMin = evs.map(_.ts.getTime).min
            val tsMax = evs.map(_.ts.getTime).max
            val prev = state.getOption
            val next = prev match {
              case Some(p) if tsMin - p.last <= gapMs =>
                SessionState(p.start, math.max(p.last, tsMax),
                  p.n + evs.size, p.sum + evs.map(_.value).sum)
              case _ =>
                SessionState(tsMin, tsMax, evs.size.toLong, evs.map(_.value).sum)
            }
            state.update(next)
            state.setTimeoutTimestamp(next.last + gapMs)
            Session(userId, new java.sql.Timestamp(next.start),
              new java.sql.Timestamp(next.last), next.n, next.sum)
          }
      }
  }

  /** Stream-stream interval join: left events matched to right events of
    * the same key within a trailing window (`right.ts ∈ [left.ts - within,
    * left.ts]`) — e.g. purchases attributed to the pageview that preceded
    * them. Both sides carry watermarks so the engine bounds join state: a
    * buffered right row is dropped once the left watermark passes its ts +
    * `within` (the interval condition gives Spark the state-eviction bound;
    * an unconstrained stream-stream join would buffer forever).
    * Column names are prefixed `l_`/`r_` since both sides share a schema.
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame, key: String,
                         tsCol: String = "ts", within: String = "1 hour",
                         watermark: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(tsCol, watermark)
      .select(col(key).as(s"l_$key"), col(tsCol).as("l_ts"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("l_row"))
    val r = right.withWatermark(tsCol, watermark)
      .select(col(key).as(s"r_$key"), col(tsCol).as("r_ts"),
        struct(right.columns.map(col).toIndexedSeq: _*).as("r_row"))
    l.join(r,
      col(s"l_$key") === col(s"r_$key") &&
      col("r_ts") >= col("l_ts") - expr(s"INTERVAL $within") &&
      col("r_ts") <= col("l_ts"))
  }

  /** Streaming exact dedup: drop duplicate keys across micro-batches with
    * state bounded by the event-time watermark — the streaming form of
    * `Dedup.exact` for a document/event feed (a key seen twice within the
    * watermark horizon is emitted once; state for keys older than the
    * watermark is dropped, so this scales to unbounded streams where an
    * unwindowed `dropDuplicates` would grow state forever).
    */
  def dedupStream(events: DataFrame, keys: Seq[String], tsCol: String = "ts",
                  watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming incremental load: MERGE each micro-batch into a persistent
    * keyed table via `foreachBatch` — the streaming form of the reference's
    * cursor-loop incremental load (extract.py:170-271 fetches changed rows,
    * models.sql upserts them; here the change feed is the stream and the
    * upsert is `Sinks.upsertParquet` with the same [[graft.operators
    * .MergeOps.Strategy]] DSL). Batches are pre-deduped inside upsert; a
    * retried batch re-merges idempotently for Replace/Greatest/Least/
    * coalesce strategies. With `appId` set, each micro-batch commits a
    * Delta `txn` action keyed (appId, batchId) and a REPLAYED batch is
    * skipped entirely — exactly-once even for strategies a re-merge
    * would not leave fixed, and no wasted re-merge on restart.
    */
  def upsertSink(tablePath: String, keys: Seq[String],
                 strategies: Map[String, graft.operators.MergeOps.Strategy] =
                   Map.empty,
                 appId: Option[String] = None): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      if (!batch.isEmpty)
        graft.sources.Sinks.upsertParquet(batch.sparkSession, tablePath,
          batch, keys, strategies,
          txn = appId.map(a => (a, batchId)))

  /** End-to-end change-feed pipeline (the streaming form of the
    * reference's order-status cursor loop, extract.py:170-271 +
    * models.sql's ON CONFLICT coalescing upsert): each micro-batch is
    * first reduced to its LATEST change per key (`tsCol` desc with the
    * remaining columns as tie-break — a cursor feed can carry several
    * changes for one order in one poll), then MERGEd into the persistent
    * keyed table. Feed batches arriving in cursor order make the table
    * converge to exactly the batch replay ([[changeFeedReplay]]); a
    * retried micro-batch re-merges idempotently.
    *
    * Scale: the per-batch reduction is one window over the batch (batch-
    * sized state only); the table MERGE shuffles on the keys. State held
    * by the ENGINE is zero — the table is the state, which is what lets
    * the feed run for months without watermark-bounded growth concerns.
    */
  def changeFeedSink(tablePath: String, keys: Seq[String], tsCol: String,
                     strategies: Map[String, graft.operators.MergeOps.Strategy] =
                       Map.empty,
                     appId: Option[String] = None): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      if (!batch.isEmpty) {
        val tieBreak = batch.columns.filterNot(c => keys.contains(c))
          .sorted.map(col).toSeq
        val latest = graft.functions.F.qualifyTopN(batch, keys.map(col),
          col(tsCol).desc +: tieBreak.map(_.desc))
        graft.sources.Sinks.upsertParquet(batch.sparkSession, tablePath,
          latest, keys, strategies,
          txn = appId.map(a => (a, batchId)))
      }

  /** Streaming near-dup ADMISSION — the continuously-ingesting deduped
    * corpus: each micro-batch is deduped within itself AND against the
    * persisted already-admitted corpus
    * ([[graft.operators.Dedup.incrementalDedup]]'s batch-probes-index
    * shape — the corpus is never self-joined, so per-batch cost tracks
    * the batch), and only admitted docs append to the corpus table.
    * Engine state is ZERO — the corpus TABLE is the state (the
    * [[changeFeedSink]] principle): no watermark-bounded state growth,
    * and a restart resumes from the table. A retried micro-batch
    * re-admits idempotently (admitted docs merge by key; their
    * duplicates are rejected again by the same content hashes).
    *
    * Cost honesty: the ADMISSION joins track the batch, but this sink
    * re-derives the corpus band index from the table every trigger
    * (`materialize = false` below, so nothing is persisted across
    * batches — a long-running query must not leak cached corpus-scale
    * frames each trigger). A production deployment at corpus scale
    * maintains the banded index as its own incrementally-upserted table
    * (admitted docs' bands appended alongside the docs) so the
    * per-trigger cost is truly batch-sized; this sink is the
    * self-contained form of that pipeline.
    */
  def dedupAdmissionSink(corpusPath: String, idColName: String = "doc_id",
                         textColName: String = "text",
                         n: Int = 3, k: Int = 32, bands: Int = 8,
                         verifyThreshold: Double = 0.7)
      : (DataFrame, Long) => Unit =
    (batch, _) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val hasCorpus = java.nio.file.Files.exists(
          java.nio.file.Paths.get(corpusPath, "_CURRENT"))
        val corpus =
          if (hasCorpus) graft.sources.Sinks.readUpsertTable(spark, corpusPath)
          else batch.limit(0)
        val verdict = graft.operators.Dedup.incrementalDedup(corpus, batch,
          col(idColName), col(textColName), n, k, bands, verifyThreshold,
          materialize = false)
        val admitted = batch.join(
          verdict.filter(col("is_admitted"))
            .select(col("doc_id").as(idColName)),
          idColName)
        if (!admitted.isEmpty)
          graft.sources.Sinks.upsertParquet(spark, corpusPath, admitted,
            Seq(idColName))
      }

  /** Catalog names for the two index tables backing one `indexPath` —
    * derived from the path so two streams over different locations never
    * collide in the shared session catalog.
    */
  private[graft] def dedupIndexTableNames(indexPath: String): (String, String) = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(indexPath.getBytes("UTF-8")).take(6)
      .map(b => f"$b%02x").mkString
    (s"graft_dedup_idx_${h}_sh", s"graft_dedup_idx_${h}_bands")
  }

  /** The PRUNED corpus-side probe frames for one micro-batch: the stored
    * band index restricted to the batch's bucket values (bucket pruning —
    * only matching bucket files are read) and the stored shingle table
    * restricted to the candidate ids those buckets surfaced (id-bucket
    * pruning). Both collects are micro-batch-bounded: bucket values ≤
    * |batch|·bands, candidate ids ≤ probed-bucket occupancy; past
    * `maxProbeKeys` the probe degrades to the unpruned full-index join —
    * correct, just no longer corpus-size-independent (and loudly logged,
    * because at that batch size the operator's cost model has changed).
    * Rows carrying the batch's own ids are excluded on both frames so a
    * partial previous attempt cannot make a retried batch reject itself.
    */
  /** Literal/join crossover for driver-held key filters: at or below
    * this many keys the filter is a literal IN (which is what lets the
    * bucketed scan prune files — bucket pruning only fires on literal
    * predicates, and with few values it selects few buckets); above it,
    * pruning would select nearly every file bucket anyway while the
    * literal list becomes a six-figure expression tree the analyzer and
    * codegen must carry, so the filter switches to a broadcast hash
    * semi/anti join against a tiny driver-built frame — same rows, plan
    * size O(1) in the key count.
    */
  private[graft] val MaxLiteralKeys = 1024

  /** A semi/anti membership filter that stays a literal IN while small
    * (bucket-pruning-friendly) and becomes a broadcast join past
    * [[MaxLiteralKeys]] (plan-size-safe). `negate=false` keeps matching
    * rows (semi), `negate=true` drops them (anti).
    */
  private[graft] def keysFilter(spark: org.apache.spark.sql.SparkSession,
                         df: DataFrame, colName: String,
                         keys: Seq[Long], negate: Boolean): DataFrame =
    if (keys.length <= MaxLiteralKeys) {
      val in = col(colName).isInCollection(keys)
      df.filter(if (negate) !in else in)
    } else {
      val keyFrame = broadcast(
        spark.createDataset(keys)(
          org.apache.spark.sql.Encoders.scalaLong).toDF(colName))
      df.join(keyFrame, Seq(colName), if (negate) "left_anti" else "left_semi")
    }

  private[graft] def prunedIndexProbe(spark: org.apache.spark.sql.SparkSession,
                                      shTable: String, bandsTable: String,
                                      batchBands: DataFrame,
                                      batchIds: DataFrame,
                                      maxProbeKeys: Int)
      : (DataFrame, DataFrame) = {
    val shFull = spark.table(shTable).select("id", "sh")
    val bandsFull = spark.table(bandsTable).select("id", "band", "bucket")
    val bucketVals = batchBands.select("bucket").distinct()
      // collect-bound: <= maxProbeKeys+1 bucket keys (limit-capped; loud full-scan fallback above the cap)
      .limit(maxProbeKeys + 1).collect().map(_.getLong(0))
    if (bucketVals.length > maxProbeKeys) {
      Console.err.println(s"[graft] dedup index probe: batch touches " +
        s">$maxProbeKeys buckets; falling back to full-index scan")
      (shFull.join(batchIds, Seq("id"), "left_anti"),
        bandsFull.join(batchIds, Seq("id"), "left_anti"))
    } else {
      val bandsPruned =
        keysFilter(spark, bandsFull, "bucket", bucketVals.toIndexedSeq,
            negate = false)
          .join(batchIds, Seq("id"), "left_anti")
      val candIds = bandsPruned
        .join(batchBands.select("band", "bucket").distinct(),
          Seq("band", "bucket"), "left_semi")
        // collect-bound: <= maxProbeKeys+1 candidate ids (limit-capped, same fallback)
        .select("id").distinct().limit(maxProbeKeys + 1).collect()
        .map(_.getLong(0))
      val shPruned =
        if (candIds.length > maxProbeKeys)
          shFull.join(batchIds, Seq("id"), "left_anti")
        else keysFilter(spark, shFull, "id", candIds.toIndexedSeq,
            negate = false)
          .join(batchIds, Seq("id"), "left_anti")
      (shPruned, bandsPruned)
    }
  }

  /** Remove a re-admitted id's index rows from EARLIER batch partitions.
    * An update re-ingesting an existing `doc_id` with new text would
    * otherwise strand the OLD text's shingle/band rows in their original
    * partition — future batches could be rejected against text no longer
    * in the corpus, and per-id duplicate rows would skew bucket-occupancy
    * caps. Detection is cheap in the common no-update case: one
    * id-bucket-pruned membership probe of the sh table (bucketed by id);
    * only partitions actually holding stale rows are rewritten, via the
    * same idempotent partition overwrite the ingest itself uses. The
    * bands table needs no separate detection pass — an id's band rows
    * are always written to the same batch partition as (or, after a
    * crash, a subset of) its sh rows.
    */
  private def compactReadmittedIds(spark: org.apache.spark.sql.SparkSession,
                                   shTable: String, bandsTable: String,
                                   admittedIds: Array[Long],
                                   currentBatch: Long): Unit = {
    val shT = spark.table(shTable)
    // literal IN below the crossover (id-bucket-pruned scan), broadcast
    // semi join above it (plan-size-safe) — [[keysFilter]]'s contract
    val membership =
      keysFilter(spark, shT, "id", admittedIds.toIndexedSeq, negate = false)
    val stale = membership.filter(col("batch") =!= currentBatch)
      // collect-bound: keysFilter-pruned to one micro-batch's admitted ids — batch-sized
      .select("id", "batch").collect()
    if (stale.nonEmpty) {
      val staleIds = stale.map(_.getLong(0)).distinct.toIndexedSeq
      for (p <- stale.map(_.getLong(1)).distinct.sorted;
           tbl <- Seq(shTable, bandsTable)) {
        val keep = keysFilter(spark,
            spark.table(tbl).filter(col("batch") === p),
            "id", staleIds, negate = true)
          .drop("batch").localCheckpoint(true)
        graft.sources.Sinks.overwriteBucketedPartition(spark, tbl, p, keep)
      }
    }
  }

  /** [[dedupAdmissionSink]]'s production form: the corpus's LSH index
    * (shingle sets + band rows, [[graft.operators.Dedup.lshIndexTables]])
    * is MAINTAINED as two bucketed catalog tables under `indexPath`
    * ([[graft.sources.Sinks.ensureBucketedIndexTable]] — bands bucketed
    * by `bucket`, shingles by `id`, both partitioned by ingest batch), so
    * each trigger only indexes the BATCH and probes the stored index with
    * BUCKET-PRUNED scans ([[prunedIndexProbe]]): per-trigger index I/O
    * tracks the batch's probed buckets, not the corpus — the scan plan
    * shows `SelectedBucketsCount`, and the corpus side never shuffles
    * (its `HashPartitioning` satisfies every probe join/window). The
    * corpus is never re-shingled, never re-scanned end-to-end, making
    * per-trigger cost genuinely batch-sized at any corpus size.
    *
    * Exactly-once index maintenance without a transaction log: each
    * micro-batch lands its admitted docs' index rows with a STATIC
    * `INSERT OVERWRITE … PARTITION (batch=N)` — a retried batch rewrites
    * its own partition, so replays converge instead of duplicating index
    * rows (the doc table itself converges through the keyed generational
    * MERGE as always). Two retry-safety rules make that true after a
    * crash BETWEEN the writes: (1) the probe EXCLUDES index rows carrying
    * the current batch's own ids, so a partial previous attempt cannot
    * make a batch reject itself; (2) the admitted frame is
    * localCheckpoint'ed BEFORE any write, cutting the read lineage on the
    * index partitions about to be replaced (and computing the verdict
    * exactly once per trigger). Re-ingesting an EXISTING id (an update)
    * is supported: the probe never compares a doc against its own old
    * rows, and [[compactReadmittedIds]] rewrites the affected old
    * partitions so no stale text lingers in the index.
    *
    * `indexBuckets` is fixed at table creation — size it for the mature
    * corpus (an oversized count only costs small files; an undersized one
    * caps probe selectivity).
    */
  def indexedDedupAdmissionSink(corpusPath: String, indexPath: String,
                                idColName: String = "doc_id",
                                textColName: String = "text",
                                n: Int = 3, k: Int = 32, bands: Int = 8,
                                verifyThreshold: Double = 0.7,
                                indexBuckets: Int = 64,
                                maxProbeKeys: Int = 1 << 18)
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val (shTable, bandsTable) = dedupIndexTableNames(indexPath)
        val (shB, bandedB) = graft.operators.Dedup.lshIndexTables(batch,
          col(idColName), col(textColName), n, k, bands)
        var admitted: DataFrame = null
        // bucketed-scan pruning is the probe's whole point — the
        // auto-disable planner rule would drop it for scans that feed a
        // broadcast join (losing SelectedBucketsCount pruning), so force
        // bucketed scans for the trigger's scope and restore after
        val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        val prevAuto = spark.conf.get(autoKey, "true")
        spark.conf.set(autoKey, "false")
        try {
          graft.sources.Sinks.ensureBucketedIndexTable(spark, shTable,
            s"$indexPath/sh", shB, "id", indexBuckets)
          graft.sources.Sinks.ensureBucketedIndexTable(spark, bandsTable,
            s"$indexPath/bands", bandedB, "bucket", indexBuckets)
          val batchIds = batch.select(col(idColName).as("id")).distinct()
          val (corpusSh, corpusBands) = prunedIndexProbe(spark, shTable,
            bandsTable, bandedB, batchIds, maxProbeKeys)
          val verdict = graft.operators.Dedup.incrementalDedupAgainstIndex(
            corpusSh, corpusBands, shB, bandedB, batch, col(idColName),
            verifyThreshold)
          admitted = batch.join(
            verdict.filter(col("is_admitted"))
              .select(col("doc_id").as(idColName)), idColName)
            .localCheckpoint(true)
          if (!admitted.isEmpty) {
            val admittedIds = admitted.select(col(idColName).as("id"))
            compactReadmittedIds(spark, shTable, bandsTable,
              // collect-bound: one micro-batch's admitted ids
              admitted.select(col(idColName)).collect().map(_.getLong(0)),
              batchId)
            graft.sources.Sinks.upsertParquet(spark, corpusPath, admitted,
              Seq(idColName))
            graft.sources.Sinks.overwriteBucketedPartition(spark, shTable,
              batchId, shB.join(admittedIds, "id"))
            graft.sources.Sinks.overwriteBucketedPartition(spark, bandsTable,
              batchId, bandedB.join(admittedIds, "id"))
          }
        } finally {
          spark.conf.set(autoKey, prevAuto)
          shB.unpersist(); bandedB.unpersist()
          if (admitted != null) admitted.unpersist()
        }
      }

  /** Streaming EXACT-dedup admission from a persisted BLOOM index — the
    * O(batch)-per-trigger form of exact-grain corpus admission
    * ([[indexedDedupAdmissionSink]]'s sibling for whole-document hashes,
    * no LSH needed). Per trigger: the batch probes the stored bitmap at
    * scan speed; only bloom-maybe rows reach the confirmation join whose
    * corpus side is broadcast-semi-pruned
    * ([[graft.operators.Dedup.bloomIncrementalExact]]); admitted docs
    * merge into the corpus table and their fingerprints OR into the
    * bitmap (bloom union is bitwise OR), which re-persists atomically.
    *
    * Crash ordering: the bitmap is written BEFORE the corpus merge. A
    * bitmap ahead of the corpus only over-routes rows to the confirm
    * join (safe); a bitmap behind the corpus would admit exact dups
    * unchecked (never allowed to happen). A retried batch cannot reject
    * itself: corpus rows carrying the batch's own ids are excluded from
    * the confirmation join.
    *
    * Capacity: the bitmap is sized for `expectedItems` up front; when
    * admissions exceed that capacity (tracked in a sidecar, no corpus
    * scans in the steady state), the bitmap REBUILDS from the corpus at
    * double capacity — amortized O(1) per admitted doc, and the fpp
    * contract holds at any corpus size instead of silently degrading.
    */
  /** Remove a re-admitted id's signature rows from EARLIER batch
    * partitions of a banded-signature index table — shared by the media
    * and video admission sinks. Detection is one id-filtered probe
    * (literal/broadcast crossover); only partitions actually holding
    * stale rows are rewritten, via the same idempotent partition
    * overwrite the ingest uses.
    */
  private def compactStaleSignatureRows(
      spark: org.apache.spark.sql.SparkSession, table: String,
      admittedIds: Array[Long], currentBatch: Long): Unit =
    if (admittedIds.nonEmpty) {
      val stale = keysFilter(spark, spark.table(table), "id",
          admittedIds.toIndexedSeq, negate = false)
        .filter(col("batch") =!= currentBatch)
        // collect-bound: keysFilter-pruned to one micro-batch's admitted ids — batch-sized
        .select("id", "batch").collect()
      if (stale.nonEmpty) {
        val staleIds = stale.map(_.getLong(0)).distinct.toIndexedSeq
        stale.map(_.getLong(1)).distinct.sorted.foreach { p =>
          val keep = keysFilter(spark,
              spark.table(table).filter(col("batch") === p),
              "id", staleIds, negate = true)
            .drop("batch").localCheckpoint(true)
          graft.sources.Sinks.overwriteBucketedPartition(spark, table, p,
            keep)
        }
      }
    }

  /** Catalog table name for a media-signature index path. */
  def mediaIndexTableName(indexPath: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(indexPath.getBytes("UTF-8")).take(6)
      .map(b => f"$b%02x").mkString
    s"graft_media_idx_${h}_bands"
  }

  /** Streaming MEDIA near-dup admission — [[indexedDedupAdmissionSink]]
    * at 64-bit-signature grain: each micro-batch of media blobs is
    * decoded map-only (no exchange before decode), hashed with `hasher`
    * (image pHash by default; audio fingerprint or any
    * `bytes => Option[signature]` plugs in), deduped within itself AND
    * against the PERSISTED banded-signature index
    * ([[graft.operators.Multimodal.incrementalHashDedupAgainstIndex]]),
    * and only admitted rows merge into the corpus table. The index is a
    * bucket-bucketed catalog table partitioned by ingest batch: the
    * probe restricts to the batch's bucket values through the literal/
    * broadcast [[keysFilter]] crossover, so per-trigger index I/O
    * tracks the batch's probed buckets, not the corpus. Engine state is
    * zero — the tables are the state.
    *
    * Idempotence: index rows carrying the batch's own ids are excluded
    * from the probe (a partial previous attempt cannot make a retried
    * batch reject itself), the corpus merge is keyed, and the batch's
    * index rows land as a partition overwrite — replays converge in
    * any crash ordering. Undecodable blobs are dropped (they cannot
    * near-dup anything, and admitting them is a policy choice left to
    * the caller).
    */
  def mediaDedupAdmissionSink(corpusPath: String, indexPath: String,
                              maxHamming: Int = 3, maxBucket: Int = 64,
                              indexBuckets: Int = 64,
                              idColName: String = "media_id",
                              contentColName: String = "content",
                              hasher: Array[Byte] => Option[Long] =
                                graft.operators.Multimodal.imagePHash _)
      : (DataFrame, Long) => Unit = { (batch0, batchId) =>
    if (!batch0.isEmpty) {
      val spark = batch0.sparkSession
      val Multimodal = graft.operators.Multimodal
      val Sinks = graft.sources.Sinks
      val batch = batch0.localCheckpoint(true)
      // map-only signature extraction — the imageHashes shape, hasher-
      // generic; rows that do not decode yield no signature
      val hashes = spark.createDataFrame(
        batch.select(col(idColName), col(contentColName)).rdd
          .mapPartitions { it =>
            javax.imageio.ImageIO.setUseCache(false)
            it.flatMap { r =>
              Option(r.getAs[Array[Byte]](1)).flatMap(hasher)
                .map(h => org.apache.spark.sql.Row(r.getLong(0), h))
            }
          },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("phash",
            org.apache.spark.sql.types.LongType, nullable = false))))
        .localCheckpoint(true)
      val table = mediaIndexTableName(indexPath)
      Sinks.ensureBucketedIndexTable(spark, table, s"$indexPath/bands",
        Multimodal.bandedHashes(hashes.limit(0), maxHamming),
        "bucket", indexBuckets)
      val bucketVals = Multimodal.bandedHashes(hashes, maxHamming)
        // collect-bound: one micro-batch's distinct band buckets (<= batch rows x bands)
        .select("bucket").distinct().collect().map(_.getLong(0))
        .toIndexedSeq
      val batchIds = hashes.select("id")
      val corpusBanded = keysFilter(spark,
          spark.table(table).select("id", "phash", "band", "bucket"),
          "bucket", bucketVals, negate = false)
        .join(batchIds, Seq("id"), "left_anti") // retry self-exclusion
      val verdict = Multimodal.incrementalHashDedupAgainstIndex(
          corpusBanded, hashes, maxHamming, maxBucket)
        .localCheckpoint(true)
      val admittedIds = verdict.filter(col("is_admitted")).select("id")
      val admitted = batch.join(
        admittedIds.withColumnRenamed("id", idColName), idColName)
      // RE-ADMITTED ids (an update re-ingesting an existing media_id
      // with new bytes) would strand their OLD signature's band rows in
      // the original batch partition — future batches could be rejected
      // against content no longer in the corpus. Rewrite only the
      // partitions actually holding stale rows (the text sink's
      // compactReadmittedIds discipline at signature grain).
      compactStaleSignatureRows(spark, table,
        // collect-bound: one micro-batch's admitted ids
        admittedIds.collect().map(_.getLong(0)), batchId)
      if (!admitted.isEmpty)
        Sinks.upsertParquet(spark, corpusPath, admitted, Seq(idColName))
      // the batch's index partition is written LAST and unconditionally
      // (possibly empty): a replay erases any partial earlier write
      Sinks.overwriteBucketedPartition(spark, table, batchId,
        Multimodal.bandedHashes(hashes.join(admittedIds, "id"), maxHamming)
          .localCheckpoint(true))
    }
  }

  /** Catalog table name for a video frame-signature index path. */
  def videoIndexTableName(indexPath: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(indexPath.getBytes("UTF-8")).take(6)
      .map(b => f"$b%02x").mkString
    s"graft_video_idx_${h}_bands"
  }

  /** Streaming VIDEO near-dup admission — [[mediaDedupAdmissionSink]]
    * at frame-signature grain: each micro-batch of clips is frame-
    * decoded map-only (MJPEG via the JDK —
    * [[graft.operators.Multimodal.videoFrameHashes]]), per-frame
    * pHashes are banded, and a clip is rejected when it shares ≥
    * `minShared` near-identical frame signatures with any single
    * already-admitted clip (or an earlier clip in the same batch) —
    * [[graft.operators.Multimodal.incrementalFrameDedupAgainstIndex]]
    * probing the persisted bucketed frame index, bucket-restricted to
    * the batch's touched values. Same idempotence discipline as the
    * media sink: probe self-exclusion, keyed corpus merge, partition-
    * overwrite index writes, stale-row compaction for re-admitted ids.
    * Clips in codecs the JDK cannot decode yield no frames and are NOT
    * admitted (admission requires signatures; route undecodable blobs
    * to a quarantine table upstream if they must be kept).
    */
  def videoDedupAdmissionSink(corpusPath: String, indexPath: String,
                              maxHamming: Int = 3, minShared: Int = 2,
                              maxBucket: Int = 1024,
                              indexBuckets: Int = 64,
                              idColName: String = "media_id",
                              contentColName: String = "content")
      : (DataFrame, Long) => Unit = { (batch0, batchId) =>
    if (!batch0.isEmpty) {
      val spark = batch0.sparkSession
      val Multimodal = graft.operators.Multimodal
      val Sinks = graft.sources.Sinks
      val batch = batch0.localCheckpoint(true)
      // distinct (clip, frame signature) rows — map-only decode
      val frames = Multimodal.videoFrameHashes(spark, batch,
          idColName, contentColName)
        .select(col("video_id").as("id"), col("phash")).distinct()
        .localCheckpoint(true)
      val bandedB = Multimodal.bandedHashes(frames, maxHamming)
        .localCheckpoint(true)
      val table = videoIndexTableName(indexPath)
      Sinks.ensureBucketedIndexTable(spark, table, s"$indexPath/bands",
        bandedB.limit(0), "bucket", indexBuckets)
      // collect-bound: one micro-batch's distinct band buckets (<= batch rows x bands)
      val bucketVals = bandedB.select("bucket").distinct().collect()
        .map(_.getLong(0)).toIndexedSeq
      val corpusBanded = keysFilter(spark,
          spark.table(table).select("id", "phash", "band", "bucket"),
          "bucket", bucketVals, negate = false)
        .join(frames.select("id").distinct(), Seq("id"), "left_anti")
      val verdict = Multimodal.incrementalFrameDedupAgainstIndex(
          corpusBanded,
          frames.select(col("id").as("video_id"), col("phash")),
          maxHamming, minShared, maxBucket)
        .localCheckpoint(true)
      val admittedIds = verdict.filter(col("is_admitted")).select("id")
      compactStaleSignatureRows(spark, table,
        // collect-bound: one micro-batch's admitted ids
        admittedIds.collect().map(_.getLong(0)), batchId)
      val admitted = batch.join(
        admittedIds.withColumnRenamed("id", idColName), idColName)
      if (!admitted.isEmpty)
        Sinks.upsertParquet(spark, corpusPath, admitted, Seq(idColName))
      Sinks.overwriteBucketedPartition(spark, table, batchId,
        bandedB.join(admittedIds, "id").localCheckpoint(true))
    }
  }

  def bloomDedupAdmissionSink(corpusPath: String, indexPath: String,
                              idColName: String = "doc_id",
                              textColName: String = "text",
                              expectedItems: Long = 1L << 20,
                              fpp: Double = 0.01,
                              fam: graft.operators.Dedup.HashFamily =
                                graft.operators.Dedup.XxHash)
      : (DataFrame, Long) => Unit =
    (batch, _) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        val Dedup = graft.operators.Dedup
        val Sinks = graft.sources.Sinks
        import java.nio.file.{Files, Paths}
        val countFile = Paths.get(indexPath, "_admitted_count.json")
        def readCount(): Long =
          if (Files.exists(countFile))
            new com.fasterxml.jackson.databind.ObjectMapper()
              .readTree(Files.readString(countFile)).get("n").asLong()
          else 0L
        def capacityOf(mBits: Long): Long = {
          val ln2 = math.log(2.0)
          (mBits * ln2 * ln2 / -math.log(fpp)).toLong.max(1L)
        }
        val hasCorpus = Files.exists(Paths.get(corpusPath, "_CURRENT"))
        def corpusNow() =
          if (hasCorpus) Sinks.readUpsertTable(spark, corpusPath)
          else batch.limit(0)
        def fpsOf(df: DataFrame) = df.select(
          fam.hash(graft.operators.TextAnalysis.normText(col(textColName)))
            .as("fp"))
        // load-or-init; rebuild at double capacity when admissions have
        // outgrown the design point (one corpus scan, amortized-rare)
        var (words, m, k) =
          if (Files.exists(Paths.get(indexPath, "_bloom_meta.json"))) {
            val (w0, m0, k0, _) = Dedup.readBloomIndex(spark, indexPath)
            if (readCount() > capacityOf(m0)) {
              val (m1, k1) = Dedup.bloomSizing(
                math.max(readCount() * 2, expectedItems), fpp)
              (Dedup.buildBloomBitmap(fpsOf(corpusNow()), col("fp"),
                m1, k1, fam), m1, k1)
            } else (w0, m0, k0)
          } else {
            val (m0, k0) = Dedup.bloomSizing(expectedItems, fpp)
            (new Array[Long]((m0 / 64L).toInt), m0, k0)
          }
        // a retried batch must not reject itself against its own
        // previous partial admission
        val batchIds = batch.select(col(idColName)).distinct()
        val corpus = corpusNow().join(broadcast(batchIds),
          Seq(idColName), "left_anti")
        val verdict = Dedup.bloomIncrementalExact(corpus, batch,
          col(idColName), col(textColName), fpp, fam,
          index = Some((words, m, k)))
        val admitted = batch.join(
          verdict.filter(col("is_admitted"))
            .select(col("doc_id").as(idColName)), idColName)
          .localCheckpoint(true)
        try {
          val nAdmitted = admitted.count()
          if (nAdmitted > 0) {
            val newBits = Dedup.buildBloomBitmap(fpsOf(admitted),
              col("fp"), m, k, fam)
            var i = 0
            while (i < words.length) { words(i) |= newBits(i); i += 1 }
            val prevCount = readCount()
            // bitmap first, then corpus (see ordering note above)
            Dedup.writeBloomIndex(spark, words, m, k, fam, indexPath)
            Files.writeString(countFile,
              s"""{"n":${prevCount + nAdmitted}}""")
            Sinks.upsertParquet(spark, corpusPath, admitted, Seq(idColName))
          }
        } finally admitted.unpersist()
      }

  /** Streaming cluster-drift monitor: every micro-batch's embeddings are
    * assigned to FIXED reference centroids (trained once on a baseline
    * corpus with [[graft.operators.Similarity.kmeansClusters]]'s trainer
    * and passed in as plain rows — broadcast, never retrained online),
    * and the per-cluster admission histogram appends to a stats table
    * keyed by batch. Drift shows up as the histogram shifting against
    * the baseline — the early-warning signal that an embedding corpus'
    * topic mix is moving (new crawl source, upstream encoder change)
    * BEFORE any downstream model notices. Engine state is zero (the
    * stats TABLE is the state, the [[changeFeedSink]] principle); cost
    * per trigger is |batch| × broadcast(k centroids) — the bounded
    * assignment loop, batch-sized.
    */
  def clusterDriftSink(centroids: Seq[(Long, Seq[Double])],
                       statsPath: String,
                       idColName: String = "vec_id",
                       vecColName: String = "vec")
      : (DataFrame, Long) => Unit = {
    require(centroids.nonEmpty, "need at least one reference centroid")
    (batch, batchId) =>
      if (!batch.isEmpty) {
        val spark = batch.sparkSession
        import spark.implicits._
        val cents = centroids.toDF("cid", "cvec")
        val sim = graft.operators.Similarity.cosine(
          col(vecColName), col("cvec"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(idColName))
          .orderBy(col("__sim").desc, col("cid"))
        val hist = batch.crossJoin(broadcast(cents))
          .withColumn("__sim", sim)
          .withColumn("__cr",
            org.apache.spark.sql.functions.row_number().over(w))
          .filter(col("__cr") === 1)
          .groupBy(col("cid").as("cluster_id"))
          .agg(count(lit(1)).as("n"),
            round(avg(col("__sim")), 4).as("mean_sim"))
          .withColumn("batch_id", lit(batchId))
        // IDEMPOTENT per batch_id: a retried/replayed micro-batch must
        // replace its own histogram partition, not append a duplicate —
        // double-counted rows would fabricate the very drift signal this
        // sink exists to detect. Dynamic overwrite touches only the
        // partitions present in the batch (exactly one: this batch_id);
        // all other batches' partitions stay untouched — the same
        // exactly-once discipline as the admission sinks.
        hist.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(statsPath)
      }
  }

  /** Batch replay of a change feed: the table [[changeFeedSink]] converges
    * to — latest change per key over the WHOLE feed. The equivalence
    * (stream-applied batches == one batch replay) is the pipeline's
    * correctness contract, asserted in StreamsSpec.
    */
  def changeFeedReplay(feed: DataFrame, keys: Seq[String],
                       tsCol: String): DataFrame = {
    val tieBreak = feed.columns.filterNot(c => keys.contains(c))
      .sorted.map(col).toSeq
    graft.functions.F.qualifyTopN(feed, keys.map(col),
      col(tsCol).desc +: tieBreak.map(_.desc))
  }

  /** Batch sessionization — gap-based island detection with windows:
    * new session when gap to previous event > gapMinutes; session id =
    * running count of session starts (reference models time-series as
    * date-partitioned snapshots diffed with LEAD — same island technique,
    * naver_shp__stock_sales.sql:40-48).
    * One shuffle on user_id; two window passes, no joins.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wSess = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("session_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("session_id"), col("ts"), col("event_id"),
        col("value"))
  }

  /** Streaming crawl-frontier admission — the discovery side of a web
    * pipeline: each micro-batch of candidate URLs (e.g.
    * [[graft.operators.TextAnalysis.extractLinks]] output) is
    * canonicalized, run through the politeness/policy stages (domain
    * blocklist, robots.txt for `agent`), deduplicated against the
    * PERSISTED seen-set, and only then appended to the frontier table.
    * Rejections are auditable: with `rejectsPath` set, every rejected
    * URL lands in a batch_id-partitioned table with its reason
    * (`blocklist` / `robots`) — written as a dynamic partition
    * overwrite, so replays converge ([[clusterDriftSink]] discipline).
    *
    * Seen-set state is the [[bloomDedupAdmissionSink]] machinery keyed
    * by the canonical URL's hash (rendered to a string fingerprint —
    * NOT normText(url), which would case-fold case-sensitive paths):
    * broadcast bitmap probe at scan speed, exact confirm join, crash-
    * safe generational persistence, capacity-doubling rebuild. A URL
    * seen once is never re-admitted — re-crawl scheduling is a policy
    * layer above this sink (documented non-goal).
    *
    * Frontier rows: (url_id, url, curl, host). Policy frames
    * (`blocklist`: domain; `robots`: domain, robots_txt) are read per
    * batch — refresh them by replacing the backing table.
    */
  def frontierAdmissionSink(frontierPath: String, indexPath: String,
                            blocklist: DataFrame, robots: DataFrame,
                            agent: String,
                            urlColName: String = "url",
                            rejectsPath: Option[String] = None,
                            expectedItems: Long = 1L << 20,
                            fpp: Double = 0.01)
      : (DataFrame, Long) => Unit = {
    val TextAnalysis = graft.operators.TextAnalysis
    val Robots = graft.operators.Robots
    (batch0, batchId) =>
      if (!batch0.isEmpty) {
        val canon = batch0.select(col(urlColName).as("url"))
          .withColumn("curl", TextAnalysis.canonicalUrl(col("url")))
          .withColumn("url_id", graft.functions.F.hash64(col("curl")))
          .dropDuplicates("url_id") // within-batch exact dedup
          .localCheckpoint(true)
        val bl = TextAnalysis.domainBlocklistFilter(canon, col("url_id"),
            col("url"), blocklist)
          .select(col("doc_id").as("url_id"), col("host"), col("blocked"))
        val rb = Robots.robotsFilter(canon, col("url_id"), col("url"),
            robots, agent)
          .select(col("doc_id").as("url_id"), col("allowed"))
        val judged = canon.join(bl, "url_id").join(rb, "url_id")
          .localCheckpoint(true)
        rejectsPath.foreach { rp =>
          val rejects = judged.filter(col("blocked") || !col("allowed"))
            .select(col("url_id"), col("url"),
              when(col("blocked"), "blocklist").otherwise("robots")
                .as("reason"),
              lit(batchId).as("batch_id"))
          rejects.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(rp)
        }
        val pass = judged.filter(!col("blocked") && col("allowed"))
          .select(col("url_id"), col("url"), col("curl"), col("host"),
            // the seen-set fingerprint: canonical-hash as a string
            // (digits/hex only — normText-stable by construction)
            col("url_id").cast("string").as("fp_key"))
        if (!pass.isEmpty)
          bloomDedupAdmissionSink(frontierPath, indexPath,
            idColName = "url_id", textColName = "fp_key",
            expectedItems = expectedItems, fpp = fpp)(pass, batchId)
      }
  }
}
