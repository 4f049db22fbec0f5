package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams
import graft.streaming.Streams.Event

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("windowedEventStats aggregates a real stream with watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streams.windowedEventStats(df, "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData((ts(0), "click", 1.0), (ts(5), "click", 2.0), (ts(12), "view", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_stats")
        .groupBy("win_start", "event_type")
        .agg(max("n_events").as("n"), max("sum_value").as("s"))
        .collect()
      val click = rows.find(_.getString(1) == "click").get
      assert(click.getLong(2) == 2 && click.getDouble(3) == 3.0)
      val view = rows.find(_.getString(1) == "view").get
      assert(view.getLong(2) == 1 && view.getDouble(3) == 4.0)
    } finally q.stop()
  }

  test("qualityMonitor tracks windowed keep rate; stream equals batch backfill") {
    implicit val sq = spark.sqlContext
    val good = "the quick brown fox jumps over the lazy dog"
    val bad = "a a"
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "text")
    val q = Streams.qualityMonitor(df, minWords = 5, minStopwords = 1,
        watermark = "10 minutes", windowLen = "10 minutes")
      .writeStream.format("memory").queryName("qmon")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData((ts(0), good), (ts(1), bad), (ts(12), good))
      q.processAllAvailable()
      val rows = spark.table("qmon").groupBy("win_start")
        .agg(max("n_docs").as("n"), max("keep_rate").as("kr"))
        .orderBy("win_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(1) == 2 && rows(0).getDouble(2) == 0.5)
      assert(rows(1).getLong(1) == 1 && rows(1).getDouble(2) == 1.0)
    } finally q.stop()
    // backfill: the identical frame logic over a static batch frame
    val batch = Seq((ts(0), good), (ts(1), bad), (ts(12), good))
      .toDF("ts", "text")
    val b = Streams.qualityMonitor(batch, minWords = 5, minStopwords = 1,
        windowLen = "10 minutes")
      .orderBy("win_start").collect()
      .map(r => (r.getLong(2), r.getDouble(5))).toSeq
    assert(b == Seq((2L, 0.5), (1L, 1.0)))
  }

  test("sessionize (stateful streaming) merges events within gap") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streams.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Update()).start()
    try {
      mem.addData(Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0), Event(2L, ts(0), 9.0))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
      val u1 = rows.filter(_.getLong(0) == 1L).maxBy(_.getLong(3))
      assert(u1.getLong(3) == 2 && u1.getDouble(4) == 3.0)
      assert(u1.getTimestamp(1) == ts(0) && u1.getTimestamp(2) == ts(5))
    } finally q.stop()
  }

  test("streamIntervalJoin matches right rows in the trailing window") {
    implicit val sq = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp, String)]
    val rMem = MemoryStream[(Long, Timestamp, String)]
    val q = Streams.streamIntervalJoin(
        lMem.toDF().toDF("user_id", "ts", "tag"),
        rMem.toDF().toDF("user_id", "ts", "tag"),
        "user_id", within = "30 minutes", watermark = "10 minutes")
      .select(col("l_row.tag").as("l_tag"), col("r_row.tag").as("r_tag"))
      .writeStream.format("memory").queryName("ivjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      rMem.addData((1L, ts(0), "pv_early"), (1L, ts(50), "pv_late"), (2L, ts(0), "pv_other"))
      lMem.addData((1L, ts(20), "buy"))
      q.processAllAvailable()
      val rows = spark.table("ivjoin").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // pv_early (ts 0) is within [ -10, 20 ] of buy; pv_late (50) is after;
      // pv_other is another user
      assert(rows == Set(("buy", "pv_early")))
    } finally q.stop()
  }

  test("dedupStream drops duplicate keys across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = Streams.dedupStream(
        mem.toDF().toDF("doc_id", "ts", "value"), Seq("doc_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(0), 1.0), (1L, ts(1), 2.0), (2L, ts(0), 3.0))
      q.processAllAvailable()
      mem.addData((1L, ts(2), 4.0), (3L, ts(2), 5.0)) // 1 is a dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("upsertSink merges each micro-batch into a keyed table") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_upsert").toString
    val mem = MemoryStream[(Long, String, Double)]
    val q = mem.toDF().toDF("k", "name", "v")
      .writeStream
      .foreachBatch(Streams.upsertSink(dir, Seq("k"),
        Map("v" -> graft.operators.MergeOps.Greatest)))
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, "a", 10.0), (2L, "b", 20.0))
      q.processAllAvailable()
      mem.addData((2L, "b2", 5.0), (3L, "c", 30.0))   // update + insert
      q.processAllAvailable()
      val out = graft.sources.Sinks.readUpsertTable(spark, dir)
        .orderBy("k").collect()
      assert(out.length == 3)
      assert(out(1).getString(1) == "b2")   // SourceFirst default
      assert(out(1).getDouble(2) == 20.0)   // Greatest kept target value
      assert(out(2).getDouble(2) == 30.0)
    } finally q.stop()
  }

  test("exactly-once across a REAL restart: the checkpoint-replayed " +
    "last batch no-ops through the txn guard") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_rt").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_rt_cp").toString
    val mem = MemoryStream[(Long, Double)]
    def start() = mem.toDF().toDF("k", "v")
      .writeStream
      .option("checkpointLocation", cp)
      .foreachBatch(Streams.upsertSink(dir, Seq("k"),
        appId = Some("rt-app")))
      .outputMode(OutputMode.Append()).start()
    val q = start()
    mem.addData((1L, 1.0)); q.processAllAvailable()
    mem.addData((2L, 2.0)); q.processAllAvailable()
    q.stop()
    // crash window: the sink's table commit landed but the CHECKPOINT
    // commit didn't — exactly what a driver death between foreachBatch
    // returning and the offset commit leaves behind. Structured
    // Streaming then REPLAYS batch 1 on restart; without the txn guard
    // the table would double-merge it.
    val c1 = java.nio.file.Paths.get(cp, "commits", "1")
    assert(java.nio.file.Files.deleteIfExists(c1),
      s"expected checkpoint commit marker $c1")
    // the local ChecksumFileSystem keeps a .crc sidecar; leaving it
    // stale makes the replay's rename fail and read as a concurrent
    // writer — a real crash would have left NEITHER file
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(cp, "commits", ".1.crc"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(graft.sources.Sinks.lastTxnVersion(dir, "rt-app")
      .contains(1L))
    // exactly TWO table commits — the replay added none
    assert(graft.sources.Sinks.deltaLogVersions(dir) == Seq(0L, 1L))
    val out = graft.sources.Sinks.readUpsertTable(spark, dir)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 1.0), (2L, 2.0)))
  }

  test("rename mid-stream: later batches stage through the mapping, " +
    "checkpoint-replay across the rename still no-ops") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_rtm").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_rtm_cp").toString
    val mem = MemoryStream[(Long, Double)]
    def start(colName: String) = mem.toDF().toDF("k", colName)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch(Streams.upsertSink(dir, Seq("k"),
        appId = Some("rtm-app")))
      .outputMode(OutputMode.Append()).start()
    val q = start("v")
    mem.addData((1L, 1.0)); q.processAllAvailable(); q.stop()
    // metadata-only RENAME between micro-batches (round-12 optional
    // directive 8: the exactly-once writer composed with column
    // mapping was unpinned)
    graft.sources.Sinks.renameDeltaColumn(spark, dir, "v", "score")
    // the restarted stream emits the NEW logical name; the sink stages
    // it under the PHYSICAL spelling via toPhysicalFrame
    val q2 = start("score")
    mem.addData((2L, 2.0)); q2.processAllAvailable(); q2.stop()
    val out = graft.sources.Sinks.readDeltaTableAt(spark, dir)
    assert(out.columns.toSeq == Seq("k", "score"))
    assert(out.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.0), (2L, 2.0)))
    // the staged files keep the birth-name spelling
    val gen = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_CURRENT")).trim
    val physCols = spark.read.parquet(
      java.nio.file.Paths.get(dir, gen).toString).columns.toSeq
    assert(physCols.contains("v") && !physCols.contains("score"),
      s"staged files must keep the physical spelling: $physCols")
    val versionsBefore = graft.sources.Sinks.deltaLogVersions(dir)
    // crash-replay ACROSS the rename: the checkpoint commit of the
    // post-rename batch vanishes (driver died between foreachBatch and
    // the offset commit); the restart replays it and the txn guard
    // must no-op — even though the table's schema changed since
    val c1 = java.nio.file.Paths.get(cp, "commits", "1")
    assert(java.nio.file.Files.deleteIfExists(c1))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(cp, "commits", ".1.crc"))
    val q3 = start("score")
    q3.processAllAvailable(); q3.stop()
    assert(graft.sources.Sinks.deltaLogVersions(dir) == versionsBefore,
      "the replayed batch must not re-commit")
    assert(graft.sources.Sinks.lastTxnVersion(dir, "rtm-app")
      .contains(1L))
    // a NEW batch still emitting the STALE name is refused loudly (the
    // physical-collision guard), never silently mapped onto the buried
    // physical values
    val q4 = start("v")
    mem.addData((3L, 3.0))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q4.processAllAvailable()
    }
    q4.stop()
    assert(graft.sources.Sinks.deltaLogVersions(dir) == versionsBefore)
  }

  test("change-feed pipeline: streamed upserts equal the batch replay") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_feed").toString
    // order-status cursor feed: (order_id, status, changed_ts) — several
    // changes per order, some within one poll batch, some across polls
    val mem = MemoryStream[(Long, Int, Timestamp)]
    val q = mem.toDF().toDF("order_id", "order_status", "changed_ts")
      .writeStream
      .foreachBatch(Streams.changeFeedSink(dir, Seq("order_id"),
        "changed_ts"))
      .outputMode(OutputMode.Append()).start()
    val feed = Seq(
      // poll 1: order 1 created then shipped IN THE SAME BATCH (the
      // within-batch latest-wins reduction is what's exercised here)
      Seq((1L, 0, ts(0)), (1L, 2, ts(5)), (2L, 0, ts(1))),
      // poll 2: order 2 advances, order 3 appears
      Seq((2L, 1, ts(10)), (3L, 0, ts(11))),
      // poll 3: orders 1 and 3 reach terminal states
      Seq((1L, 3, ts(20)), (3L, 2, ts(21))))
    try {
      feed.foreach { batch => mem.addData(batch: _*); q.processAllAvailable() }
    } finally q.stop()
    val streamed = graft.sources.Sinks.readUpsertTable(spark, dir)
      .orderBy("order_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2)))
    val replay = Streams.changeFeedReplay(
      feed.flatten.toDF("order_id", "order_status", "changed_ts"),
      Seq("order_id"), "changed_ts")
      .orderBy("order_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2)))
    assert(streamed.toSeq == replay.toSeq,
      "stream-applied micro-batches must converge to the batch replay")
    assert(streamed.toSeq == Seq((1L, 3, ts(20)), (2L, 1, ts(10)),
      (3L, 2, ts(21))))
  }

  test("sessionizeBatch splits on gaps and matches stream semantics") {
    val df = Seq(
      (1L, ts(0), 1L, 1.0), (1L, ts(10), 2L, 2.0),   // session 1 (gap 10 <= 30)
      (1L, ts(60), 3L, 4.0),                          // session 2 (gap 50)
      (2L, ts(0), 4L, 8.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Streams.sessionizeBatch(df, gapMinutes = 30)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out((1L, 1L)) == (2L, 3.0))
    assert(out((1L, 2L)) == (1L, 4.0))
    assert(out((2L, 1L)) == (1L, 8.0))
  }

  test("dedupAdmissionSink: a continuously-ingesting deduped corpus") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("admit")
      .toFile.getAbsolutePath + "/corpus"
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch(Streams.dedupAdmissionSink(dir))
      .outputMode(OutputMode.Append()).start()
    val polls = Seq(
      // poll 1: 2 duplicates within the batch + one unique
      Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma delta epsilon"),
        (3L, "one two three four five")),
      // poll 2: a dup of the ADMITTED CORPUS + one new doc
      Seq((4L, "alpha beta gamma delta epsilon"),
        (5L, "six seven eight nine ten")))
    try polls.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val corpus = graft.sources.Sinks.readUpsertTable(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(corpus.keySet == Set(1L, 3L, 5L),
      s"within-batch dup (2) and cross-poll dup (4) rejected: $corpus")
    assert(corpus(5L) == "six seven eight nine ten")
  }

  test("clusterDriftSink: fixed-centroid histograms expose a " +
    "distribution shift across polls") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Double])]
    val dir = java.nio.file.Files.createTempDirectory("drift")
      .toFile.getAbsolutePath + "/stats"
    // two reference centroids on opposite axes
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val q = mem.toDF.toDF("vec_id", "vec").writeStream
      .foreachBatch(Streams.clusterDriftSink(cents, dir))
      .outputMode(OutputMode.Append()).start()
    val polls = Seq(
      // poll 0: balanced
      Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)),
        (3L, Seq(0.8, 0.2)), (4L, Seq(0.2, 0.8))),
      // poll 1: drifted — everything lands on cluster 1
      Seq((5L, Seq(0.1, 0.9)), (6L, Seq(0.0, 1.0)), (7L, Seq(0.2, 0.8))))
    try polls.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    def readHist() = spark.read.parquet(dir)
      .collect().map(r => (r.getAs[Number]("batch_id").longValue(),
        r.getAs[Long]("cluster_id")) -> r.getAs[Long]("n"))
      .toMap
    val hist = readHist()
    assert(hist((0L, 0L)) == 2L && hist((0L, 1L)) == 2L,
      s"poll 0 balanced: $hist")
    assert(!hist.contains((1L, 0L)) && hist((1L, 1L)) == 3L,
      s"poll 1 fully drifted to cluster 1: $hist")
    // a REPLAYED micro-batch (crash-recovery re-fires foreachBatch with
    // the same batch_id) must overwrite its own partition, not append —
    // the histogram is unchanged, not double-counted
    Streams.clusterDriftSink(cents, dir)(
      spark.createDataFrame(Seq(
        (5L, Seq(0.1, 0.9)), (6L, Seq(0.0, 1.0)), (7L, Seq(0.2, 0.8))))
        .toDF("vec_id", "vec"), 1L)
    val replayed = readHist()
    assert(replayed == hist, s"replay of batch 1 must be idempotent: " +
      s"$replayed vs $hist")
  }

  test("bloomDedupAdmissionSink: exact-dup admission through a persisted " +
    "bitmap, capacity rebuild included") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("bloomadmit")
      .toFile.getAbsolutePath
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      // tiny capacity: 4 expected items forces the double-capacity
      // rebuild path once admissions pass the design point
      .foreachBatch(Streams.bloomDedupAdmissionSink(
        s"$base/corpus", s"$base/index", expectedItems = 4))
      .outputMode(OutputMode.Append()).start()
    val polls = Seq(
      // poll 1: within-batch exact dup + uniques
      Seq((1L, "alpha beta gamma"), (2L, "ALPHA  beta gamma"),
        (3L, "one two three")),
      // poll 2: cross-poll exact dup (only the persisted bitmap links
      // the polls) + five new docs pushing admissions past the 64-bit
      // minimum bitmap's ~6-item capacity
      Seq((4L, "alpha beta gamma"), (5L, "six seven eight"),
        (6L, "nine ten eleven"), (7L, "twelve thirteen"),
        (8L, "fourteen fifteen"), (9L, "sixteen seventeen")),
      // poll 3: the over-capacity count triggers the double-capacity
      // rebuild from the corpus; dups of docs admitted in BOTH earlier
      // polls must still reject and a fresh doc must still admit
      Seq((10L, "one two three"), (11L, "twelve thirteen"),
        (12L, "eighteen nineteen")))
    try polls.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val corpus = graft.sources.Sinks.readUpsertTable(spark, s"$base/corpus")
      .collect().map(r => r.getLong(0)).toSet
    assert(corpus == Set(1L, 3L, 5L, 6L, 7L, 8L, 9L, 12L),
      s"normalized within-batch dup (2), cross-poll dups (4, 10, 11) " +
        s"rejected; got $corpus")
    // the persisted index reflects every admitted doc: a brand-new
    // session probing it sees all admitted fingerprints as maybe-present
    val (w, m, k, fam) = graft.operators.Dedup.readBloomIndex(
      spark, s"$base/index")
    import spark.implicits._
    val admittedTexts = Seq("alpha beta gamma", "one two three",
      "six seven eight", "nine ten eleven", "twelve thirteen",
      "fourteen fifteen", "sixteen seventeen", "eighteen nineteen")
      .toDF("text")
    val misses = admittedTexts.filter(!graft.operators.Dedup
      .bloomMightContain(w, m, k, fam.hash(
        graft.operators.TextAnalysis.normText(org.apache.spark.sql
          .functions.col("text"))), fam)).count()
    assert(misses == 0, "no false negatives after the capacity rebuild")
  }

  test("indexedDedupAdmissionSink probes a persisted index across polls") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val base = java.nio.file.Files.createTempDirectory("admix")
      .toFile.getAbsolutePath
    val q = mem.toDF.toDF("doc_id", "text").writeStream
      .foreachBatch(Streams.indexedDedupAdmissionSink(
        s"$base/corpus", s"$base/index"))
      .outputMode(OutputMode.Append()).start()
    val polls = Seq(
      Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma delta epsilon"),
        (3L, "one two three four five")),
      Seq((4L, "alpha beta gamma delta epsilon"),
        (5L, "six seven eight nine ten")),
      // poll 3: dups of docs admitted in BOTH earlier polls — only the
      // maintained index can reject these (nothing else links the polls)
      Seq((6L, "one two three four five"),
        (7L, "six seven eight nine ten"),
        (8L, "fresh words never seen before anywhere")))
    try polls.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val corpus = graft.sources.Sinks.readUpsertTable(spark, s"$base/corpus")
      .collect().map(_.getLong(0)).toSet
    assert(corpus == Set(1L, 3L, 5L, 8L),
      s"cross-poll dups (4,6,7) and within-batch dup (2) rejected: $corpus")
    // the index contains exactly the admitted docs' rows
    val indexed = spark.read.parquet(s"$base/index/bands")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(indexed == Set(1L, 3L, 5L, 8L),
      s"index rows track admissions: $indexed")
    assert(spark.read.parquet(s"$base/index/sh")
      .select("id").distinct().count() == 4)
  }

  test("indexedDedupAdmissionSink: replay converges after a partial crash") {
    // a previous attempt wrote the sh partition then died before the
    // bands write and the corpus upsert; the retried batch must not
    // reject itself against its own partial index rows
    val base = java.nio.file.Files.createTempDirectory("admres")
      .toFile.getAbsolutePath
    val sink = Streams.indexedDedupAdmissionSink(
      s"$base/corpus", s"$base/index")
    val b0 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five")).toDF("doc_id", "text")
    // simulate the crashed first attempt: index tables created and the
    // sh partition committed, death before the bands write + corpus upsert
    val (sh0, bands0) = graft.operators.Dedup.lshIndexTables(
      b0, col("doc_id"), col("text"))
    val (shT, bandsT) = Streams.dedupIndexTableNames(s"$base/index")
    graft.sources.Sinks.ensureBucketedIndexTable(spark, shT,
      s"$base/index/sh", sh0, "id", 64)
    graft.sources.Sinks.ensureBucketedIndexTable(spark, bandsT,
      s"$base/index/bands", bands0, "bucket", 64)
    graft.sources.Sinks.overwriteBucketedPartition(spark, shT, 0L, sh0)
    sh0.unpersist(); bands0.unpersist()
    sink(b0, 0L) // the retry
    val corpus = graft.sources.Sinks.readUpsertTable(spark, s"$base/corpus")
      .collect().map(_.getLong(0)).toSet
    assert(corpus == Set(1L, 2L),
      s"self-exclusion must let the replayed batch admit itself: $corpus")
    assert(spark.read.parquet(s"$base/index/bands")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 2L), "bands partition completed on replay")
    // sh partition was rewritten, not duplicated, by the replay
    assert(spark.read.parquet(s"$base/index/sh").groupBy("id")
      .count().filter(col("count") > 1).isEmpty,
      "replayed sh partition must not duplicate rows")
    // the healed index still dedups later batches
    sink(Seq((3L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text"), 1L)
    assert(graft.sources.Sinks.readUpsertTable(spark, s"$base/corpus")
      .count() == 2, "cross-batch dup rejected after the repair")
  }

  // ---- bucketed-index probe plan properties ------------------------------

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.FileSourceScanExec
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: QueryStageExec => q +: allNodes(q.plan)
    case n => n +: n.children.flatMap(allNodes)
  }

  private def indexScans(df: org.apache.spark.sql.DataFrame,
                         pathFrag: String): Seq[FileSourceScanExec] =
    allNodes(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains(pathFrag))
        => f
    }

  test("indexedDedupAdmissionSink: bucket-pruned, shuffle-free, flat probe") {
    val base = java.nio.file.Files.createTempDirectory("admbkt")
      .toFile.getAbsolutePath
    val sink = Streams.indexedDedupAdmissionSink(
      s"$base/corpus", s"$base/index", indexBuckets = 64)
    def doc(i: Long) = (i, s"unique words for document number $i " +
      s"carrying token ${i * 7919} and token ${i * 104729}")
    sink(Seq((1L, "alpha beta gamma delta epsilon"), doc(2L))
      .toDF("doc_id", "text"), 0L)
    val (shT, bandsT) = Streams.dedupIndexTableNames(s"$base/index")

    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(autoKey, "true")
    spark.conf.set(autoKey, "false")
    try {
      // the probe a future trigger would run: one dup of doc 1, one fresh
      def probeFrames() = {
        val pb = Seq((100L, "alpha beta gamma delta epsilon"),
          (101L, "completely novel probe content here"))
          .toDF("doc_id", "text")
        val (shP, bandsP) = graft.operators.Dedup.lshIndexTables(
          pb, col("doc_id"), col("text"))
        val ids = pb.select(col("doc_id").as("id")).distinct()
        val frames = Streams.prunedIndexProbe(spark, shT, bandsT, bandsP,
          ids, 1 << 18)
        (frames, shP, bandsP)
      }
      def probeStats(): (Long, Long, String) = {
        val ((corpusSh, corpusBands), shP, bandsP) = probeFrames()
        val bandRows = corpusBands.count()
        val shRows = corpusSh.count()
        val planStr = corpusBands.queryExecution.executedPlan.toString
        shP.unpersist(); bandsP.unpersist()
        (bandRows, shRows, planStr)
      }
      val (bandRows1, shRows1, plan1) = probeStats()
      // file-level bucket pruning is active and partial
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val m = sel.findFirstMatchIn(plan1)
        .getOrElse(fail(s"no SelectedBucketsCount in probe plan:\n$plan1"))
      assert(m.group(1).toInt < m.group(2).toInt,
        s"probe must select a strict subset of buckets: ${m.matched}")
      assert(m.group(2).toInt == 64)
      // value-level probe: only the dup doc's band rows survive the filter
      assert(bandRows1 == 8, s"probe selects exactly the dup's band rows: $bandRows1")
      assert(shRows1 >= 1, "candidate shingle rows surfaced")

      // no shuffle anywhere on the index side of the probe
      val ((cSh, cBands), shP2, bandsP2) = probeFrames()
      for (frame <- Seq(cSh, cBands)) {
        frame.collect()
        val shuffles = allNodes(frame.queryExecution.executedPlan).collect {
          case s: ShuffleExchangeExec
            if allNodes(s.child).exists {
              case f: FileSourceScanExec =>
                f.relation.location.rootPaths.exists(
                  _.toString.contains(s"$base/index"))
              case _ => false
            } => s
        }
        assert(shuffles.isEmpty,
          s"index-side probe must not shuffle: ${frame.queryExecution.executedPlan}")
      }
      shP2.unpersist(); bandsP2.unpersist()

      // grow the stored corpus 3x with fresh docs; the SAME probe stays flat
      sink(Seq(doc(3L), doc(4L)).toDF("doc_id", "text"), 1L)
      sink(Seq(doc(5L), doc(6L)).toDF("doc_id", "text"), 2L)
      val (bandRows2, shRows2, plan2) = probeStats()
      assert(bandRows2 == bandRows1 && shRows2 == shRows1,
        s"probe rows must not grow with the corpus: " +
          s"($bandRows1,$shRows1) -> ($bandRows2,$shRows2)")
      val m2 = sel.findFirstMatchIn(plan2).get
      assert(m2.group(1).toInt == m.group(1).toInt,
        "selected bucket count tracks the probe, not the corpus")
    } finally spark.conf.set(autoKey, prev)
    // and the admission verdict itself stays correct on the grown corpus
    sink(Seq((7L, "alpha beta gamma delta epsilon"),
      (8L, "genuinely new final document")).toDF("doc_id", "text"), 3L)
    val corpus = graft.sources.Sinks.readUpsertTable(spark, s"$base/corpus")
      .collect().map(_.getLong(0)).toSet
    assert(corpus == Set(1L, 2L, 3L, 4L, 5L, 6L, 8L),
      s"dup (7) rejected, fresh (8) admitted: $corpus")
  }

  test("mediaDedupAdmissionSink: near-dup images rejected against the " +
    "persisted signature index; replay converges") {
    implicit val sq = spark.sqlContext
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        r.setSample(x, y, 0, f(x, y) & 0xff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // textured patterns (pHash's robust contract — see imagePHash docs)
    def texA(x: Int, y: Int) =
      ((math.sin(x * 0.35) + math.sin(y * 0.28) +
        math.sin((x + y) * 0.11)) * 40 + 128).toInt
    def texB(x: Int, y: Int) =
      ((math.sin(x * 0.9) * math.sin(y * 0.8)) * 90 + 128).toInt
    def texC(x: Int, y: Int) =
      ((math.sin(x * 0.15 + 2) * math.sin(y * 0.5 + 1)) * 80 + 128).toInt
    val base = java.nio.file.Files.createTempDirectory("mediaadmit")
      .toFile.getAbsolutePath
    val mem = MemoryStream[(Long, Array[Byte])]
    val sink = Streams.mediaDedupAdmissionSink(
      s"$base/corpus", s"$base/index", maxHamming = 3)
    val q = mem.toDF.toDF("media_id", "content").writeStream
      .foreachBatch(sink).outputMode(OutputMode.Append()).start()
    val polls = Seq(
      Seq((1L, png(64, 64)(texA)), (2L, png(64, 64)(texB))),
      // 3 is a RESIZED copy of 1 (near-dup across polls); 4 is fresh;
      // 5 does not decode at all
      Seq((3L, png(128, 128)((x, y) => texA(x / 2, y / 2))),
        (4L, png(64, 64)(texC)), (5L, Array[Byte](1, 2, 3))))
    try polls.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    def corpusIds() = graft.sources.Sinks
      .readUpsertTable(spark, s"$base/corpus")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(corpusIds() == Set(1L, 2L, 4L),
      s"resized copy (3) rejected, undecodable (5) dropped: ${corpusIds()}")
    // the index holds exactly maxHamming+1 band rows per admitted id
    val idx = spark.table(Streams.mediaIndexTableName(s"$base/index"))
    assert(idx.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 4L, 2L -> 4L, 4L -> 4L))
    // replay of poll 1 (crash-recovery re-fire) converges: same corpus,
    // no duplicated index rows
    sink(Seq((3L, png(128, 128)((x, y) => texA(x / 2, y / 2))),
      (4L, png(64, 64)(texC)), (5L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "content"), 1L)
    assert(corpusIds() == Set(1L, 2L, 4L))
    assert(spark.table(Streams.mediaIndexTableName(s"$base/index"))
      .groupBy("id").count().filter(col("count") > 4).isEmpty,
      "replay must not duplicate index rows")
  }

  test("mediaDedupAdmissionSink: re-admitting a media id compacts its " +
    "old signature rows") {
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        r.setSample(x, y, 0, f(x, y) & 0xff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def texA(x: Int, y: Int) =
      ((math.sin(x * 0.35) + math.sin(y * 0.28) +
        math.sin((x + y) * 0.11)) * 40 + 128).toInt
    def texB(x: Int, y: Int) =
      ((math.sin(x * 0.9) * math.sin(y * 0.8)) * 90 + 128).toInt
    val base = java.nio.file.Files.createTempDirectory("mediaupd")
      .toFile.getAbsolutePath
    val sink = Streams.mediaDedupAdmissionSink(
      s"$base/corpus", s"$base/index", maxHamming = 3)
    sink(Seq((1L, png(64, 64)(texA))).toDF("media_id", "content"), 0L)
    // media 1 is UPDATED with different content: must not be rejected
    // against its own old signature, and the old rows must leave
    sink(Seq((1L, png(64, 64)(texB))).toDF("media_id", "content"), 1L)
    val table = Streams.mediaIndexTableName(s"$base/index")
    val byBatch = spark.table(table)
      .selectExpr("id", "cast(batch as bigint) as batch").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byBatch == Set((1L, 1L)),
      s"old batch-0 signature rows compacted out: $byBatch")
    // content matching the OLD signature is admissible again; content
    // matching the NEW signature is rejected
    sink(Seq((10L, png(64, 64)(texA)), (11L, png(64, 64)(texB)))
      .toDF("media_id", "content"), 2L)
    val corpus = graft.sources.Sinks
      .readUpsertTable(spark, s"$base/corpus")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(corpus == Set(1L, 10L),
      s"old-signature media admitted, new-signature dup rejected: $corpus")
  }

  test("videoDedupAdmissionSink: re-encoded clips rejected on frame " +
    "overlap; replay converges") {
    def pixel(f: Int, x: Int, y: Int) =
      ((math.sin(x * 0.35 + f) + math.sin(y * 0.28) +
        math.sin((x + y) * 0.11 + f * 0.7)) * 40 + 128).toInt
    def other(f: Int, x: Int, y: Int) =
      ((math.sin(x * 0.9 + 2 * f) * math.sin(y * 0.8)) * 90 + 128).toInt
    val M = graft.operators.Multimodal
    val base = java.nio.file.Files.createTempDirectory("videoadmit")
      .toFile.getAbsolutePath
    val sink = Streams.videoDedupAdmissionSink(
      s"$base/corpus", s"$base/index", maxHamming = 3, minShared = 2)
    sink(Seq(
      (1L, M.syntheticMjpegAvi(64, 64, 4, pixel)),
      (2L, M.syntheticMjpegAvi(64, 64, 4, other)))
      .toDF("media_id", "content"), 0L)
    // poll 1: a re-encoded copy of clip 1 (lower JPEG quality), a fresh
    // clip, and an undecodable payload
    val poll1 = Seq(
      (3L, M.syntheticMjpegAvi(64, 64, 4, pixel, jpegQuality = 0.6f)),
      (4L, M.syntheticMjpegAvi(64, 64, 4,
        (f, x, y) => ((math.sin(x * 0.2 + f) * math.sin(y * 0.45)) * 80
          + 128).toInt)),
      (5L, Array[Byte](9, 9, 9))).toDF("media_id", "content")
    sink(poll1, 1L)
    def corpusIds() = graft.sources.Sinks
      .readUpsertTable(spark, s"$base/corpus")
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(corpusIds() == Set(1L, 2L, 4L),
      s"re-encoded clip (3) rejected, undecodable (5) dropped: " +
        corpusIds())
    // replay of poll 1 converges: same corpus, no duplicated index rows
    sink(poll1, 1L)
    assert(corpusIds() == Set(1L, 2L, 4L))
    val perClip = spark
      .table(Streams.videoIndexTableName(s"$base/index"))
      .select("id", "phash").distinct()
      .groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perClip.keySet == Set(1L, 2L, 4L),
      s"index holds admitted clips only: $perClip")
    assert(perClip.values.forall(n => n >= 1 && n <= 4),
      s"at most one signature per distinct frame: $perClip")
  }

  test("keysFilter: >1k keys becomes a broadcast join, not a giant IN; " +
    "small key sets stay literal") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val dir = java.nio.file.Files.createTempDirectory("keysflt")
      .toFile.getAbsolutePath
    spark.range(0, 10000).selectExpr("id", "id * 2 as v")
      .write.mode("overwrite").parquet(dir)
    val base = spark.read.parquet(dir)

    // ABOVE the crossover: the filter must be a broadcast hash join —
    // the plan carries one tiny relation, not a 5000-arm IN expression
    val bigKeys = (0L until 5000L).map(_ * 2)
    val big = Streams.keysFilter(spark, base, "id", bigKeys, negate = false)
    big.collect()
    val bigPlan = allNodes(big.queryExecution.executedPlan)
    assert(bigPlan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"oversized key set must broadcast-join:\n${big.queryExecution.executedPlan}")
    assert(!big.queryExecution.optimizedPlan.toString.contains(" IN ("),
      "no literal IN list for an oversized key set")
    assert(big.count() == 5000)

    // negated: broadcast anti join, same plan-size bound
    val bigNeg = Streams.keysFilter(spark, base, "id", bigKeys, negate = true)
    assert(allNodes(bigNeg.queryExecution.executedPlan)
      .exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "oversized negated key set must broadcast anti-join")
    assert(bigNeg.count() == 5000) // drops the 5000 even ids, keeps the odd

    // AT/BELOW the crossover: stays a literal predicate (what bucketed
    // scans can prune on) — no join anywhere in the plan
    val smallKeys = (0L until Streams.MaxLiteralKeys.toLong)
    val small = Streams.keysFilter(spark, base, "id", smallKeys,
      negate = false)
    assert(!allNodes(small.queryExecution.executedPlan)
      .exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "small key set must stay a literal filter")
    assert(small.count() == Streams.MaxLiteralKeys)
  }

  test("indexedDedupAdmissionSink: re-admitting an id compacts its old index rows") {
    val base = java.nio.file.Files.createTempDirectory("admupd")
      .toFile.getAbsolutePath
    val sink = Streams.indexedDedupAdmissionSink(
      s"$base/corpus", s"$base/index")
    sink(Seq((1L, "original text alpha beta gamma delta"),
      (2L, "some other unrelated document text")).toDF("doc_id", "text"), 0L)
    // doc 1 is UPDATED with new text in a later batch: it must not be
    // rejected against its own old rows, and its old rows must leave
    sink(Seq((1L, "replacement text one two three four"))
      .toDF("doc_id", "text"), 1L)
    val corpus = graft.sources.Sinks.readUpsertTable(spark, s"$base/corpus")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(corpus.keySet == Set(1L, 2L))
    assert(corpus(1L) == "replacement text one two three four",
      "update re-admitted through the keyed merge")
    // the index holds exactly ONE row-set per id — no stale batch=0 rows
    val shByIdBatch = spark.read.parquet(s"$base/index/sh")
      .selectExpr("id", "cast(batch as bigint) as batch").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shByIdBatch == Set((1L, 1L), (2L, 0L)),
      s"doc 1's old sh rows compacted out of batch 0: $shByIdBatch")
    assert(spark.read.parquet(s"$base/index/bands")
      .filter(col("id") === 1L)
      .selectExpr("cast(batch as bigint) as batch").distinct()
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "doc 1's old band rows compacted out")
    // a doc matching the OLD text is now admissible (old text left the
    // corpus); a doc matching the NEW text is rejected
    sink(Seq((3L, "original text alpha beta gamma delta"),
      (4L, "replacement text one two three four")).toDF("doc_id", "text"), 2L)
    val after = graft.sources.Sinks.readUpsertTable(spark, s"$base/corpus")
      .collect().map(_.getLong(0)).toSet
    assert(after == Set(1L, 2L, 3L),
      s"old-text doc admitted, new-text dup rejected: $after")
  }

  test("frontierAdmissionSink: canonicalize -> blocklist -> robots -> " +
      "persisted seen-set, with a rejects audit") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val base = java.nio.file.Files.createTempDirectory("frontier")
      .toFile.getAbsolutePath
    val blocklist = Seq("bad.org").toDF("domain")
    val robots = Seq(("ok.com", "User-agent: *\nDisallow: /private\n"))
      .toDF("domain", "robots_txt")
    val q = mem.toDF.toDF("url").writeStream
      .foreachBatch(Streams.frontierAdmissionSink(
        s"$base/frontier", s"$base/index", blocklist, robots,
        agent = "graftbot", rejectsPath = Some(s"$base/rejects")))
      .outputMode(OutputMode.Append()).start()
    val polls = Seq(
      Seq("https://ok.com/a",
        "https://ok.com/a?utm_source=x",   // canonical dup (tracking param)
        "https://WWW.ok.com/a",            // canonical dup (www + case)
        "https://bad.org/x",               // blocklisted
        "https://ok.com/private/y",        // robots-disallowed
        "https://ok.com/b"),
      Seq("https://ok.com/a",              // cross-poll dup
        "https://ok.com/c",                // new
        "http://bad.org/y"))               // blocklisted again
    try polls.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val frontier = graft.sources.Sinks.readUpsertTable(
        spark, s"$base/frontier")
      .collect().map(_.getAs[String]("curl")).toSet
    assert(frontier == Set("https://ok.com/a", "https://ok.com/b",
      "https://ok.com/c"), s"got $frontier")
    val rejects = spark.read.parquet(s"$base/rejects")
      .collect().map(r => (r.getAs[String]("url"),
        r.getAs[String]("reason"))).toSet
    assert(rejects == Set(
      ("https://bad.org/x", "blocklist"),
      ("http://bad.org/y", "blocklist"),
      ("https://ok.com/private/y", "robots")), s"got $rejects")
  }
}
