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
    val (sh0, bands0) = graft.operators.Dedup.lshIndexTables(
      b0, col("doc_id"), col("text"))
    sh0.write.parquet(s"$base/index/sh/batch=0") // the stranded artifact
    sh0.unpersist(); bands0.unpersist()
    sink(b0, 0L) // the retry
    val corpus = graft.sources.Sinks.readUpsertTable(spark, s"$base/corpus")
      .collect().map(_.getLong(0)).toSet
    assert(corpus == Set(1L, 2L),
      s"self-exclusion must let the replayed batch admit itself: $corpus")
    assert(spark.read.parquet(s"$base/index/bands")
      .select("id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 2L), "bands partition completed on replay")
    // the healed index still dedups later batches
    sink(Seq((3L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text"), 1L)
    assert(graft.sources.Sinks.readUpsertTable(spark, s"$base/corpus")
      .count() == 2, "cross-batch dup rejected after the repair")
  }
}
