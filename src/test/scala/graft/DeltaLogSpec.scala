package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Golden-file + replay pins for the minimal Delta-protocol log emitted
  * by the generational MERGE tables (Sinks.appendDeltaCommit). No Delta
  * reader exists in the sandbox, so conformance is asserted against the
  * PUBLISHED protocol structure (delta-io/delta PROTOCOL.md): version
  * file naming, protocol/metaData/commitInfo/add/remove action shapes,
  * and the state-reconstruction rule (adds minus removes replays to each
  * committed snapshot's exact file set).
  */
class DeltaLogSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def actions(tablePath: String, v: Long) = {
    val f = Paths.get(tablePath, "_delta_log", f"$v%020d.json")
    assert(Files.exists(f), s"missing log version $v at $f")
    Files.readString(f).linesIterator.filter(_.nonEmpty)
      .map(mapper.readTree).toSeq
  }

  private def genFiles(tablePath: String, gen: Long): Set[String] = {
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(tablePath, s"gen-$gen")
    val ls = Files.list(dir)
    try ls.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_"))
      .map(n => s"gen-$gen/$n").toSet
    finally ls.close()
  }

  test("upsertParquet writes protocol-conformant versioned commits") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v"), Seq("k"))
    Sinks.upsertParquet(spark, dir,
      Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("k", "name", "v"), Seq("k"))
    Sinks.upsertParquet(spark, dir,
      Seq((4L, "d", 40.0)).toDF("k", "name", "v"), Seq("k"))
    assert(Sinks.deltaLogVersions(dir) == Seq(0L, 1L, 2L))
    // version-0 structure: protocol first, then commitInfo + metaData
    val v0 = actions(dir, 0L)
    val protocol = v0.head.get("protocol")
    assert(protocol != null, "version 0 must declare the protocol action")
    assert(protocol.get("minReaderVersion").asInt == 1 &&
      protocol.get("minWriterVersion").asInt == 2)
    val meta0 = v0.find(_.has("metaData")).get.get("metaData")
    assert(meta0.get("format").get("provider").asText == "parquet")
    assert(meta0.get("partitionColumns").size == 0)
    // schemaString round-trips through Spark's own schema JSON
    val parsed = org.apache.spark.sql.types.DataType
      .fromJson(meta0.get("schemaString").asText)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(parsed.fieldNames.toSet == Set("k", "name", "v"))
    // adds carry relative paths with real sizes
    val adds0 = v0.filter(_.has("add")).map(_.get("add"))
    assert(adds0.nonEmpty)
    adds0.foreach { a =>
      val p = a.get("path").asText
      assert(p.startsWith("gen-0/") && !p.startsWith("/"), p)
      assert(a.get("size").asLong > 0 && a.get("dataChange").asBoolean)
      assert(Files.exists(Paths.get(dir, p)), s"added file must exist: $p")
    }
    // each later commit removes the full prior snapshot (generations are
    // full snapshots) and re-declares metaData; table id is stable
    val v1 = actions(dir, 1L)
    assert(v1.filter(_.has("remove")).map(_.get("remove").get("path").asText)
      .toSet == adds0.map(_.get("path").asText).toSet,
      "v1 removes exactly v0's files")
    assert(v1.find(_.has("metaData")).get.get("metaData").get("id").asText
      == meta0.get("id").asText, "table id stable across commits")
    assert(v1.exists(n => n.has("commitInfo") &&
      n.get("commitInfo").get("operation").asText == "MERGE"))
    assert(!v1.exists(_.has("protocol")), "protocol only at version 0")
  }

  test("log replay reconstructs every retained generation's file set and rows") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    (0 until 3).foreach { i =>
      Sinks.upsertParquet(spark, dir,
        Seq((i.toLong, s"n$i", i * 1.0), (100L, s"u$i", 9.0))
          .toDF("k", "name", "v"), Seq("k"))
    }
    Sinks.listGenerations(dir).foreach { g =>
      assert(Sinks.deltaLiveFiles(dir, g).toSet == genFiles(dir, g),
        s"replay to version $g = gen-$g's exact file list")
      val viaLog = Sinks.readDeltaTableAt(spark, dir, g)
        .orderBy("k").collect().toSeq
      val viaPointer = Sinks.readUpsertTableAt(spark, dir, g)
        .orderBy("k").collect().toSeq
      assert(viaLog == viaPointer, s"version $g rows match time travel")
    }
  }

  test("OPTIMIZE logs a dataChange=false commit; replay stays current") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    // many small files so compaction has work to do (AQE would coalesce
    // the merge shuffle to one file otherwise)
    val coalKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoal = spark.conf.get(coalKey, "true")
    spark.conf.set(coalKey, "false")
    try Sinks.upsertParquet(spark, dir,
      spark.range(0, 64).select(col("id").as("k"),
        (col("id") * 2).as("v")).repartition(16), Seq("k"))
    finally spark.conf.set(coalKey, prevCoal)
    val (before, after) = Sinks.compactUpsertTable(spark, dir,
      targetBytes = 1L << 30)
    assert(after < before, s"compaction ran: $before -> $after")
    val vLatest = Sinks.deltaLogVersions(dir).last
    val acts = actions(dir, vLatest)
    assert(acts.exists(n => n.has("commitInfo") &&
      n.get("commitInfo").get("operation").asText == "OPTIMIZE"))
    acts.filter(_.has("add")).foreach(a =>
      assert(!a.get("add").get("dataChange").asBoolean,
        "OPTIMIZE adds carry dataChange=false"))
    val viaLog = Sinks.readDeltaTableAt(spark, dir)
      .agg(count(lit(1)), sum("v")).head()
    val viaPointer = Sinks.readUpsertTable(spark, dir)
      .agg(count(lit(1)), sum("v")).head()
    assert(viaLog == viaPointer)
  }

  test("a committer that dies before its log write is healed by the next commit") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    Sinks.upsertParquet(spark, dir,
      Seq((2L, 2.0)).toDF("k", "v"), Seq("k"))
    // simulate the crash window: gen-1 committed, its log entry lost
    Files.delete(Paths.get(dir, "_delta_log",
      f"${1L}%020d.json"))
    Sinks.upsertParquet(spark, dir,
      Seq((3L, 3.0)).toDF("k", "v"), Seq("k"))
    assert(Sinks.deltaLogVersions(dir) == Seq(0L, 1L, 2L),
      "healed log is contiguous")
    assert(Sinks.deltaLiveFiles(dir, 1L).toSet == genFiles(dir, 1L),
      "the healed version replays the skipped generation from disk")
    assert(Sinks.readDeltaTableAt(spark, dir).orderBy("k").collect().toSeq
      == Sinks.readUpsertTable(spark, dir).orderBy("k").collect().toSeq)
  }

  test("partitioned upserts log one batch commit scoped to affected partitions") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
        .toDF("k", "ds", "v"), Seq("k"), "ds")
    val untouched = Sinks.deltaLiveFiles(dir)
      .filter(_.startsWith("p=2024-01-01/")).toSet
    assert(untouched.nonEmpty)
    // second batch touches only 01-02 and a new partition
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((2L, "2024-01-02", 5.0), (3L, "2024-01-03", 3.0))
        .toDF("k", "ds", "v"), Seq("k"), "ds")
    assert(Sinks.deltaLogVersions(dir) == Seq(0L, 1L))
    val v1 = actions(dir, 1L)
    val touched = (v1.filter(_.has("add")).map(_.get("add").get("path").asText)
      ++ v1.filter(_.has("remove")).map(_.get("remove").get("path").asText))
    assert(touched.nonEmpty &&
      touched.forall(p => p.startsWith("p=2024-01-02/") ||
        p.startsWith("p=2024-01-03/")),
      s"commit scoped to affected partitions: $touched")
    // untouched partition's files stay live; replay matches the table read
    assert(Sinks.deltaLiveFiles(dir).filter(
      _.startsWith("p=2024-01-01/")).toSet == untouched)
    val viaLog = Sinks.readDeltaTableAt(spark, dir)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val viaTable = Sinks.readUpsertPartitionedTable(spark, dir)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(viaLog == viaTable)
    assert(viaLog == Seq((1L, 1.0), (2L, 5.0), (3L, 3.0)))
  }
}
