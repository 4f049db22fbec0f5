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
    // simulate the crash window: gen-1 pointer-swapped, its log entry
    // (which carries the generation marker in its commitInfo) never
    // landed — the surviving log tail still says generation 0
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
    // CONTENT pin (round-9 regression): the healing writer must merge
    // from the POINTER generation, not the stale logged state — a
    // log-state base here would silently drop k=2's acknowledged batch
    assert(Sinks.readUpsertTable(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L),
      "no batch may be lost across the heal")
  }

  test("timestamp time travel resolves to the latest commit at-or-before") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    Thread.sleep(30) // distinct wall-clock stamps for the two commits
    Sinks.upsertParquet(spark, dir,
      Seq((2L, 2.0)).toDF("k", "v"), Seq("k"))
    val hist = Sinks.deltaHistory(spark, dir)
      .select("version", "timestamp").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap
    assert(Sinks.versionAtTimestamp(dir, hist(0L)) == 0L)
    assert(Sinks.versionAtTimestamp(dir, hist(1L) - 1) == 0L)
    assert(Sinks.versionAtTimestamp(dir, hist(1L)) == 1L)
    // past the last commit reads the latest, like any protocol reader
    assert(Sinks.versionAtTimestamp(dir, hist(1L) + 60000) == 1L)
    assert(Sinks.readDeltaTableAsOf(spark, dir, hist(0L))
      .select("k").as[Long].collect().toSet == Set(1L))
    // before the first commit: nothing to read — loud error
    intercept[IllegalArgumentException] {
      Sinks.versionAtTimestamp(dir, hist(0L) - 60000)
    }
  }

  test("RESTORE commits the old state on top; DVs and merges respect it") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), Seq("k")) // v0, gen 0
    Sinks.upsertParquet(spark, dir,
      Seq((3L, 3.0)).toDF("k", "v"), Seq("k")) // v1, gen 1
    graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("k") === 2L) // v2: DV marks k=2
    // restore to v1: the re-add drops the DV added after it
    val (v3, added, removed) = Sinks.restoreDeltaTable(spark, dir, 1L)
    assert(v3 == 3L && added > 0)
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(1L, 2L, 3L),
      "RESTORE must undo the DELETE by re-adding the DV-free entries")
    // restore to v0: files from gen-1 are removed, gen-0's re-added
    val (v4, _, removed4) = Sinks.restoreDeltaTable(spark, dir, 0L)
    assert(v4 == 4L && removed4 > 0)
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(1L, 2L))
    // history records the operation with its parameter
    val ops = Sinks.deltaHistory(spark, dir)
      .select("version", "operation").as[(Long, String)].collect().toMap
    assert(ops(3L) == "RESTORE" && ops(4L) == "RESTORE")
    // the next MERGE bases on the RESTORED logged state and converges
    // the pointer path too
    Sinks.upsertParquet(spark, dir,
      Seq((4L, 4.0)).toDF("k", "v"), Seq("k"))
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(1L, 2L, 4L))
    assert(Sinks.readUpsertTable(spark, dir).select("k").as[Long]
      .collect().toSet == Set(1L, 2L, 4L))
  }

  test("RESTORE and time travel lower through GraftSql") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    Thread.sleep(30)
    Sinks.upsertParquet(spark, dir,
      Seq((2L, 2.0)).toDF("k", "v"), Seq("k"))
    val row = graft.plans.GraftSql.sql(spark,
      s"RESTORE '$dir' TO VERSION AS OF 0").collect().head
    assert(row.getAs[String]("operation") == "RESTORE" &&
      row.getAs[Long]("new_version") == 2L)
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(1L))
    // timestamp form: restore forward to v1's state via its wall clock
    val ts1 = Sinks.deltaHistory(spark, dir)
      .filter(col("version") === 1L).select("timestamp")
      .collect().head.getTimestamp(0)
    val row2 = graft.plans.GraftSql.sql(spark,
      s"RESTORE '$dir' TO TIMESTAMP AS OF '$ts1'").collect().head
    assert(row2.getAs[Long]("restored_version") == 1L)
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(1L, 2L))
  }

  test("a lagging legacy _GEN_LOGGED sidecar cannot resurrect a DV DELETE") {
    // round-10 fix for the round-9 advice: the generation marker now
    // commits atomically INSIDE each generation commit's commitInfo, so
    // a sidecar left one generation behind (the old post-commit-move
    // crash window) is ignored whenever the log itself carries markers.
    // Old behavior: lastLoggedGen=0 -> the next upsert re-logs gen-1
    // (erasing the DELETE from the log) and merges from the raw gen dir
    // (resurrecting the deleted rows).
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), Seq("k"))
    Sinks.upsertParquet(spark, dir,
      Seq((3L, 3.0)).toDF("k", "v"), Seq("k"))
    Files.writeString(Paths.get(dir, "_delta_log", "_GEN_LOGGED"), "0")
    graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("k") === 2L)
    val versionsBefore = Sinks.deltaLogVersions(dir).size
    Sinks.upsertParquet(spark, dir,
      Seq((4L, 4.0)).toDF("k", "v"), Seq("k"))
    assert(Sinks.deltaLogVersions(dir).size == versionsBefore + 1,
      "no spurious re-log of an already-logged generation")
    assert(Sinks.readUpsertTable(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L),
      "the DV DELETE must survive the next merge")
    assert(Sinks.readDeltaTableAt(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L),
      "protocol replay agrees")
  }

  test("lastLoggedGeneration survives checkpoint + log pruning") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    Sinks.upsertParquet(spark, dir,
      Seq((2L, 2.0)).toDF("k", "v"), Seq("k"))
    // a DELETE version on top so the checkpoint lands on a commit that
    // carries NO generation marker — pruning then removes every JSON
    // that did, forcing the pointer's graftLastGen path
    graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("k") === 2L)
    Sinks.checkpointDeltaLog(spark, dir)
    assert(Sinks.cleanDeltaLog(dir) == 2,
      "pruning removed the generation-marker JSONs")
    // every gen-commit JSON below the checkpoint is gone; the pointer's
    // graftLastGen field must answer, or the next upsert would re-log
    // old generations
    val versionsBefore = Sinks.deltaLogVersions(dir).size
    Sinks.upsertParquet(spark, dir,
      Seq((3L, 3.0)).toDF("k", "v"), Seq("k"))
    assert(Sinks.deltaLogVersions(dir).size == versionsBefore + 1,
      "exactly one new commit after pruning")
    assert(Sinks.readUpsertTable(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L),
      "the pre-checkpoint DELETE holds and the new batch lands")
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

  test("partitioned reads align mixed per-partition schemas to the logged schema") {
    // a 100 TB lake WILL contain partitions last rewritten by an older
    // producer: batch 2 adds a column but touches only its own
    // partitions, so files under untouched partitions keep the old
    // schema. Both read paths must serve the LOGGED (latest metaData)
    // schema, nulls for the column a partition's files predate — not
    // whatever schema the first listed file happens to carry.
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
        .toDF("k", "ds", "v"), Seq("k"), "ds")
    // second batch carries a NEW column and touches only 01-02; without
    // the evolution flag the drifted batch must fail loudly
    val drifted = Seq((2L, "2024-01-02", 5.0, "late"))
      .toDF("k", "ds", "v", "w")
    intercept[IllegalArgumentException] {
      Sinks.upsertParquetPartitioned(spark, dir, drifted, Seq("k"), "ds")
    }
    Sinks.upsertParquetPartitioned(spark, dir, drifted, Seq("k"), "ds",
      evolveSchema = true)
    val viaPointer = Sinks.readUpsertPartitionedTable(spark, dir)
    assert(viaPointer.columns.contains("w"),
      s"late column lost by the pointer read: ${viaPointer.columns.toSeq}")
    val got = viaPointer.select("k", "w").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(1L -> None, 2L -> Some("late")))
    val viaLog = Sinks.readDeltaTableAt(spark, dir)
    assert(viaLog.columns.contains("w"),
      s"late column lost by the log read: ${viaLog.columns.toSeq}")
    assert(viaLog.select("k", "w").as[(Long, Option[String])]
      .collect().toMap == got)
    // batch 3 does NOT carry w and opens a brand-NEW partition: its
    // commit has no merge target at all, so without the metaData union
    // the logged schema would REGRESS to (k,ds,v) and the aligned
    // readers would hide w everywhere (round-10 review find). TWO rows
    // so a later one-row delete leaves a real deletion vector
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((3L, "2024-01-03", 9.0), (4L, "2024-01-03", 10.0))
        .toDF("k", "ds", "v"), Seq("k"), "ds",
      evolveSchema = true)
    val after = Sinks.readUpsertPartitionedTable(spark, dir)
    assert(after.columns.contains("w"),
      "a later w-less batch regressed the logged schema")
    assert(after.select("k", "w").as[(Long, Option[String])]
      .collect().toMap ==
      Map(1L -> None, 2L -> Some("late"), 3L -> None, 4L -> None))
    assert(Sinks.readDeltaTableAt(spark, dir)
      .select("k", "w").as[(Long, Option[String])].collect().toMap ==
      Map(1L -> None, 2L -> Some("late"), 3L -> None, 4L -> None))
    // an evolved table with a LIVE DV (k=3 marked, k=4 survives in the
    // same file): the MOR scan must align its plain and DV'd file
    // groups to the logged schema (union across eras), serving nulls
    // instead of throwing
    val del = graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("k") === 3L)
    assert(del.filesWithDv == 1 && del.filesDropped == 0,
      s"the delete must leave a real deletion vector, got $del")
    assert(Sinks.readDeltaTableAt(spark, dir)
      .select("k", "w").as[(Long, Option[String])].collect().toMap ==
      Map(1L -> None, 2L -> Some("late"), 4L -> None))
  }

  test("OPTIMIZE after a DV DELETE compacts the LOGICAL rows") {
    // same resurrection class as the merge base: compaction must read
    // the logged (MOR) state, not the raw pointer generation dir that
    // still physically carries the deleted rows. The rewrite purges the
    // vectors (logical content unchanged — dataChange=false holds).
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try Sinks.upsertParquet(spark, dir,
      spark.range(0, 64).select(col("id").as("k"),
        (col("id") * 2).as("v")).repartition(16), Seq("k"))
    finally spark.conf.set(key, prev)
    graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("k") < 8L)
    val (before, after) = Sinks.compactUpsertTable(spark, dir,
      targetBytes = 1L << 30)
    assert(after < before)
    val expect = (8L until 64L).toSet
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == expect,
      "OPTIMIZE resurrected DV-deleted rows (log read)")
    assert(Sinks.readUpsertTable(spark, dir).select("k").as[Long]
      .collect().toSet == expect,
      "OPTIMIZE resurrected DV-deleted rows (pointer read)")
    // the compacted generation is vector-free
    assert(Sinks.deltaLiveFiles(dir).nonEmpty)
    assert(graft.sources.DeletionVectors.purgeDeletionVectors(spark, dir)
      == 0, "compaction must have purged the vectors")
  }

  test("a partitioned writer crash between pointer swap and log write " +
      "loses no batch") {
    // round-10 fourth-pass find: the logged-state merge base needs the
    // per-partition twin of upsertParquet's log-covers-pointer guard —
    // without it, a batch whose log write never landed (pointer swapped,
    // writer died) is erased by the next merge of that partition. The
    // partitionGens commitInfo markers carry the guard's evidence.
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
        .toDF("k", "ds", "v"), Seq("k"), "ds") // v0
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((3L, "2024-01-01", 3.0)).toDF("k", "ds", "v"),
      Seq("k"), "ds") // v1: p=01-01 -> gen-1
    // simulate the crash window: v1's log entry never landed
    Files.delete(Paths.get(dir, "_delta_log", f"${1L}%020d.json"))
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((4L, "2024-01-01", 4.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    assert(Sinks.readUpsertPartitionedTable(spark, dir).select("k")
      .as[Long].collect().toSet == Set(1L, 2L, 3L, 4L),
      "the crashed batch's rows were erased (pointer read)")
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(1L, 2L, 3L, 4L),
      "the crashed batch's rows were erased (log read)")
  }

  test("a partitioned MERGE after a DV DELETE does not resurrect rows") {
    // round-10 review find: the partitioned merge base read raw pointer
    // gen dirs (which still physically carry DV-deleted rows) and its
    // CAS checked only partition pointers — a DELETE between batches
    // was silently undone for the touched partition
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
        (3L, "2024-01-02", 3.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("k") === 2L)
    // the next batch touches the DELETE's partition
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((5L, "2024-01-01", 5.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(1L, 3L, 5L),
      "DV-deleted row resurrected by the partitioned merge (log read)")
    assert(Sinks.readUpsertPartitionedTable(spark, dir).select("k")
      .as[Long].collect().toSet == Set(1L, 3L, 5L),
      "DV-deleted row resurrected by the partitioned merge (pointer read)")
    // partition-grain purge (round-10 directive 6): k=5 shares p=01-01's
    // merged file with k=1, so the delete leaves a REAL vector (a
    // lone-row file would drop outright and purge would no-op)
    val del2 = graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("k") === 5L)
    assert(del2.filesWithDv == 1 && del2.filesDropped == 0, s"$del2")
    val preV = Sinks.deltaLogVersions(dir).max
    assert(graft.sources.DeletionVectors.purgeDeletionVectors(spark, dir)
      == 1, "one DV-carrying file purged at partition grain")
    // vectors physically gone: log reader, MOR reader, and the pointer
    // reader all agree; no vector left in the live state
    val expect = Set(1L, 3L)
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == expect)
    assert(graft.sources.DeletionVectors.readDeltaTableMor(spark, dir)
      .select("k").as[Long].collect().toSet == expect)
    assert(Sinks.readUpsertPartitionedTable(spark, dir).select("k")
      .as[Long].collect().toSet == expect)
    assert(graft.sources.DeletionVectors.purgeDeletionVectors(spark, dir)
      == 0, "idempotent: nothing left to purge")
    // time-travel retention intact: the pre-purge version still reads
    // (its files survive on the generation clock), WITH its vector
    assert(Sinks.readDeltaTableAt(spark, dir, preV).count() >= 2,
      "pre-purge version unreadable after partition purge")
    assert(graft.sources.DeletionVectors
      .readDeltaTableMor(spark, dir, preV)
      .select("k").as[Long].collect().toSet == expect,
      "pre-purge MOR read must still subtract the purged vector")
    // and a later merge of the purged partition neither duplicates nor
    // resurrects (partitionGens markers advanced with the purge commit)
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((7L, "2024-01-01", 7.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(1L, 3L, 7L),
      "post-purge merge corrupted the partition")
  }

  test("partition-wide delete + checkpoint pruning cannot re-arm the " +
      "crash-window guard") {
    // round-10 advice: when a DV DELETE drops a partition's EVERY live
    // file and cleanDeltaLog then prunes the JSONs that carried its
    // partitionGens markers, the markerless guard saw "no live file
    // under the pointer gen" and classified the partition as
    // crash-lagging — the next merge based on the raw pointer dir and
    // resurrected the whole deleted partition. The _last_checkpoint
    // graftPartGens snapshot (plus the ever-logged containment check)
    // closes it.
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
        (3L, "2024-01-02", 3.0)).toDF("k", "ds", "v"), Seq("k"), "ds") // v0
    // partition-wide delete: every physical row of p=2024-01-01 goes,
    // so BOTH its files drop outright — zero live files, no DVs left
    graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("ds") === "2024-01-01") // v1
    Sinks.checkpointDeltaLog(spark, dir) // snapshot carries graftPartGens
    assert(Sinks.cleanDeltaLog(dir) == 1, "v0 (the marker JSON) pruned")
    // the merge of the deleted partition must see it as CURRENT (gen-0
    // logged, then emptied), not crash-lagging
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((9L, "2024-01-01", 9.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(3L, 9L),
      "partition-wide-deleted rows resurrected after marker pruning")
  }

  test("DELETE and purge refuse a crash-lagging partition " +
      "(pointer ahead of log); the merge heals") {
    // this round's own review finds: writing over a partition whose
    // merge crashed between pointer swap and log commit either erases
    // the crashed batch (purge: fresh partitionGens marker covers the
    // pointer) or is silently undone (DELETE: the healing merge's
    // raw-dir base discards the vector after the delete was
    // acknowledged). Both must refuse; the MERGE is the healer.
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
        (3L, "2024-01-02", 3.0)).toDF("k", "ds", "v"),
      Seq("k"), "ds") // v0: gen-0 both partitions
    // a healthy DELETE first: leaves a REAL vector on the shared gen-0
    // file (k=2 stays live, so the file cannot drop outright)
    graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("k") === 1L) // v1
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((5L, "2024-01-01", 5.0)).toDF("k", "ds", "v"),
      Seq("k"), "ds") // v2: p=01-01 -> gen-1 (MOR base, so k=1 stays gone)
    // simulate the crash window: v2's log entry never landed — the
    // pointer names gen-1, the logged state still holds gen-0 + the DV
    Files.delete(Paths.get(dir, "_delta_log", f"${2L}%020d.json"))
    val eDel = intercept[IllegalArgumentException] {
      graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
        col("k") === 2L)
    }
    assert(eDel.getMessage.contains("pointer generation ahead"),
      eDel.getMessage)
    val ePurge = intercept[IllegalArgumentException] {
      graft.sources.DeletionVectors.purgeDeletionVectors(spark, dir)
    }
    assert(ePurge.getMessage.contains("pointer generation ahead"),
      ePurge.getMessage)
    // the merge heals the window (raw-dir base carries the crashed
    // batch, which was itself MOR-based, so the pre-crash delete
    // holds); afterwards no vectors remain and purge is a clean no-op
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((7L, "2024-01-01", 7.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    assert(graft.sources.DeletionVectors.purgeDeletionVectors(spark, dir)
      == 0)
    assert(Sinks.readDeltaTableAt(spark, dir).select("k").as[Long]
      .collect().toSet == Set(2L, 3L, 5L, 7L),
      "crashed batch lost or pre-crash delete resurrected through the heal")
    // post-heal, DELETE works again
    assert(graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir,
      col("k") === 2L).rowsDeleted == 1L)
  }

  test("dropDeltaColumn is metadata-only; re-add and rename refuse loudly") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v"),
      keys = Seq("k")) // v0
    val filesBefore = {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(Paths.get(dir))
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
      finally walk.close()
    }
    Sinks.dropDeltaColumn(spark, dir, "name") // v1, metadata-only
    val post = Sinks.readDeltaTableAt(spark, dir)
    assert(post.columns.toSet == Set("k", "v"), "column still visible")
    assert(post.count() == 2)
    val filesAfter = {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(Paths.get(dir))
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).map(_.toString).toSet
      finally walk.close()
    }
    assert(filesAfter == filesBefore, "drop must not touch data files")
    // time travel to the pre-drop version reads that version's schema
    assert(Sinks.readDeltaTableAt(spark, dir, 0L).columns.toSet
      == Set("k", "name", "v"))
    // re-adding the dropped name is refused: old files still carry the
    // orphaned physical values, which would resurface as the new data
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, dir,
        Seq((3L, "ghost", 30.0)).toDF("k", "name", "v"), keys = Seq("k"),
        evolveSchema = true)
    }
    assert(e.getMessage.contains("re-add"), e.getMessage)
    // a narrow batch without the column merges fine under the new schema
    Sinks.upsertParquet(spark, dir,
      Seq((3L, 30.0)).toDF("k", "v"), keys = Seq("k"))
    assert(Sinks.readDeltaTableAt(spark, dir).columns.toSet
      == Set("k", "v"))
    // the marker survives checkpoint + log pruning (configuration rides
    // the checkpoint parquet and canonicalMetaData)
    Sinks.checkpointDeltaLog(spark, dir)
    Sinks.cleanDeltaLog(dir)
    val e2 = intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, dir,
        Seq((4L, "ghost", 40.0)).toDF("k", "name", "v"), keys = Seq("k"),
        evolveSchema = true)
    }
    assert(e2.getMessage.contains("re-add"),
      s"droppedColumns marker lost through checkpoint pruning: " +
        e2.getMessage)
    // rename is metadata-only via column mapping since round 12
    // (DeltaMappingSpec owns the semantics); here: it composes with the
    // droppedColumns marker — the renamed table still refuses the
    // buried name
    Sinks.renameDeltaColumn(spark, dir, "v", "val")
    assert(Sinks.readDeltaTableAt(spark, dir).columns.toSet
      == Set("k", "val"))
    val e3 = intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, dir,
        Seq((5L, "ghost", 50.0)).toDF("k", "name", "val"), keys = Seq("k"),
        evolveSchema = true)
    }
    assert(e3.getMessage.contains("re-add"), e3.getMessage)
  }

  test("add actions carry footer-derived stats; skipped types are omitted") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "alpha", 1.5, java.sql.Date.valueOf("2024-03-01")),
        (9L, "omega", -2.5, java.sql.Date.valueOf("2024-03-09")))
        .toDF("k", "name", "v", "ds").coalesce(1), Seq("k"))
    val adds = actions(dir, 0L).filter(_.has("add")).map(_.get("add"))
    assert(adds.nonEmpty)
    val stats = mapper.readTree(adds.head.get("stats").asText)
    assert(stats.get("numRecords").asLong == 2L)
    val mins = stats.get("minValues"); val maxs = stats.get("maxValues")
    assert(mins.get("k").asLong == 1L && maxs.get("k").asLong == 9L)
    assert(mins.get("name").asText == "alpha" &&
      maxs.get("name").asText == "omega")
    assert(mins.get("v").asDouble == -2.5 && maxs.get("v").asDouble == 1.5)
    // DATE renders as ISO strings, the Delta stats convention
    assert(mins.get("ds").asText == "2024-03-01" &&
      maxs.get("ds").asText == "2024-03-09")
    assert(stats.get("nullCount").get("name").asLong == 0L)
  }

  test("checkpoint: classic parquet + _last_checkpoint; state matches " +
    "full JSON replay and later commits replay on top") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    (0 until 4).foreach { i =>
      Sinks.upsertParquet(spark, dir,
        Seq((i.toLong, i * 1.0), (50L, i * 9.0)).toDF("k", "v"), Seq("k"),
        checkpointInterval = 0) // manual checkpointing in this test
    }
    val cpV = Sinks.checkpointDeltaLog(spark, dir, 2L)
    assert(cpV == 2L)
    val logDir = Paths.get(dir, "_delta_log")
    val cpFile = logDir.resolve(f"${2L}%020d.checkpoint.parquet")
    assert(Files.isRegularFile(cpFile), "checkpoint is a single FILE")
    val lc = mapper.readTree(Files.readString(
      logDir.resolve("_last_checkpoint")))
    assert(lc.get("version").asLong == 2L && lc.get("size").asLong > 0)
    // checkpoint rows: exactly one protocol, one metaData, adds = live set
    val cp = spark.read.parquet(cpFile.toString)
    assert(cp.where(col("protocol").isNotNull).count() == 1)
    assert(cp.where(col("metaData").isNotNull).count() == 1)
    val cpAdds = cp.where(col("add").isNotNull)
      .select("add.path").as[String].collect().toSet
    assert(cpAdds == Sinks.deltaLiveFiles(dir, 2L).toSet,
      "checkpoint adds = pure-JSON replay at the checkpoint version")
    // stats survive the checkpoint round-trip
    val cpStats = cp.where(col("add").isNotNull)
      .select("add.stats").as[String].collect()
    assert(cpStats.forall(s => s != null &&
      mapper.readTree(s).get("numRecords").asLong > 0))
    // the checkpoint-aware reader resumes from the checkpoint and still
    // sees version-3 state; row content matches the pointer read
    assert(Sinks.readDeltaTableAt(spark, dir).orderBy("k").collect().toSeq
      == Sinks.readUpsertTable(spark, dir).orderBy("k").collect().toSeq)
    // time travel BELOW the checkpoint still answers via JSON replay
    assert(Sinks.readDeltaTableAt(spark, dir, 1L).orderBy("k")
      .collect().toSeq
      == Sinks.readUpsertTableAt(spark, dir, 1L).orderBy("k")
        .collect().toSeq)
  }

  test("upsertParquet auto-checkpoints every checkpointInterval commits") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    (0 until 3).foreach { i =>
      Sinks.upsertParquet(spark, dir,
        Seq((i.toLong, i * 1.0)).toDF("k", "v"), Seq("k"),
        checkpointInterval = 2)
    }
    val logDir = Paths.get(dir, "_delta_log")
    assert(Files.isRegularFile(
      logDir.resolve(f"${2L}%020d.checkpoint.parquet")))
    assert(mapper.readTree(Files.readString(
      logDir.resolve("_last_checkpoint"))).get("version").asLong == 2L)
  }

  test("stats-based file skipping prunes disjoint-range files; results " +
    "are exact either way") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    // clustered write -> each committed file covers a disjoint k range
    // (the merge's own hash shuffle would otherwise scatter the ranges).
    // AQE would rightly coalesce 1000 tiny rows to one file; hold it off
    // so the test gets the multi-file layout a real table would have.
    val coalKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoal = spark.conf.get(coalKey, "true")
    spark.conf.set(coalKey, "false")
    try Sinks.upsertParquet(spark, dir,
      spark.range(0, 1000).repartition(8).select(col("id").as("k"),
        (col("id") % 7).as("v")), Seq("k"), clusterBy = Seq("k"))
    finally spark.conf.set(coalKey, prevCoal)
    val all = Sinks.deltaLiveAdds(spark, dir).map(_._1)
    assert(all.size >= 4, s"expected multiple files, got ${all.size}")
    val pruned = Sinks.deltaPrunedFiles(spark, dir, "k", 100L, 160L)
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"stats must skip files: ${pruned.size} of ${all.size}")
    val got = Sinks.readDeltaTablePruned(spark, dir, "k", 100L, 160L)
      .orderBy("k").select("k").as[Long].collect().toSeq
    assert(got == (100L to 160L).toSeq, "pruned read is exact")
    // empty range -> empty frame with the table schema, no error
    val empty = Sinks.readDeltaTablePruned(spark, dir, "k", 5000L, 6000L)
    assert(empty.count() == 0 &&
      empty.schema.fieldNames.toSet == Set("k", "v"))
    // a column with no stats entry never prunes (missing = keep)
    assert(Sinks.deltaPrunedFiles(spark, dir, "nope", 0, 1).size == all.size)
  }

  test("deltaTableCount answers COUNT(*) from the log alone") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      spark.range(0, 500).select(col("id").as("k"),
        (col("id") % 3).as("v")), Seq("k"))
    Sinks.upsertParquet(spark, dir,
      spark.range(400, 700).select(col("id").as("k"),
        (col("id") % 3).as("v")), Seq("k"))
    assert(Sinks.deltaTableCount(spark, dir) == Some(700L),
      "metadata count equals the merged row count")
    assert(Sinks.deltaTableCount(spark, dir, 0L) == Some(500L),
      "counts time-travel with the log")
    assert(Sinks.deltaTableCount(spark, dir).get ==
      Sinks.readDeltaTableAt(spark, dir).count())
  }

  test("cleanDeltaLog prunes pre-checkpoint history; state and future " +
    "checkpoints survive the gap") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    (0 until 5).foreach { i =>
      Sinks.upsertParquet(spark, dir,
        Seq((i.toLong, i * 1.0)).toDF("k", "v"), Seq("k"),
        checkpointInterval = 0)
    }
    // no checkpoint yet: cleanup must refuse (returns 0, deletes nothing)
    assert(Sinks.cleanDeltaLog(dir) == 0)
    assert(Sinks.deltaLogVersions(dir) == (0L to 4L))
    Sinks.checkpointDeltaLog(spark, dir, 3L)
    assert(Sinks.cleanDeltaLog(dir, keepTail = 1) == 2,
      "versions 0,1 deleted; 2 kept as tail, 3 is the checkpoint")
    assert(Sinks.deltaLogVersions(dir) == Seq(2L, 3L, 4L))
    // current state still reconstructs (checkpoint base + tail replay)
    assert(Sinks.readDeltaTableAt(spark, dir).orderBy("k").collect().toSeq
      == Sinks.readUpsertTable(spark, dir).orderBy("k").collect().toSeq)
    // a LATER commit + checkpoint builds on the checkpoint base, not the
    // (now gapped) JSON history — the cleanup-then-checkpoint trap
    Sinks.upsertParquet(spark, dir,
      Seq((99L, 99.0)).toDF("k", "v"), Seq("k"), checkpointInterval = 0)
    Sinks.checkpointDeltaLog(spark, dir)
    assert(Sinks.cleanDeltaLog(dir) == 3, "2,3,4 below the new checkpoint")
    val viaCp = Sinks.readDeltaTableAt(spark, dir).orderBy("k")
      .collect().toSeq
    assert(viaCp == Sinks.readUpsertTable(spark, dir).orderBy("k")
      .collect().toSeq, "post-clean checkpoint state is complete")
    assert(viaCp.map(_.getLong(0)).contains(0L),
      "rows merged before the cleaned history survive in the state")
    // time travel BELOW the retained history fails loudly — a gapped
    // JSON replay would silently yield a partial snapshot for
    // partition-scoped commits, so the reader refuses instead
    val err = intercept[IllegalArgumentException] {
      Sinks.readDeltaTableAt(spark, dir, 1L)
    }
    assert(err.getMessage.contains("vacuumed"), err.getMessage)
  }

  test("post-VACUUM partition rewrite removes the files a pre-checkpoint " +
    "commit added (the write path is checkpoint-aware)") {
    // the r7-advice trap: partition A is last rewritten BEFORE the
    // checkpoint; after cleanDeltaLog prunes the pre-checkpoint JSONs, a
    // commit that rewrites A again can only learn A's live files from the
    // CHECKPOINT — a raw JSON replay would emit no removes for them, and
    // protocol readers would see both generations (duplicated rows)
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "A", 1.0), (2L, "B", 2.0)).toDF("k", "ds", "v"),
      Seq("k"), "ds")                       // v0: A and B born
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((2L, "B", 5.0)).toDF("k", "ds", "v"),
      Seq("k"), "ds")                       // v1: touches only B
    val aFilesV0 = Sinks.deltaLiveFiles(dir)
      .filter(_.startsWith("p=A/")).toSet
    assert(aFilesV0.nonEmpty)
    Sinks.checkpointDeltaLog(spark, dir)    // checkpoint at v1
    assert(Sinks.cleanDeltaLog(dir) == 1, "v0's JSON pruned")
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "A", 9.0)).toDF("k", "ds", "v"),
      Seq("k"), "ds")                       // v2: rewrites A post-vacuum
    val v2 = actions(dir, 2L)
    val removed = v2.filter(_.has("remove"))
      .map(_.get("remove").get("path").asText).toSet
    assert(aFilesV0.subsetOf(removed),
      s"v2 must remove A's pre-checkpoint files: removed=$removed " +
        s"expected at least $aFilesV0")
    // a protocol reader reconstructing through the checkpoint sees
    // exactly one generation of A — no duplicated rows
    val viaLog = Sinks.readDeltaTableAt(spark, dir)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(viaLog == Seq((1L, 9.0), (2L, 5.0)),
      s"one row per key through the log: $viaLog")
  }

  test("txn actions make writers idempotent across replay, checkpoint " +
    "pruning, and concurrent twins") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    val app = "ingest-app"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 10.0)).toDF("k", "v"), Seq("k"), txn = Some((app, 0L)))
    assert(Sinks.lastTxnVersion(dir, app).contains(0L))
    // the txn action sits in the leading block with the protocol shape
    val v0 = actions(dir, 0L)
    val tx = v0.find(_.has("txn")).map(_.get("txn"))
    assert(tx.nonEmpty, "commit must carry the txn action")
    assert(tx.get.get("appId").asText == app &&
      tx.get.get("version").asLong == 0L && tx.get.has("lastUpdated"))
    // REPLAY of batch 0 (different payload — a buggy retry): no-op, no
    // new version, table unchanged
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 999.0)).toDF("k", "v"), Seq("k"), txn = Some((app, 0L)))
    assert(Sinks.deltaLogVersions(dir) == Seq(0L))
    assert(Sinks.readDeltaTableAt(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq == Seq((1L, 10.0)))
    // the NEXT batch commits normally
    Sinks.upsertParquet(spark, dir,
      Seq((2L, 20.0)).toDF("k", "v"), Seq("k"), txn = Some((app, 1L)))
    assert(Sinks.lastTxnVersion(dir, app).contains(1L))
    // a different appId is independent state
    Sinks.upsertParquet(spark, dir,
      Seq((3L, 30.0)).toDF("k", "v"), Seq("k"),
      txn = Some(("other-app", 0L)))
    assert(Sinks.lastTxnVersion(dir, "other-app").contains(0L))
    assert(Sinks.lastTxnVersion(dir, app).contains(1L))
    // checkpoint + prune: the graftTxns snapshot carries the marker past
    // the txn-bearing JSONs' deletion, so a restarted writer still skips
    val cpV = Sinks.checkpointDeltaLog(spark, dir)
    // the checkpoint PARQUET carries the protocol txn rows (one per
    // appId, newest version) — an EXTERNAL Delta reader reconstructing
    // from the checkpoint sees the idempotence state too, not just
    // graft's _last_checkpoint snapshot
    val cpDf = spark.read.parquet(
      Paths.get(dir, "_delta_log", f"$cpV%020d.checkpoint.parquet")
        .toString)
    val txRows = cpDf.where(col("txn").isNotNull)
      .select("txn.appId", "txn.version").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(txRows == Map(app -> 1L, "other-app" -> 0L),
      s"checkpoint txn rows: $txRows")
    assert(Sinks.cleanDeltaLog(dir) > 0)
    assert(Sinks.lastTxnVersion(dir, app).contains(1L),
      "txn version must survive log pruning via the checkpoint snapshot")
    Sinks.upsertParquet(spark, dir,
      Seq((2L, 888.0)).toDF("k", "v"), Seq("k"), txn = Some((app, 1L)))
    assert(Sinks.readDeltaTableAt(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)),
      "replayed batch after pruning must not re-merge")
    // the partitioned writer shares the protocol
    val pdir = Files.createTempDirectory("dlog").toString + "/p"
    Sinks.upsertParquetPartitioned(spark, pdir,
      Seq((1L, "A", 1.0)).toDF("k", "ds", "v"), Seq("k"), "ds",
      txn = Some((app, 0L)))
    Sinks.upsertParquetPartitioned(spark, pdir,
      Seq((1L, "A", 777.0)).toDF("k", "ds", "v"), Seq("k"), "ds",
      txn = Some((app, 0L)))
    assert(Sinks.readUpsertPartitionedTable(spark, pdir).collect()
      .map(_.getDouble(2)).toSeq == Seq(1.0),
      "partitioned replay must be a no-op")
  }

  test("concurrent twin writers with the same (appId, version) commit " +
    "exactly once") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((0L, 0.0)).toDF("k", "v"), Seq("k"))
    val app = "twin-app"
    // four twins race the SAME batch id with drifted payloads (the
    // zombie-driver + restarted-driver case): the lock-CAS plus the
    // in-lock txn recheck must let exactly one land
    val threads = (1 to 4).map { i =>
      new Thread(() =>
        try Sinks.upsertParquet(spark, dir,
          Seq((1L, i.toDouble)).toDF("k", "v"), Seq("k"),
          txn = Some((app, 7L)), maxRetries = 10)
        catch { // a loser may exhaust retries under pathological
                // scheduling — the asserts below still hold
          case _: java.util.ConcurrentModificationException => () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val txns = Sinks.deltaLogVersions(dir)
      .flatMap(v => actions(dir, v).filter(_.has("txn")).map(_.get("txn")))
      .filter(t => t.get("appId").asText == app)
    assert(txns.map(_.get("version").asLong).toSeq == Seq(7L),
      s"exactly one commit must carry (twin-app, 7): $txns")
    val vs = Sinks.readDeltaTableAt(spark, dir)
      .filter(col("k") === 1L).collect().map(_.getDouble(1)).toSeq
    assert(vs.length == 1 && (1 to 4).map(_.toDouble).contains(vs.head))
    assert(Sinks.lastTxnVersion(dir, app).contains(7L))
  }

  test("a replayed txn batch skips EVERY entry guard: dropped columns " +
    "and constraints added after the batch landed") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    val app = "replay-app"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "x", 5.0)).toDF("k", "name", "v"), Seq("k"),
      txn = Some((app, 0L)))
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "x", 0.5)).toDF("k", "name", "v"), Seq("k"),
      txn = Some((app, 1L)))
    // the table evolves PAST batch 0: its column dropped, a constraint
    // IT would violate (but the current rows pass) added
    Sinks.dropDeltaColumn(spark, dir, "name")
    Sinks.addDeltaCheckConstraint(spark, dir, "v_cap", "v < 1")
    // a restarted stream replays batch 0 verbatim (still carrying
    // 'name', v=5.0 violating v_cap) — it must NO-OP, not wedge the
    // stream on the dropped-column or constraint guard
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "x", 5.0)).toDF("k", "name", "v"), Seq("k"),
      txn = Some((app, 0L)))
    val after = Sinks.readDeltaTableAt(spark, dir)
    assert(after.columns.toSet == Set("k", "v"))
    assert(after.collect().map(_.getDouble(1)).toSeq == Seq(0.5),
      "the replay must not re-merge batch 0's payload")
    // constraint refs are CASE-INSENSITIVE like Spark's resolution:
    // `V < 10` reads column v, so dropping v must refuse
    Sinks.dropDeltaCheckConstraint(spark, dir, "v_cap")
    Sinks.addDeltaCheckConstraint(spark, dir, "v_cap_uc", "V < 10")
    val e = intercept[IllegalArgumentException] {
      Sinks.dropDeltaColumn(spark, dir, "v")
    }
    assert(e.getMessage.contains("v_cap_uc"))
    // ADD CONSTRAINT on a table a DELETE fully emptied (the natural
    // wipe-then-constrain-then-reingest sequence) trivially validates
    val dir2 = Files.createTempDirectory("dlog").toString + "/t2"
    Sinks.upsertParquet(spark, dir2,
      Seq((1L, -5.0)).toDF("k", "v"), Seq("k"))
    graft.sources.DeletionVectors.deleteDeltaWhere(spark, dir2,
      lit(true))
    Sinks.addDeltaCheckConstraint(spark, dir2, "v_pos", "v > 0")
    Sinks.upsertParquet(spark, dir2,
      Seq((2L, 7.0)).toDF("k", "v"), Seq("k"))
    assert(Sinks.readDeltaTableAt(spark, dir2).count() == 1)
  }

  test("CHECK constraints ride the PARTITIONED commit path: enforced " +
    "per batch, configuration survives partition-scoped metaData") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "A", 5.0), (2L, "B", 7.0)).toDF("k", "ds", "v"),
      Seq("k"), "ds")
    Sinks.addDeltaCheckConstraint(spark, dir, "v_pos", "v > 0")
    // a violating partitioned batch is refused; no pointer moved
    intercept[IllegalStateException] {
      Sinks.upsertParquetPartitioned(spark, dir,
        Seq((3L, "A", -1.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    }
    assert(Sinks.readUpsertPartitionedTable(spark, dir).count() == 2)
    // a PARTITION-SCOPED commit's metaData must carry the configuration
    // forward (it unions with the logged schema/config), so the
    // constraint still fires after a commit that touched only p=B
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((2L, "B", 9.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    intercept[IllegalStateException] {
      Sinks.upsertParquetPartitioned(spark, dir,
        Seq((4L, "A", -2.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    }
    // the merged-snapshot (strategy-minted rows) check is pinned on the
    // unpartitioned path; both writers share enforceConstraintsOnStage
    val ok = Sinks.readUpsertPartitionedTable(spark, dir)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ok.toSeq == Seq((1L, 5.0), (2L, 9.0)))
  }

  test("the streaming upsert sink with an appId skips a replayed " +
    "micro-batch entirely") {
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    val sink = graft.streaming.Streams.upsertSink(dir, Seq("k"),
      appId = Some("stream-q1"))
    sink(Seq((1L, 1.0)).toDF("k", "v"), 0L)
    sink(Seq((2L, 2.0)).toDF("k", "v"), 1L)
    // batch 1 REPLAYED after a restart, with drifted content — skipped
    sink(Seq((2L, 666.0)).toDF("k", "v"), 1L)
    assert(Sinks.readDeltaTableAt(spark, dir).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.0), (2L, 2.0)))
    assert(Sinks.lastTxnVersion(dir, "stream-q1").contains(1L))
  }

  test("CHECK constraints: existing rows validated at ADD, writers " +
    "enforce at entry AND on the merged snapshot, drops interlock") {
    import graft.operators.MergeOps
    val dir = Files.createTempDirectory("dlog").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 5.0, 10.0)).toDF("k", "lo", "hi"), Seq("k"))
    Sinks.addDeltaCheckConstraint(spark, dir, "hi_positive", "hi > 0")
    val vAfterAdd = Sinks.deltaLogVersions(dir).max
    // a violating batch is refused at ENTRY; no version, no pointer move
    val e1 = intercept[IllegalStateException] {
      Sinks.upsertParquet(spark, dir,
        Seq((2L, 1.0, -3.0)).toDF("k", "lo", "hi"), Seq("k"))
    }
    assert(e1.getMessage.contains("hi_positive") &&
      e1.getMessage.contains("source-batch"))
    assert(Sinks.deltaLogVersions(dir).max == vAfterAdd)
    assert(Sinks.readDeltaTableAt(spark, dir).count() == 1)
    // a passing batch commits, and the constraint rides the new metaData
    Sinks.upsertParquet(spark, dir,
      Seq((2L, 1.0, 30.0)).toDF("k", "lo", "hi"), Seq("k"))
    // ADD over already-violating EXISTING rows is refused
    val e2 = intercept[IllegalStateException] {
      Sinks.addDeltaCheckConstraint(spark, dir, "lo_gt_hi", "lo > hi")
    }
    assert(e2.getMessage.contains("existing"))
    // cross-column strategies can mint rows NEITHER side carried: the
    // batch passes the entry check (12-8=4 > 3) but Greatest(lo)=8
    // beside Least(hi)=10 leaves a 2-wide band — only the staged
    // merged-snapshot check can catch it
    Sinks.addDeltaCheckConstraint(spark, dir, "wide_band", "hi - lo > 3")
    val e3 = intercept[IllegalStateException] {
      Sinks.upsertParquet(spark, dir,
        Seq((1L, 8.0, 12.0)).toDF("k", "lo", "hi"), Seq("k"),
        strategies = Map("lo" -> MergeOps.Greatest, "hi" -> MergeOps.Least))
    }
    assert(e3.getMessage.contains("wide_band") &&
      e3.getMessage.contains("merged-snapshot"))
    // no half-committed state: the table still reads
    assert(Sinks.readDeltaTableAt(spark, dir).count() == 2)
    // dropping a column a constraint references is refused
    val e4 = intercept[IllegalArgumentException] {
      Sinks.dropDeltaColumn(spark, dir, "lo")
    }
    assert(e4.getMessage.contains("wide_band"))
    // constraints survive checkpoint + pruning (configuration snapshot)
    Sinks.checkpointDeltaLog(spark, dir)
    Sinks.cleanDeltaLog(dir)
    val e5 = intercept[IllegalStateException] {
      Sinks.upsertParquet(spark, dir,
        Seq((3L, 1.0, -1.0)).toDF("k", "lo", "hi"), Seq("k"))
    }
    assert(e5.getMessage.contains("hi_positive"),
      "constraint must survive log pruning")
    // DROP CONSTRAINT is loud on a typo and effective when real
    intercept[IllegalArgumentException] {
      Sinks.dropDeltaCheckConstraint(spark, dir, "no_such")
    }
    Sinks.dropDeltaCheckConstraint(spark, dir, "wide_band")
    Sinks.dropDeltaColumn(spark, dir, "lo") // now legal
    // the SQL spellings lower onto the same calls
    val addDf = graft.plans.GraftSql.sql(spark,
      s"ALTER TABLE '$dir' ADD CONSTRAINT hi_cap CHECK (hi < 1000)")
    assert(addDf.select("operation").head.getString(0) == "ADD CONSTRAINT")
    val dropDf = graft.plans.GraftSql.sql(spark,
      s"ALTER TABLE '$dir' DROP CONSTRAINT hi_cap")
    assert(dropDf.select("constraint_name").head.getString(0) == "hi_cap")
    // NULL passes CHECK (SQL semantics): a narrow batch under schema
    // evolution leaves late-added columns null, which must not violate
    Sinks.addDeltaCheckConstraint(spark, dir, "hi_floor", "hi > -100")
    Sinks.upsertParquet(spark, dir,
      Seq((9L, "tag")).toDF("k", "label"), Seq("k"), evolveSchema = true)
    assert(Sinks.readDeltaTableAt(spark, dir)
      .filter(col("k") === 9L).count() == 1)
  }
}
