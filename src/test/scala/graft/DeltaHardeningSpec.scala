package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, DeletionVectors}

/** Round-12 hardening pins: the legacy `graftPartGens` backfill
  * (round-11 directive 3), the version-pinned checkpoint txn rows
  * sourced from the previous checkpoint PARQUET instead of the unpinned
  * sidecar, the txn-walk garbage discipline, and constraint column-ref
  * validation at ADD time (round-11 ADVICE items 1, 2, 4).
  */
class DeltaHardeningSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Builds the LEGACY layout the crash-window guard's documented
    * residual describes: partitioned table, partition-wide DELETE on
    * 2024-01-01, a later merge touching only 2024-01-02, checkpoint,
    * prune — then strip the `graftPartGens`/`graftTxns` snapshots from
    * `_last_checkpoint`, exactly what a pre-snapshot checkpointer left
    * behind. Partition 2024-01-01 ends with a pointer, no marker, no
    * live files, and no retained-log evidence.
    */
  private def buildLegacyLayout(): String = {
    val dir = Files.createTempDirectory("legacy").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
        (3L, "2024-01-02", 3.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    val del = DeletionVectors.deleteDeltaWhere(spark, dir,
      col("ds") === "2024-01-01")
    assert(del.rowsDeleted == 2L)
    // a later merge touching ONLY the other partition, so the pruned
    // tail keeps a marker for 01-02 but none for 01-01
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((3L, "2024-01-02", 9.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    Sinks.checkpointDeltaLog(spark, dir)
    assert(Sinks.cleanDeltaLog(dir) > 0,
      "fixture must prune the delete evidence")
    // simulate the pre-snapshot checkpointer: drop the graft snapshots
    val lc = Paths.get(dir, "_delta_log", "_last_checkpoint")
    val node = mapper.readTree(Files.readString(lc))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    assert(node.has("graftPartGens"), "fixture expects the snapshot")
    node.remove("graftPartGens")
    node.remove("graftTxns")
    Files.writeString(lc, mapper.writeValueAsString(node))
    dir
  }

  test("pointer read of an UNHEALED evolved generation serves the crashed batch's columns") {
    val root = Files.createTempDirectory("ptrahead")
    val dir = root.resolve("t").toString
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    val store = new FuzzHarness.CrashingStore()
    graft.sources.LogStores.register(root, store)
    try {
      // die right after the pointer swap, before the log commit: store
      // ops inside the second upsert are createNew(_LOCK), put(lock
      // token), put(_CURRENT) — complete the third and crash
      store.arm(3, completeTrippingOp = true)
      intercept[FuzzHarness.InjectedCrash] {
        Sinks.upsertParquet(spark, dir,
          Seq((2L, 2.0, "late")).toDF("k", "v", "w"), Seq("k"),
          evolveSchema = true)
      }
      store.disarm()
      Files.deleteIfExists(Paths.get(dir, "_LOCK"))
      // the window must actually be open (fixture self-check)
      assert(FuzzHarness.rootPointerGen(dir).contains(1L) &&
        FuzzHarness.maxLoggedGen(dir) == 0L,
        "fixture drift: expected pointer gen-1 ahead of logged gen-0")
      // the pointer read must serve the crashed batch's evolved column
      // (round-13 review find: forcing the stale LOGGED schema onto the
      // unhealed generation silently hid it)
      val out = Sinks.readUpsertTable(spark, dir)
      assert(out.columns.toSet == Set("k", "v", "w"), out.columns.toSeq)
      assert(out.where(col("k") === 2L).select("w")
        .collect()(0).getString(0) == "late")
    } finally graft.sources.LogStores.unregister(root)
  }

  test("legacy layout WITHOUT migration resurrects the deleted partition (the residual is real)") {
    val dir = buildLegacyLayout()
    // the guard now sees 01-01 as crash-lagging (no marker, no live
    // files, no retained evidence) and the merge heals from the RAW
    // pointer dir — resurrecting the two deleted rows. This pins the
    // hazard the migration exists to close.
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((9L, "2024-01-01", 9.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    val ks = Sinks.readUpsertPartitionedTable(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(ks == Set(1L, 2L, 3L, 9L),
      s"fixture drift: expected the documented resurrection, got $ks")
  }

  test("migratePartitionGens closes the legacy crash-window residual") {
    val dir = buildLegacyLayout()
    val stamped = Sinks.migratePartitionGens(spark, dir)
    // only the markerless partition needed a stamp; 01-02's marker is
    // in the retained tail
    assert(stamped.keySet == Set("2024-01-01"), s"stamped $stamped")
    // the stamp survives pruning: it lands in a MIGRATE commit AND the
    // fresh checkpoint's graftPartGens snapshot
    val lc = mapper.readTree(Files.readString(
      Paths.get(dir, "_delta_log", "_last_checkpoint")))
    assert(lc.has("graftPartGens") &&
      lc.get("graftPartGens").has("2024-01-01"))
    // the next merge must NOT base on the raw pointer dir: deleted rows
    // stay deleted
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((9L, "2024-01-01", 9.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    val ks = Sinks.readUpsertPartitionedTable(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(ks == Set(3L, 9L),
      s"deleted rows resurrected through a migrated table: $ks")
    // idempotent: everything now carries a marker, nothing to stamp
    assert(Sinks.migratePartitionGens(spark, dir).isEmpty)
  }

  test("migratePartitionGens refuses on positive crash evidence") {
    val dir = Files.createTempDirectory("legacy").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0))
        .toDF("k", "ds", "v"), Seq("k"), "ds")
    // later commit so the marker-carrying v0 can be pruned below the cp
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((2L, "2024-01-02", 5.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    Sinks.checkpointDeltaLog(spark, dir)
    assert(Sinks.cleanDeltaLog(dir) > 0)
    val lc = Paths.get(dir, "_delta_log", "_last_checkpoint")
    val node = mapper.readTree(Files.readString(lc))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.remove("graftPartGens")
    node.remove("graftTxns")
    Files.writeString(lc, mapper.writeValueAsString(node))
    // simulate a writer that died between pointer swap and log commit:
    // gen-1 exists on disk, pointer names it, the log still shows gen-0
    val pdir = Paths.get(dir, "p=2024-01-01")
    val gen1 = pdir.resolve("gen-1")
    Files.createDirectories(gen1)
    val src = {
      val ls = Files.list(pdir.resolve("gen-0"))
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet")).get
      } finally ls.close()
    }
    Files.copy(src, gen1.resolve(src.getFileName))
    Files.writeString(pdir.resolve("_CURRENT"), "gen-1")
    val e = intercept[IllegalArgumentException] {
      Sinks.migratePartitionGens(spark, dir)
    }
    assert(e.getMessage.contains("crashed between its pointer swap") &&
      e.getMessage.contains("p=2024-01-01"), e.getMessage)
  }

  test("checkpoint parquet txn rows never inherit unpinned sidecar state (round-11 ADVICE 4)") {
    val dir = Files.createTempDirectory("txnpin").toString + "/t"
    // v0, v1 carry txn versions 1, 2 for appId "app"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 10.0)).toDF("k", "v"), Seq("k"), txn = Some(("app", 1L)))
    Sinks.upsertParquet(spark, dir,
      Seq((2L, 20.0)).toDF("k", "v"), Seq("k"), txn = Some(("app", 2L)))
    Sinks.checkpointDeltaLog(spark, dir, 1L)
    // simulate a concurrent commit landing MID-checkpoint: the sidecar
    // (deliberately unpinned) already reflects a future txn version
    val lc = Paths.get(dir, "_delta_log", "_last_checkpoint")
    val node = mapper.readTree(Files.readString(lc))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    node.putObject("graftTxns").put("app", 99L)
    node.putObject("graftPartGens") // keep shape realistic
    Files.writeString(lc, mapper.writeValueAsString(node))
    // a later commit, then a pinned re-checkpoint at version 2: its
    // parquet txn rows must come from the PINNED previous parquet + the
    // retained walk <= 2, never the poisoned sidecar
    Sinks.upsertParquet(spark, dir,
      Seq((3L, 30.0)).toDF("k", "v"), Seq("k"), txn = Some(("app", 3L)))
    Sinks.checkpointDeltaLog(spark, dir, 2L)
    val cp = spark.read.parquet(
      Paths.get(dir, "_delta_log", f"${2L}%020d.checkpoint.parquet").toString)
    val txns = cp.where(col("txn").isNotNull)
      .select(col("txn.appId"), col("txn.version")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(txns == Map("app" -> 3L),
      s"pinned txn rows leaked sidecar state: $txns")
  }

  test("malformed txn lines never fabricate version 0 (round-11 ADVICE 1)") {
    val dir = Files.createTempDirectory("txngarbage").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 10.0)).toDF("k", "v"), Seq("k"), txn = Some(("good", 7L)))
    // hand-append a commit whose txn line carries a non-numeric version
    // and another with no appId at all — a protocol-violating producer
    val v = Sinks.deltaLogVersions(dir).max + 1
    val meta = Files.readString(
      Paths.get(dir, "_delta_log", f"${0L}%020d.json"))
      .linesIterator.find(_.contains("\"metaData\"")).get
    val body = Seq(
      """{"commitInfo":{"timestamp":0,"operation":"GARBAGE","operationParameters":{},"engineInfo":"test"}}""",
      """{"txn":{"appId":"ghost","version":"not-a-number","lastUpdated":0}}""",
      """{"txn":{"version":5,"lastUpdated":0}}""",
      meta).mkString("", "\n", "\n")
    Files.writeString(Paths.get(dir, "_delta_log", f"$v%020d.json"), body)
    // neither walk direction may see a phantom: the reverse reader
    // returns None for ghost, and the checkpoint sidecar skips it
    assert(Sinks.lastTxnVersion(dir, "ghost").isEmpty)
    assert(Sinks.lastTxnVersion(dir, "good").contains(7L))
    Sinks.checkpointDeltaLog(spark, dir)
    val lc = mapper.readTree(Files.readString(
      Paths.get(dir, "_delta_log", "_last_checkpoint")))
    assert(lc.has("graftTxns") && !lc.get("graftTxns").has("ghost") &&
      lc.get("graftTxns").get("good").asLong() == 7L)
    // and a writer for "ghost" at version 1 must RUN, not skip: a
    // fabricated version 0 would make lastTxnVersion(ghost) >= ... false
    Sinks.upsertParquet(spark, dir,
      Seq((9L, 90.0)).toDF("k", "v"), Seq("k"), txn = Some(("ghost", 1L)))
    assert(Sinks.readUpsertTable(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSet == Set(1L, 9L))
  }

  test("ADD CONSTRAINT validates column refs against the logged schema (round-11 ADVICE 2)") {
    val dir = Files.createTempDirectory("ckref").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 10.0)).toDF("k", "v"), Seq("k"))
    // wipe every live file — the zero-live-file regime where the
    // validation scan is skipped and a typo would previously land
    DeletionVectors.deleteDeltaWhere(spark, dir, lit(true))
    val e = intercept[IllegalArgumentException] {
      Sinks.addDeltaCheckConstraint(spark, dir, "typo", "vv > 0")
    }
    assert(e.getMessage.contains("vv") &&
      e.getMessage.contains("not in the logged schema"), e.getMessage)
    // a valid-column constraint still lands on the wiped table, and the
    // next writer enforces it
    Sinks.addDeltaCheckConstraint(spark, dir, "v_pos", "v > 0")
    intercept[IllegalStateException] {
      Sinks.upsertParquet(spark, dir,
        Seq((2L, -5.0)).toDF("k", "v"), Seq("k"))
    }
    Sinks.upsertParquet(spark, dir,
      Seq((2L, 5.0)).toDF("k", "v"), Seq("k"))
    // a constraint naming a DROPPED column is refused the same way
    // (the constraint on v must go first — dropDeltaColumn refuses to
    // orphan a live constraint, which is its own round-11 pin)
    Sinks.dropDeltaCheckConstraint(spark, dir, "v_pos")
    Sinks.dropDeltaColumn(spark, dir, "v")
    val e2 = intercept[IllegalArgumentException] {
      Sinks.addDeltaCheckConstraint(spark, dir, "back", "v > 0")
    }
    assert(e2.getMessage.contains("not in the logged schema"))
  }

  test("isVanishedFileError: vacuum races qualify, missing tables and unresolved relations do not (r14 ADVICE)") {
    val root = Files.createTempDirectory("vanished")
    def fnf = new java.io.FileNotFoundException(
      root.resolve("gen-0/part-000.parquet").toString)
    // the real race signatures, table root present
    assert(Sinks.isVanishedFileError(fnf, root))
    assert(Sinks.isVanishedFileError(
      new java.nio.file.NoSuchFileException(root.resolve("x").toString),
      root))
    assert(Sinks.isVanishedFileError(new RuntimeException(
      "[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error"), root))
    // wrapped causes are walked
    assert(Sinks.isVanishedFileError(
      new RuntimeException("job aborted", fnf), root))
    // PATH_NOT_FOUND counts only for paths under THIS table's root
    assert(Sinks.isVanishedFileError(new RuntimeException(
      s"[PATH_NOT_FOUND] Path does not exist: $root/gen-1"), root))
    assert(!Sinks.isVanishedFileError(new RuntimeException(
      "[PATH_NOT_FOUND] Path does not exist: /some/typoed/table"), root))
    // the old substring trap: an unresolved relation is NOT a race
    assert(!Sinks.isVanishedFileError(new RuntimeException(
      "[TABLE_OR_VIEW_NOT_FOUND] The table or view does not exist"),
      root))
    // nothing qualifies once the table root itself is gone — a race
    // needs a table to race on
    val gone = root.resolve("never-created")
    assert(!Sinks.isVanishedFileError(fnf, gone))
  }

  test("SQL VACUUM refuses BEFORE mutating on a crash-lagging table (r14 ADVICE)") {
    val dir = Files.createTempDirectory("vacorder").toString + "/t"
    Sinks.upsertParquet(spark, dir, Seq((1L, 10.0)).toDF("k", "v"),
      Seq("k"))
    val root = Paths.get(dir)
    // a stale staged dir old enough for cleanStagedUpserts to claim
    val staged = root.resolve("_txn-stale-junk")
    Files.createDirectories(staged)
    Files.setLastModifiedTime(staged,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600 * 1000))
    val logCount = Sinks.deltaLogVersions(dir).size
    // fake the crash window: pointer ahead of the log, no gen dir
    Files.writeString(root.resolve("_CURRENT"), "gen-5")
    intercept[IllegalArgumentException] {
      graft.plans.GraftSql.sql(spark, s"VACUUM '$dir'")
    }
    // the refusal fired before ANY cleanup: staged dir and log intact
    assert(Files.isDirectory(staged),
      "cleanStagedUpserts ran before the crash-lagging refusal")
    assert(Sinks.deltaLogVersions(dir).size == logCount,
      "cleanDeltaLog ran before the crash-lagging refusal")
    // heal and confirm VACUUM then works end-to-end
    Files.writeString(root.resolve("_CURRENT"), "gen-0")
    val row = graft.plans.GraftSql.sql(spark, s"VACUUM '$dir'").head()
    assert(row.getString(1) == "VACUUM")
    assert(!Files.isDirectory(staged), "stale staged dir not swept")
  }
}
