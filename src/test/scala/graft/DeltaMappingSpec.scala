package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Sinks, DeletionVectors}

/** Column mapping (round-11 optional directive 8): metadata-only RENAME
  * COLUMN that composes with DV DELETEs, RESTORE, time travel, schema
  * evolution, purge/compact rewrites, stats pruning, constraints, and
  * the droppedColumns guard. Data files keep the column's birth-name
  * spelling; the logged schema carries the logical name plus the Delta
  * protocol's `delta.columnMapping.physicalName` field metadata.
  */
class DeltaMappingSpec extends SparkSpec {
  import spark.implicits._

  private def ks(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("rename round-trips through DV DELETE, merge, purge, compact, RESTORE") {
    val dir = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      (1L to 8L).map(k => (k, s"n$k", k * 1.0)).toDF("k", "name", "v"),
      Seq("k"))
    DeletionVectors.deleteDeltaWhere(spark, dir, col("k") % 3 === 0L)
    Sinks.renameDeltaColumn(spark, dir, "name", "title")
    val afterRename = Sinks.readDeltaTableAt(spark, dir)
    assert(afterRename.columns.toSeq == Seq("k", "title", "v"))
    // values survive the rename (they live under the physical name) and
    // the DELETE still holds
    assert(afterRename.select("k", "title").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set(1L, 2L, 4L, 5L, 7L, 8L).map(k => (k, s"n$k")))
    val preMergeVersion = Sinks.deltaLogVersions(dir).max
    // a merge updating the RENAMED column, through the logical name
    Sinks.upsertParquet(spark, dir,
      Seq((2L, "T2", 2.5), (9L, "T9", 9.0)).toDF("k", "title", "v"),
      Seq("k"))
    def titleOf(k: Long): String = Sinks.readDeltaTableAt(spark, dir)
      .where(col("k") === k).select("title").collect()(0).getString(0)
    assert(titleOf(2L) == "T2" && titleOf(9L) == "T9" &&
      titleOf(1L) == "n1")
    // the data files still spell the column physically
    val physCols = spark.read.parquet(
      java.nio.file.Paths.get(dir,
        Files.readString(java.nio.file.Paths.get(dir, "_CURRENT")).trim)
        .toString).columns.toSeq
    assert(physCols.contains("name") && !physCols.contains("title"),
      s"staged files must keep the physical spelling: $physCols")
    // purge + compact rewrites keep the mapping coherent
    DeletionVectors.deleteDeltaWhere(spark, dir, col("k") === 8L)
    DeletionVectors.purgeDeletionVectors(spark, dir)
    Sinks.compactUpsertTable(spark, dir)
    val afterRewrites = Sinks.readDeltaTableAt(spark, dir)
    assert(afterRewrites.columns.toSeq == Seq("k", "title", "v"))
    assert(ks(afterRewrites) == Set(1L, 2L, 4L, 5L, 7L, 9L))
    assert(titleOf(2L) == "T2")
    // pointer read path agrees with its partitioned twin: LOGICAL names
    // (round-12 ADVICE closed the physical/logical asymmetry between
    // readUpsertTable and readUpsertPartitionedTable)
    val viaPointer = Sinks.readUpsertTable(spark, dir)
    assert(viaPointer.columns.toSeq == Seq("k", "title", "v"),
      s"pointer reads expose logical names: ${viaPointer.columns.toSeq}")
    assert(viaPointer.where(col("k") === 2L).select("title")
      .collect()(0).getString(0) == "T2")
    // RESTORE to the pre-merge version reverts rows AND keeps mapping
    Sinks.restoreDeltaTable(spark, dir, preMergeVersion)
    val restored = Sinks.readDeltaTableAt(spark, dir)
    assert(restored.columns.toSeq == Seq("k", "title", "v"))
    assert(ks(restored) == Set(1L, 2L, 4L, 5L, 7L, 8L))
    // RESTORE further back, to the pre-RENAME schema: name comes back
    Sinks.restoreDeltaTable(spark, dir, 1L)
    assert(Sinks.readDeltaTableAt(spark, dir).columns.toSeq ==
      Seq("k", "name", "v"))
  }

  test("rename refusals: collisions, constraints, old-name reuse, dropped names") {
    val dir = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "v"),
      Seq("k"))
    intercept[IllegalArgumentException] {
      Sinks.renameDeltaColumn(spark, dir, "name", "V") // case collision
    }
    intercept[IllegalArgumentException] {
      Sinks.renameDeltaColumn(spark, dir, "ghost", "x") // unknown column
    }
    Sinks.addDeltaCheckConstraint(spark, dir, "v_pos", "v > 0")
    val e = intercept[IllegalArgumentException] {
      Sinks.renameDeltaColumn(spark, dir, "v", "value")
    }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    Sinks.dropDeltaCheckConstraint(spark, dir, "v_pos")
    Sinks.renameDeltaColumn(spark, dir, "v", "value")
    // re-using the OLD logical name as a "new" evolved column would
    // collide with the renamed column's physical name in the files
    val e2 = intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, dir,
        Seq((3L, "c", 3.0, 33.0)).toDF("k", "name", "value", "v"),
        Seq("k"), evolveSchema = true)
    }
    assert(e2.getMessage.contains("physical name"), e2.getMessage)
    // dropping the renamed column buries BOTH spellings
    Sinks.dropDeltaColumn(spark, dir, "value")
    val e3 = intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, dir,
        Seq((3L, "c", 3.0)).toDF("k", "name", "v"),
        Seq("k"), evolveSchema = true)
    }
    assert(e3.getMessage.contains("dropped"), e3.getMessage)
    // and renaming another column ONTO a dropped name is refused
    intercept[IllegalArgumentException] {
      Sinks.renameDeltaColumn(spark, dir, "name", "value")
    }
  }

  test("partitioned table rename + stats pruning on the logical name") {
    val dir = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
        (3L, "2024-01-02", 3.0), (4L, "2024-01-02", 4.0))
        .toDF("k", "ds", "amount"),
      Seq("k"), "ds")
    Sinks.renameDeltaColumn(spark, dir, "amount", "amt")
    val viaPtr = Sinks.readUpsertPartitionedTable(spark, dir)
    assert(viaPtr.columns.toSeq == Seq("k", "ds", "amt"))
    assert(viaPtr.select("k", "amt").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0)))
    // merge through the new name into one partition; DELETE by it too
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((2L, "2024-01-01", 20.0)).toDF("k", "ds", "amt"),
      Seq("k"), "ds")
    // k=3 deletes via a DV (k=4 keeps the file alive and DV'd)
    DeletionVectors.deleteDeltaWhere(spark, dir, col("amt") === 3.0)
    assert(Sinks.readDeltaTableAt(spark, dir).select("k", "amt")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
      Set((1L, 1.0), (2L, 20.0), (4L, 4.0)))
    // external protocol reader agrees through the mapping
    val ext = ExternalDeltaReader.readRows(spark, dir)._2
      .map(m => (m("k"), m("amt"))).toSet
    assert(ext == Set((1L, 1.0), (2L, 20.0), (4L, 4.0)))
    // file-skipping prunes on the LOGICAL name (stats stay physical)
    val pruned = Sinks.readDeltaTablePruned(spark, dir, "amt", 15.0, null)
    assert(pruned.select("k").collect().map(_.getLong(0)).toSet ==
      Set(2L))
    val files = Sinks.deltaPrunedFiles(spark, dir, "amt", 15.0, null)
    assert(files.nonEmpty &&
      files.size < Sinks.deltaLiveFiles(dir).size,
      s"stats must actually skip files: kept ${files.size}")
  }

  test("mapping is protocol-visible: mode=name, field ids, protocol (2,5)") {
    val dir = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "a", 1.0)).toDF("k", "name", "v"), Seq("k"))
    Sinks.renameDeltaColumn(spark, dir, "name", "title")
    // a real reader needs the mode DECLARED and the protocol BUMPED —
    // physicalName metadata alone is ignored by off-the-shelf engines
    // (round-12 review find)
    val snap = ExternalDeltaReader.snapshot(spark, dir)
    assert(snap.config.get("delta.columnMapping.mode").contains("name"))
    assert(snap.config.get("delta.columnMapping.maxColumnId")
      .contains("3"))
    assert(snap.minReader == 2 && snap.minWriter == 5,
      s"protocol not upgraded: (${snap.minReader}, ${snap.minWriter})")
    // EVERY field carries a stable id + physicalName (a partially
    // mapped schema is rejected by external readers)
    snap.schema.fields.foreach { f =>
      assert(f.metadata.contains("delta.columnMapping.id"), f.name)
      assert(f.metadata.contains("delta.columnMapping.physicalName"),
        f.name)
    }
    // evolution stamps the NEW field too and advances maxColumnId
    Sinks.upsertParquet(spark, dir,
      Seq((2L, "b", 2.0, "z2")).toDF("k", "title", "v", "z"),
      Seq("k"), evolveSchema = true)
    val snap2 = ExternalDeltaReader.snapshot(spark, dir)
    val zField = snap2.schema.fields.find(_.name == "z").get
    assert(zField.metadata.getLong("delta.columnMapping.id") == 4L)
    assert(snap2.config.get("delta.columnMapping.maxColumnId")
      .contains("4"))
    // the checkpoint re-declares the upgraded protocol, never (1, 2)
    val cpV = Sinks.checkpointDeltaLog(spark, dir)
    val proto = spark.read.parquet(java.nio.file.Paths.get(dir,
        "_delta_log", f"$cpV%020d.checkpoint.parquet").toString)
      .where(col("protocol").isNotNull)
      .select("protocol.minReaderVersion", "protocol.minWriterVersion")
      .collect()(0)
    assert(proto.getInt(0) == 2 && proto.getInt(1) == 5)
    // a RE-CASED spelling of the renamed column's physical name is
    // refused at writer entry, like every sibling guard
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, dir,
        Seq((3L, "x")).toDF("k", "NAME"), Seq("k"), evolveSchema = true)
    }
    assert(e.getMessage.contains("physical name"), e.getMessage)
    // engine-reserved target names are refused
    intercept[IllegalArgumentException] {
      Sinks.renameDeltaColumn(spark, dir, "v", "__p")
    }
  }

  test("ids never shrink or get reused; protocol survives RESTORE-past-rename") {
    val dir = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "a", 1.0)).toDF("k", "name", "v"), Seq("k"))
    val preRename = Sinks.deltaLogVersions(dir).max
    Sinks.renameDeltaColumn(spark, dir, "name", "title") // ids 1..3
    Sinks.upsertParquet(spark, dir,
      Seq((2L, "b", 2.0, "z")).toDF("k", "title", "v", "z"),
      Seq("k"), evolveSchema = true) // z gets id 4
    Sinks.dropDeltaColumn(spark, dir, "z") // id 4 retired, not freed
    // a second rename must NOT shrink maxColumnId back to the max
    // surviving field id (the spec forbids id reuse — round-12 review)
    Sinks.renameDeltaColumn(spark, dir, "v", "score")
    val snap = ExternalDeltaReader.snapshot(spark, dir)
    assert(snap.config.get("delta.columnMapping.maxColumnId")
      .contains("4"), snap.config)
    // the NEXT evolved column gets a fresh id, never dropped z's 4
    Sinks.upsertParquet(spark, dir,
      Seq((3L, "c", 3.0, "w")).toDF("k", "title", "score", "w"),
      Seq("k"), evolveSchema = true)
    val wField = ExternalDeltaReader.snapshot(spark, dir)
      .schema.fields.find(_.name == "w").get
    assert(wField.metadata.getLong("delta.columnMapping.id") == 5L)
    // RESTORE to the pre-rename version reverts the SCHEMA but carries
    // column mapping forward (round-12 ADVICE, medium): re-logging the
    // pre-mapping metaData verbatim would unset mode and drop
    // maxColumnId, so a later rename would re-mint ids from 0 and a
    // later evolution could REUSE dropped z's retired id 4 — the spec
    // forbids id reuse across table history, and upstream delta refuses
    // RESTOREs that unset name-mode mapping
    Sinks.restoreDeltaTable(spark, dir, preRename)
    val snapR = ExternalDeltaReader.snapshot(spark, dir)
    assert(snapR.config.get("delta.columnMapping.mode").contains("name"),
      s"mode must survive RESTORE: ${snapR.config}")
    assert(snapR.config.get("delta.columnMapping.maxColumnId")
      .contains("5"), s"maxColumnId must stay monotone: ${snapR.config}")
    // restored fields are FULLY stamped (a partially-mapped schema is
    // rejected by conformant readers) with ids STABLE across the
    // boundary: matched by physical name to the pre-restore schema
    assert(snapR.schema.fieldNames.toSeq == Seq("k", "name", "v"))
    def idOf(n: String): Long = snapR.schema.fields.find(_.name == n).get
      .metadata.getLong("delta.columnMapping.id")
    assert(idOf("k") == 1L && idOf("name") == 2L && idOf("v") == 3L,
      snapR.schema.json)
    snapR.schema.fields.foreach(f => assert(
      f.metadata.contains("delta.columnMapping.physicalName"), f.name))
    // the external reader materializes the restored rows through the
    // carried mapping
    assert(ExternalDeltaReader.readRows(spark, dir)._2
      .map(m => (m("k"), m("name"))).toSet == Set((1L, "a")))
    // a rename AFTER the restore mints id 6, never retired z's 4
    Sinks.upsertParquet(spark, dir,
      Seq((2L, "b", 2.0, "q2")).toDF("k", "name", "v", "q"),
      Seq("k"), evolveSchema = true)
    val qField = ExternalDeltaReader.snapshot(spark, dir)
      .schema.fields.find(_.name == "q").get
    assert(qField.metadata.getLong("delta.columnMapping.id") == 6L,
      "a retired id must never be reused after RESTORE")
    val cpV = Sinks.checkpointDeltaLog(spark, dir)
    Sinks.cleanDeltaLog(dir)
    val proto = spark.read.parquet(java.nio.file.Paths.get(dir,
        "_delta_log", f"$cpV%020d.checkpoint.parquet").toString)
      .where(col("protocol").isNotNull)
      .select("protocol.minReaderVersion", "protocol.minWriterVersion")
      .collect()(0)
    assert(proto.getInt(0) == 2 && proto.getInt(1) == 5,
      s"protocol downgraded through checkpoint: $proto")
    assert(ExternalDeltaReader.snapshot(spark, dir).minReader == 2)
  }

  test("re-cased dropped names and reserved __ columns are refused at entry") {
    val dir = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "a", 1.0)).toDF("k", "name", "v"), Seq("k"))
    Sinks.dropDeltaColumn(spark, dir, "name")
    // a re-CASED re-add resolves onto the buried physical values under
    // Spark's case-insensitive resolution — refuse like exact case
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, dir,
        Seq((2L, "x", 2.0)).toDF("k", "NAME", "v"),
        Seq("k"), evolveSchema = true)
    }
    assert(e.getMessage.contains("re-add"), e.getMessage)
    // the engine-internal __ namespace is refused at every sink entry
    // (the partitioned rider __p would silently replace such a column)
    val e2 = intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, dir,
        Seq((2L, 2.0, "boom")).toDF("k", "v", "__p"),
        Seq("k"), evolveSchema = true)
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Sinks.upsertParquetPartitioned(spark, dir + "2",
        Seq((1L, "2024-01-01", "x")).toDF("k", "ds", "__fp"),
        Seq("k"), "ds")
    }
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
  }

  test("partition column cannot be renamed or dropped; legacy tables warn") {
    val dir = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    // the committer records its partition column in the configuration
    // (the log's add actions never declare partition columns) — the
    // metadata-only ops key their refusal on it
    val snap = ExternalDeltaReader.snapshot(spark, dir)
    assert(snap.config.get("graft.partitionColumn").contains("ds"))
    val e = intercept[IllegalArgumentException] {
      Sinks.renameDeltaColumn(spark, dir, "ds", "day")
    }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Sinks.dropDeltaColumn(spark, dir, "ds")
    }
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
    // re-cased spelling refuses too (Spark resolution is case-insensitive)
    intercept[IllegalArgumentException] {
      Sinks.renameDeltaColumn(spark, dir, "DS", "day")
    }
    // non-partition columns stay renameable
    Sinks.renameDeltaColumn(spark, dir, "v", "amt")
    assert(Sinks.readUpsertPartitionedTable(spark, dir).columns.toSeq ==
      Seq("k", "ds", "amt"))
  }

  test("nested-typed schemas refuse column mapping (top-level-only stamping)") {
    val dir = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, ("a", 2L), 1.0)).toDF("k", "pair", "v"), Seq("k"))
    // mode=name over a struct-typed schema would publish partially
    // mapped metadata (nested fields carry no physicalName/id) that
    // conformant readers reject — refused up front
    val e = intercept[IllegalArgumentException] {
      Sinks.renameDeltaColumn(spark, dir, "v", "score")
    }
    assert(e.getMessage.contains("nested"), e.getMessage)
    // and an ALREADY-mapped (flat) table refuses evolving a nested
    // column onto itself for the same reason
    val dir2 = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquet(spark, dir2,
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    Sinks.renameDeltaColumn(spark, dir2, "v", "score")
    val e2 = intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, dir2,
        Seq((2L, 2.0, ("x", 1L))).toDF("k", "score", "pair"),
        Seq("k"), evolveSchema = true)
    }
    assert(e2.getMessage.contains("nested"), e2.getMessage)
    // and RESTORE refuses carrying mode=name onto a nested-typed
    // restored schema — the third gate (round-13 review find): drop the
    // struct, rename (mapping on), then restore to the pre-drop version
    val dir3 = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquet(spark, dir3,
      Seq((1L, ("a", 2L), 1.0)).toDF("k", "pair", "v"), Seq("k"))
    val preDrop = Sinks.deltaLogVersions(dir3).max
    Sinks.dropDeltaColumn(spark, dir3, "pair")
    Sinks.renameDeltaColumn(spark, dir3, "v", "score")
    val e3 = intercept[IllegalArgumentException] {
      Sinks.restoreDeltaTable(spark, dir3, preDrop)
    }
    assert(e3.getMessage.contains("nested"), e3.getMessage)
  }

  test("ALTER TABLE RENAME COLUMN lowers through GraftSql") {
    val dir = Files.createTempDirectory("cmap").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      Seq((1L, 1.0)).toDF("k", "v"), Seq("k"))
    val out = graft.plans.GraftSql.sql(spark,
      s"ALTER TABLE '$dir' RENAME COLUMN v TO score")
    assert(out.columns.contains("to_column"))
    assert(Sinks.readDeltaTableAt(spark, dir).columns.toSeq ==
      Seq("k", "score"))
  }
}
