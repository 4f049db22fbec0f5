package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.functions._

/** An INDEPENDENT Delta-protocol reader (round-11 directive 2): parses
  * `_last_checkpoint`, the checkpoint parquet, and the JSON commit tail
  * strictly from the published protocol shapes (delta-io/delta
  * PROTOCOL.md) and the formats documented in the log itself — ZERO
  * imports from `graft.sources`. Until now the log subsystem was
  * verified only by its own read path plus hand-written cases; this
  * reader is the external consumer the checkpoint's version-pinned txn
  * rows were built for. If the emitted log shape drifts from the
  * protocol, this spec goes red.
  *
  * Deliberately re-implemented from the public specs (not shared with
  * the engine): Z85 (RFC 1924 alphabet), the GDV1 inline-DV envelope
  * (magic + one length-prefixed bitmap per 2^32 index range, as
  * documented in the descriptor), and the portable 32-bit roaring
  * format (cookie 12346, array containers <= 4096 values, 8 KiB bitmap
  * containers — RoaringFormatSpec).
  */
object ExternalDeltaReader {

  final case class Add(path: String, dvInline: Option[String],
                       dvSize: Int, dvCardinality: Long)
  final case class Snapshot(schema: StructType,
                            config: Map[String, String],
                            adds: Map[String, Add],
                            txns: Map[String, Long],
                            minReader: Int, minWriter: Int)

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  // ---- Z85 decode, from RFC 1924's alphabet ----
  private val alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private def z85(s: String, rawLen: Int): Array[Byte] = {
    val idx = alphabet.zipWithIndex.toMap
    val out = s.grouped(5).flatMap { grp =>
      val v = grp.foldLeft(0L)((acc, c) => acc * 85 + idx(c))
      (3 to 0 by -1).map(sh => ((v >> (8 * sh)) & 0xFF).toByte)
    }.toArray
    out.take(rawLen)
  }

  // ---- portable 32-bit roaring (RoaringFormatSpec, no-run cookie) ----
  private def roaring32(buf: java.nio.ByteBuffer): Seq[Long] = {
    val cookie = buf.getInt
    require(cookie == 12346, s"roaring cookie $cookie not supported")
    val nContainers = buf.getInt
    val meta = (0 until nContainers).map { _ =>
      val key = buf.getShort & 0xFFFF
      val card = (buf.getShort & 0xFFFF) + 1
      (key, card)
    }
    (0 until nContainers).foreach(_ => buf.getInt) // offset table
    meta.flatMap { case (key, card) =>
      val hi = key.toLong << 16
      if (card <= 4096)
        (0 until card).map(_ => hi | (buf.getShort & 0xFFFF).toLong)
      else
        (0 until 1024).flatMap { w =>
          val word = buf.getLong
          (0 until 64).filter(b => (word & (1L << b)) != 0L)
            .map(b => hi | (w * 64 + b).toLong)
        }
    }
  }

  /** Deleted row indexes of an inline deletion-vector descriptor. */
  def deletedIndexes(inline: String, sizeInBytes: Int): Set[Long] = {
    val bytes = z85(inline, sizeInBytes)
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt == 0x47445631, "GDV1 magic missing")
    val nParts = buf.getInt
    (0 until nParts).flatMap { _ =>
      val hi = buf.getInt.toLong << 32
      val len = buf.getInt
      val slice = buf.slice().order(java.nio.ByteOrder.LITTLE_ENDIAN)
      slice.limit(len)
      buf.position(buf.position() + len)
      roaring32(slice).map(lo => hi | lo)
    }.toSet
  }

  /** Reconstruct the snapshot at `version` (latest when negative):
    * checkpoint parquet first (when one at or below the target is
    * pointed at), then ascending JSON replay of the tail — the
    * protocol's state-reconstruction rule.
    */
  def snapshot(spark: SparkSession, tablePath: String,
               version: Long = -1L): Snapshot = {
    val logDir = Paths.get(tablePath, "_delta_log")
    require(Files.isDirectory(logDir), s"no _delta_log under $tablePath")
    val versions = {
      val ls = Files.list(logDir)
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.map(_.getFileName.toString)
          .filter(_.endsWith(".json"))
          .flatMap(n =>
            scala.util.Try(n.stripSuffix(".json").toLong).toOption)
          .toSeq.sorted
      } finally ls.close()
    }
    // a checkpoint-only log (every JSON at or below the checkpoint
    // pruned, nothing after) is legal: _last_checkpoint names the
    // snapshot version — the latest must consider both sources
    val lc = logDir.resolve("_last_checkpoint")
    val lcVersion: Option[Long] =
      if (!Files.exists(lc)) None
      else Some(om.readTree(Files.readString(lc)).get("version").asLong())
        .filter(v =>
          Files.exists(logDir.resolve(f"$v%020d.checkpoint.parquet")))
    val target =
      if (version >= 0) version
      else (versions ++ lcVersion).maxOption.getOrElse(
        throw new IllegalStateException(
          s"no commits and no checkpoint under $tablePath"))
    var schema: Option[StructType] = None
    var config = Map.empty[String, String]
    var minReader = 1
    var minWriter = 2
    val adds = scala.collection.mutable.LinkedHashMap.empty[String, Add]
    val txns = scala.collection.mutable.Map.empty[String, Long]

    val cpVersion: Option[Long] = lcVersion.filter(_ <= target)
    cpVersion.foreach { v =>
      val cp = spark.read.parquet(
        logDir.resolve(f"$v%020d.checkpoint.parquet").toString)
      // collect-bound: test-scope conformance reader over small tables
      cp.collect().foreach { r =>
        def struct(name: String): Option[Row] = {
          val i = r.fieldIndex(name)
          if (r.isNullAt(i)) None else Some(r.getStruct(i))
        }
        struct("protocol").foreach { p =>
          minReader = p.getAs[Int]("minReaderVersion")
          minWriter = p.getAs[Int]("minWriterVersion")
        }
        struct("metaData").foreach { m =>
          schema = Some(DataType.fromJson(
            m.getAs[String]("schemaString")).asInstanceOf[StructType])
          config = m.getAs[Map[String, String]]("configuration")
        }
        struct("add").foreach { a =>
          val dv = {
            val di = a.fieldIndex("deletionVector")
            if (a.isNullAt(di)) None else Some(a.getStruct(di))
          }
          adds(a.getAs[String]("path")) = Add(a.getAs[String]("path"),
            dv.map(_.getAs[String]("pathOrInlineDv")),
            dv.map(_.getAs[Int]("sizeInBytes")).getOrElse(0),
            dv.map(_.getAs[Long]("cardinality")).getOrElse(0L))
        }
        struct("txn").foreach { t =>
          txns(t.getAs[String]("appId")) = t.getAs[Long]("version")
        }
      }
    }
    versions.filter(v => v > cpVersion.getOrElse(-1L) && v <= target)
      .foreach { v =>
        Files.readString(logDir.resolve(f"$v%020d.json")).linesIterator
          .filter(_.nonEmpty).map(om.readTree).foreach { n =>
            if (n.has("protocol")) {
              minReader = n.get("protocol").get("minReaderVersion").asInt()
              minWriter = n.get("protocol").get("minWriterVersion").asInt()
            }
            if (n.has("metaData")) {
              val m = n.get("metaData")
              schema = Some(DataType.fromJson(
                m.get("schemaString").asText()).asInstanceOf[StructType])
              val cb = Map.newBuilder[String, String]
              m.get("configuration").fields().forEachRemaining(e =>
                cb += e.getKey -> e.getValue.asText())
              config = cb.result()
            }
            if (n.has("remove"))
              adds.remove(n.get("remove").get("path").asText())
            if (n.has("add")) {
              val a = n.get("add")
              val dv = Option(a.get("deletionVector"))
              adds(a.get("path").asText()) = Add(a.get("path").asText(),
                dv.map(_.get("pathOrInlineDv").asText()),
                dv.map(_.get("sizeInBytes").asInt()).getOrElse(0),
                dv.map(_.get("cardinality").asLong()).getOrElse(0L))
            }
            if (n.has("txn")) {
              val t = n.get("txn")
              val prev = txns.get(t.get("appId").asText())
              val ver = t.get("version").asLong()
              txns(t.get("appId").asText()) =
                prev.fold(ver)(math.max(_, ver))
            }
          }
      }
    Snapshot(schema.getOrElse(
      throw new IllegalStateException("no metaData in log")),
      config, adds.toMap, txns.toMap, minReader, minWriter)
  }

  /** Materialize the snapshot's rows: every live file read under the
    * LOGGED schema — scanned by each field's PHYSICAL name (the
    * protocol's `delta.columnMapping.physicalName` field metadata,
    * identity when absent) and exposed by the logical one — with
    * deletion-vector row indexes (position within the file) subtracted.
    * Test-scope: single small files read in one partition preserve file
    * order, which defines the row index.
    */
  def readRows(spark: SparkSession, tablePath: String,
               version: Long = -1L): (StructType, Seq[Map[String, Any]]) = {
    val snap = snapshot(spark, tablePath, version)
    // a real reader refuses protocols above its understanding instead
    // of silently misreading (column mapping rides minReaderVersion 2)
    require(snap.minReader <= 2,
      s"unsupported Delta protocol: minReaderVersion ${snap.minReader}")
    val cols = snap.schema.fieldNames.toSeq
    val physKey = "delta.columnMapping.physicalName"
    // physicalName metadata is honored ONLY under the declared mapping
    // mode, exactly like off-the-shelf readers — a log that stamped
    // metadata without declaring mode=name would be misread by them,
    // and this conformance reader must fail the same way
    val mapped = snap.config.get("delta.columnMapping.mode")
      .contains("name")
    val physSchema = StructType(snap.schema.fields.map(f =>
      if (mapped && f.metadata.contains(physKey))
        f.copy(name = f.metadata.getString(physKey))
      else f))
    val rows = snap.adds.values.toSeq.flatMap { add =>
      val file = Paths.get(tablePath, add.path).toString
      // collect-bound: conformance reader, per-file test-scale reads
      val raw = spark.read.schema(physSchema).parquet(file).collect()
      val deleted = add.dvInline
        .map(s => deletedIndexes(s, add.dvSize)).getOrElse(Set.empty)
      raw.zipWithIndex.collect {
        case (r, i) if !deleted.contains(i.toLong) =>
          cols.zipWithIndex.map { case (c, j) =>
            c -> (if (r.isNullAt(j)) null else r.get(j)) }.toMap
      }
    }
    (snap.schema, rows)
  }
}

/** Conformance: the external reader and graft's own read path must see
  * the SAME table across DV, RESTORE, schema-evolution, dropped-column,
  * checkpoint/pruning, and txn histories.
  */
class ExternalDeltaReaderSpec extends SparkSpec {
  import spark.implicits._
  import graft.sources.{Sinks, DeletionVectors}

  private def graftRows(dir: String, version: Long = Long.MaxValue)
      : Set[Map[String, Any]] = {
    val df = Sinks.readDeltaTableAt(spark, dir, version)
    df.collect().map(r => df.columns.zipWithIndex.map { case (c, i) =>
      c -> (if (r.isNullAt(i)) null else r.get(i)) }.toMap).toSet
  }
  private def externalRows(dir: String, version: Long = -1L)
      : Set[Map[String, Any]] =
    ExternalDeltaReader.readRows(spark, dir, version)._2.toSet

  test("DV + RESTORE + evolution + drop-column history reads identically") {
    val dir = Files.createTempDirectory("extr").toString + "/t"
    Sinks.upsertParquet(spark, dir,
      (1L to 8L).map(k => (k, s"a$k", k * 1.0)).toDF("k", "name", "v"),
      Seq("k"))
    DeletionVectors.deleteDeltaWhere(spark, dir, col("k") % 3 === 0L)
    assert(externalRows(dir) == graftRows(dir), "post-DELETE snapshot")
    assert(externalRows(dir).map(_("k").asInstanceOf[Long]) ==
      Set(1L, 2L, 4L, 5L, 7L, 8L))
    // schema evolution
    Sinks.upsertParquet(spark, dir,
      Seq((2L, "b2", 9.0, "late")).toDF("k", "name", "v", "w"),
      Seq("k"), evolveSchema = true)
    assert(externalRows(dir) == graftRows(dir), "post-evolution snapshot")
    val preRestore = Sinks.deltaLogVersions(dir).max
    // RESTORE back to the post-DELETE version
    Sinks.restoreDeltaTable(spark, dir, 1L)
    assert(externalRows(dir) == graftRows(dir), "post-RESTORE snapshot")
    assert(!externalRows(dir).head.contains("w"),
      "restore must revert the logged schema")
    // version-pinned read of the evolved state still works
    assert(externalRows(dir, preRestore) == graftRows(dir, preRestore),
      "pinned pre-RESTORE snapshot")
    // dropped column disappears for BOTH readers (metadata-only drop)
    Sinks.upsertParquet(spark, dir,
      Seq((9L, "i9", 9.5)).toDF("k", "name", "v"), Seq("k"))
    Sinks.dropDeltaColumn(spark, dir, "name")
    assert(externalRows(dir) == graftRows(dir), "post-DROP snapshot")
    assert(!externalRows(dir).head.contains("name"))
  }

  test("checkpoint + pruned tail reconstructs from the parquet, txns pinned") {
    val dir = Files.createTempDirectory("extr").toString + "/t"
    Sinks.upsertParquet(spark, dir, Seq((1L, 1.0)).toDF("k", "v"),
      Seq("k"), txn = Some(("writer-a", 3L)))
    Sinks.upsertParquet(spark, dir, Seq((2L, 2.0)).toDF("k", "v"),
      Seq("k"), txn = Some(("writer-b", 1L)))
    DeletionVectors.deleteDeltaWhere(spark, dir, col("k") === 1L)
    Sinks.checkpointDeltaLog(spark, dir)
    assert(Sinks.cleanDeltaLog(dir) > 0, "fixture must prune the tail")
    Sinks.upsertParquet(spark, dir, Seq((3L, 3.0)).toDF("k", "v"),
      Seq("k"), txn = Some(("writer-a", 4L)))
    // state reconstructs from checkpoint parquet + retained tail
    assert(externalRows(dir) == graftRows(dir))
    assert(externalRows(dir).map(_("k").asInstanceOf[Long]) ==
      Set(2L, 3L))
    // the idempotent-writer state is readable by the external consumer
    val snap = ExternalDeltaReader.snapshot(spark, dir)
    assert(snap.txns == Map("writer-a" -> 4L, "writer-b" -> 1L),
      s"txn state: ${snap.txns}")
    // and version-pinned at the checkpoint: txns as of THAT version
    val cpV = Sinks.deltaLogVersions(dir)
      .filter(v => Files.exists(Paths.get(dir, "_delta_log",
        f"$v%020d.checkpoint.parquet"))).max
    val pinned = ExternalDeltaReader.snapshot(spark, dir, cpV)
    assert(pinned.txns == Map("writer-a" -> 3L, "writer-b" -> 1L),
      s"pinned txn state leaked future commits: ${pinned.txns}")
  }

  test("partitioned table + partition-wide DELETE reads identically") {
    val dir = Files.createTempDirectory("extr").toString + "/t"
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
        (3L, "2024-01-02", 3.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    DeletionVectors.deleteDeltaWhere(spark, dir, col("ds") === "2024-01-01")
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((4L, "2024-01-03", 4.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
    assert(externalRows(dir) == graftRows(dir))
    assert(externalRows(dir).map(_("k").asInstanceOf[Long]) ==
      Set(3L, 4L))
  }
}
