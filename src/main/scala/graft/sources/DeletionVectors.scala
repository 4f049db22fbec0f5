package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion vectors for the generational Delta-logged tables: MERGE-ON-READ
  * row deletes. A `DELETE WHERE` on a petabyte table must not rewrite every
  * file that contains one matching row — it marks the deleted ROW INDEXES
  * in a per-file bitmap and republishes the same physical file with the
  * bitmap attached; readers subtract the marked rows, and a later purge
  * (OPTIMIZE-style) rewrites only the files that actually carry vectors.
  *
  * Log shape follows the Delta protocol's deletion-vector descriptor: the
  * delete commit `remove`s the file's previous `add` and re-`add`s the same
  * path carrying `deletionVector: {storageType: "i", pathOrInlineDv,
  * sizeInBytes, cardinality}` with the payload INLINE, Z85-encoded
  * (RFC-1924 alphabet), and `stats.numRecords` still the PHYSICAL row
  * count (logical count = numRecords - cardinality, which
  * [[Sinks.deltaTableCount]] applies). The payload envelope is
  * graft-native and documented here — magic "GDV1", then one length-
  * prefixed STANDARD portable 32-bit RoaringBitmap per 2^32 range of row
  * indexes — because the sandbox carries no external conformance target
  * for Delta's RoaringBitmapArray bytes; the container encoding itself
  * (array <= 4096 values, bitmap above, cookie 12346) is the published
  * roaring portable format.
  *
  * Scale notes (100 TB lens):
  * - the predicate scan reads only LIVE files; matched row indexes are
  *   grouped per file, unioned with the file's prior vector, and
  *   roaring-serialized IN THE EXECUTORS — the driver receives one
  *   (path, bytes, cardinality) row per touched file, never a row-index
  *   list, so a broad DELETE's driver footprint tracks the table's FILE
  *   count, not its matched-ROW count.
  * - files whose vector reaches the physical row count are dropped
  *   outright (full-file delete needs no vector, no read amplification).
  * - readers split the scan: files with no vector stream through
  *   untouched (zero overhead for the common case); files with vectors
  *   anti-join their row indexes against the exploded deleted set —
  *   merge-on-read's honest cost, proportional to the UNPURGED delete
  *   volume, reclaimed by [[purgeDeletionVectors]].
  */
object DeletionVectors {

  // ------------------------------------------------------------------
  // Z85 (RFC-1924 alphabet; 4 bytes -> 5 chars, big-endian base 85)
  // ------------------------------------------------------------------
  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Inv: Array[Int] = {
    val inv = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => inv(c.toInt) = i }
    inv
  }

  /** Z85 over zero-padded input; callers carry the true byte length. */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ Array.fill[Byte](4 - bytes.length % 4)(0)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xFFL); j += 1 }
      var k = 4
      val chunk = new Array[Char](5)
      while (k >= 0) { chunk(k) = Z85((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  /** Inverse of [[z85Encode]]; `rawLen` trims the zero padding. */
  def z85Decode(s: String, rawLen: Int): Array[Byte] = {
    require(s.length % 5 == 0, "z85 input must be a multiple of 5 chars")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val d = Z85Inv(s.charAt(i + j).toInt)
        require(d >= 0, s"invalid z85 char '${s.charAt(i + j)}'")
        v = v * 85 + d; j += 1
      }
      var k = 3
      val base = i / 5 * 4
      while (k >= 0) { out(base + k) = (v & 0xFF).toByte; v >>= 8; k -= 1 }
      i += 5
    }
    out.take(rawLen)
  }

  // ------------------------------------------------------------------
  // Portable 32-bit roaring bitmap (cookie 12346, array/bitmap
  // containers, no run containers) inside the GDV1 multi-bitmap envelope
  // ------------------------------------------------------------------
  private val GdvMagic = 0x47445631 // "GDV1"
  private val NoRunCookie = 12346

  private def putU16(b: java.nio.ByteBuffer, v: Int): Unit =
    b.putShort((v & 0xFFFF).toShort)

  private def roaring32Serialize(values: Array[Int]): Array[Byte] = {
    // values sorted distinct, interpreted unsigned
    val byKey = values.groupBy(v => (v >>> 16) & 0xFFFF).toSeq.sortBy(_._1)
    val n = byKey.size
    val containersBytes = byKey.map { case (_, vs) =>
      if (vs.length <= 4096) vs.length * 2 else 8192
    }
    val total = 8 + 8 * n + containersBytes.sum
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(NoRunCookie)
    buf.putInt(n)
    byKey.foreach { case (k, vs) =>
      putU16(buf, k); putU16(buf, vs.length - 1)
    }
    var off = 8 + 8 * n
    containersBytes.foreach { cb => buf.putInt(off); off += cb }
    byKey.foreach { case (_, vs) =>
      if (vs.length <= 4096) vs.foreach(v => putU16(buf, v & 0xFFFF))
      else {
        val words = new Array[Long](1024)
        vs.foreach { v =>
          val lo = v & 0xFFFF
          words(lo >>> 6) |= (1L << (lo & 63))
        }
        words.foreach(buf.putLong)
      }
    }
    buf.array()
  }

  private def roaring32Deserialize(bytes: Array[Byte], pos0: Int,
                                   len: Int): Array[Int] = {
    val buf = java.nio.ByteBuffer.wrap(bytes, pos0, len)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val cookie = buf.getInt
    require(cookie == NoRunCookie, s"unsupported roaring cookie $cookie")
    val n = buf.getInt
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    (0 until n).foreach { i =>
      keys(i) = buf.getShort & 0xFFFF
      cards(i) = (buf.getShort & 0xFFFF) + 1
    }
    (0 until n).foreach(_ => buf.getInt) // offsets (sequential read)
    val out = Array.newBuilder[Int]
    (0 until n).foreach { i =>
      val hi = keys(i) << 16
      if (cards(i) <= 4096)
        (0 until cards(i)).foreach(_ => out += (hi | (buf.getShort & 0xFFFF)))
      else {
        var w = 0
        while (w < 1024) {
          var bits = buf.getLong
          while (bits != 0L) {
            val b = java.lang.Long.numberOfTrailingZeros(bits)
            out += (hi | (w * 64 + b))
            bits &= bits - 1
          }
          w += 1
        }
      }
    }
    out.result()
  }

  /** Serialize sorted-distinct non-negative row indexes to GDV1 bytes. */
  def serializeIndexes(sorted: Array[Long]): Array[Byte] = {
    require(sorted.forall(_ >= 0), "row indexes must be non-negative")
    val groups = sorted.groupBy(i => (i >>> 32).toInt).toSeq.sortBy(_._1)
    val parts = groups.map { case (hi, vs) =>
      (hi, roaring32Serialize(vs.map(v => (v & 0xFFFFFFFFL).toInt)))
    }
    val total = 8 + parts.map(p => 8 + p._2.length).sum
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(GdvMagic)
    buf.putInt(parts.size)
    parts.foreach { case (hi, b) =>
      buf.putInt(hi); buf.putInt(b.length); buf.put(b)
    }
    buf.array()
  }

  /** Inverse of [[serializeIndexes]]. */
  def deserializeIndexes(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt == GdvMagic, "not a GDV1 deletion vector")
    val nParts = buf.getInt
    val out = Array.newBuilder[Long]
    var pos = 8
    (0 until nParts).foreach { _ =>
      val hi = buf.getInt(pos).toLong << 32
      val len = buf.getInt(pos + 4)
      roaring32Deserialize(bytes, pos + 8, len)
        .foreach(v => out += (hi | (v & 0xFFFFFFFFL)))
      pos += 8 + len
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // Descriptor <-> bitmap
  // ------------------------------------------------------------------
  private[sources] def dvIndexes(
      node: com.fasterxml.jackson.databind.JsonNode): Array[Long] = {
    require(node.get("storageType").asText() == "i",
      "only inline (storageType=i) deletion vectors are produced/read")
    deserializeIndexes(z85Decode(node.get("pathOrInlineDv").asText(),
      node.get("sizeInBytes").asInt()))
  }

  private def dvDescriptor(mapper: com.fasterxml.jackson.databind.ObjectMapper,
                           bytes: Array[Byte], cardinality: Long)
      : com.fasterxml.jackson.databind.node.ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("storageType", "i")
    n.put("pathOrInlineDv", z85Encode(bytes))
    n.put("sizeInBytes", bytes.length)
    n.put("cardinality", cardinality)
    n
  }

  /** Physical numRecords from an add node's stats, if logged. */
  private def statsNumRecords(
      mapper: com.fasterxml.jackson.databind.ObjectMapper,
      add: com.fasterxml.jackson.databind.JsonNode): Option[Long] =
    if (!add.has("stats")) None
    else {
      val n = mapper.readTree(add.get("stats").asText()).get("numRecords")
      if (n == null || n.isNull) None else Some(n.asLong())
    }

  // ------------------------------------------------------------------
  // DELETE WHERE
  // ------------------------------------------------------------------
  /** Result of a merge-on-read delete: rows newly marked deleted, files
    * that carry (new or grown) vectors, files dropped outright because
    * every physical row is now deleted.
    */
  case class DvDelete(rowsDeleted: Long, filesWithDv: Int, filesDropped: Int)

  /** One touched file's finished deletion vector, as shipped to the
    * driver: the GDV1 roaring BYTES (already unioned with the file's
    * previous vector), never the raw row-index list — driver memory is
    * bounded by touched-FILE count × bitmap size, not by matched-ROW
    * count (a broad DELETE on a 10k-file table matches ~10^10 rows; as
    * raw longs in collected Rows that is a silent driver OOM, as roaring
    * bitmaps it is ~the table's add-entry volume).
    */
  private[graft] case class FileDv(absPath: String, dvBytes: Array[Byte],
                                     cardinality: Long, prevCardinality: Long)

  /** The predicate scan + per-file vector build for [[deleteDeltaWhere]]:
    * matched row indexes are grouped per physical file IN THE EXECUTORS,
    * unioned there with the file's existing vector (broadcast — bounded
    * by the table's unpurged delete volume, the same bytes every MOR
    * reader already ships), and serialized there; the driver receives
    * one (path, bytes, cardinality, prevCardinality) row per touched
    * file. Package-private so DeletionVectorsSpec can pin the bound.
    */
  private[graft] def collectFileDvs(spark: SparkSession,
      root: java.nio.file.Path,
      state: scala.collection.Map[String,
        com.fasterxml.jackson.databind.JsonNode],
      schema: Option[org.apache.spark.sql.types.StructType],
      predicate: Column): Array[FileDv] = {
    import spark.implicits._
    val absPaths = state.keys.map(p => root.resolve(p).toString).toSeq
    val existingDv: Map[String, Array[Byte]] = state.toSeq.flatMap {
      case (rel, add) =>
        if (!add.has("deletionVector")) None
        else {
          val n = add.get("deletionVector")
          require(n.get("storageType").asText() == "i",
            "only inline (storageType=i) deletion vectors are produced/read")
          Some(root.resolve(rel).toAbsolutePath.toString ->
            z85Decode(n.get("pathOrInlineDv").asText(),
              n.get("sizeInBytes").asInt()))
        }
    }.toMap
    val exB = spark.sparkContext.broadcast(existingDv)
    // logged-schema read: a predicate over a late-added column must see
    // nulls on pre-evolution files, not depend on footer sampling. The
    // scan is physical, the predicate is written against LOGICAL names;
    // the _metadata pseudo-columns are captured BEFORE the logical
    // rename (a projection can strip their resolvability)
    val scan0 = schema.map(s =>
      spark.read.schema(Sinks.physicalSchema(s))).getOrElse(spark.read)
      .parquet(absPaths: _*)
      .withColumn("__fp", normalizedFilePath)
      .withColumn("__ri", col("_metadata.row_index"))
    val out = schema.filter(s => Sinks.columnMapping(Some(s)).nonEmpty)
      .map(s => scan0.toDF(s.fieldNames.toIndexedSeq :+ "__fp" :+ "__ri": _*))
      .getOrElse(scan0)
      .filter(predicate)
      .select(col("__fp").as("fp"), col("__ri").as("ri"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (fp, it) =>
        // executor-side: one file's matched indexes (bounded by that
        // file's physical row count — the same bound a rewrite shuffles)
        val newIdx = it.map(_._2).toArray
        val existing = exB.value.get(fp).map(deserializeIndexes)
          .getOrElse(Array.empty[Long])
        val union = (existing ++ newIdx).distinct.sorted
        FileDv(fp, serializeIndexes(union), union.length.toLong,
          existing.length.toLong)
      }
      // collect-bound: one row per TOUCHED FILE (roaring bytes, not row
      // indexes) — see FileDv's scale contract
      .collect()
    exB.unpersist(false)
    out
  }

  /** [[collectFileDvs]] against a table's current logged state — the
    * spec-facing entry that pins the driver-side bound without widening
    * Sinks' state internals.
    */
  private[graft] def collectFileDvsAt(spark: SparkSession,
      tablePath: String, predicate: Column): Array[FileDv] = {
    val (state, meta) =
      Sinks.deltaStateWithMeta(spark, tablePath, Long.MaxValue)
    collectFileDvs(spark, java.nio.file.Paths.get(tablePath), state,
      Sinks.metaSchema(meta), predicate)
  }

  /** `_metadata.file_path` (a `file:` URI, percent-encoded) normalized
    * to the plain absolute filesystem path `Paths.toAbsolutePath`
    * produces — one key space for the DV bookkeeping joins. The decode
    * matters: a table path containing a space (or any URI-special char)
    * renders as %XX in the metadata column, and an undecoded join would
    * silently subtract NOTHING, resurrecting every deleted row.
    *
    * The decode must be PURE percent-decoding: `url_decode` speaks
    * x-www-form-urlencoded, where a literal '+' means space — but a
    * filesystem '+' stays '+' in the file URI, so a table path
    * containing '+' would decode to a space, miss the filesystem-side
    * key, and silently resurrect the file's deleted rows. Escaping
    * every literal '+' to %2B first makes url_decode percent-decode
    * only (and keeps the whole expression codegen'd — no UDF).
    */
  private def normalizedFilePath: Column =
    url_decode(regexp_replace(
      regexp_replace(col("_metadata.file_path"),
        "^[A-Za-z][A-Za-z0-9+.-]*:/+", "/"),
      "\\+", "%2B"))

  /** MERGE-ON-READ `DELETE WHERE predicate`: no data file is rewritten.
    * Matching is computed per physical file via `_metadata.row_index`
    * (the scan is the only data-touching step); existing vectors union
    * with the new marks, so repeated deletes compose. Commits
    * remove+re-add per touched file with the protocol's DV descriptor;
    * operation=DELETE with the predicate in operationParameters.
    */

  def deleteDeltaWhere(spark: SparkSession, tablePath: String,
                       predicate: Column): DvDelete = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val mapper = Sinks.jsonMapper
    // the version the matched row-indexes were computed against: the
    // commit below is only valid against THIS state — a merge landing in
    // between rewrites files and the indexes would mark wrong rows
    val vAtRead = Sinks.logTailVersion(tablePath)
    val (state, meta) =
      Sinks.deltaStateWithMeta(spark, tablePath, Long.MaxValue)
    require(state.nonEmpty, s"no live files under $tablePath")
    require(meta.nonEmpty, s"no metaData action under $tablePath")
    val root = Paths.get(tablePath)
    // DV bookkeeping keys on the NORMALIZED ABSOLUTE PATH, not the
    // basename: one partitioned batch write reuses task file names
    // across its partition dirs (part-00000-<same-uuid> under every
    // p=…), so basenames legitimately collide on partitioned tables
    val relByAbs = state.keys.map(p =>
      root.resolve(p).toAbsolutePath.toString -> p).toMap
    // matched rows never reach the driver: the vectors are unioned and
    // roaring-serialized in the executors, one FileDv per touched file.
    // A base file vacuumed mid-scan by a concurrent committer is the
    // uniform lost-race refusal — the caller re-runs on fresh state
    val fileDvs =
      try collectFileDvs(spark, root, state,
        Sinks.metaSchema(meta), predicate)
      catch {
        case e: Exception if Sinks.isVanishedFileError(e, root) =>
          throw new java.util.ConcurrentModificationException(
            s"deleteDeltaWhere($tablePath): a scanned file was vacuumed " +
              "by a concurrent committer mid-scan; retry against fresh " +
              "state")
      }
    if (fileDvs.isEmpty) return DvDelete(0L, 0, 0)
    // crash-window refusal (round-11 review find): a DELETE touching a
    // partition whose pointer is ahead of its logged state would be
    // ACKNOWLEDGED and then silently undone — the healing merge
    // re-bases that partition on the raw pointer dir and the prefix
    // removes drop this commit's vectors. Refuse; merge first.
    Sinks.requireNoCrashLagging(root, state,
      fileDvs.flatMap(fd => Sinks.partitionOf(relByAbs(fd.absPath)))
        .distinct.toSeq, "deleteDeltaWhere")
    // the root-level twin (round-12 fuzz-harness find): unpartitioned
    // tables have the exact same window — a DELETE acknowledged while
    // the pointer is ahead of the log is dropped by the healing merge
    if (fileDvs.exists(fd =>
        Sinks.partitionOf(relByAbs(fd.absPath)).isEmpty))
      Sinks.requireRootNotCrashLagging(root, state, "deleteDeltaWhere")

    var rowsDeleted = 0L
    var dropped = 0
    val removes = Seq.newBuilder[String]
    val adds = Seq.newBuilder[com.fasterxml.jackson.databind.JsonNode]
    fileDvs.foreach { fd =>
      val rel = relByAbs(fd.absPath)
      val add = state(rel)
      rowsDeleted += fd.cardinality - fd.prevCardinality
      val phys = statsNumRecords(mapper, add)
      removes += rel
      if (phys.contains(fd.cardinality)) {
        dropped += 1 // every physical row deleted: drop the file outright
      } else {
        val re = add.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
        re.set[com.fasterxml.jackson.databind.JsonNode]("deletionVector",
          dvDescriptor(mapper, fd.dvBytes, fd.cardinality))
        re.put("dataChange", true)
        // checkpoint-reconstructed nodes are skeletons: fill the
        // spec-required field the rebuild drops (same class as the
        // canonical metaData below)
        if (!re.has("partitionValues")) re.putObject("partitionValues")
        adds += re
      }
    }

    val logDir = root.resolve("_delta_log")
    val now = System.currentTimeMillis()
    val actions = Seq.newBuilder[String]
    val ci = mapper.createObjectNode()
    val ciBody = ci.putObject("commitInfo")
    ciBody.put("timestamp", now)
    ciBody.put("operation", "DELETE")
    ciBody.putObject("operationParameters")
      .put("predicate", predicate.toString)
    ciBody.put("engineInfo", "graft")
    actions += mapper.writeValueAsString(ci)
    val md = mapper.createObjectNode()
    // canonical full shape: after checkpoint pruning the reconstructed
    // node is the checkpoint skeleton (no format/partitionColumns)
    md.set[com.fasterxml.jackson.databind.JsonNode]("metaData",
      mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](
        Sinks.canonicalMetaData(meta.get, now)))
    actions += mapper.writeValueAsString(md)
    removes.result().foreach { p =>
      val r = mapper.createObjectNode()
      val rb = r.putObject("remove")
      rb.put("path", p); rb.put("deletionTimestamp", now)
      rb.put("dataChange", true)
      actions += mapper.writeValueAsString(r)
    }
    adds.result().foreach { a =>
      val w = mapper.createObjectNode()
      w.set[com.fasterxml.jackson.databind.JsonNode]("add", a)
      actions += mapper.writeValueAsString(w)
    }
    val body = actions.result().mkString("", "\n", "\n")
    // commit under the table's metadata lock, and only if no other
    // commit landed since the predicate scan (the row indexes are only
    // meaningful against the scanned state) — a racer fails loudly, the
    // caller re-runs the delete against the fresh state
    Sinks.withMetadataLock(root, 60000L) {
      val vNow = Sinks.logTailVersion(tablePath)
      if (vNow != vAtRead)
        throw new java.util.ConcurrentModificationException(
          s"deleteDeltaWhere($tablePath): version advanced " +
            s"$vAtRead -> $vNow during the predicate scan; retry")
      val v = vNow + 1
      val dst = logDir.resolve(f"$v%020d.json")
      Sinks.casPublish(dst, body, s"deleteDeltaWhere($tablePath)")
    }
    DvDelete(rowsDeleted, adds.result().size, dropped)
  }

  // ------------------------------------------------------------------
  // READ with DVs applied
  // ------------------------------------------------------------------
  /** Scan `addNodes` (relative path -> add node) applying any deletion
    * vectors: plain files stream through one untouched scan; DV'd files
    * anti-join their `_metadata.row_index` against the exploded deleted
    * set (joined by normalized absolute path).
    */
  private[sources] def scanWithDvs(spark: SparkSession, tablePath: String,
      addNodes: Seq[(String, com.fasterxml.jackson.databind.JsonNode)],
      schema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val root = java.nio.file.Paths.get(tablePath)
    def abs(p: String) = root.resolve(p).toString
    // under schema evolution files span eras; both scans read under the
    // LOGGED schema so the union's sides line up and a partition's
    // late-added column is nulls, not an AnalysisException. The scan
    // spells columns PHYSICALLY (the data-file truth under column
    // mapping); the exit renames to the logical spelling
    def reader = schema.map(s =>
      spark.read.schema(Sinks.physicalSchema(s))).getOrElse(spark.read)
    val (withDv, plain) = addNodes.partition(_._2.has("deletionVector"))
    val plainDf =
      if (plain.isEmpty) None
      else Some(reader.parquet(plain.map(p => abs(p._1)): _*))
    val dvDf =
      if (withDv.isEmpty) None
      else {
        // keyed by normalized absolute path (basenames collide across a
        // partitioned batch's partition dirs — see deleteDeltaWhere)
        val deleted = withDv.flatMap { case (rel, node) =>
          val fp = root.resolve(rel).toAbsolutePath.toString
          dvIndexes(node.get("deletionVector")).map(i => (fp, i))
        }
        import spark.implicits._
        val delDf = deleted.toDF("__fp", "__ri")
        val scan = reader.parquet(withDv.map(p => abs(p._1)): _*)
          .withColumn("__fp", normalizedFilePath)
          .withColumn("__ri", col("_metadata.row_index"))
        Some(scan.join(delDf, Seq("__fp", "__ri"), "left_anti")
          .drop("__fp", "__ri"))
      }
    val out = (plainDf, dvDf) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        throw new IllegalArgumentException("no live files to scan")
    }
    // physical -> logical (positional: physicalSchema preserves order);
    // identity when no column was ever renamed
    schema.filter(s => Sinks.columnMapping(Some(s)).nonEmpty)
      .map(s => out.toDF(s.fieldNames.toIndexedSeq: _*)).getOrElse(out)
  }

  /** [[Sinks.readDeltaTableAt]]'s DV-aware form: the state at `version`
    * with every file's deletion vector applied.
    */
  def readDeltaTableMor(spark: SparkSession, tablePath: String,
                        version: Long = Long.MaxValue): DataFrame = {
    val (state, meta) = Sinks.deltaStateWithMeta(spark, tablePath, version)
    require(state.nonEmpty, s"no live files at version $version")
    scanWithDvs(spark, tablePath, state.toSeq, Sinks.metaSchema(meta))
  }

  // ------------------------------------------------------------------
  // PURGE (OPTIMIZE-style rewrite of DV'd files)
  // ------------------------------------------------------------------
  /** Rewrite ONLY the files carrying deletion vectors into clean files
    * (deleted rows physically gone), commit remove+add, and return how
    * many files were purged. Untouched files keep their add entries —
    * purge cost tracks the delete volume, not the table. Partitioned
    * layouts delegate to [[Sinks.purgePartitionedDvs]]: each DV-carrying
    * partition is rewritten at partition grain (merge-shaped — MOR base,
    * pointer swap, `partitionGens` markers, one batch commit).
    */
  def purgeDeletionVectors(spark: SparkSession, tablePath: String): Int = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val mapper = Sinks.jsonMapper
    val vAtRead = Sinks.logTailVersion(tablePath)
    val (state, meta) =
      Sinks.deltaStateWithMeta(spark, tablePath, Long.MaxValue)
    val withDv = state.toSeq.filter(_._2.has("deletionVector"))
    if (withDv.isEmpty) return 0
    // PARTITIONED layouts take the partition-grain path: the root-level
    // gen-dv-purge rewrite dir below would mix partitions, which the
    // partition-scoped merge base and remove prefixes can neither read
    // nor replace — a later merge would duplicate the purged rows. The
    // partition purge IS a merge-shaped rewrite of each DV-carrying
    // partition (MOR base, pointer swap, partitionGens markers). The
    // already-built state rides along — no second reconstruction.
    if (state.keys.exists(_.startsWith("p=")))
      return Sinks.purgePartitionedDvs(spark, tablePath, vAtRead, state,
        meta)
    val root = Paths.get(tablePath)
    // root-level crash-window refusal, same rationale as the
    // partitioned purge's: a purge over the stale logged state would be
    // silently superseded when the healing merge re-bases on the raw
    // pointer dir (round-12 fuzz-harness find)
    Sinks.requireRootNotCrashLagging(root, state, "purgeDeletionVectors")
    val v = vAtRead + 1
    val genDir = root.resolve(f"gen-dv-purge-$v%020d")
    // logged-schema scan: an era-spanning purge rewrite must carry the
    // evolved columns (nulls where the old files lack them), not
    // whichever footer Spark samples
    Sinks.toPhysicalFrame(
        scanWithDvs(spark, tablePath, withDv, Sinks.metaSchema(meta)),
        Sinks.metaSchema(meta))
      .write.mode("overwrite").parquet(genDir.toString)
    val now = System.currentTimeMillis()
    val actions = Seq.newBuilder[String]
    val ci = mapper.createObjectNode()
    val cb = ci.putObject("commitInfo")
    cb.put("timestamp", now); cb.put("operation", "OPTIMIZE_DV_PURGE")
    cb.putObject("operationParameters")
    cb.put("engineInfo", "graft")
    actions += mapper.writeValueAsString(ci)
    val md = mapper.createObjectNode()
    // canonical full shape (see deleteDeltaWhere)
    md.set[com.fasterxml.jackson.databind.JsonNode]("metaData",
      mapper.valueToTree[com.fasterxml.jackson.databind.JsonNode](
        Sinks.canonicalMetaData(meta.get, now)))
    actions += mapper.writeValueAsString(md)
    withDv.foreach { case (rel, _) =>
      val r = mapper.createObjectNode()
      val rb = r.putObject("remove")
      rb.put("path", rel); rb.put("deletionTimestamp", now)
      rb.put("dataChange", false)
      actions += mapper.writeValueAsString(r)
    }
    Sinks.genDataFiles(root, genDir).foreach { a =>
      val w = mapper.createObjectNode()
      val ab = w.putObject("add")
      ab.put("path", a.path)
      ab.set[com.fasterxml.jackson.databind.JsonNode]("partitionValues",
        mapper.createObjectNode())
      ab.put("size", a.size)
      ab.put("modificationTime", a.mtime)
      ab.put("dataChange", false)
      a.stats.foreach(s => ab.put("stats", s))
      actions += mapper.writeValueAsString(w)
    }
    val body = actions.result().mkString("", "\n", "\n")
    val logDir = root.resolve("_delta_log")
    // same commit discipline as deleteDeltaWhere: lock + staleness check
    // (the rewritten files were selected against the scanned state)
    Sinks.withMetadataLock(root, 60000L) {
      val vNow = Sinks.logTailVersion(tablePath)
      if (vNow != vAtRead)
        throw new java.util.ConcurrentModificationException(
          s"purgeDeletionVectors($tablePath): version advanced " +
            s"$vAtRead -> $vNow during the rewrite; retry")
      val dst = logDir.resolve(f"$v%020d.json")
      Sinks.casPublish(dst, body, s"purgeDeletionVectors($tablePath)")
    }
    withDv.size
  }
}
