package graft

import java.nio.file.{Files, Path, Paths}
import graft.sources.{LogStore, LocalFsLogStore}

/** Shared pieces of the Delta fuzz harnesses (unpartitioned
  * [[DeltaFuzzSpec]] and partitioned [[DeltaFuzzPartitionedSpec]]):
  * the fault-injecting store and the INDEPENDENT protocol observables
  * the models use to adjudicate a crashed op's effect — pointer bytes,
  * version listings, generation markers — parsed with their own code,
  * never graft's read path.
  */
object FuzzHarness {

  final class InjectedCrash extends RuntimeException("injected crash")

  /** Simulated process death at a storage-operation boundary: passes
    * through to `delegate` until `armAt` more operations have run, then
    * throws on every operation — the op that trips the limit does NOT
    * execute (died before it), and nothing after it executes either
    * (the process is gone). `disarm()` models the restarted process.
    * The default delegate is the production local store; passing the
    * rename-free [[ObjectStoreSemantics]] composes crash histories with
    * the object-store primitive set.
    */
  final class CrashingStore(delegate: LogStore = LocalFsLogStore)
      extends LogStore {
    @volatile private var remaining: Int = Int.MaxValue
    @volatile var fired: Boolean = false
    def arm(afterOps: Int): Unit = { remaining = afterOps; fired = false }
    def disarm(): Unit = { remaining = Int.MaxValue }
    private def step(): Unit = this.synchronized {
      if (remaining <= 0) { fired = true; throw new InjectedCrash }
      remaining -= 1
    }
    def createNew(p: Path): Unit = { step(); delegate.createNew(p) }
    def put(p: Path, c: String): Unit = { step(); delegate.put(p, c) }
    def putIfAbsent(p: Path, c: String): Unit = {
      step(); delegate.putIfAbsent(p, c) }
    def putFile(s: Path, d: Path): Unit = {
      step(); delegate.putFile(s, d) }
    def delete(p: Path): Unit = { step(); delegate.delete(p) }
  }

  /** Rename-free store over the local namespace — the S3/GCS primitive
    * set (whole-object PUT, conditional PUT, DELETE), no Files.move
    * anywhere. Single-writer test semantics, same as LogStoreSpec's
    * MockObjectStore; shared here so crash histories can run under it.
    */
  object ObjectStoreSemantics extends LogStore {
    def createNew(p: Path): Unit = Files.createFile(p)
    def put(p: Path, c: String): Unit = Files.writeString(p, c)
    def putIfAbsent(p: Path, c: String): Unit = {
      if (Files.exists(p))
        throw new java.nio.file.FileAlreadyExistsException(p.toString)
      Files.writeString(p, c)
    }
    def putFile(s: Path, d: Path): Unit =
      Files.copy(s, d,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    def delete(p: Path): Unit = Files.deleteIfExists(p)
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def logVersions(dir: String): Seq[Long] = {
    val ld = Paths.get(dir, "_delta_log")
    if (!Files.isDirectory(ld)) return Seq.empty
    val ls = Files.list(ld)
    try {
      import scala.jdk.CollectionConverters._
      ls.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.contains(".tmp"))
        .flatMap(n => scala.util.Try(n.stripSuffix(".json").toLong).toOption)
        .toSeq.sorted
    } finally ls.close()
  }

  /** Max table-wide `generation` marker: retained commitInfo walk plus
    * the `graftLastGen` survivor in `_last_checkpoint`.
    */
  def maxLoggedGen(dir: String): Long = {
    var out = -1L
    val lc = Paths.get(dir, "_delta_log", "_last_checkpoint")
    if (Files.exists(lc)) {
      val n = mapper.readTree(Files.readString(lc))
      if (n.has("graftLastGen")) out = n.get("graftLastGen").asLong()
    }
    eachCommitParams(dir) { p =>
      if (p.has("generation"))
        out = math.max(out, p.get("generation").asText().toLong)
    }
    out
  }

  /** Max PER-PARTITION `partitionGens` markers: retained commitInfo
    * walk plus the `graftPartGens` snapshot in `_last_checkpoint`.
    */
  def maxPartMarkers(dir: String): Map[String, Long] = {
    val out = scala.collection.mutable.Map.empty[String, Long]
    val lc = Paths.get(dir, "_delta_log", "_last_checkpoint")
    if (Files.exists(lc)) {
      val n = mapper.readTree(Files.readString(lc))
      if (n.has("graftPartGens"))
        n.get("graftPartGens").fields().forEachRemaining(e =>
          out(e.getKey) = e.getValue.asText().toLong)
    }
    eachCommitParams(dir) { p =>
      if (p.has("partitionGens"))
        p.get("partitionGens").fields().forEachRemaining { e =>
          val g = e.getValue.asText().toLong
          out(e.getKey) = math.max(out.getOrElse(e.getKey, -1L), g)
        }
    }
    out.toMap
  }

  private def eachCommitParams(dir: String)(
      f: com.fasterxml.jackson.databind.JsonNode => Unit): Unit = {
    val ld = Paths.get(dir, "_delta_log")
    logVersions(dir).foreach { v =>
      Files.readString(ld.resolve(f"$v%020d.json")).linesIterator
        .filter(_.nonEmpty)
        .flatMap(l => scala.util.Try(mapper.readTree(l)).toOption)
        .filter(_.has("commitInfo")).map(_.get("commitInfo"))
        .filter(_.has("operationParameters"))
        .map(_.get("operationParameters"))
        .foreach(f)
    }
  }

  def rootPointerGen(dir: String): Option[Long] = {
    val p = Paths.get(dir, "_CURRENT")
    if (!Files.exists(p)) None
    else Some(Files.readString(p).trim.stripPrefix("gen-").toLong)
  }

  def partPointerGen(dir: String, part: String): Option[Long] = {
    val p = Paths.get(dir, s"p=$part", "_CURRENT")
    if (!Files.exists(p)) None
    else Some(Files.readString(p).trim.stripPrefix("gen-").toLong)
  }
}
