package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import graft.sources.{LogStore, LogStores, LocalFsLogStore, Sinks,
  DeletionVectors}

/** Object-store portability proof for the commit layer (round-11
  * directive 4): every ACID invariant must hold when the storage
  * provides NO atomic rename — only whole-object PUT, conditional PUT
  * (put-if-absent), and DELETE, i.e. the S3/GCS primitive set. The
  * [[MockObjectStore]] below forbids rename by construction (its
  * implementations never call Files.move) and counts primitive
  * invocations so a silently-bypassing code path can't green-wash the
  * spec.
  */
class LogStoreSpec extends SparkSpec {
  import spark.implicits._

  /** Rename-free store: models an object store over the local namespace
    * so the engine's read paths (which GET objects by name, exactly as
    * they would over an object store) keep working. `put` is a direct
    * whole-object write — atomic on a real object store; this spec is
    * single-threaded so local torn-read exposure is moot. `putFile` is
    * a COPY (an upload), never a move.
    */
  private final class MockObjectStore extends LogStore {
    val ops = scala.collection.concurrent.TrieMap[String, Int]()
    private def bump(k: String): Unit =
      ops.updateWith(k)(v => Some(v.getOrElse(0) + 1))
    def createNew(path: Path): Unit = {
      bump("createNew")
      Files.createFile(path) // conditional PUT: throws when present
    }
    def put(path: Path, content: String): Unit = {
      bump("put")
      Files.writeString(path, content)
    }
    def putIfAbsent(path: Path, content: String): Unit = {
      bump("putIfAbsent")
      if (Files.exists(path))
        throw new java.nio.file.FileAlreadyExistsException(path.toString)
      Files.writeString(path, content)
    }
    def putFile(src: Path, dst: Path): Unit = {
      bump("putFile")
      Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    }
    def delete(path: Path): Unit = {
      bump("delete")
      Files.deleteIfExists(path)
    }
  }

  private def withMock[A](root: String)(body: MockObjectStore => A): A = {
    val store = new MockObjectStore
    LogStores.register(Paths.get(root), store)
    try body(store) finally LogStores.unregister(Paths.get(root))
  }

  test("store primitives: putIfAbsent is a CAS, local default is atomic-move") {
    val d = Files.createTempDirectory("store")
    val f = d.resolve("obj")
    LocalFsLogStore.putIfAbsent(f, "a")
    assert(Files.readString(f) == "a")
    intercept[java.nio.file.FileAlreadyExistsException] {
      LocalFsLogStore.putIfAbsent(f, "b")
    }
    assert(Files.readString(f) == "a", "failed CAS must not clobber")
    LocalFsLogStore.put(f, "c")
    assert(Files.readString(f) == "c")
    LocalFsLogStore.delete(f)
    assert(!Files.exists(f))
    val m = new MockObjectStore
    m.putIfAbsent(f, "x")
    intercept[java.nio.file.FileAlreadyExistsException] {
      m.putIfAbsent(f, "y")
    }
    assert(Files.readString(f) == "x")
  }

  test("registry routes by nearest enclosing root, default elsewhere") {
    val root = Files.createTempDirectory("reg")
    val store = new MockObjectStore
    LogStores.register(root, store)
    try {
      assert(LogStores.forPath(root.resolve("t/_delta_log/x.json")) eq store)
      assert(LogStores.forPath(
        Paths.get("/tmp/definitely-not-registered/x")) eq LocalFsLogStore)
    } finally LogStores.unregister(root)
  }

  test("upsert/DELETE/RESTORE/checkpoint hold every invariant with rename forbidden") {
    val root = Files.createTempDirectory("objstore").toString
    val dir = root + "/t"
    withMock(root) { store =>
      // three generations of MERGE
      Sinks.upsertParquet(spark, dir,
        Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v"),
        Seq("k"))
      Sinks.upsertParquet(spark, dir,
        Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("k", "name", "v"),
        Seq("k"))
      Sinks.upsertParquet(spark, dir,
        Seq((4L, "d", 40.0)).toDF("k", "name", "v"), Seq("k"))
      assert(Sinks.deltaLogVersions(dir) == Seq(0L, 1L, 2L))
      assert(Sinks.readUpsertTable(spark, dir).select("k", "v")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ==
        Set((1L, 10.0), (2L, 25.0), (3L, 30.0), (4L, 40.0)))
      // MOR DELETE (DV commit), then protocol + pointer reads agree
      val del = DeletionVectors.deleteDeltaWhere(spark, dir, col("k") === 2L)
      assert(del.rowsDeleted == 1L)
      assert(Sinks.readDeltaTableAt(spark, dir).select("k")
        .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L))
      // RESTORE to the pre-DELETE version
      Sinks.restoreDeltaTable(spark, dir, 2L)
      assert(Sinks.readDeltaTableAt(spark, dir).select("k")
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
      // checkpoint + prune, state survives
      Sinks.checkpointDeltaLog(spark, dir)
      assert(Sinks.cleanDeltaLog(dir) > 0)
      Sinks.upsertParquet(spark, dir,
        Seq((5L, "e", 50.0)).toDF("k", "name", "v"), Seq("k"))
      assert(Sinks.readUpsertTable(spark, dir).select("k")
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
      // every commit primitive was actually exercised through the seam.
      // Lock acquisition is an atomic putIfAbsent WITH the fence token
      // (round-14 ADVICE: the createNew-then-put pair had a token-clobber
      // window), so the acquire shows up under putIfAbsent alongside the
      // log commits: >= 6 commits (v0..v5) plus >= 6 lock acquires.
      assert(store.ops.getOrElse("putIfAbsent", 0) >= 12,
        "log commits + atomic lock acquires")
      assert(store.ops.getOrElse("put", 0) > 0, "pointer/manifest/_last_checkpoint")
      assert(store.ops.getOrElse("putFile", 0) > 0, "checkpoint parquet")
      assert(store.ops.getOrElse("delete", 0) > 0, "lock release")
    }
  }

  test("partitioned merge + partition-wide DELETE + purge, rename-free") {
    val root = Files.createTempDirectory("objstore").toString
    val dir = root + "/t"
    withMock(root) { store =>
      Sinks.upsertParquetPartitioned(spark, dir,
        Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
          (3L, "2024-01-02", 3.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
      Sinks.upsertParquetPartitioned(spark, dir,
        Seq((2L, "2024-01-01", 9.0), (4L, "2024-01-03", 4.0))
          .toDF("k", "ds", "v"), Seq("k"), "ds")
      val del = DeletionVectors.deleteDeltaWhere(spark, dir,
        col("ds") === "2024-01-02")
      assert(del.rowsDeleted == 1L)
      // the DV-aware protocol read sees the delete immediately; the
      // pointer read is raw-generation by contract and catches up when
      // the partition is next rewritten
      assert(Sinks.readDeltaTableAt(spark, dir).select("k")
        .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
      Sinks.upsertParquetPartitioned(spark, dir,
        Seq((5L, "2024-01-02", 5.0)).toDF("k", "ds", "v"), Seq("k"), "ds")
      val got = Sinks.readUpsertPartitionedTable(spark, dir)
        .select("k", "v").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == Set((1L, 1.0), (2L, 9.0), (4L, 4.0), (5L, 5.0)),
        s"deleted row resurrected or batch lost: $got")
      assert(store.ops.getOrElse("putIfAbsent", 0) >= 4)
      assert(store.ops.getOrElse("put", 0) > 0)
    }
  }
}
