package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Joins, MergeOps}
import graft.sources.Sinks

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("persisted IVF index: probed search is bucket-pruned and equals " +
    "the in-memory operator; appends assign against fixed centroids") {
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("ivfidx").toString + "/idx"
    val e = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("vec"))
    Similarity.buildIvfIndex(spark, e, col("vec_id"), col("vec"), dir)

    // the serving contract: the on-disk index reproduces the in-memory
    // operator value-for-value (same trainer, same probes, same top-k)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
    val mem = Similarity.ivfTopK(e, col("vec_id"), col("vec"), k = 5)
      .collect().map(key).toSet
    val served = Similarity.ivfIndexSearch(spark, dir, e,
        col("vec_id"), col("vec"), k = 5, nProbe = 2, excludeSelf = true)
      .collect().map(key).toSet
    assert(served == mem,
      s"persisted search diverged: ${(served diff mem).take(3)} vs " +
        s"${(mem diff served).take(3)}")

    // plan proof: a small query batch probes few centroids, and the
    // bucketed list scan reads ONLY those buckets
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(autoKey, "true")
    spark.conf.set(autoKey, "false")
    try {
      val res = Similarity.ivfIndexSearch(spark, dir,
        e.filter(col("vec_id") < 2), col("vec_id"), col("vec"),
        k = 3, nProbe = 2)
      val plan = res.queryExecution.executedPlan.toString
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      val m = sel.findFirstMatchIn(plan)
        .getOrElse(fail(s"no SelectedBucketsCount in probe plan:\n$plan"))
      assert(m.group(1).toInt < m.group(2).toInt,
        s"probed search must read a strict subset of buckets: ${m.matched}")
      assert(res.count() > 0)
    } finally spark.conf.set(autoKey, prev)

    // append: a clone of vector 7 lands in vector 7's list (assigned
    // against the FIXED centroids) and is immediately searchable at
    // cosine 1.0; the stored corpus was never rewritten
    val clone = e.filter(col("vec_id") === 7)
      .select((col("vec_id") + 100000).as("vec_id"), col("vec"))
    val batch = Similarity.ivfIndexAppend(spark, clone,
      col("vec_id"), col("vec"), dir)
    assert(batch == 1L)
    val hit = Similarity.ivfIndexSearch(spark, dir,
        e.filter(col("vec_id") === 7), col("vec_id"), col("vec"),
        k = 1, nProbe = 1, excludeSelf = true)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(hit.toSeq == Seq((100007L, 1.0)),
      s"the appended clone must be the top hit: ${hit.toSeq}")
    // retried append (same batch partition rewritten) converges —
    // idempotent overwrite, no duplicate rows
    val table = Similarity.ivfIndexTableName(dir)
    graft.sources.Sinks.overwriteBucketedPartition(spark, table, batch,
      spark.table(table).filter(col("batch") === batch)
        .drop("batch").localCheckpoint(true))
    assert(spark.table(table).filter(col("id") === 100007L).count() == 1)
    assert(Similarity.ivfIndexSearch(spark, dir,
        e.filter(col("vec_id") === 7), col("vec_id"), col("vec"),
        k = 1, nProbe = 1, excludeSelf = true)
      .collect().map(_.getLong(1)).toSeq == Seq(100007L))
  }

  test("saltedAggregate equals plain aggregation") {
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Joins.saltedAggregate(df, Seq(col("k")), buckets = 8,
        partials = Seq(sum("v").as("ps"), count(lit(1)).as("pc")),
        finals = Seq(sum("ps").as("total"), sum("pc").as("n")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salt is content-derived: stable across re-evaluation of the same row") {
    // SPARK-23207 guard: the salt must be a pure function of row content so a
    // stage retry recomputes identical salts. Evaluate the salted plan twice
    // and demand identical per-row assignments.
    val df = (1 to 200).map(i => (if (i % 7 == 0) "hot" else s"k$i", i.toLong))
      .toDF("k", "v")
    def saltOf() = df
      .withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(8)))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(saltOf() == saltOf())
  }

  test("saltedAggregate tolerates map-typed columns (salt skips them)") {
    val df = (1 to 100).map(i => (s"k${i % 3}", i.toLong, Map("m" -> i)))
      .toDF("k", "v", "props")
    val out = Joins.saltedAggregate(df, Seq(col("k")), buckets = 4,
        partials = Seq(sum("v").as("ps")), finals = Seq(sum("ps").as("total")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out("k1") == (1 to 100).filter(_ % 3 == 1).sum)
  }

  test("saltedJoin equals plain join") {
    val fact = (1 to 500).map(i => (s"k${i % 5}", i)).toDF("k", "v")
    val dim = (0 until 5).map(i => (s"k$i", s"label$i")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    val salted = Joins.saltedJoin(fact, dim, "k", buckets = 4).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(salted.size == 500)
  }

  test("upsertParquet: generational MERGE with pointer swap") {
    val dir = Files.createTempDirectory("graft_upsert").toString
    val batch1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    Sinks.upsertParquet(spark, dir, batch1, Seq("k"))
    assert(Sinks.readUpsertTable(spark, dir).count() == 2)
    // second batch: update k=2 (greatest v), insert k=3
    val batch2 = Seq((2L, "b2", 5.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    Sinks.upsertParquet(spark, dir, batch2, Seq("k"),
      Map("v" -> MergeOps.Greatest))
    val out = Sinks.readUpsertTable(spark, dir).orderBy("k").collect()
    assert(out.length == 3)
    assert(out(1).getString(1) == "b2")   // SourceFirst default
    assert(out(1).getDouble(2) == 20.0)   // Greatest kept target
    assert(out(2).getDouble(2) == 30.0)
    // generations retained for rollback; pointer names the latest
    val files = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(files.contains("gen-0") && files.contains("gen-1") && files.contains("_CURRENT"))
  }

  test("upsertParquetPartitioned: only batch partitions are rewritten, rest byte-identical") {
    import java.nio.file.{Files => NF, Paths}
    val dir = NF.createTempDirectory("graft_pupsert").toString
    val batch1 = Seq(
      (1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
      (3L, "2024-01-02", 30.0)).toDF("k", "ymd", "v")
    Sinks.upsertParquetPartitioned(spark, dir, batch1, Seq("k"), "ymd")
    assert(Sinks.readUpsertPartitionedTable(spark, dir).count() == 3)
    // fingerprint every file of the untouched partition
    def fileBytes(part: String): Map[String, Seq[Byte]] = {
      val walk = NF.walk(Paths.get(dir, part))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(NF.isRegularFile(_))
          .map(p => p.toString -> NF.readAllBytes(p).toSeq).toMap
      } finally walk.close()
    }
    val before = fileBytes("p=2024-01-01")
    // batch 2 touches ONLY 2024-01-02: update k=3, insert k=4
    val batch2 = Seq((3L, "2024-01-02", 35.0), (4L, "2024-01-02", 40.0))
      .toDF("k", "ymd", "v")
    Sinks.upsertParquetPartitioned(spark, dir, batch2, Seq("k"), "ymd")
    assert(fileBytes("p=2024-01-01") == before,
      "untouched partition files must be byte-identical (never rewritten)")
    assert(NF.readString(Paths.get(dir, "p=2024-01-01", "_CURRENT")).trim == "gen-0")
    assert(NF.readString(Paths.get(dir, "p=2024-01-02", "_CURRENT")).trim == "gen-1")
    val out = Sinks.readUpsertPartitionedTable(spark, dir)
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "2024-01-01", 10.0), (2L, "2024-01-01", 20.0),
        (3L, "2024-01-02", 35.0), (4L, "2024-01-02", 40.0)))
    // no staging residue
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_stage")))
  }

  test("upsertParquetPartitioned self-heals after a crash between move and pointer swap") {
    import java.nio.file.{Files => NF, Paths}
    val dir = NF.createTempDirectory("graft_crash").toString
    Sinks.upsertParquetPartitioned(spark,
      dir, Seq((1L, "2024-01-01", 1.0)).toDF("k", "ymd", "v"), Seq("k"), "ymd")
    // simulate a run that died AFTER moving gen-1 into place but BEFORE
    // the pointer swap (plus its orphaned staging skeleton)
    NF.createDirectories(Paths.get(dir, "p=2024-01-01", "gen-1"))
    NF.writeString(Paths.get(dir, "p=2024-01-01", "gen-1", "part-junk"), "junk")
    // the dead run's staging skeleton must look OLD — a young _stage-* is
    // presumed to be a live concurrent writer and is left alone
    NF.createDirectories(Paths.get(dir, "_stage-999", "__p=2024-01-01"))
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 25L * 3600 * 1000)
    NF.setLastModifiedTime(Paths.get(dir, "_stage-999", "__p=2024-01-01"), old)
    NF.setLastModifiedTime(Paths.get(dir, "_stage-999"), old)
    Sinks.upsertParquetPartitioned(spark,
      dir, Seq((2L, "2024-01-01", 2.0)).toDF("k", "ymd", "v"), Seq("k"), "ymd")
    assert(NF.readString(Paths.get(dir, "p=2024-01-01", "_CURRENT")).trim == "gen-1")
    assert(Sinks.readUpsertPartitionedTable(spark, dir).count() == 2,
      "wedged gen dir replaced, merge applied")
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_stage")),
      "orphaned staging removed")
  }

  test("upsertParquetPartitioned: concurrent writers lose no partition update") {
    val dir = Files.createTempDirectory("graft_prace").toString
    // writers 1/3 hit partition A, writers 2/4 hit partition B, and all
    // race from an empty table: every key must survive, and each
    // partition's generation chain must reflect exactly its two commits
    val threads = (1 to 4).map { i =>
      val part = if (i % 2 == 1) "2024-01-01" else "2024-01-02"
      new Thread(() => Sinks.upsertParquetPartitioned(spark, dir,
        Seq((i.toLong, part, i.toDouble)).toDF("k", "ymd", "v"),
        Seq("k"), "ymd", maxRetries = 20))
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    val out = Sinks.readUpsertPartitionedTable(spark, dir)
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L),
      "a lost update would drop a writer's key")
    import java.nio.file.{Files => NF, Paths}
    Seq("2024-01-01", "2024-01-02").foreach { p =>
      assert(NF.readString(Paths.get(dir, s"p=$p", "_CURRENT")).trim
        == "gen-1", s"partition $p: two serialized commits")
    }
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_stage-")), "stages cleaned")
  }

  test("upsertParquetPartitioned vacuums per-partition generations") {
    val dir = Files.createTempDirectory("graft_pvac").toString
    (0 to 3).foreach { i =>
      val b = Seq((i.toLong, "2024-01-01", i.toDouble)).toDF("k", "ymd", "v")
      Sinks.upsertParquetPartitioned(spark, dir, b, Seq("k"), "ymd",
        keepGenerations = 2)
    }
    val gens = new java.io.File(dir, "p=2024-01-01").listFiles().map(_.getName)
      .filter(_.startsWith("gen-")).sorted
    assert(gens.toSeq == Seq("gen-2", "gen-3"), s"got ${gens.toSeq}")
    assert(Sinks.readUpsertPartitionedTable(spark, dir).count() == 4)
  }

  test("upsertParquet: concurrent writers lose no generation") {
    val dir = Files.createTempDirectory("graft_race").toString
    // 4 writers race from the same (empty) base; every commit must land on
    // the exact base it merged from, so all 4 keys survive regardless of
    // the schedule — the losers re-merge from the winner's generation
    val threads = (1 to 4).map { i =>
      new Thread(() => Sinks.upsertParquet(spark, dir,
        Seq((i.toLong, s"w$i")).toDF("k", "name"), Seq("k"),
        maxRetries = 20))
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    val out = Sinks.readUpsertTable(spark, dir).orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L),
      "a lost update would drop a writer's key")
    import java.nio.file.{Files => NF, Paths}
    assert(NF.readString(Paths.get(dir, "_CURRENT")).trim == "gen-3",
      "4 serialized commits: gen-0..gen-3")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_txn-")), "losers clean their staging")
    assert(!NF.exists(Paths.get(dir, "_LOCK")), "lock released")
    // the manifest is written under the same lock as each pointer swap:
    // after the race it must name exactly the final generation's files
    import scala.jdk.CollectionConverters._
    val manifest = NF.readAllLines(
      Paths.get(dir, "_symlink_format_manifest", "manifest"))
      .asScala.filter(_.nonEmpty)
    assert(manifest.nonEmpty && manifest.forall(_.contains("/gen-3/")),
      s"manifest must track the winning generation, got $manifest")
  }

  test("readUpsertTableAt time-travels within the retention window") {
    val dir = Files.createTempDirectory("graft_tt").toString
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "v1")).toDF("k", "name"), Seq("k"))
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "v2"), (2L, "w")).toDF("k", "name"), Seq("k"))
    assert(Sinks.listGenerations(dir) == Seq(0L, 1L))
    val then_ = Sinks.readUpsertTableAt(spark, dir, 0L).collect()
    assert(then_.map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "v1")), "generation 0 is an immutable snapshot")
    val now = Sinks.readUpsertTableAt(spark, dir, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(now == Set((1L, "v2"), (2L, "w")))
    intercept[IllegalArgumentException] {
      Sinks.readUpsertTableAt(spark, dir, 9L)
    }
    // an orphan gen-2 from a dead committer (moved, never pointer-swapped)
    // is UNCOMMITTED: not listed, not readable — the next writer will
    // replace it under the lock
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "gen-2"))
    assert(Sinks.listGenerations(dir) == Seq(0L, 1L))
    intercept[IllegalArgumentException] {
      Sinks.readUpsertTableAt(spark, dir, 2L)
    }
    // missing table: empty listing, loud read failure, no IO exception
    assert(Sinks.listGenerations(dir + "/nope") == Seq.empty)
    intercept[IllegalArgumentException] {
      Sinks.readUpsertTableAt(spark, dir + "/nope", 0L)
    }
  }

  test("upsertParquet adopts over an orphan generation from a dead committer") {
    import java.nio.file.{Files => NF, Paths}
    val dir = NF.createTempDirectory("graft_orphan").toString
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "a")).toDF("k", "name"), Seq("k"))
    // a committer died between its gen-1 move and its pointer swap: gen-1
    // exists but _CURRENT still names gen-0 → unreferenced, replaceable
    NF.createDirectories(Paths.get(dir, "gen-1"))
    NF.writeString(Paths.get(dir, "gen-1", "part-junk"), "junk")
    Sinks.upsertParquet(spark, dir,
      Seq((2L, "b")).toDF("k", "name"), Seq("k"))
    assert(NF.readString(Paths.get(dir, "_CURRENT")).trim == "gen-1")
    assert(Sinks.readUpsertTable(spark, dir).count() == 2)
  }

  test("upsertParquet steals a stale lock; cleanStagedUpserts is age-gated") {
    import java.nio.file.{Files => NF, Paths}
    val dir = NF.createTempDirectory("graft_stale").toString
    NF.createDirectories(Paths.get(dir))
    // a crashed committer's lock, backdated beyond the stale window
    val lock = Paths.get(dir, "_LOCK")
    NF.writeString(lock, "")
    NF.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 600000))
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "a")).toDF("k", "name"), Seq("k"), staleLockMs = 1000)
    assert(Sinks.readUpsertTable(spark, dir).count() == 1,
      "stale lock stolen, upsert committed")
    // staged leftovers: only old ones are swept
    val fresh = Paths.get(dir, "_txn-fresh")
    val dead = Paths.get(dir, "_txn-dead")
    NF.createDirectories(fresh); NF.createDirectories(dead)
    NF.setLastModifiedTime(dead,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 600000))
    assert(Sinks.cleanStagedUpserts(dir, olderThanMs = 60000) == 1)
    assert(NF.exists(fresh) && !NF.exists(dead))
  }

  test("upsertParquet vacuums generations beyond the retention window") {
    val dir = Files.createTempDirectory("graft_vac").toString
    (0 to 4).foreach { i =>
      val batch = Seq((i.toLong, s"v$i")).toDF("k", "name")
      Sinks.upsertParquet(spark, dir, batch, Seq("k"), keepGenerations = 2)
    }
    val gens = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("gen-")).sorted
    assert(gens.toSeq == Seq("gen-3", "gen-4"), s"got ${gens.toSeq}")
    assert(Sinks.readUpsertTable(spark, dir).count() == 5)
  }

  test("bucketed tables join with no exchange in the plan") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
      val b = (1 to 800).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
      Sinks.writeBucketed(a, "buck_a", "k", 8)
      Sinks.writeBucketed(b, "buck_b", "k", 8)
      val j = spark.table("buck_a").join(spark.table("buck_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed equi-join must not shuffle:\n$plan")
      assert(j.count() == 800)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS buck_a")
      spark.sql("DROP TABLE IF EXISTS buck_b")
    }
  }

  test("symlink manifest: external readers consume a committed generation with no engine code") {
    import java.nio.file.{Files => NF, Paths}
    import scala.jdk.CollectionConverters._
    val dir = NF.createTempDirectory("graft_manifest").toString
    Sinks.upsertParquet(spark, dir,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v"), Seq("k"))
    Sinks.upsertParquet(spark, dir,
      Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("k", "name", "v"), Seq("k"))
    // the interop contract: read the manifest's file URIs with plain
    // java.nio, scan them with plain spark.read.parquet — zero graft code
    val manifest = Paths.get(dir, "_symlink_format_manifest", "manifest")
    val paths = NF.readAllLines(manifest).asScala.toSeq.filter(_.nonEmpty)
    assert(paths.nonEmpty && paths.forall(_.contains("/gen-1/")),
      s"manifest must name only current-generation files, got $paths")
    val external = spark.read.parquet(paths: _*)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(external == Set((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0)))
    // and it matches the engine's own pointer read exactly
    val internal = Sinks.readUpsertTable(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(external == internal)
  }

  test("symlink manifest: per-partition manifests track each partition's generation") {
    import java.nio.file.{Files => NF, Paths}
    import scala.jdk.CollectionConverters._
    val dir = NF.createTempDirectory("graft_pmanifest").toString
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((1L, "2024-01-01", 10.0), (3L, "2024-01-02", 30.0))
        .toDF("k", "ymd", "v"), Seq("k"), "ymd")
    // second batch touches only 2024-01-02
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((3L, "2024-01-02", 35.0)).toDF("k", "ymd", "v"), Seq("k"), "ymd")
    def manifestPaths(p: String): Seq[String] =
      NF.readAllLines(Paths.get(dir, "_symlink_format_manifest", s"p=$p",
        "manifest")).asScala.toSeq.filter(_.nonEmpty)
    assert(manifestPaths("2024-01-01").forall(_.contains("/gen-0/")))
    assert(manifestPaths("2024-01-02").forall(_.contains("/gen-1/")))
    val all = manifestPaths("2024-01-01") ++ manifestPaths("2024-01-02")
    val external = spark.read.parquet(all: _*)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(external == Set((1L, "2024-01-01", 10.0), (3L, "2024-01-02", 35.0)))
  }

  test("compaction racing upserts loses neither data nor the pointer") {
    val dir = Files.createTempDirectory("compact_race").toString
    // seed a fragmented generation
    val prior = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Sinks.upsertParquet(spark, dir,
      (1L to 200L).map(i => (i, s"v$i")).toDF("k", "v").repartition(6),
      keys = Seq("k"))
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", prior)
    // writer thread lands 3 more batches while compaction loops; every
    // compaction commit must re-validate its base under the lock, so a
    // mid-flight upsert only costs it a retry, never a lost row
    val writer = new Thread(() =>
      (1 to 3).foreach { i =>
        Sinks.upsertParquet(spark, dir,
          Seq((200L + i, s"new$i")).toDF("k", "v"), Seq("k"),
          maxRetries = 30)
      })
    val compactor = new Thread(() =>
      (1 to 3).foreach { _ =>
        Sinks.compactUpsertTable(spark, dir, targetBytes = 1L << 30,
          maxRetries = 30, keepGenerations = 10)
      })
    writer.start(); compactor.start()
    writer.join(180000); compactor.join(180000)
    val out = Sinks.readUpsertTable(spark, dir)
    assert(out.count() == 203,
      "all seeded + raced rows survive compaction")
    assert(out.filter(col("k") > 200L).count() == 3)
    import java.nio.file.{Files => NF, Paths}
    assert(!NF.exists(Paths.get(dir, "_LOCK")), "lock released")
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith("_txn-")), "stages cleaned")
  }

  test("compactUpsertTable: fewer files, same rows, old generation travels") {
    val dir = Files.createTempDirectory("compact").toFile.getAbsolutePath
    val t = s"$dir/tbl"
    val data = (1L to 500L).map(i => (i, s"v$i")).toDF("k", "v")
    // AQE would coalesce the tiny seed to one file — hold it off so the
    // table starts fragmented, like a table after many small upserts
    val prior = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try Sinks.upsertParquet(spark, t, data.repartition(8), keys = Seq("k"))
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", prior)
    val before = spark.read.parquet(s"$t/gen-0")
    // huge target => everything packs into one file
    val (nb, na) = Sinks.compactUpsertTable(spark, t, targetBytes = 1L << 30)
    assert(nb > 1 && na == 1, s"expected 8ish -> 1, got $nb -> $na")
    val cur = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$t/_CURRENT")).trim
    assert(cur == "gen-1", "compaction commits a NEW generation")
    val after = spark.read.parquet(s"$t/gen-1")
    assert(after.inputFiles.length == 1)
    assert(after.orderBy("k").collect().toSeq ==
      before.orderBy("k").collect().toSeq, "content unchanged")
    // time travel still reads the pre-compaction generation
    assert(Sinks.readUpsertTableAt(spark, t, 0).count() == 500)
    // idempotent: a second run is a no-op
    assert(Sinks.compactUpsertTable(spark, t, targetBytes = 1L << 30)
      == ((1, 1)))
  }

  test("upsertParquet evolveSchema: a drifted batch widens the table") {
    val dir = Files.createTempDirectory("evolve").toFile.getAbsolutePath
    val t = s"$dir/tbl"
    Sinks.upsertParquet(spark, t, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      keys = Seq("k"))
    // same batch WITHOUT the flag still fails loudly (no silent drift)
    val drifted = Seq((2L, "B", 7L), (3L, "C", 9L)).toDF("k", "v", "extra")
    intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, t, drifted, keys = Seq("k"))
    }
    // a batch MISSING the key column must fail loudly even with
    // evolution on — null-filled keys would silently discard the batch
    intercept[IllegalArgumentException] {
      Sinks.upsertParquet(spark, t, drifted.drop("k"), keys = Seq("k"),
        evolveSchema = true)
    }
    Sinks.upsertParquet(spark, t, drifted, keys = Seq("k"),
      evolveSchema = true)
    val back = spark.read.parquet(s"$t/gen-1").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(back.toSeq == Seq(
      (1L, "a", None), (2L, "B", Some(7L)), (3L, "C", Some(9L))))
  }

  test("zValue interleaves bits; writeZOrdered clusters BOTH dimensions") {
    // zValue: cell bits interleave — (x=0b11, y=0b00) -> 0b0101 = 5
    val z = Seq((3L, 0L)).toDF("a", "b")
      .select(Sinks.zValue(Seq(col("a"), col("b")), bitsPer = 2).as("z"))
      .head().getLong(0)
    assert(z == 5L)

    // 64x64 grid; y is a decorrelated permutation of x's range
    val grid = (0 until 4096)
      .map(i => (i.toLong, (i % 64).toLong, ((i / 64) * 37 % 64).toLong))
      .toDF("id", "x", "y")
    val dir = Files.createTempDirectory("zorder").toFile.getAbsolutePath

    def avgSpans(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && f.getName.startsWith("part-"))
        .map(_.getAbsolutePath)
      assert(files.length > 1, "expected multiple files")
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")))
          .head()
        (r.getLong(0).toDouble, r.getLong(1).toDouble)
      }
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }

    Sinks.writeZOrdered(grid, Seq("x", "y"), s"$dir/z", numFiles = 16,
      bitsPer = 6)
    val (zx, zy) = avgSpans(s"$dir/z")

    // baseline: single-column sort clusters x but leaves y unpruned
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(s"$dir/xsort")
    val (_, sy) = avgSpans(s"$dir/xsort")

    // z-order: every file spans a bounded cell in BOTH dims (16 files on
    // a 64x64 grid ≈ 16-wide cells); x-sort leaves y at ~full range
    assert(zx < 32.0 && zy < 32.0,
      s"z-order should bound both dims: x=$zx y=$zy")
    assert(sy > 48.0, s"x-sorted baseline should leave y wide: $sy")
    assert(zy < sy / 2, "z-order must beat single-column sort on dim 2")

    // layout only — content round-trips exactly
    val back = spark.read.parquet(s"$dir/z")
    assert(back.columns.toSeq == Seq("id", "x", "y"), "helper cols dropped")
    assert(back.count() == 4096)
  }

  /** Minimal ustar reader for the round-trip assertion: walks 512-byte
    * headers, octal size field, returns (name, bytes) per entry.
    */
  private def readTar(f: java.nio.file.Path): Seq[(String, Array[Byte])] = {
    val bytes = java.nio.file.Files.readAllBytes(f)
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= bytes.length && bytes(off) != 0) {
      val name = new String(bytes, off, 100, "UTF-8").takeWhile(_ != 0)
      val sizeStr = new String(bytes, off + 124, 12, "UTF-8")
        .takeWhile(c => c != 0 && c != ' ')
      val size = java.lang.Long.parseLong(sizeStr, 8).toInt
      // ustar magic sanity on every header
      assert(new String(bytes, off + 257, 5, "UTF-8") == "ustar", name)
      out += name -> bytes.slice(off + 512, off + 512 + size)
      off += 512 + ((size + 511) / 512) * 512
    }
    out.result()
  }

  test("writeTarShards: WebDataset samples round-trip; shard bytes are " +
    "partitioning-invariant") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"text of doc $i", s"""{"id":$i}""")).toDF("id", "txt", "meta")
    val dir = java.nio.file.Files.createTempDirectory("wds").toString
    graft.sources.Sinks.writeTarShards(docs, col("id"),
      Seq("txt" -> col("txt"), "json" -> col("meta")), s"$dir/a",
      numShards = 4)
    val shards = new java.io.File(s"$dir/a").listFiles()
      .filter(_.getName.endsWith(".tar")).sortBy(_.getName)
    assert(shards.nonEmpty && shards.length <= 4)
    val entries = shards.flatMap(f => readTar(f.toPath)).toSeq
    // every sample contributes its full entry group, grouped by basename
    assert(entries.length == 80, s"40 samples x 2 entries: ${entries.length}")
    val byName = entries.toMap
    (1L to 40L).foreach { i =>
      assert(new String(byName(s"$i.txt"), "UTF-8") == s"text of doc $i")
      assert(new String(byName(s"$i.json"), "UTF-8") == s"""{"id":$i}""")
    }
    // same data, different input partitioning -> byte-identical shards
    graft.sources.Sinks.writeTarShards(docs.repartition(7), col("id"),
      Seq("txt" -> col("txt"), "json" -> col("meta")), s"$dir/b",
      numShards = 4)
    shards.foreach { f =>
      val other = java.nio.file.Paths.get(s"$dir/b", f.getName)
      assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.file.Files.readAllBytes(other)),
        s"${f.getName} must be reproducible byte-for-byte")
    }
    // the shard manifest names every shard with its sample count
    val man = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/a", "_manifest.json")))
    assert(man.get("total_samples").asLong == 40L &&
      man.get("entries_per_sample").asInt == 2)
    import scala.jdk.CollectionConverters._
    val manShards = man.get("shards").elements().asScala
      .map(s => s.get("shard").asText() -> s.get("samples").asLong()).toMap
    assert(manShards.keySet == shards.map(_.getName).toSet)
    assert(manShards.values.sum == 40L)
    shards.foreach { f =>
      assert(readTar(f.toPath).size.toLong ==
        manShards(f.getName) * 2, s"${f.getName} entry count vs manifest")
    }

    // a rerun with FEWER samples pre-cleans stale shard files (an empty
    // shard writes nothing — a leftover would silently join the output)
    graft.sources.Sinks.writeTarShards(docs.limit(1), col("id"),
      Seq("txt" -> col("txt")), s"$dir/a", numShards = 4)
    val after = new java.io.File(s"$dir/a").listFiles()
      .filter(_.getName.endsWith(".tar"))
    assert(after.length == 1 &&
      after.flatMap(f => readTar(f.toPath)).length == 1,
      "stale shards from the larger run must be gone")
  }

  test("deltaHistory lists commits with operations and row counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hist").toString + "/t"
    graft.sources.Sinks.upsertParquet(spark, dir,
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v"), Seq("k"))
    graft.sources.Sinks.upsertParquet(spark, dir,
      Seq((3L, 3.0)).toDF("k", "v"), Seq("k"))
    val h = graft.sources.Sinks.deltaHistory(spark, dir)
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(h.forall(_.getString(2) == "MERGE"))
    assert(h(0).getLong(5) == 2L && h(1).getLong(5) == 3L,
      "rows_added from logged stats")
    assert(h.forall(r => r.getLong(3) > 0), "files_added positive")
  }
}
