package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Sinks

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("overwritePartitions replaces only touched partitions") {
    val dir = Files.createTempDirectory("graft_pt").toString
    val v1 = Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("ymd", "v")
    Sinks.overwritePartitions(v1, dir, Seq("ymd"))
    // overwrite only day 2 with new value
    val v2 = Seq(("2024-01-02", 99)).toDF("ymd", "v")
    Sinks.overwritePartitions(v2, dir, Seq("ymd"))
    // partition values come back type-inferred (DATE) — compare as strings
    val out = spark.read.parquet(dir).orderBy("ymd").collect()
      .map(r => (String.valueOf(r.getAs[Any]("ymd")), r.getAs[Int]("v")))
    assert(out.toSeq == Seq(("2024-01-01", 1), ("2024-01-02", 99)))
  }

  test("overwritePartitions short-circuits empty batches") {
    val dir = Files.createTempDirectory("graft_pt2").toString
    val v1 = Seq(("2024-01-01", 1)).toDF("ymd", "v")
    Sinks.overwritePartitions(v1, dir, Seq("ymd"))
    Sinks.overwritePartitions(v1.filter(col("v") < 0), dir, Seq("ymd"))
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("dualLoad runs strict sink first and skips analytics on failure") {
    val df = Seq(1, 2, 3).toDF("x")
    val okResults = Sinks.dualLoad(df, _ => (), _ => ())
    assert(okResults.forall(_.success))
    assert(okResults.map(_.sink) == Seq("strict", "analytics"))
    val failResults = Sinks.dualLoad(df,
      _ => throw new RuntimeException("constraint violation"), _ => ())
    assert(!failResults.head.success)
    assert(!failResults(1).success)
    assert(failResults(1).error.exists(_.contains("skipped")))
  }

  test("exportByKey writes one directory per key value") {
    val dir = Files.createTempDirectory("graft_exp").toString
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    Sinks.exportByKey(df, "k", dir)
    val sub = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("k=")).sorted
    assert(sub.toSeq == Seq("k=a", "k=b"))
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("JDBC stagedMerge: round-trip with strategies against embedded Derby") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    import graft.sources.JdbcSink
    import graft.operators.MergeOps
    val b1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    assert(JdbcSink.stagedMerge(b1, url, "tgt", Seq("k")) == 2)
    // second batch: k=2 updated (Greatest keeps 20.0, Replace takes name), k=3 inserted
    val b2 = Seq((2L, "b2", 5.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    JdbcSink.stagedMerge(b2, url, "tgt", Seq("k"),
      Map("v" -> MergeOps.Greatest, "name" -> MergeOps.Replace))
    val out = spark.read.jdbc(url, "tgt", new java.util.Properties)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 20.0), (3L, "c", 30.0)))
    // staging table must be gone
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "TGT_STG", null)
      try assert(!rs.next(), "staging table must be dropped") finally rs.close()
    } finally conn.close()
  }

  test("JDBC onConflictSql renders the Postgres dialect") {
    import graft.sources.JdbcSink
    import graft.operators.MergeOps
    val sql = JdbcSink.onConflictSql("t", "t_stg", Seq("k"), Seq("v"),
      Map("v" -> MergeOps.SourceFirst), MergeOps.SourceFirst)
    assert(sql.contains("ON CONFLICT (\"k\")"))
    assert(sql.contains("COALESCE(EXCLUDED.\"v\", t.\"v\")"))
  }

  test("rebuildPartitionsBatched rejects out-of-range batches before writing") {
    import java.time.LocalDate
    val dir = Files.createTempDirectory("graft_d7").toString
    def day(s: String) = java.sql.Date.valueOf(s)
    val base = Seq((day("2024-01-01"), 1), (day("2024-01-02"), 2),
      (day("2024-02-01"), 3)).toDF("ymd", "v")
    // batch 1 valid (Jan), batch 2 declares Feb but smuggles a Jan row
    val r = Sinks.rebuildPartitionsBatched(dir, "ymd", Seq(
      (LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 31),
        base.filter(col("ymd") < lit(day("2024-02-01")))),
      (LocalDate.of(2024, 2, 1), LocalDate.of(2024, 2, 29),
        base.filter(col("ymd") >= lit(day("2024-01-02"))))))
    assert(r.head.success && r.head.count == 2)
    assert(!r(1).success && r(1).error.exists(_.contains("outside declared")))
    // only the valid batch landed
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("rebuildPartitionsBatched rejects NULL dates (default-partition guard)") {
    import java.time.LocalDate
    val dir = Files.createTempDirectory("graft_d7n").toString
    val withNull = Seq((Option(java.sql.Date.valueOf("2024-01-01")), 1),
      (Option.empty[java.sql.Date], 2)).toDF("ymd", "v")
    val r = Sinks.rebuildPartitionsBatched(dir, "ymd", Seq(
      (LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 31), withNull)))
    assert(!r.head.success && r.head.error.exists(_.contains("outside declared")))
  }

  test("export writes parquet, csv with header, json lines, and orc") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val base = Files.createTempDirectory("graft_exp2").toString
    Sinks.export(df, s"$base/p")
    Sinks.export(df, s"$base/c", "csv")
    Sinks.export(df, s"$base/j", "json")
    Sinks.export(df, s"$base/o", "orc")
    assert(spark.read.parquet(s"$base/p").count() == 2)
    val csv = spark.read.option("header", "true").csv(s"$base/c")
    assert(csv.columns.toSeq == Seq("k", "v") && csv.count() == 2)
    assert(spark.read.json(s"$base/j").count() == 2)
    // orc round-trips names/types AND values via the Readers-side scan
    // (nullability widens on read — a storage artifact, same as parquet)
    val orc = graft.sources.Readers.orc(spark, s"$base/o")
    assert(orc.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(orc.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException](Sinks.export(df, s"$base/x", "xml"))
  }

  test("assertUniqueKeys passes unique input, rejects duplicates with samples") {
    val ok = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Sinks.assertUniqueKeys(ok, Seq("k"))
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val e = intercept[IllegalStateException](Sinks.assertUniqueKeys(dup, Seq("k")))
    assert(e.getMessage.contains("duplicate keys"))
    // dualLoad integration: strict sink failure skips the analytics sink
    val res = Sinks.dualLoad(dup,
      b => Sinks.assertUniqueKeys(b, Seq("k")), _ => ())
    assert(!res.head.success && res(1).error.exists(_.contains("skipped")))
  }

  test("multimodal plumbing: schema, determinism, batched decode") {
    val media = Multimodal.fromDocuments(Tables.documents(spark, sf001).limit(20))
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.schema == Multimodal.featureSchema)
    assert(feats.count() == 20)
    val r1 = feats.orderBy("media_id").collect()
    val r2 = Multimodal.extractFeatures(spark, media).orderBy("media_id").collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq, "decode must be deterministic")
    assert(r1.forall(_.getAs[Seq[Float]]("feature").length == 8))
    assert(r1.forall(r => r.getAs[Int]("n_bytes") > 0))
    // text payloads are not decodable images → decode columns stay null
    assert(r1.forall(_.isNullAt(r1.head.fieldIndex("decoded_width"))))
  }

  test("multimodal: real PNG decode via javax.imageio round-trips exactly") {
    // unit round trip: encode a known gradient, decode, check the closed form
    val png = Multimodal.syntheticPng(20, 10)
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), "real PNG magic")
    assert(Multimodal.decodeImage(png).contains((20, 10, 20L * 10 * 28 / 2)))
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    // distributed: image rows get real payloads and decode to the formula
    val media = Multimodal.withMediaPayloads(
      Multimodal.fromDocuments(Tables.documents(spark, sf001).limit(30)))
    val feats = Multimodal.extractFeatures(spark, media)
      .filter($"media_type" === "image").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val (w, h) = (id % 96 + 16, id % 64 + 16)
      assert(r.getAs[Long]("decoded_width") == w)
      assert(r.getAs[Long]("decoded_height") == h)
      assert(r.getAs[Long]("pixel_sum") == w * h * (w + h - 2) / 2)
    }
  }

  test("multimodal: real WAV decode via javax.sound round-trips exactly") {
    def sawSum(n: Long): Long = {
      val (p, r) = (n / 200, n % 200)
      -100 * p + r * (r - 1) / 2 - 100 * r
    }
    // unit round trip: RIFF magic, then decode matches the closed form
    val wav = Multimodal.syntheticWav(450)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF", "real WAV header")
    assert(Multimodal.decodeAudio(wav).contains((8000L, 450L, sawSum(450))))
    // exact one-period check: sums to -100 per full period
    assert(Multimodal.decodeAudio(Multimodal.syntheticWav(400))
      .contains((8000L, 400L, -200L)))
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
    // distributed: audio rows get real payloads and decode to the formula
    val media = Multimodal.withMediaPayloads(
      Multimodal.fromDocuments(Tables.documents(spark, sf001).limit(30)))
    val feats = Multimodal.extractFeatures(spark, media)
      .filter($"media_type" === "audio").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = id % 4000 + 100
      assert(r.getAs[Long]("sample_rate") == 8000L)
      assert(r.getAs[Long]("n_frames") == n)
      assert(r.getAs[Long]("sample_sum") == sawSum(n))
      // image columns stay null on audio rows
      assert(r.isNullAt(r.fieldIndex("decoded_width")))
    }
  }

  test("multimodal: real MP4/AVI container-metadata decode round-trips exactly") {
    // MP4: box skeleton parses back to the declared dims + duration
    val mp4 = Multimodal.syntheticMp4(640, 360, 12345L)
    assert(mp4.length == 240, "fixed-length box skeleton")
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp", "real MP4 magic")
    assert(Multimodal.decodeVideoMeta(mp4).contains(("mp4", 640, 360, 12345L)))
    // AVI: RIFF main header parses back; duration = us/frame * frames
    val avi = Multimodal.syntheticAvi(320, 240, nFrames = 100)
    assert(avi.length == 88)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    assert(Multimodal.decodeVideoMeta(avi).contains(("avi", 320, 240, 4000L)))
    // corrupt/foreign bytes: honest None, never an exception
    assert(Multimodal.decodeVideoMeta("not a video".getBytes).isEmpty)
    assert(Multimodal.decodeVideoMeta(mp4.take(30)).isEmpty, "torn box")
    assert(Multimodal.decodeVideoMeta(Multimodal.syntheticPng(8, 8)).isEmpty)
    // distributed: video rows get real container payloads; dims/duration
    // decode to the id formulas, frame features stay the labeled stub
    val media = Multimodal.withVideoPayloads(Multimodal.withMediaPayloads(
      Multimodal.fromDocuments(Tables.documents(spark, sf001).limit(30))))
    val feats = Multimodal.extractFeatures(spark, media)
      .filter($"media_type" === "video").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[String]("video_container") ==
        (if (id % 2 == 0) "mp4" else "avi"))
      assert(r.getAs[Long]("decoded_width") == id % 320 + 32)
      assert(r.getAs[Long]("decoded_height") == id % 240 + 32)
      assert(r.getAs[Long]("video_duration_ms") ==
        (if (id % 2 == 0) id % 5000 + 500 else 40 * (id % 250 + 25)))
      assert(r.isNullAt(r.fieldIndex("pixel_sum")) &&
        r.isNullAt(r.fieldIndex("sample_rate")), "image/audio columns null")
      assert(!r.isNullAt(r.fieldIndex("feature")), "stub features present")
    }
  }

  test("partitioned upsert rejects a high-cardinality partition column loudly") {
    val dir = Files.createTempDirectory("graft_cap").toString + "/t"
    val batch = spark.range(0, 50).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("p"), col("id").as("v"))
    val e = intercept[IllegalArgumentException] {
      Sinks.upsertParquetPartitioned(spark, dir, batch, Seq("k"), "p",
        maxPartitions = 10)
    }
    assert(e.getMessage.contains("more than 10 distinct"),
      s"loud cardinality error: ${e.getMessage}")
    // the documented escape hatch
    Sinks.upsertParquetPartitioned(spark, dir, batch, Seq("k"), "p",
      maxPartitions = 100)
    assert(Sinks.readUpsertPartitionedTable(spark, dir).count() == 50)
  }

  test("writeTrainingShards: one pos-ordered file per shard, permutation replays") {
    import graft.operators.Sampling
    val dir = Files.createTempDirectory("graft_shards").toString
    val df = (0L until 300L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val sharded = Sampling.shuffleShard(df, col("doc_id"), numShards = 4)
    Sinks.writeTrainingShards(sharded, dir)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 4)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: one file per shard")
      // a loader streaming the single file replays pos order with no sort
      val pos = spark.read.parquet(files.head.toString)
        .select("pos").collect().map(_.getLong(0))
      assert(pos.sameElements(pos.sorted), s"${d.getName} not pos-ordered")
      assert(pos.sameElements(0L until pos.length.toLong), "dense positions")
    }
    // every row lands exactly once across the shard files
    assert(spark.read.parquet(dir).select("doc_id").distinct().count() == 300)
  }

  test("imagePHash: resize-tolerant, content-sensitive; near-dup pairs " +
    "find the resized copy and skip different content") {
    import spark.implicits._
    // deterministic grayscale PNG with a programmable raster
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        r.setSample(x, y, 0, f(x, y) & 0xff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def grad(x: Int, y: Int) = (x * 2 + y) % 256
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = Multimodal.imagePHash(png(64, 64)(grad)).get
    // same content at a different size -> tiny Hamming distance
    val resized = Multimodal.imagePHash(png(128, 128)((x, y) =>
      grad(x / 2, y / 2))).get
    assert(ham(base, resized) <= 3, s"resize moved ${ham(base, resized)} bits")
    // genuinely different content -> far
    val checker = Multimodal.imagePHash(png(64, 64)((x, y) =>
      if ((x / 4 + y / 4) % 2 == 0) 255 else 0)).get
    assert(ham(base, checker) > 10, s"checker only ${ham(base, checker)} away")
    assert(ham(base, base) == 0 && Multimodal.imagePHash(
      Array[Byte](1, 2, 3)).isEmpty)
    // pair operator: banding + bounded buckets + exact Hamming verify
    val media = Seq(
      (1L, png(64, 64)(grad)),
      (2L, png(128, 128)((x, y) => grad(x / 2, y / 2))),
      (3L, png(64, 64)((x, y) => if ((x / 4 + y / 4) % 2 == 0) 255 else 0)),
      (4L, png(32, 32)((x, y) => (255 - x * 3 - y) & 0xff))
    ).toDF("media_id", "content")
    val pairs = Multimodal.imageNearDupPairs(spark, media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "the resized copy must pair")
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
      "the checkerboard pairs with nothing")
  }

  test("audioFingerprint: gain-invariant, content-sensitive; near-dup " +
    "pairs find the louder copy") {
    import spark.implicits._
    def wav(n: Int)(f: Int => Int): Array[Byte] = {
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = f(i)
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // a swelling-then-fading tone profile
    def tone(i: Int) = {
      val env = if (i < 3000) i / 30 else (6500 - i) / 35
      (math.sin(i * 0.3) * env).toInt
    }
    val base = Multimodal.audioFingerprint(wav(6500)(tone)).get
    // same audio at double volume -> IDENTICAL fingerprint
    val loud = Multimodal.audioFingerprint(wav(6500)(i => tone(i) * 2)).get
    assert(ham(base, loud) == 0, "gain must not move any bit")
    // different energy profile -> far
    val other = Multimodal.audioFingerprint(wav(6500)(i =>
      (math.sin(i * 0.3) * (if ((i / 500) % 2 == 0) 100 else 5)).toInt)).get
    assert(ham(base, other) > 10, s"other only ${ham(base, other)} away")
    assert(Multimodal.audioFingerprint(wav(100)(_ => 1)).isEmpty,
      "sub-130-sample payloads refuse")
    val media = Seq(
      (1L, wav(6500)(tone)),
      (2L, wav(6500)(i => tone(i) * 2)),
      (3L, wav(6500)(i =>
        (math.sin(i * 0.3) * (if ((i / 500) % 2 == 0) 100 else 5)).toInt))
    ).toDF("media_id", "content")
    val pairs = Multimodal.audioNearDupPairs(spark, media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"only the gain-scaled copy pairs: $pairs")
  }

  test("audioSpectralFingerprint: gain-invariant AND frequency-sensitive " +
    "where the broadband fingerprint is blind") {
    def wav(n: Int)(f: Int => Int): Array[Byte] = {
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val v = f(i)
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // identical amplitude envelope, different carrier frequency:
    // 440 Hz vs 1400 Hz at 8 kHz (0.345 vs 1.1 rad/sample)
    def env(i: Int) = if (i < 3000) i / 30 else (6500 - i) / 35
    def tone(om: Double)(i: Int) = (math.sin(i * om) * env(i)).toInt
    val low = Multimodal.audioSpectralFingerprint(wav(6500)(tone(0.345))).get
    val high = Multimodal.audioSpectralFingerprint(wav(6500)(tone(1.1))).get
    // the broadband (single-band) fingerprint cannot tell them apart —
    // that blindness is exactly what the spectral form fixes
    val bbLow = Multimodal.audioFingerprint(wav(6500)(tone(0.345))).get
    val bbHigh = Multimodal.audioFingerprint(wav(6500)(tone(1.1))).get
    assert(ham(bbLow, bbHigh) <= 4,
      s"broadband is envelope-only (sanity): ${ham(bbLow, bbHigh)}")
    assert(ham(low, high) > 10,
      s"spectral must separate the carriers: ${ham(low, high)}")
    // gain invariance: double volume -> identical signature
    val loud = Multimodal.audioSpectralFingerprint(
      wav(6500)(i => tone(0.345)(i) * 2)).get
    assert(ham(low, loud) == 0, "gain must not move any bit")
    // deterministic; refuses non-audio and too-short clips
    assert(Multimodal.audioSpectralFingerprint(wav(6500)(tone(0.345)))
      .contains(low))
    assert(Multimodal.audioSpectralFingerprint("junk".getBytes).isEmpty)
    assert(Multimodal.audioSpectralFingerprint(wav(300)(_ => 5)).isEmpty)
    // plugs into the generic hash-pair machinery as a hasher
    val media = Seq((1L, wav(6500)(tone(0.345))),
      (2L, wav(6500)(i => tone(0.345)(i) * 3)),
      (3L, wav(6500)(tone(1.1)))).toDF("media_id", "content")
    val hashes = media.collect().flatMap { r =>
      Multimodal.audioSpectralFingerprint(r.getAs[Array[Byte]](1))
        .map(h => (r.getLong(0), h))
    }.toSeq.toDF("id", "phash")
    val pairs = Multimodal.hashNearDupPairs(hashes, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"only the gain-scaled copy pairs: $pairs")
  }

  test("incrementalFrameDedup: clips sharing >= minShared near frames " +
    "reject; one shared frame is not enough") {
    val (a, b, c) = (0x1111111111111111L, 0x2222222222222222L,
      0x3333333333333333L)
    val (p, q) = (0x4444444444444444L, 0x5555555555555555L)
    val corpus = Seq((1L, a), (1L, b), (1L, c), (2L, 0x6666666666666666L))
      .toDF("video_id", "phash")
    val batch = Seq(
      (100L, a ^ 2L), (100L, b ^ 4L), (100L, 0x7777777777777777L),
      // 100 shares 2 near frames with corpus video 1 -> rejected
      (101L, p), (101L, q),              // fresh -> admitted
      (102L, p ^ 8L), (102L, q ^ 16L),   // 2 near frames of 101 -> rejected
      (103L, c ^ 2L), (103L, 0x0123456789ABCDEFL)
      // 103 shares only ONE frame with video 1 -> below minShared, admitted
    ).toDF("video_id", "phash")
    val out = graft.operators.Multimodal
      .incrementalFrameDedup(corpus, batch, maxHamming = 3, minShared = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(out(100L) == ((false, Some(1L))), s"$out")
    assert(out(101L) == ((true, None)), s"$out")
    assert(out(102L) == ((false, Some(101L))), s"$out")
    assert(out(103L) == ((true, None)), s"$out")
  }

  test("imageQualityGate: dims, aspect, and contrast rules; undecodable " +
    "rows carry null stats and keep=false") {
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        r.setSample(x, y, 0, f(x, y) & 0xff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def tex(x: Int, y: Int) =
      ((math.sin(x * 0.35) + math.sin(y * 0.28)) * 50 + 128).toInt
    val media = Seq(
      (1L, png(64, 64)(tex)),               // keeps
      (2L, png(64, 64)((_, _) => 128)),     // flat: fails contrast
      (3L, png(16, 16)(tex)),               // fails min dims
      (4L, png(200, 40)(tex)),              // aspect 5 > 4
      (5L, "not an image".getBytes)         // undecodable
    ).toDF("media_id", "content")
    val out = graft.operators.Multimodal
      .imageQualityGate(spark, media)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(5), "textured 64x64 must keep")
    assert(!out(2L).getBoolean(5) && out(2L).getDouble(4) == 0.0,
      "flat image fails the contrast floor")
    assert(!out(3L).getBoolean(5), "16x16 fails min dims")
    assert(!out(4L).getBoolean(5), "5:1 aspect fails")
    assert(!out(5L).getBoolean(5) && out(5L).isNullAt(1),
      "undecodable: null stats, keep=false")
    // stats are real: the flat image's mean is its fill value
    assert(out(2L).getDouble(3) == 128.0)
  }

  test("incrementalHashDedup: near batch signatures reject against the " +
    "corpus; within-batch near groups keep the min id") {
    val h = 0x0F0F0F0F0F0F0F0FL
    val f = 0x123456789ABCDEF0L
    val corpus = Seq((1L, h), (2L, h)).toDF("id", "phash")
    val batch = Seq(
      (100L, h ^ 2L),          // 1 bit off a corpus sig -> rejected, dup_of 1
      (101L, f),               // fresh -> admitted
      (102L, f ^ (1L << 40)),  // 1 bit off 101 -> rejected, dup_of 101
      (103L, ~h)               // far from everything -> admitted
    ).toDF("id", "phash")
    val out = graft.operators.Multimodal
      .incrementalHashDedup(corpus, batch, maxHamming = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
    assert(out(100L) == ((false, Some(1L))), s"$out")
    assert(out(101L) == ((true, None)), s"$out")
    assert(out(102L) == ((false, Some(101L))), s"$out")
    assert(out(103L) == ((true, None)), s"$out")
  }

  test("hashNearDupPairs: maxHamming=0 single-band mask keeps exact-dup " +
    "pairs past the bucket cap") {
    // 200 distinct signatures + one exact-dup pair NOT involving the
    // min id: under the (1L<<64)==1 mask bug every signature landed in
    // bucket 0, the 202-row bucket blew the cap, and the star fallback
    // (pairs around the min id only) silently lost (900, 901)
    val hashes = ((0L until 200L).map(i => (i, i * 0x9E3779B97F4A7C15L)) ++
      Seq((900L, 0x1234567890ABCDEFL), (901L, 0x1234567890ABCDEFL)))
      .toDF("id", "phash")
    val pairs = Multimodal.hashNearDupPairs(hashes, maxHamming = 0,
        maxBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((900L, 901L, 0)),
      s"exactly the exact-dup pair at hamming 0: $pairs")
  }

  test("imageDedupClusters: resized copy clusters with its original, " +
    "min id survives") {
    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        r.setSample(x, y, 0, f(x, y) & 0xff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def grad(x: Int, y: Int) = (x * 2 + y) % 256
    val media = Seq(
      (1L, png(64, 64)(grad)),
      (2L, png(128, 128)((x, y) => grad(x / 2, y / 2))),
      (3L, png(64, 64)((x, y) => if ((x / 4 + y / 4) % 2 == 0) 255 else 0))
    ).toDF("media_id", "content")
    val cl = Multimodal.imageDedupClusters(spark, media, maxHamming = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(cl(1L) == ((1L, true)), "min id labels and survives")
    assert(cl(2L) == ((1L, false)), "the resized copy joins cluster 1")
    assert(cl(3L) == ((3L, true)), "the checkerboard is its own cluster")
  }

  test("media decode is map-only by default: no shuffle before decode, " +
    "rebalance opts in") {
    // shuffle-free fixture (a parallelized local frame): any
    // ShuffledRowRDD in the lineage can only come from the operator
    val media = (1L to 20L).map(i =>
        (i, Multimodal.syntheticPng((i % 30).toInt + 16, (i % 20).toInt + 16)))
      .toDF("media_id", "content")
    val lineage = Multimodal.imageHashes(spark, media)
      .rdd.toDebugString
    assert(!lineage.contains("ShuffledRowRDD"),
      s"default decode must not shuffle the blobs:\n$lineage")
    val rebalanced = Multimodal.imageHashes(spark, media, rebalance = true)
      .rdd.toDebugString
    assert(rebalanced.contains("ShuffledRowRDD"),
      s"rebalance=true must hash-repartition:\n$rebalanced")
  }

  test("MJPEG-AVI: real frame decode round-trips; re-encoded clips pair, " +
    "different content does not") {
    // textured (spread-spectrum) frames — pHash's robust contract is
    // natural-image-like content, not flat gradients (documented
    // fragility in imagePHash's scaladoc)
    def pixel(f: Int, x: Int, y: Int) =
      ((math.sin(x * 0.35 + f) + math.sin(y * 0.28) +
        math.sin((x + y) * 0.11 + f * 0.7)) * 40 + 128).toInt
    val clip = Multimodal.syntheticMjpegAvi(64, 64, nFrames = 4, pixel)
    assert(new String(clip.take(4), "US-ASCII") == "RIFF" &&
      new String(clip.slice(8, 12), "US-ASCII") == "AVI ")
    // container metadata still parses from the full MJPG container
    assert(Multimodal.decodeVideoMeta(clip).contains(("avi", 64, 64, 160L)))
    // REAL frame decode: 4 frames at the declared dims
    val frames = Multimodal.decodeMjpegFrames(clip).get
    assert(frames.length == 4)
    assert(frames.forall(f => f.getWidth == 64 && f.getHeight == 64))
    // decoded frame content matches the source raster perceptually:
    // per-frame pHash within 3 bits of the lossless source's hash
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0 until 4).foreach { f =>
      val src = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = src.getRaster
      for (y <- 0 until 64; x <- 0 until 64)
        r.setSample(x, y, 0, pixel(f, x, y))
      val d = ham(Multimodal.pHashOfImage(frames(f)),
        Multimodal.pHashOfImage(src))
      assert(d <= 3, s"frame $f decoded ${d} bits off its source raster")
    }
    // non-MJPG payloads refuse honestly
    assert(Multimodal.decodeMjpegFrames(
      Multimodal.syntheticAvi(64, 64, 4)).isEmpty, "frameless AVI")
    assert(Multimodal.decodeMjpegFrames(
      Multimodal.syntheticMp4(64, 64, 100)).isEmpty)
    assert(Multimodal.decodeMjpegFrames("junk".getBytes).isEmpty)

    // the dedup contract: a RE-ENCODED copy (lower JPEG quality) pairs
    // with the original on frame-hash overlap; different content doesn't
    val reenc = Multimodal.syntheticMjpegAvi(64, 64, 4, pixel,
      jpegQuality = 0.6f)
    def other(f: Int, x: Int, y: Int) =
      ((math.sin(x * 0.9 + 2 * f) * math.sin(y * 0.8)) * 90 + 128).toInt
    val media = Seq(
      (1L, clip), (2L, reenc),
      (3L, Multimodal.syntheticMjpegAvi(64, 64, 4, other))
    ).toDF("media_id", "content")
    val pairs = Multimodal.videoNearDupPairs(spark, media,
        maxHamming = 3, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"only the re-encoded copy pairs: $pairs")

    // extractFeatures: the MJPG clip's feature is the REAL pixel-pooled
    // vector, not the byte-histogram stub
    val feats = Multimodal.extractFeatures(spark,
        media.select($"media_id", lit("video").as("media_type"),
          $"content"))
      .orderBy("media_id").collect()
    val stub = Multimodal.decodeStub(clip, 8).toSeq
    def feat(i: Int): Seq[Float] =
      feats(i).getSeq[Float](feats(i).fieldIndex("feature")).toSeq
    assert(feat(0) != stub, "MJPG feature must not be the stub")
    // pixel-pooled features of the two encodings of the SAME content
    // nearly coincide (JPEG artifacts only); the stub's byte histograms
    // of different encodings would not
    val fa = feat(0)
    val fb = feat(1)
    assert(fa.zip(fb).forall { case (a, b) => math.abs(a - b) < 0.02 },
      s"re-encoded pooled features must nearly coincide: $fa vs $fb")
  }
}
