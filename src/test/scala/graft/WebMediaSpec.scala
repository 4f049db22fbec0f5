package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis}
import graft.sources.Warc

/** Round-8 web/media surface: WARC scan, GIF frame decode (cross-
  * container video near-dup), constellation landmarks (time-shift-
  * invariant audio matching), domain blocklist filtering.
  */
class WebMediaSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- WARC ----------------

  private def warcFixtureBytes(gz: Boolean): Array[Byte] = {
    val recs = Seq(
      ("https://a.example.com/1", "2026-01-01T00:00:00Z",
        "hello warc".getBytes("UTF-8")),
      ("https://b.example.com/2", "2026-01-02T00:00:00Z",
        "second page é".getBytes("UTF-8")),
      ("https://c.example.com/3", "2026-01-03T00:00:00Z",
        Array.fill[Byte](5000)('x'.toByte)))
    if (gz) Warc.gzipWarcBytes(recs.iterator)
    else {
      val bos = new java.io.ByteArrayOutputStream()
      recs.foreach { case (u, d, b) => Warc.writeResponseRecord(bos, u, d, b) }
      bos.toByteArray
    }
  }

  test("warc scan reads plain and gzipped files; documents() decodes bodies") {
    val dir = Files.createTempDirectory("graft_warc").toString
    Files.write(java.nio.file.Paths.get(s"$dir/part-0.warc"),
      warcFixtureBytes(gz = false))
    Files.write(java.nio.file.Paths.get(s"$dir/part-1.warc.gz"),
      warcFixtureBytes(gz = true))
    val out = Warc.scan(spark, s"$dir/*").collect()
    assert(out.length == 6) // 3 records × 2 files
    assert(out.forall(_.getString(1) == "response"))
    assert(out.forall(_.getInt(5) == 200))
    val docs = Warc.documents(spark, s"$dir/*")
      .orderBy("url").collect()
    assert(docs.length == 6)
    assert(docs(0).getString(0) == "https://a.example.com/1")
    assert(docs(0).getString(3) == "hello warc")
    assert(docs(2).getString(3) == "second page é") // UTF-8 survives
    assert(docs(4).getString(3).length == 5000)
  }

  test("warc parser fails loudly on a truncated block") {
    val whole = warcFixtureBytes(gz = false)
    val torn = java.util.Arrays.copyOf(whole, whole.length - 2000)
    val ex = intercept[Exception] {
      Warc.records(new java.io.ByteArrayInputStream(torn)).toList
    }
    assert(ex.isInstanceOf[java.io.EOFException] ||
      ex.getMessage.contains("WARC"))
  }

  test("warc roundTrip reproduces (url, date, status, text) exactly") {
    val triples = Seq(
      (7L, "https://x.example.com/7", "2026-02-01T00:00:00Z", "alpha beta"),
      (8L, "https://y.example.com/8", "2026-02-02T00:00:00Z", "gamma"))
      .toDF("id", "url", "warc_date", "text")
      .select(col("url"), col("warc_date"),
        encode(col("text"), "UTF-8").as("body"))
    val out = Warc.roundTrip(spark, triples).orderBy("url").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "https://x.example.com/7")
    assert(out(0).getInt(2) == 200)
    assert(out(0).getString(3) == "alpha beta")
  }

  test("curatedDocuments: WARC → blocklist → url dedup → boilerplate → gopher, end to end") {
    // body lines are page-unique (only "subscribe now" is domain-wide)
    def page(tail: String) =
      (s"$tail story: the quick brown fox and the lazy dog ran with " +
        "many other animals over the hills and far away in the morning " +
        s"light\nsubscribe now\nmore about $tail").getBytes("UTF-8")
    val recs = Seq(
      ("https://good.site.com/a?utm_source=x", "2026-01-01T00:00:00Z",
        page("alpha tail")),
      ("https://good.site.com/a", "2026-01-01T00:01:00Z",
        page("alpha tail")), // canonical dup of the first
      ("https://good.site.com/b", "2026-01-01T00:02:00Z", page("beta tail")),
      ("https://good.site.com/c", "2026-01-01T00:03:00Z", page("gamma tail")),
      ("https://spam.bad.org/x", "2026-01-01T00:04:00Z", page("spam tail")))
    val dir = Files.createTempDirectory("graft_warc_cur").toString
    val bos = new java.io.ByteArrayOutputStream()
    recs.foreach { case (u, d, b) => Warc.writeResponseRecord(bos, u, d, b) }
    Files.write(java.nio.file.Paths.get(s"$dir/crawl-0.warc"), bos.toByteArray)
    val blocklist = Seq("bad.org").toDF("domain")
    val out = Warc.curatedDocuments(spark, s"$dir/*.warc", blocklist,
      minWords = 5).collect()
    val urls = out.map(_.getAs[String]("url")).toSet
    assert(!urls.exists(_.contains("bad.org")), "blocked domain must be gone")
    assert(urls.count(_.contains("/a")) == 1, "canonical dups collapse to one")
    assert(out.length == 3, s"4 good pages − 1 dup = 3, got ${out.length}")
    assert(out.forall(r => !r.getAs[String]("text").contains("subscribe now")),
      "domain-wide boilerplate line must be removed")
    assert(out.forall(_.getAs[Boolean]("keep")),
      "prose pages must pass the gopher gate")
    assert(out.forall(_.getAs[Long]("n_removed") == 1L))
  }

  test("curatedDocuments extracts HTML payloads before curation") {
    val html = ("<html><head><script>tracker();</script></head><body>" +
      "<p>the quick brown fox and the lazy dog ran with many other " +
      "animals over the hills &amp; far away</p></body></html>")
      .getBytes("UTF-8")
    val dir = Files.createTempDirectory("graft_warc_html").toString
    val bos = new java.io.ByteArrayOutputStream()
    Warc.writeResponseRecord(bos, "https://h.com/p",
      "2026-01-01T00:00:00Z", html)
    Files.write(java.nio.file.Paths.get(s"$dir/c.warc"), bos.toByteArray)
    val none = Seq.empty[String].toDF("domain")
    val out = Warc.curatedDocuments(spark, s"$dir/*.warc", none,
      minWords = 5).collect()
    assert(out.length == 1)
    val text = out(0).getAs[String]("text")
    assert(!text.contains("<") && !text.contains("tracker") &&
      text.contains("hills & far away"))
    val rawOut = Warc.curatedDocuments(spark, s"$dir/*.warc", none,
      minWords = 5, htmlPayload = false).collect()
    assert(rawOut(0).getAs[String]("text").contains("<p>"))
  }

  // ---------------- GIF frames ----------------

  private def framePixel(f: Int, x: Int, y: Int): Int =
    ((x * 3 + y * 5 + f * 17) % 251)

  test("decodeGifFrames round-trips a synthetic animated GIF") {
    val gif = Multimodal.syntheticGif(48, 32, 5, framePixel)
    val frames = Multimodal.decodeGifFrames(gif)
    assert(frames.isDefined && frames.get.length == 5)
    assert(frames.get.head.getWidth == 48 && frames.get.head.getHeight == 32)
    // non-GIF bytes: honest None, not an exception
    assert(Multimodal.decodeGifFrames(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.decodeGifFrames(
      Multimodal.syntheticPng(16, 16)).isEmpty)
  }

  test("cross-container video near-dup: GIF and MJPEG-AVI of the same frames pair") {
    val gif = Multimodal.syntheticGif(64, 48, 6, framePixel)
    val avi = Multimodal.syntheticMjpegAvi(64, 48, 6, framePixel)
    val other = Multimodal.syntheticGif(64, 48, 6,
      (f, x, y) => ((x * x + y * 7 + f * 31) % 241))
    val media = Seq(
      (1L, "video", gif), (2L, "video", avi), (3L, "video", other))
      .toDF("media_id", "media_type", "content")
    val pairs = Multimodal.videoNearDupPairs(spark, media,
      maxHamming = 8, minShared = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"GIF/AVI re-encodes of the same frames must pair; got ${pairs.toList}")
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L),
      "different content must not pair")
  }

  test("gif frames feed extractFeatures with a REAL pooled feature") {
    val gif = Multimodal.syntheticGif(32, 32, 4, framePixel)
    val media = Seq((5L, "video", gif)).toDF("media_id", "media_type", "content")
    val feats = Multimodal.extractFeatures(spark, media, dim = 8).collect()
    assert(feats.length == 1)
    val v = feats(0).getSeq[Float](3)
    assert(v.length == 8 && v.exists(_ != 0.0f))
  }

  // ---------------- constellation landmarks ----------------

  /** Tone clip whose dominant band hops pseudo-randomly every 256
    * samples (aperiodic, seed-keyed — unrelated seeds share no band
    * SEQUENCE, so cross-clip votes cannot cohere at any one offset).
    */
  private def toneSamples(n: Int, seed: Int): Array[Short] = {
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val seg = i / 256
      var z = seg * 0x9E3779B97F4A7C15L + seed * 0xBF58476D1CE4E5B9L
      z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
      val f = 400.0 + (z & 7) * 350.0
      out(i) = (8000.0 * math.sin(2.0 * math.Pi * f * i / 8000.0)).toShort
      i += 1
    }
    out
  }

  test("audioLandmarks: shifted copy matches at the shift offset; different audio does not") {
    val a = toneSamples(16384, seed = 1)
    val shiftHops = 16 // 16 × 128-sample hops = 2048 samples of silence
    val shifted = new Array[Short](2048 + a.length)
    System.arraycopy(a, 0, shifted, 2048, a.length)
    val b = toneSamples(16384, seed = 2)
    val media = Seq(
      (1L, Multimodal.syntheticWavFromSamples(a)),
      (2L, Multimodal.syntheticWavFromSamples(shifted)),
      (3L, Multimodal.syntheticWavFromSamples(b)))
      .toDF("media_id", "content")
    val pairs = Multimodal.audioMatchPairs(spark, media, minVotes = 1,
      maxKeyFreq = 1 << 20).collect()
    val m12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(m12.isDefined, s"shifted copy must match; got ${pairs.toList}")
    assert(m12.get.getInt(3) == shiftHops,
      s"winning offset must equal the shift (${m12.get.getInt(3)} != $shiftHops)")
    val trueVotes = m12.get.getLong(2)
    assert(trueVotes >= 50, s"true match must vote heavily, got $trueVotes")
    // unrelated clips can coincide on a few landmark keys (the key
    // space is small by design) but their votes cannot COHERE at one
    // offset: require a wide separation — the margin any production
    // minVotes sits inside
    val spurious = pairs.filter(r =>
      r.getLong(1) == 3L || r.getLong(0) == 3L).map(_.getLong(2))
    assert(spurious.forall(_ <= trueVotes / 4),
      s"unrelated votes must stay far below the true match " +
        s"($trueVotes vs ${spurious.toList})")
  }

  test("one-signature spectral fingerprint is shift-SENSITIVE where landmarks are not") {
    val a = toneSamples(16384, seed = 1)
    val shifted = new Array[Short](2048 + a.length)
    System.arraycopy(a, 0, shifted, 2048, a.length)
    val fa = Multimodal.audioSpectralFingerprint(
      Multimodal.syntheticWavFromSamples(a)).get
    val fs = Multimodal.audioSpectralFingerprint(
      Multimodal.syntheticWavFromSamples(shifted)).get
    // the windows slide under the shift: distance grows well past a
    // near-dup threshold — documenting WHY the constellation exists
    assert(java.lang.Long.bitCount(fa ^ fs) > 3)
  }

  test("landmarkMatchPairs drops stopword keys past maxKeyFreq") {
    // key 1 hits every clip (stopword); key 100+i is distinctive
    val rows = (0L until 10L).flatMap(i => Seq(
      (i, 1, 0), (i, 1, 1), (i, 1, 2), (i, 1, 3), (i, 1, 4),
      (i, 100 + i.toInt, 3)))
    val lm = rows.toDF("id", "lkey", "toff")
    val all = Multimodal.landmarkMatchPairs(lm, minVotes = 1,
      maxKeyFreq = 1 << 20).collect()
    assert(all.nonEmpty) // stopword key manufactures pairs when uncapped
    val pruned = Multimodal.landmarkMatchPairs(lm, minVotes = 1,
      maxKeyFreq = 4).collect()
    assert(pruned.isEmpty, "common-key votes must vanish under the cap")
  }

  test("stored landmark index: probe equals in-memory matcher on cross pairs, bucket-pruned") {
    // corpus: 40 clips × 30 landmarks; batch: 3 clips, one a shifted
    // copy of corpus clip 7 (same keys, toff+5)
    val corpus = (0L until 40L).flatMap(id => (0 until 30).map(j =>
      (id, ((id * 31 + j * 17) % 97).toInt, j)))
      .toDF("id", "lkey", "toff")
    val batch = ((0 until 30).map(j =>
      (1007L, ((7L * 31 + j * 17) % 97).toInt, j + 5)) ++
      (0 until 30).map(j => (1008L, ((j * j * 13 + 5) % 97).toInt, j)))
      .toDF("id", "lkey", "toff")
    val dir = Files.createTempDirectory("graft_lmk").toString
    Multimodal.landmarkWriteIndex(spark, corpus, dir, buckets = 64)
    val probe = Multimodal.landmarkMatchAgainstStoredIndex(spark, dir,
      batch, minVotes = 3, maxKeyFreq = 1 << 20)
    val got = probe.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val want = Multimodal.landmarkMatchPairs(
        corpus.unionByName(batch), minVotes = 3, maxKeyFreq = 1 << 20)
      .filter(col("id_b") >= 1000L && col("id_a") < 1000L)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == want, s"stored probe must equal in-memory cross pairs\n" +
      s"got=$got\nwant=$want")
    assert(got.exists { case (a, b, v, off) =>
      a == 7L && b == 1007L && off == 5 && v >= 20L },
      s"shifted copy must match its corpus original at offset 5: $got")
    // the probe must read only the batch's key buckets
    val plan = probe.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
    val m = sel.findFirstMatchIn(plan)
      .getOrElse(fail(s"no SelectedBucketsCount in probe plan:\n${plan.take(2000)}"))
    assert(m.group(1).toInt < m.group(2).toInt, m.matched)
    // fresh-session re-attach: drop the catalog entry, probe again —
    // pure DDL over _lmk_meta.json must rebind to the same layout
    spark.sql(s"DROP TABLE IF EXISTS ${Multimodal.landmarkIndexTableName(dir)}")
    val again = Multimodal.landmarkMatchAgainstStoredIndex(spark, dir,
        batch, minVotes = 3, maxKeyFreq = 1 << 20)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(again == want, "re-attached probe must answer identically")
  }

  // ---------------- domain blocklist ----------------

  test("domainBlocklistFilter: suffix semantics at label boundaries only") {
    val docs = Seq(
      (1L, "https://news.example.com/a"),
      (2L, "https://example.com/b"),
      (3L, "https://notexample.com/c"),
      (4L, "https://deep.a.bad.org:8080/d"),
      (5L, "not a url"))
      .toDF("doc_id", "url")
    val rules = Seq("example.com", "bad.org").toDF("domain")
    val out = TextAnalysis.domainBlocklistFilter(docs, col("doc_id"),
      col("url"), rules).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(3))).toSeq ==
      Seq((1L, true), (2L, true), (3L, false), (4L, true), (5L, false)))
    assert(out(0).getString(4) == "example.com")
    assert(out(3).getString(4) == "bad.org") // port stripped before match
    assert(out(4).getString(2) == "") // non-URL: host empty, never blocked
  }

  test("domainBlocklistFilter picks the most specific matching rule") {
    val docs = Seq((1L, "https://x.sub.example.com/p")).toDF("doc_id", "url")
    val rules = Seq("example.com", "sub.example.com").toDF("domain")
    val out = TextAnalysis.domainBlocklistFilter(docs, col("doc_id"),
      col("url"), rules).collect()
    assert(out(0).getBoolean(3) && out(0).getString(4) == "sub.example.com")
  }

  // ---------------- header dims ----------------

  test("imageHeaderDims reads PNG/GIF/JPEG/BMP headers without decoding") {
    assert(Multimodal.imageHeaderDims(Multimodal.syntheticPng(100, 60))
      .contains(("png", 100, 60)))
    assert(Multimodal.imageHeaderDims(
        Multimodal.syntheticGif(48, 32, 2, (_, x, y) => (x + y) % 251))
      .contains(("gif", 48, 32)))
    val img = new java.awt.image.BufferedImage(64, 48,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    assert(Multimodal.imageHeaderDims(Multimodal.encodeJpeg(img))
      .contains(("jpeg", 64, 48)))
    // hand-built BMP header: 'BM', width 640 LE at 18, height -480
    // (top-down) at 22 — |height| is the answer
    val bmp = new Array[Byte](54)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 0x80.toByte; bmp(19) = 0x02 // 640
    val hNeg = -480
    bmp(22) = (hNeg & 0xff).toByte; bmp(23) = ((hNeg >> 8) & 0xff).toByte
    bmp(24) = ((hNeg >> 16) & 0xff).toByte
    bmp(25) = ((hNeg >> 24) & 0xff).toByte
    assert(Multimodal.imageHeaderDims(bmp).contains(("bmp", 640, 480)))
    // junk, truncated PNG, truncated JPEG -> None, never a throw
    assert(Multimodal.imageHeaderDims("plain text".getBytes).isEmpty)
    assert(Multimodal.imageHeaderDims(
      Multimodal.syntheticPng(40, 40).take(12)).isEmpty)
    assert(Multimodal.imageHeaderDims(
      Multimodal.encodeJpeg(img).take(6)).isEmpty)
    assert(Multimodal.imageHeaderDims(null).isEmpty)
  }

  // ---------------- HTML -> text ----------------

  test("htmlToText strips script/style/comments, breaks blocks, decodes") {
    val html =
      """<html><head><title>My Page</title>
        |<style>body { color: red; }</style>
        |<script>if (1<2) { alert("x&y"); }</script></head>
        |<body><!-- secret --><h1>Top &amp; best</h1>
        |<p>First   line</p><p>A &lt;b&gt; is not a tag&nbsp;here</p>
        |<span>inline</span> <b>bold</b></body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(TextAnalysis.htmlToText(col("h")).as("t"))
      .head().getString(0)
    val lines = out.split("\n").toSeq
    assert(lines == Seq("My Page", "Top & best", "First line",
      "A <b> is not a tag here", "inline bold"))
    assert(!out.contains("alert") && !out.contains("color") &&
      !out.contains("secret"))
  }

  test("htmlToText: unclosed script eats to end; plain text passes through") {
    val out = Seq(
        "<p>ok</p><script>var x = 1;",    // unclosed: browser behavior
        "no markup at all",
        "")
      .toDF("h").select(TextAnalysis.htmlToText(col("h")).as("t"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("ok", "no markup at all", ""))
  }

  // ---------------- robots.txt ----------------

  private val robotsTxt =
    """# comment line
      |User-agent: alpha
      |User-agent: beta
      |Disallow: /shared
      |
      |User-agent: *
      |Disallow: /private  # trailing comment
      |Allow: /private/ok
      |Disallow:
      |""".stripMargin

  test("parseRobots: groups, shared UA runs, comments, empty values") {
    val parsed = graft.operators.Robots.parseRobots(
        Seq(("E.com", robotsTxt)).toDF("domain", "robots_txt"),
        col("domain"), col("robots_txt"))
      .orderBy("line_idx").collect()
    // two groups: {alpha, beta} -> /shared ; {*} -> 3 rules
    assert(parsed.map(r => (r.getString(0), r.getLong(2), r.getString(3),
      r.getString(4))).toSeq == Seq(
      ("e.com", 1L, "user-agent", "alpha"),
      ("e.com", 1L, "user-agent", "beta"),
      ("e.com", 1L, "disallow", "/shared"),
      ("e.com", 2L, "user-agent", "*"),
      ("e.com", 2L, "disallow", "/private"),
      ("e.com", 2L, "allow", "/private/ok"),
      ("e.com", 2L, "disallow", "")))
  }

  test("robotsFilter: longest prefix wins, tie goes to Allow, exact " +
      "agent group shadows '*', absent robots allows") {
    val robots = Seq(("e.com", robotsTxt)).toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://e.com/private/x"),     // * group: Disallow /private
      (2L, "https://e.com/private/ok/p"),  // Allow /private/ok is longer
      (3L, "https://e.com/shared"),        // alpha/beta rule not for us
      (4L, "https://e.com/other"),         // no rule matches
      (5L, "https://norobots.com/private") // no robots file at all
    ).toDF("doc_id", "url")
    val out = graft.operators.Robots.robotsFilter(urls, col("doc_id"),
        col("url"), robots, agent = "crawler")
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(4))).toSeq ==
      Seq((1L, false), (2L, true), (3L, true), (4L, true), (5L, true)))
    assert(out(0).getString(5) == "disallow" &&
      out(0).getString(6) == "/private")
    assert(out(1).getString(5) == "allow" &&
      out(1).getString(6) == "/private/ok")
    assert(out(3).getString(5) == null) // empty Disallow is not a rule

    // as agent beta, the exact group shadows '*': /shared blocked,
    // /private now allowed (the '*' rules no longer apply)
    val beta = graft.operators.Robots.robotsFilter(urls, col("doc_id"),
        col("url"), robots, agent = "BETA")
      .orderBy("doc_id").collect()
    assert(beta.map(r => (r.getLong(0), r.getBoolean(4))).toSeq ==
      Seq((1L, true), (2L, true), (3L, false), (4L, true), (5L, true)))
  }

  test("robotsFilter verdicts are per URL when several URLs share an id") {
    // round-10 review find: hits keyed by doc_id alone leaked one URL's
    // Disallow onto its siblings — q238's frontier legally keeps the MIN
    // discovering doc per canonical URL, so one id can carry many URLs
    val robots = Seq(("e.com", robotsTxt)).toDF("domain", "robots_txt")
    val urls = Seq(
      (1L, "https://e.com/private/x"), // disallowed
      (1L, "https://e.com/other"),     // same id — must stay allowed
      (1L, "https://e.com/private/ok/p") // same id — Allow wins
    ).toDF("doc_id", "url")
    val out = graft.operators.Robots.robotsFilter(urls, col("doc_id"),
        col("url"), robots, agent = "crawler")
      .orderBy("url").collect()
    assert(out.map(r => (r.getString(1), r.getBoolean(4))).toSeq == Seq(
      ("https://e.com/other", true),
      ("https://e.com/private/ok/p", true),
      ("https://e.com/private/x", false)))
  }

  // ---------------- link extraction ----------------

  test("resolveUrl covers every RFC-3986-subset branch") {
    val base = "https://h.example.com/dir/page?x=1#top"
    val cases = Seq(
      ("https://other.org/a#f", "https://other.org/a"), // absolute
      ("//cdn.net/lib.js", "https://cdn.net/lib.js"),   // scheme-relative
      ("/root/x", "https://h.example.com/root/x"),      // root-relative
      ("sub/y", "https://h.example.com/dir/sub/y"),     // dir-relative
      ("./z", "https://h.example.com/dir/z"),           // dot collapse
      ("././w", "https://h.example.com/dir/w"),         // adjacent dots
      ("", "https://h.example.com/dir/page"),           // self (no query)
      ("mailto:a@b.c", "mailto:a@b.c"))                 // scheme passthru
    val out = cases.map(_._1).toDF("href")
      .select(TextAnalysis.resolveUrl(lit(base), col("href")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(out == cases.map(_._2))
    // bare-origin base: relative joins at '/'
    val bare = Seq("p").toDF("href")
      .select(TextAnalysis.resolveUrl(lit("https://h.com"), col("href")))
      .head().getString(0)
    assert(bare == "https://h.com/p")
  }

  test("extractLinks: both quote styles, scheme filter, duplicates kept") {
    val html = """<p><a class="x" href="https://a.org/1">1</a>
      |<a href='/rel'>2</a><a href="javascript:void(0)">j</a>
      |<a href="https://a.org/1">again</a><area href="https://no.anchor/">
      |</p>""".stripMargin
    val out = TextAnalysis.extractLinks(
        Seq((7L, "https://s.com/d/p", html)).toDF("id", "u", "h"),
        col("id"), col("u"), col("h"))
      .collect().map(r => (r.getString(2), r.getString(3))).toSeq
    assert(out == Seq(
      ("https://a.org/1", "https://a.org/1"),
      ("https://a.org/1", "https://a.org/1"), // dup occurrence kept
      ("/rel", "https://s.com/rel")))         // javascript: + <area> dropped
  }

  test("linkGraphEdges aggregates to domain grain, drops self-loops") {
    val links = Seq(
      (1L, "https://a.com/x", "x", "https://b.com/1"),
      (2L, "https://a.com/y", "x", "https://b.com/2"),
      (3L, "https://a.com/z", "x", "https://a.com/self"),
      (4L, "https://b.com/w", "x", "https://a.com/back"))
      .toDF("doc_id", "url", "href", "link")
    val out = graft.operators.TextAnalysis.linkGraphEdges(links,
        col("url"), col("link"))
      .orderBy("src_domain", "dst_domain").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq(("a.com", "b.com", 2L), ("b.com", "a.com", 1L)))
  }

  test("extractAnchors cleans inner markup and resolves hrefs") {
    val html = """<a href="https://t.org/a"><img src="i.png"><b>Read
      |&amp; learn</b></a><a href="/x" class="k">plain</a>
      |<a href="javascript:x()">drop</a>""".stripMargin
    val out = TextAnalysis.extractAnchors(
        Seq((1L, "https://s.com/d/p", html)).toDF("id", "u", "h"),
        col("id"), col("u"), col("h"))
      .collect().map(r => (r.getString(3), r.getString(4))).toSeq
    assert(out == Seq(
      ("https://t.org/a", "Read\n& learn"), // <img>/<b> gone, entity decoded
      ("https://s.com/x", "plain")))
  }

  test("sitemapEntries parses urlset and sitemapindex blocks") {
    val urlset = """<?xml version="1.0"?><urlset>
      |<url><loc> https://a.com/1 </loc><lastmod>2026-01-02</lastmod></url>
      |<url><loc>https://a.com/2?x=1&amp;y=2</loc></url>
      |<url><lastmod>2026-01-03</lastmod></url></urlset>""".stripMargin
    val index = "<sitemapindex><sitemap><loc>https://a.com/s2.xml" +
      "</loc></sitemap></sitemapindex>"
    val out = TextAnalysis.sitemapEntries(
        Seq((1L, urlset), (2L, index)).toDF("id", "xml"),
        col("id"), col("xml"))
      .orderBy("doc_id", "loc")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSeq
    // loc-less block dropped; &amp; decoded; whitespace-tolerant loc
    assert(out == Seq(
      (1L, "https://a.com/1", Some("2026-01-02")),
      (1L, "https://a.com/2?x=1&y=2", None),
      (2L, "https://a.com/s2.xml", None)))
  }

  test("robotsFilter: equal-length Allow and Disallow -> Allow wins") {
    val robots = Seq(("t.com",
      "User-agent: *\nDisallow: /abc\nAllow: /abd\nAllow: /abc\n"))
      .toDF("domain", "robots_txt")
    val urls = Seq((1L, "https://t.com/abc/x")).toDF("doc_id", "url")
    val out = graft.operators.Robots.robotsFilter(urls, col("doc_id"),
      col("url"), robots, agent = "any").collect()
    assert(out(0).getBoolean(4) && out(0).getString(5) == "allow")
  }
}
