package graft.sources

import java.io.{BufferedInputStream, ByteArrayInputStream, ByteArrayOutputStream, InputStream, OutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (ISO 28500 / WARC/1.0) source — the container format web-scale
  * text corpora actually arrive in (Common Crawl publishes ~100 TB per
  * crawl as `*.warc.gz` segments). Dependency-free: the format is line
  * headers + a counted block, and per-record gzip members concatenate
  * into a stream `java.util.zip.GZIPInputStream` reads natively.
  *
  * Scale design: WARC corpora ship as many ~1 GB files, so parallelism
  * is at FILE grain — `spark.sparkContext.binaryFiles` hands each task
  * a `PortableDataStream` (a lazy handle, not the bytes) and
  * [[records]] parses it INCREMENTALLY: one record in memory at a
  * time, never the whole file. A 100 TB crawl is ~100k files = 100k
  * tasks; the decode is map-only with no exchange anywhere, and
  * downstream column pruning costs nothing extra because a WARC record
  * must be byte-scanned to find the next one regardless.
  *
  * Record parsing follows the spec shape: a `WARC/1.0` version line,
  * `Name: value` headers to a blank line, `Content-Length` bytes of
  * block, a `\r\n\r\n` trailer. For `response` records whose block is
  * an `application/http` message the HTTP head is split off so callers
  * get the status code and the raw page body.
  */
object Warc {

  /** One parsed WARC record: the headers that matter downstream plus
    * the raw block payload (HTTP head already stripped for responses).
    */
  final case class WarcRecord(
      warcType: String,
      url: String,
      date: String,
      recordId: String,
      contentType: String,
      httpStatus: Int, // -1 when the block is not an HTTP message
      payload: Array[Byte])

  private val crlf = "\r\n".getBytes("ISO-8859-1")

  /** Read one ISO-8859-1 header line (to LF; CR stripped); None at EOF. */
  private def readLine(in: InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder(64)
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    Some(sb.toString)
  }

  private def readFully(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new java.io.EOFException(
        s"WARC block truncated: expected $n bytes, got $off")
      off += r
    }
    buf
  }

  /** Incrementally parse a WARC stream (already de-gzipped if needed)
    * into records. Tolerates leading blank lines between records (the
    * spec's `\r\n\r\n` trailer) and stops cleanly at EOF. Malformed
    * records fail loudly — a truncated 100 TB ingest must not look
    * like a short corpus.
    */
  def records(in: InputStream): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private val s = new BufferedInputStream(in, 1 << 16)
    private var nextRec: WarcRecord = _
    private var eof = false

    private def advance(): Unit = {
      nextRec = null
      var line = readLine(s)
      while (line.exists(_.isEmpty)) line = readLine(s) // inter-record blanks
      line match {
        case None => eof = true
        case Some(v) if !v.startsWith("WARC/") =>
          throw new IllegalArgumentException(
            s"not a WARC record boundary: '${v.take(40)}'")
        case Some(_) =>
          var headers = Map.empty[String, String]
          var h = readLine(s)
          while (h.exists(_.nonEmpty)) {
            val i = h.get.indexOf(':')
            if (i > 0)
              headers += (h.get.substring(0, i).trim.toLowerCase ->
                h.get.substring(i + 1).trim)
            h = readLine(s)
          }
          val len = headers.getOrElse("content-length",
            throw new IllegalArgumentException(
              "WARC record missing Content-Length")).toInt
          val block = readFully(s, len)
          val ctype = headers.getOrElse("content-type", "")
          val (status, payload) =
            if (ctype.startsWith("application/http")) splitHttp(block)
            else (-1, block)
          nextRec = WarcRecord(
            warcType = headers.getOrElse("warc-type", ""),
            url = headers.getOrElse("warc-target-uri", ""),
            date = headers.getOrElse("warc-date", ""),
            recordId = headers.getOrElse("warc-record-id", ""),
            contentType = ctype,
            httpStatus = status,
            payload = payload)
      }
    }

    advance()
    override def hasNext: Boolean = !eof && nextRec != null
    override def next(): WarcRecord = {
      val r = nextRec; advance(); r
    }
  }

  /** Split an HTTP message block into (status, body). */
  private def splitHttp(block: Array[Byte]): (Int, Array[Byte]) = {
    var i = 0
    var end = -1
    while (end < 0 && i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n') end = i
      i += 1
    }
    if (end < 0) (-1, block)
    else {
      val head = new String(block, 0, end, "ISO-8859-1")
      val statusLine = head.takeWhile(_ != '\r')
      val parts = statusLine.split(" ")
      val status =
        if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
          scala.util.Try(parts(1).toInt).getOrElse(-1)
        else -1
      (status, java.util.Arrays.copyOfRange(block, end + 4, block.length))
    }
  }

  /** Parse possibly-gzipped WARC bytes ([[records]] over the right
    * stream). `.warc.gz` files are CONCATENATED per-record gzip members;
    * `GZIPInputStream` reads across member boundaries, so the same
    * incremental parser serves both layouts.
    */
  def recordsFromStream(in: InputStream, gzipped: Boolean): Iterator[WarcRecord] =
    records(if (gzipped) new GZIPInputStream(new BufferedInputStream(in, 1 << 16))
            else in)

  // ------------------------------------------------------------------
  // Writing (fixtures, round-trip tests, re-sharding sinks)
  // ------------------------------------------------------------------

  /** Write one `response` record (HTTP 200, text/html body). Used by the
    * round-trip gate and by tests; the header set is the minimal spec-
    * conformant response shape crawlers emit.
    */
  def writeResponseRecord(out: OutputStream, url: String, date: String,
                          body: Array[Byte], status: Int = 200): Unit = {
    val httpHead =
      s"HTTP/1.1 $status OK\r\nContent-Type: text/html; charset=utf-8\r\nContent-Length: ${body.length}\r\n\r\n"
        .getBytes("ISO-8859-1")
    val block = httpHead ++ body
    val head = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append("WARC-Type: response\r\n")
      .append(s"WARC-Target-URI: $url\r\n")
      .append(s"WARC-Date: $date\r\n")
      .append(s"WARC-Record-ID: <urn:uuid:${java.util.UUID.nameUUIDFromBytes(url.getBytes("UTF-8"))}>\r\n")
      .append("Content-Type: application/http; msgtype=response\r\n")
      .append(s"Content-Length: ${block.length}\r\n")
      .append("\r\n")
      .toString.getBytes("ISO-8859-1")
    out.write(head); out.write(block); out.write(crlf); out.write(crlf)
  }

  /** Serialize (url, date, body) triples into `.warc.gz` bytes — one
    * gzip member per record, the Common Crawl layout (so a reader can
    * seek to a record offset and inflate just that member).
    */
  def gzipWarcBytes(recs: Iterator[(String, String, Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    recs.foreach { case (url, date, body) =>
      val gz = new GZIPOutputStream(bos)
      writeResponseRecord(gz, url, date, body)
      gz.finish() // one member per record; next record opens a new member
    }
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // DataFrame surface
  // ------------------------------------------------------------------

  val schema: StructType = StructType(Seq(
    StructField("warc_file", StringType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("warc_date", StringType, nullable = false),
    StructField("content_type", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /** Scan a WARC path glob into (file, type, url, date, content_type,
    * http_status, payload). One task per file (the WARC scale contract);
    * each task streams its file — `PortableDataStream.open()` is a lazy
    * handle, so memory holds one record, not one file.
    */
  def scan(spark: SparkSession, pathGlob: String,
           minPartitions: Int = 0): DataFrame = {
    val parts = if (minPartitions > 0) minPartitions
                else spark.sparkContext.defaultParallelism
    val rdd = spark.sparkContext.binaryFiles(pathGlob, parts)
      .flatMap { case (file, pds) =>
        val in = pds.open()
        val inner = recordsFromStream(in, gzipped = file.endsWith(".gz"))
        new Iterator[Row] { // close the file handle at exhaustion
          override def hasNext: Boolean = {
            val h = try inner.hasNext catch {
              case e: Throwable => in.close(); throw e
            }
            if (!h) in.close()
            h
          }
          override def next(): Row = {
            val r = inner.next()
            Row(file, r.warcType, r.url, r.date, r.contentType,
              r.httpStatus, r.payload)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** `response` records as text documents: (url, warc_date, http_status,
    * text) with the payload decoded as UTF-8 — the frame the web-curation
    * pipeline (urlDedup → removeBoilerplate → gopherQualityGate) starts
    * from. Filtering to responses happens BEFORE the payload leaves the
    * task, so request/metadata records never materialize downstream.
    */
  def documents(spark: SparkSession, pathGlob: String,
                minPartitions: Int = 0): DataFrame =
    scan(spark, pathGlob, minPartitions)
      .filter(col("warc_type") === "response")
      .select(col("url"), col("warc_date"), col("http_status"),
        decode(col("payload"), "UTF-8").as("text"))

  /** The full web-curation pipeline FROM THE CRAWL CONTAINER: WARC scan
    * → domain blocklist → canonical-URL dedup (min-hash64 survivor) →
    * domain-scoped boilerplate removal → Gopher quality gate. One call
    * takes a Common-Crawl-shaped directory to a curated text corpus —
    * the composition q191 proves at operator grain, rooted at the real
    * source format. Scale shape: the scan is map-only at file grain;
    * every later stage is the already-audited operator (broadcast
    * blocklist, hash-agg URL groups, two-exchange boilerplate,
    * scan-speed Gopher stats).
    *
    * Output per surviving document: (doc_id, url, text, n_lines,
    * n_removed, gopher stats..., keep) — `keep` is the Gopher verdict
    * over the CLEANED text; callers filter `keep` or inspect the
    * full-funnel columns.
    */
  def curatedDocuments(spark: SparkSession, pathGlob: String,
                       blocklist: DataFrame,
                       minWords: Int = 50,
                       minPartitions: Int = 0,
                       htmlPayload: Boolean = true): DataFrame = {
    import graft.operators.TextAnalysis
    val raw0 = documents(spark, pathGlob, minPartitions)
    // crawl payloads are markup: extract text before any text-grain
    // stage (map-only, same task as the scan); htmlPayload=false for
    // pre-extracted corpora
    val raw1 =
      if (htmlPayload)
        raw0.withColumn("text", TextAnalysis.htmlToText(col("text")))
      else raw0
    val raw = raw1
      .withColumn("doc_id", graft.functions.F.hash64(col("url")))
      .withColumn("domain", TextAnalysis.urlHost(col("url")))
    val allowed = TextAnalysis.domainBlocklistFilter(raw, col("doc_id"),
        col("url"), blocklist)
      .filter(!col("blocked")).select("doc_id")
    val docs = raw.join(allowed, "doc_id")
    val survivors = TextAnalysis.urlDedup(docs, col("doc_id"), col("url"))
      .filter(col("doc_id") === col("keep_id")).select("doc_id")
    val kept = docs.join(survivors, "doc_id")
    val cleaned = TextAnalysis.removeBoilerplate(kept, col("doc_id"),
      col("text"), col("domain"))
    val gated = TextAnalysis.gopherFilter(cleaned, col("doc_id"),
      col("text"), minWords = minWords)
    cleaned.join(kept.select(col("doc_id"), col("url")), Seq("doc_id"))
      .join(gated, Seq("doc_id"))
  }

  /** In-memory round-trip used by the q202 oracle gate: serialize each
    * partition's (url, date, body) rows as one `.warc.gz` "file", then
    * parse it back with the PRODUCTION record parser. What comes out is
    * exactly what a [[scan]] of those bytes on disk would produce, but
    * derivable from a SQL-stated fixture — giving the WARC parser a
    * DuckDB-checkable CORRECTNESS row despite DuckDB not reading WARC.
    */
  def roundTrip(spark: SparkSession, triples: DataFrame): DataFrame = {
    val rdd = triples.select("url", "warc_date", "body").rdd
      .mapPartitions { it =>
        val bytes = gzipWarcBytes(it.map(r =>
          (r.getString(0), r.getString(1), r.getAs[Array[Byte]](2))))
        recordsFromStream(new ByteArrayInputStream(bytes), gzipped = true)
          .map(r => Row(r.url, r.date, r.httpStatus,
            new String(r.payload, "UTF-8")))
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("warc_date", StringType, nullable = false),
      StructField("http_status", IntegerType, nullable = false),
      StructField("text", StringType, nullable = true))))
  }
}
