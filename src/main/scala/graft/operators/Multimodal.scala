package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in fixed-size batches.
  *
  * IMAGE decode is REAL: `decodeImage` runs the JDK's `javax.imageio`
  * PNG/BMP/GIF codecs (no external deps) inside the partition loop —
  * per-task `ImageIO.setUseCache(false)` init, then per-row decode of
  * width/height and an exact raster pixel sum. AUDIO decode is REAL too:
  * `decodeAudio` runs the JDK's `javax.sound.sampled` WAV/PCM codec —
  * sample rate, frame count, and an exact signed-sample sum. VIDEO
  * container METADATA is real too: `decodeVideoMeta` parses MP4 box
  * headers and the AVI RIFF main header dependency-free (dims +
  * duration). VIDEO FRAME decode is real for MJPEG-in-AVI
  * (`decodeMjpegFrames` — MJPG `movi` chunks are plain JPEGs, which
  * `ImageIO` reads), feeding per-frame pHash and frame-overlap dedup;
  * only codecs the JDK truly cannot read (H.264 etc.) fall back to the
  * labeled `decodeStub`: a deterministic fake feature vector
  * from the bytes. Everything around
  * all three — schema, batching, partition-level processing shape,
  * metadata struct — is the real scale design: decode happens inside
  * `mapPartitions` so each task amortizes per-batch setup (codec/model
  * init) exactly like a Pandas-UDF `mapInPandas` would, and partitioning
  * is by hash so a 100 TB corpus splits into even decode tasks.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("codec", StringType, nullable = true))), nullable = true)))

  /** Build a media table from documents: treat the text bytes as an opaque
    * payload with synthetic metadata — the plumbing stand-in for real blobs.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      (when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video")).as("media_type"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (pmod(col("doc_id"), lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(1080)) + 1).cast("int").as("height"),
        (col("n_chars") * 10).as("duration_ms"),
        lit("stub").as("codec")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true),
    // real-decode columns: populated when javax.imageio recognizes the
    // payload (image rows), null otherwise (A/V stubs, undecodable bytes)
    StructField("decoded_width", LongType, nullable = true),
    StructField("decoded_height", LongType, nullable = true),
    StructField("pixel_sum", LongType, nullable = true),
    // real audio-decode columns: populated when javax.sound.sampled
    // recognizes the payload (audio rows), null otherwise
    StructField("sample_rate", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("sample_sum", LongType, nullable = true),
    // real video CONTAINER-metadata columns: populated when the payload
    // parses as an MP4 (moov/mvhd/tkhd) or AVI (RIFF avih) container —
    // dims land in decoded_width/decoded_height like the image path
    StructField("video_container", StringType, nullable = true),
    StructField("video_duration_ms", LongType, nullable = true)))

  /** Deterministic grayscale PNG: pixel(x, y) = x + y (callers keep
    * `width + height <= 257` so no value clips at 255 and the raster sum
    * has the closed form `w*h*(w+h-2)/2` — what the DuckDB oracle
    * recomputes arithmetically to prove the decode is real).
    */
  def syntheticPng(width: Int, height: Int): Array[Byte] = {
    require(width >= 1 && height >= 1 && width + height <= 257,
      "dims must keep x+y under the 8-bit clip")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, x + y); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit PCM mono WAV: sample(i) = (i % 200) - 100, a
    * sawtooth whose signed-sample sum has the closed form
    * `-100*(n/200) + r*(r-1)/2 - 100*r` with `r = n % 200` — what the
    * DuckDB oracle recomputes arithmetically to prove the decode is real
    * (a full 200-sample period sums to exactly -100).
    */
  def syntheticWav(nSamples: Int, rateHz: Int = 8000): Array[Byte] = {
    require(nSamples >= 1, "need at least one sample")
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = ((i % 200) - 100).toShort; i += 1
    }
    syntheticWavFromSamples(samples, rateHz)
  }

  /** 16-bit mono little-endian WAV from explicit samples — the fixture
    * builder for content-controlled audio tests (shifted copies, sine
    * mixes, silence spans).
    */
  def syntheticWavFromSamples(samples: Array[Short],
                              rateHz: Int = 8000): Array[Byte] = {
    require(samples.length >= 1, "need at least one sample")
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toInt
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL audio decode via the JDK WAV/PCM codec: (sample rate, frame
    * count, exact signed-sample sum across all channels). None when the
    * bytes are not decodable 16-bit little-endian PCM — the honest answer
    * for a corrupt blob, never an exception.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Long, Long, Long)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian ||
            f.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = ais.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = ais.read(buf) }
          val pcm = bos.toByteArray
          var sum = 0L
          var i = 0
          while (i + 1 < pcm.length) {
            sum += (((pcm(i + 1) & 0xff) << 8) | (pcm(i) & 0xff)).toShort
            i += 2
          }
          Some((f.getSampleRate.toLong,
            (pcm.length / 2) / f.getChannels, sum))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL image decode via the JDK codecs: (width, height, exact pixel sum
    * over band 0). None when the bytes are not a decodable image — the
    * honest answer for a corrupt blob, never an exception (one bad blob
    * must not kill a 100 TB scan).
    */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
      val r = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += r.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, sum)
    } catch { case scala.util.control.NonFatal(_) => None }

  // ---- video container metadata (dependency-free byte parsing) --------

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i + 3) & 0xffL) << 24) | ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 1) & 0xffL) << 8) | (b(i) & 0xffL)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  /** Deterministic minimal MP4: `ftyp` + `moov(mvhd, trak(tkhd))` — the
    * box skeleton every real MP4 carries (ISO/IEC 14496-12 box layout),
    * with no media data. mvhd timescale is 1000 so duration units ARE
    * milliseconds; tkhd carries the 16.16 fixed-point display dims.
    * Always exactly 240 bytes (all headers are fixed-length).
    */
  def syntheticMp4(width: Int, height: Int, durationMs: Long): Array[Byte] = {
    require(width >= 1 && height >= 1 && durationMs >= 0)
    val bb = java.nio.ByteBuffer.allocate(240) // big-endian by default
    def box(size: Int, typ: String): Unit = {
      bb.putInt(size); bb.put(typ.getBytes("ISO-8859-1"))
    }
    box(24, "ftyp")
    bb.put("isom".getBytes("ISO-8859-1")); bb.putInt(0x200)
    bb.put("isom".getBytes("ISO-8859-1")); bb.put("mp42".getBytes("ISO-8859-1"))
    box(216, "moov")
    box(108, "mvhd")
    bb.putInt(0)                 // version 0 + flags
    bb.putInt(0); bb.putInt(0)   // creation, modification
    bb.putInt(1000)              // timescale: 1 unit = 1 ms
    bb.putInt(durationMs.toInt)  // duration in timescale units
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
    (0 until 2).foreach(_ => bb.putInt(0))          // reserved[8]
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
      .foreach(bb.putInt)                           // unity matrix
    (0 until 6).foreach(_ => bb.putInt(0))          // pre_defined[24]
    bb.putInt(2)                 // next_track_ID
    box(100, "trak")
    box(92, "tkhd")
    bb.putInt(7)                 // version 0 + flags (enabled|in-movie)
    bb.putInt(0); bb.putInt(0)   // creation, modification
    bb.putInt(1)                 // track_ID
    bb.putInt(0)                 // reserved
    bb.putInt(durationMs.toInt)
    bb.putLong(0L)               // reserved[8]
    bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
    Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
    bb.putInt(width << 16)       // 16.16 fixed-point display width
    bb.putInt(height << 16)
    bb.array()
  }

  /** Deterministic minimal AVI: `RIFF('AVI ', LIST('hdrl', avih))` — the
    * main header every AVI carries (dwMicroSecPerFrame, dwTotalFrames,
    * dwWidth, dwHeight), no streams, no movi data. Always exactly 88
    * bytes; duration_ms = usPerFrame * nFrames / 1000.
    */
  def syntheticAvi(width: Int, height: Int, nFrames: Long,
                   usPerFrame: Long = 40000L): Array[Byte] = {
    require(width >= 1 && height >= 1 && nFrames >= 0 && usPerFrame > 0)
    val bb = java.nio.ByteBuffer.allocate(88)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")); bb.putInt(80)
    bb.put("AVI ".getBytes("ISO-8859-1"))
    bb.put("LIST".getBytes("ISO-8859-1")); bb.putInt(68)
    bb.put("hdrl".getBytes("ISO-8859-1"))
    bb.put("avih".getBytes("ISO-8859-1")); bb.putInt(56)
    bb.putInt(usPerFrame.toInt)  // dwMicroSecPerFrame
    bb.putInt(0); bb.putInt(0); bb.putInt(0x10) // maxBytes, padding, flags
    bb.putInt(nFrames.toInt)     // dwTotalFrames
    bb.putInt(0); bb.putInt(1); bb.putInt(0)    // initial, streams, bufSize
    bb.putInt(width); bb.putInt(height)
    (0 until 4).foreach(_ => bb.putInt(0))      // dwReserved[4]
    bb.array()
  }

  /** Encode one raster as baseline JPEG at an explicit quality — the
    * JDK writer, no external codec. Used by [[syntheticMjpegAvi]] and by
    * specs that prove re-encoded clips still pair.
    */
  def encodeJpeg(img: java.awt.image.BufferedImage,
                 quality: Float = 0.9f): Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Deterministic MJPEG-in-AVI clip: a full `RIFF('AVI ')` container —
    * `hdrl(avih, strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER
    * 'MJPG'))` + `movi` with one `00dc` chunk per frame, each chunk a
    * REAL baseline JPEG of the closed-form raster
    * `pixel(frame, x, y) & 0xff` (grayscale). This is the one video
    * codec the JDK alone can round-trip (MJPG frames ARE JPEGs;
    * `ImageIO` reads JPEG), which is what makes the video frame path
    * honest without any external codec. 25 fps timing in the headers.
    */
  def syntheticMjpegAvi(width: Int, height: Int, nFrames: Int,
                        pixel: (Int, Int, Int) => Int,
                        jpegQuality: Float = 0.9f): Array[Byte] = {
    require(width >= 8 && height >= 8 && nFrames >= 1)
    val jpegs = (0 until nFrames).map { f =>
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { r.setSample(x, y, 0, pixel(f, x, y) & 0xff); x += 1 }
        y += 1
      }
      encodeJpeg(img, jpegQuality)
    }
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def tag(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val moviBody = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val hdrlBody = 4 + (8 + 56) + (8 + 116)
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    tag("RIFF"); w32(riffBody); tag("AVI ")
    tag("LIST"); w32(hdrlBody); tag("hdrl")
    tag("avih"); w32(56)
    w32(40000L)                     // dwMicroSecPerFrame (25 fps)
    w32(0); w32(0); w32(0x10)       // maxBytesPerSec, padding, HASINDEX-less flags
    w32(nFrames.toLong)             // dwTotalFrames
    w32(0); w32(1); w32(0)          // initialFrames, streams, suggestedBufSize
    w32(width.toLong); w32(height.toLong)
    (0 until 4).foreach(_ => w32(0))
    tag("LIST"); w32(116); tag("strl")
    tag("strh"); w32(56)
    tag("vids"); tag("MJPG")        // fccType, fccHandler
    w32(0); w32(0); w32(0)          // flags, prio+lang, initialFrames
    w32(1); w32(25)                 // scale, rate: 25 fps
    w32(0); w32(nFrames.toLong)     // start, length (frames)
    w32(0); w32(-1L & 0xffffffffL)  // suggestedBufSize, quality (-1)
    w32(0); w32(0); w32(0)          // sampleSize, rcFrame(8 bytes)
    tag("strf"); w32(40)
    w32(40)                         // biSize
    w32(width.toLong); w32(height.toLong)
    w32(1L | (24L << 16))           // planes=1, bitCount=24
    tag("MJPG")                     // biCompression
    w32(width.toLong * height * 3)  // biSizeImage (nominal)
    w32(0); w32(0); w32(0); w32(0)  // ppm x/y, clrUsed, clrImportant
    tag("LIST"); w32(moviBody); tag("movi")
    jpegs.foreach { j =>
      tag("00dc"); w32(j.length.toLong); out.write(j)
      if ((j.length & 1) == 1) out.write(0) // RIFF word alignment
    }
    out.toByteArray
  }

  /** Deterministic animated GIF (GIF89a) clip — the SECOND video-ish
    * container the JDK round-trips natively (`ImageIO` both writes and
    * reads multi-frame GIF). Grayscale rasters quantize near-losslessly
    * into the 256-entry palette, so frame pHashes survive the
    * re-encode. Same closed-form `pixel(frame, x, y)` contract as
    * [[syntheticMjpegAvi]] — the two encoders share fixtures, which is
    * what lets a spec assert CROSS-CONTAINER near-dup pairing.
    */
  def syntheticGif(width: Int, height: Int, nFrames: Int,
                   pixel: (Int, Int, Int) => Int): Array[Byte] = {
    require(width >= 8 && height >= 8 && nFrames >= 1)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { f =>
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val r = img.getRaster
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            r.setSample(x, y, 0, pixel(f, x, y) & 0xff); x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** REAL animated-GIF frame decode via the JDK's multi-image GIF
    * reader. Frames are COMPOSITED progressively onto a canvas at each
    * frame's declared (left, top) offset — GIF encoders routinely emit
    * partial-frame deltas, and hashing a bare delta rect would pair
    * nothing. Disposal handling is the do-not-dispose form (each frame
    * draws over the previous canvas), which covers full-frame and
    * additive-delta GIFs; restore-to-background GIFs will composite
    * conservatively (documented bound, not a crash). None for non-GIF
    * bytes or zero decodable frames.
    */
  def decodeGifFrames(bytes: Array[Byte])
      : Option[IndexedSeq[java.awt.image.BufferedImage]] =
    try {
      if (bytes == null || bytes.length < 6 ||
          !(new String(bytes, 0, 6, "ISO-8859-1").startsWith("GIF8"))) None
      else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); None }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, false)
            val n = reader.getNumImages(true)
            if (n <= 0) None
            else {
              var canvas: java.awt.image.BufferedImage = null
              val out =
                IndexedSeq.newBuilder[java.awt.image.BufferedImage]
              var i = 0
              while (i < n) {
                val frame = reader.read(i)
                val (left, top) = frameOffset(reader.getImageMetadata(i))
                if (canvas == null)
                  canvas = new java.awt.image.BufferedImage(
                    math.max(frame.getWidth + left, 8),
                    math.max(frame.getHeight + top, 8),
                    java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g = canvas.createGraphics()
                g.drawImage(frame, left, top, null)
                g.dispose()
                val snap = new java.awt.image.BufferedImage(
                  canvas.getWidth, canvas.getHeight,
                  java.awt.image.BufferedImage.TYPE_INT_RGB)
                val g2 = snap.createGraphics()
                g2.drawImage(canvas, 0, 0, null)
                g2.dispose()
                out += snap
                i += 1
              }
              val fs = out.result()
              if (fs.isEmpty) None else Some(fs)
            }
          } finally { reader.dispose(); iis.close() }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** (imageLeftPosition, imageTopPosition) from GIF frame metadata. */
  private def frameOffset(md: javax.imageio.metadata.IIOMetadata): (Int, Int) =
    try {
      val tree = md.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[org.w3c.dom.Element]
      val nodes = tree.getElementsByTagName("ImageDescriptor")
      if (nodes.getLength == 0) (0, 0)
      else {
        val e = nodes.item(0).asInstanceOf[org.w3c.dom.Element]
        (e.getAttribute("imageLeftPosition").toInt,
          e.getAttribute("imageTopPosition").toInt)
      }
    } catch { case scala.util.control.NonFatal(_) => (0, 0) }

  /** Frame decode across every container the JDK can actually read:
    * MJPEG-in-AVI ([[decodeMjpegFrames]]) or animated GIF
    * ([[decodeGifFrames]]). The dispatch is a cheap magic-bytes check
    * on each side; None means the clip's codec has no JVM decoder and
    * it stays [[decodeStub]] territory.
    */
  def decodeVideoFrames(bytes: Array[Byte])
      : Option[IndexedSeq[java.awt.image.BufferedImage]] =
    decodeMjpegFrames(bytes).orElse(decodeGifFrames(bytes))

  /** One level of RIFF children in `[from, to)`: (chunkId, bodyStart,
    * bodyEnd), honoring the word-alignment padding rule. Torn tails are
    * truncated, never thrown.
    */
  private def riffChildren(b: Array[Byte], from: Int,
                           to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var pos = from
    var ok = true
    while (ok && pos + 8 <= to) {
      val size = le32(b, pos + 4)
      val bodyStart = pos + 8
      if (size < 0 || bodyStart + size > to) ok = false
      else {
        out += ((fourcc(b, pos), bodyStart, bodyStart + size.toInt))
        pos = bodyStart + size.toInt + (size.toInt & 1)
      }
    }
    out.result()
  }

  /** REAL video FRAME decode for the one codec the JDK can read:
    * MJPEG-in-AVI. Verifies the container declares an `MJPG` `vids`
    * stream (strh fccHandler), then decodes every `##dc`/`##db` chunk
    * in `movi` (including `rec ` sub-lists) as a JPEG. None for
    * non-AVI, non-MJPG, or frameless payloads — those remain
    * [[decodeStub]] territory (codecs the JDK truly cannot read), and
    * the labeled stub now covers ONLY them.
    */
  def decodeMjpegFrames(bytes: Array[Byte])
      : Option[IndexedSeq[java.awt.image.BufferedImage]] =
    try {
      if (bytes == null || bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
          fourcc(bytes, 8) != "AVI ") None
      else {
        val top = riffChildren(bytes, 12, bytes.length)
        def lt(s: Int) = fourcc(bytes, s)
        val isMjpg = top.exists { case (id, s, e) =>
          id == "LIST" && lt(s) == "hdrl" &&
            riffChildren(bytes, s + 4, e).exists { case (id2, s2, e2) =>
              id2 == "LIST" && lt(s2) == "strl" &&
                riffChildren(bytes, s2 + 4, e2).exists {
                  case ("strh", s3, e3) =>
                    s3 + 8 <= e3 && fourcc(bytes, s3) == "vids" &&
                      fourcc(bytes, s3 + 4) == "MJPG"
                  case _ => false
                }
            }
        }
        if (!isMjpg) None
        else {
          val frames =
            IndexedSeq.newBuilder[java.awt.image.BufferedImage]
          def collect(from: Int, to: Int): Unit =
            riffChildren(bytes, from, to).foreach {
              case ("LIST", s, e) if lt(s) == "rec " => collect(s + 4, e)
              case (id, s, e)
                  if id.length == 4 &&
                    (id.endsWith("dc") || id.endsWith("db")) =>
                val img = javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes, s, e - s))
                if (img != null) frames += img
              case _ => ()
            }
          top.collect { case ("LIST", s, e) if lt(s) == "movi" =>
            collect(s + 4, e)
          }
          val fs = frames.result()
          if (fs.isEmpty) None else Some(fs)
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** REAL video container-metadata decode: (container, width, height,
    * duration_ms) from MP4 box headers (`moov/mvhd` timescale+duration,
    * `moov/trak/tkhd` 16.16 display dims — both spec versions 0 and 1)
    * or the AVI RIFF main header (`hdrl/avih`). None for anything else —
    * the honest answer for a corrupt blob, never an exception. FRAME
    * content still has no JVM codec: [[decodeStub]] remains the labeled
    * stand-in for pixel-level features; this makes the container layer
    * (what a catalog, sampler, or cost model needs: dims + duration)
    * real for the most common asset classes.
    */
  def decodeVideoMeta(bytes: Array[Byte])
      : Option[(String, Int, Int, Long)] =
    try {
      if (bytes == null || bytes.length < 12) None
      else if (fourcc(bytes, 4) == "ftyp") decodeMp4Meta(bytes)
      else if (fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ")
        decodeAviMeta(bytes)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }

  private def decodeMp4Meta(b: Array[Byte])
      : Option[(String, Int, Int, Long)] = {
    // walk a box range, returning each (type, bodyStart, bodyEnd)
    def boxes(from: Int, to: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var pos = from
      while (pos + 8 <= to) {
        val size = be32(b, pos)
        if (size < 8 || pos + size > to) return out.result() // torn/64-bit
        out += ((fourcc(b, pos + 4), pos + 8, pos + size.toInt))
        pos += size.toInt
      }
      out.result()
    }
    val top = boxes(0, b.length)
    for {
      (_, ms, me) <- top.find(_._1 == "moov")
      children = boxes(ms, me)
      (_, hs, _) <- children.find(_._1 == "mvhd")
      (_, ts, te) <- children.find(_._1 == "trak")
      (_, ks, _) <- boxes(ts, te).find(_._1 == "tkhd")
    } yield {
      val mvhdV1 = b(hs) == 1
      val timescale = if (mvhdV1) be32(b, hs + 20) else be32(b, hs + 12)
      val duration =
        if (mvhdV1) (be32(b, hs + 24) << 32) | be32(b, hs + 28)
        else be32(b, hs + 16)
      val dimOff = if (b(ks) == 1) ks + 88 else ks + 76
      val w = (be32(b, dimOff) >> 16).toInt
      val h = (be32(b, dimOff + 4) >> 16).toInt
      ("mp4", w, h,
        if (timescale == 0) 0L else duration * 1000L / timescale)
    }
  }

  private def decodeAviMeta(b: Array[Byte])
      : Option[(String, Int, Int, Long)] = {
    // scan RIFF chunks for LIST('hdrl') then its avih child
    var pos = 12
    while (pos + 8 <= b.length) {
      val id = fourcc(b, pos)
      val size = le32(b, pos)
      if (id == "LIST" && pos + 12 <= b.length &&
          fourcc(b, pos + 8) == "hdrl") {
        var c = pos + 12
        val end = math.min(b.length, pos + 8 + le32(b, pos + 4).toInt)
        while (c + 8 <= end) {
          if (fourcc(b, c) == "avih" && c + 8 + 40 <= b.length) {
            val usPerFrame = le32(b, c + 8)
            val frames = le32(b, c + 24)
            val w = le32(b, c + 40).toInt
            val h = le32(b, c + 44).toInt
            return Some(("avi", w, h, usPerFrame * frames / 1000L))
          }
          c += 8 + le32(b, c + 4).toInt + (le32(b, c + 4).toInt & 1)
        }
        return None
      }
      pos += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    None
  }

  /** Swap VIDEO rows' payloads for real container bytes (MP4 for even
    * ids, AVI for odd): dims `(id%320+32) x (id%240+32)`; MP4 duration
    * `id%5000+500` ms, AVI `id%250+25` frames at 25 fps (40 ms each) —
    * all closed-form in the id, so a SQL oracle recomputes what the
    * parser must extract. Composes after [[withMediaPayloads]].
    */
  def withVideoPayloads(media: DataFrame): DataFrame = {
    val schema = media.schema
    val rdd = media.rdd.mapPartitions { it =>
      it.map { r =>
        if (r.getAs[String]("media_type") != "video") r
        else {
          val id = r.getAs[Long]("media_id")
          val (w, h) = ((id % 320).toInt + 32, (id % 240).toInt + 32)
          val bytes =
            if (id % 2 == 0) syntheticMp4(w, h, id % 5000 + 500)
            else syntheticAvi(w, h, id % 250 + 25)
          Row.fromSeq(r.toSeq.updated(r.fieldIndex("content"), bytes))
        }
      }
    }
    media.sparkSession.createDataFrame(rdd, schema)
  }

  /** REAL pixel-pooled feature for a decoded MJPEG clip: every frame's
    * 32×32 grayscale resample ([[resampleGray32]] — the pHash front
    * end) averaged across frames, then folded into `dim` buckets and
    * normalized to [0, ~1]. Deterministic, content-derived — replaces
    * [[decodeStub]] for the one codec the JDK can actually read.
    */
  private def mjpegPooledFeature(
      frames: IndexedSeq[java.awt.image.BufferedImage],
      dim: Int): Array[Float] = {
    val acc = new Array[Double](32 * 32)
    frames.foreach { img =>
      val g = resampleGray32(img)
      var i = 0
      while (i < acc.length) { acc(i) += g(i); i += 1 }
    }
    val out = new Array[Float](dim)
    var i = 0
    while (i < acc.length) {
      out(i % dim) += (acc(i) / frames.length / 255.0 / (acc.length / dim))
        .toFloat
      i += 1
    }
    out
  }

  /** STUB decode: deterministic fake feature extraction — a dim-`dim` vector
    * of byte-histogram statistics. In production this body is the only thing
    * that changes (JNI codec / ONNX model call per batch); the partition
    * iteration, batch shape, and output schema stay as-is.
    */
  def decodeStub(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Swap image rows' payloads for real PNG bytes (w = id%96+16,
    * h = id%64+16) and audio rows' for real WAV bytes (n = id%4000+100
    * samples at 8 kHz) — bounded, oracle-predictable. Encoding runs
    * inside `mapPartitions` — the PNG/WAV encoders are the same
    * per-task-init codec shape as the decode path.
    */
  def withMediaPayloads(media: DataFrame): DataFrame = {
    val schema = media.schema
    val rdd = media.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-task codec init
      it.map { r =>
        val id = r.getAs[Long]("media_id")
        r.getAs[String]("media_type") match {
          case "image" =>
            val png = syntheticPng((id % 96).toInt + 16, (id % 64).toInt + 16)
            Row.fromSeq(r.toSeq.updated(r.fieldIndex("content"), png))
          case "audio" =>
            val wav = syntheticWav((id % 4000).toInt + 100)
            Row.fromSeq(r.toSeq.updated(r.fieldIndex("content"), wav))
          case _ => r
        }
      }
    }
    media.sparkSession.createDataFrame(rdd, schema)
  }


  /** Feature-extract over a media table: per-partition batched decode.
    * Decode is map-only and embarrassingly parallel, so by DEFAULT the
    * input layout is taken as-is — no exchange before the decode stage
    * (at 100 TB of blobs an unconditional shuffle doubles I/O: every
    * byte written and re-read once before any work happens). When media
    * blobs arrive clustered by size (one parquet file per source) the
    * OPT-IN `rebalance = true` hash-repartitions on media_id first so
    * expected bytes per task even out — a deliberate trade of one blob
    * shuffle for CPU balance, paid only when the caller knows the
    * layout is skewed. Image rows decode for REAL (JDK codecs); A/V
    * rows take the stub.
    */
  // ---- perceptual image hashing (near-dup dedup for the image modality)

  /** 32×32 grayscale area-average resample of a decoded image — integer
    * box averaging (no Graphics2D smoothing, whose kernels vary by JVM),
    * luma-weighted for color rasters. The fixed resample is what makes
    * the hash robust to re-encoding and mild resizing: two saves of the
    * same photo land on (nearly) the same 1024 cells.
    */
  private def resampleGray32(img: java.awt.image.BufferedImage): Array[Double] = {
    val n = 32
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val bands = raster.getNumBands
    val out = new Array[Double](n * n)
    var cy = 0
    while (cy < n) {
      val y0 = cy * h / n; val y1 = math.max((cy + 1) * h / n, y0 + 1)
      var cx = 0
      while (cx < n) {
        val x0 = cx * w / n; val x1 = math.max((cx + 1) * w / n, x0 + 1)
        var sum = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            sum += (if (bands >= 3)
              (299 * raster.getSample(x, y, 0) +
                587 * raster.getSample(x, y, 1) +
                114 * raster.getSample(x, y, 2)) / 1000
            else raster.getSample(x, y, 0))
            x += 1
          }
          y += 1
        }
        val cells = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
        out(cy * n + cx) = sum.toDouble / math.max(cells, 1L)
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** 64-bit DCT perceptual hash (the standard pHash recipe): decode →
    * 32×32 grayscale → 2-D DCT-II → keep the 8×8 low-frequency block →
    * bit = coefficient above the median of the 63 non-DC coefficients
    * (the DC bit is pinned 0 — overall brightness must not vote).
    * Deterministic: fixed resample, fixed summation order, JDK-only.
    * None for undecodable bytes — one bad blob must not kill a scan.
    *
    * Honesty note on stability: bits whose coefficients sit NEAR the
    * median are fragile, and low-texture images (flat fields, pure
    * gradients) have many near-zero coefficients, so small edits can
    * move many bits there. The robust contract is re-encoding/resizing
    * of the SAME content (natural images have spread-out spectra);
    * tune `maxHamming` against measured corpus distances, exactly like
    * LSH band counts.
    */
  def imagePHash(bytes: Array[Byte]): Option[Long] =
    try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map(pHashOfImage)
    catch { case scala.util.control.NonFatal(_) => None }

  /** [[imagePHash]] on an already-decoded raster — shared by the image
    * path (one hash per blob) and the MJPEG video path (one hash per
    * extracted frame; decoding once and hashing n frames must not
    * re-enter the codec).
    */
  def pHashOfImage(img: java.awt.image.BufferedImage): Long = {
      val n = 32
      val g = resampleGray32(img)
      val cosT = Array.tabulate(8, n)((u, x) =>
        math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)))
      val coef = new Array[Double](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0
          var y = 0
          while (y < n) {
            var x = 0
            while (x < n) { s += g(y * n + x) * cosT(u)(x) * cosT(v)(y); x += 1 }
            y += 1
          }
          coef(v * 8 + u) = s
          v += 1
        }
        u += 1
      }
      val nonDc = coef.drop(1).sorted
      val med = nonDc(31) // 63 values, true median
      var hash = 0L
      var i = 1
      while (i < 64) { if (coef(i) > med) hash |= (1L << i); i += 1 }
      hash
  }

  /** Per-image statistics for quality gating: (width, height, gray
    * mean, gray population stddev) — luma-weighted for color rasters,
    * the same gray mapping as [[resampleGray32]].
    */
  def imageStats(bytes: Array[Byte]): Option[(Int, Int, Double, Double)] =
    try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))).map { img =>
      val raster = img.getRaster
      val bands = raster.getNumBands
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0.0; var sumSq = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = if (bands >= 3)
            (299 * raster.getSample(x, y, 0) +
              587 * raster.getSample(x, y, 1) +
              114 * raster.getSample(x, y, 2)) / 1000.0
          else raster.getSample(x, y, 0).toDouble
          sum += g; sumSq += g * g
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val mean = sum / n
      val variance = math.max(sumSq / n - mean * mean, 0.0)
      (w, h, mean, math.sqrt(variance))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode-FREE image dimensions from container headers:
    * (format, width, height) for PNG (IHDR), GIF (logical screen
    * descriptor), BMP (info header, |height| for top-down files) and
    * JPEG (marker scan to the first start-of-frame segment). At crawl
    * scale this is the admission stage that runs BEFORE any decode:
    * it touches at most a few hundred bytes per blob, so tracking
    * pixels, banner strips and truncated files are rejected without
    * paying the decode that dominates [[imageStats]]. None for
    * unrecognized or truncated bytes — never an exception.
    */
  def imageHeaderDims(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null) return None
    def u8(i: Int) = bytes(i) & 0xff
    def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int) =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int) =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    try {
      if (bytes.length >= 24 && u8(0) == 0x89 && bytes(1) == 'P' &&
          bytes(2) == 'N' && bytes(3) == 'G')
        Some(("png", be32(16), be32(20)))
      else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F')
        Some(("gif", le16(6), le16(8)))
      else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M')
        Some(("bmp", le32(18), math.abs(le32(22))))
      else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // segment walk: skip APPn/DQT/... by length to the first SOF
        // (C0-CF minus DHT C4 / JPG C8 / DAC CC), whose payload is
        // [precision u8][height u16][width u16]
        var i = 2
        while (i + 3 < bytes.length) {
          if (u8(i) != 0xff) return None // desynced: not a JPEG stream
          val m = u8(i + 1)
          if (m == 0xff) i += 1 // fill byte
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2
          else {
            val len = be16(i + 2)
            if (len < 2) return None
            if ((m >= 0xc0 && m <= 0xcf) &&
                m != 0xc4 && m != 0xc8 && m != 0xcc) {
              if (i + 8 >= bytes.length) return None
              return Some(("jpeg", be16(i + 7), be16(i + 5)))
            }
            i += 2 + len
          }
        }
        None
      } else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Header-only admission gate: [[imageHeaderDims]] + dimension/aspect
    * rules, map-only with no decode anywhere in the plan. The contrast
    * rule needs pixels and stays in [[imageQualityGate]] — the
    * production composition is header gate first (rejects most junk at
    * header-read cost), full gate over the survivors.
    * Output: (id, format, width, height, keep); unparseable rows carry
    * nulls and keep=false.
    */
  def imageHeaderGate(spark: SparkSession, media: DataFrame,
                      idColName: String = "media_id",
                      contentColName: String = "content",
                      minWidth: Int = 32, minHeight: Int = 32,
                      maxAspect: Double = 4.0): DataFrame = {
    val rdd = media.select(idColName, contentColName).rdd.map { r =>
      imageHeaderDims(r.getAs[Array[Byte]](1)) match {
        case Some((fmt, w, h)) =>
          val aspect = math.max(w, h).toDouble / math.max(math.min(w, h), 1)
          Row(r.getLong(0), fmt, w, h,
            w >= minWidth && h >= minHeight && aspect <= maxAspect)
        case None => Row(r.getLong(0), null, null, null, false)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("keep", BooleanType, nullable = false))))
  }

  /** Multi-format payload fixture for the header-dims gate: per id the
    * content cycles PNG / GIF / JPEG / non-image bytes, dims
    * `(id%96+16, id%64+16)` — closed-form, so the oracle states every
    * (format, width, height, keep) row arithmetically.
    */
  def withMultiFormatPayloads(media: DataFrame): DataFrame = {
    val schema = media.schema
    val rdd = media.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getAs[Long]("media_id")
        val w = (id % 96).toInt + 16; val h = (id % 64).toInt + 16
        val bytes = (id % 4) match {
          case 0 => syntheticPng(w, h)
          case 1 => syntheticGif(w, h, 1, (_, x, y) => (x + y) % 251)
          case 2 =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val ras = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { ras.setSample(x, y, 0, (x + y) % 251); x += 1 }
              y += 1
            }
            encodeJpeg(img)
          case _ => s"not an image:$id".getBytes("UTF-8")
        }
        Row.fromSeq(r.toSeq.updated(r.fieldIndex("content"), bytes))
      }
    }
    media.sparkSession.createDataFrame(rdd, schema)
  }

  /** Gopher-style quality gate for the IMAGE modality: decode map-only
    * (no exchange by default), keep images inside dimension and aspect
    * bounds with at least `minStd` gray contrast — solid fills,
    * tracking pixels, and banner-strip aspect ratios carry no training
    * signal, and at crawl scale they are a large fraction of blobs.
    * Output: (id, width, height, mean_gray, std_gray, keep); rows that
    * do not decode carry null stats and keep=false (the honest answer,
    * never an exception).
    */
  def imageQualityGate(spark: SparkSession, media: DataFrame,
                       idColName: String = "media_id",
                       contentColName: String = "content",
                       minWidth: Int = 32, minHeight: Int = 32,
                       maxAspect: Double = 4.0, minStd: Double = 8.0,
                       rebalance: Boolean = false): DataFrame = {
    val selected = media.select(idColName, contentColName)
    val laid = if (rebalance) selected.repartition(col(idColName))
               else selected
    val rdd = laid.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val stats = Option(r.getAs[Array[Byte]](1)).flatMap(imageStats)
        stats match {
          case Some((w, h, mean, std)) =>
            val aspect = math.max(w, h).toDouble / math.max(math.min(w, h), 1)
            val keep = w >= minWidth && h >= minHeight &&
              aspect <= maxAspect && std >= minStd
            Row(r.getLong(0), w, h,
              math.rint(mean * 100) / 100, math.rint(std * 100) / 100,
              keep)
          case None => Row(r.getLong(0), null, null, null, null, false)
        }
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_gray", DoubleType, nullable = true),
      StructField("std_gray", DoubleType, nullable = true),
      StructField("keep", BooleanType, nullable = false))))
  }

  /** Per-image perceptual hashes: (media_id, phash), rows whose bytes do
    * not decode are dropped (they cannot near-dup anything). Same
    * per-partition batched decode shape as [[extractFeatures]].
    */
  def imageHashes(spark: SparkSession, media: DataFrame,
                  idColName: String = "media_id",
                  contentColName: String = "content",
                  rebalance: Boolean = false): DataFrame = {
    val selected = media.select(idColName, contentColName)
    val laid = if (rebalance) selected.repartition(col(idColName))
               else selected
    val rdd = laid.rdd
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { r =>
          Option(r.getAs[Array[Byte]](1))
            .flatMap(imagePHash)
            .map(h => Row(r.getLong(0), h))
        }
      }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("phash",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Image near-duplicate pairs at corpus scale: pHash banding (the
    * pigeonhole rule — two hashes within Hamming distance `maxHamming`
    * agree on at least one of `maxHamming + 1` bit slices) buckets
    * candidates, [[Dedup.boundedBucketPairs]] caps hot buckets, and the
    * exact Hamming distance verifies. The same shuffle discipline as
    * text SimHash — no decode output ever self-joins unbanded.
    * Output: (id_a, id_b, hamming), id_a < id_b, hamming ≤ maxHamming.
    */
  def imageNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3,
                        idColName: String = "media_id",
                        contentColName: String = "content",
                        maxBucket: Int = 64): DataFrame =
    hashNearDupPairs(imageHashes(spark, media, idColName, contentColName),
      maxHamming, maxBucket)

  /** Shared 64-bit-signature near-dup machinery: pigeonhole banding
    * (`maxHamming + 1` bit slices — two signatures within the bound
    * agree on at least one slice), hot buckets capped through
    * [[Dedup.boundedBucketPairs]], exact Hamming verify. `hashes` is
    * (id, phash). Public at hash grain: any 64-bit signature source
    * (pHash, audio fingerprint, per-frame video hash, or an
    * SQL-derivable surrogate for oracle anchoring) pairs through the
    * same banding/cap/verify path. When no bucket exceeds `maxBucket`
    * the pigeonhole rule makes the candidate set COMPLETE, so the
    * output equals the all-pairs Hamming-≤k self-join — the contract
    * a SQL oracle replays.
    */
  /** The pigeonhole band slices of a 64-bit signature for Hamming bound
    * `maxHamming`: `maxHamming + 1` contiguous bit ranges — two
    * signatures within the bound agree on at least one. Shared by the
    * pair operators at image, audio, and video-frame grain.
    */
  private def bandSlices(maxHamming: Int,
                         hashCol: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    require(maxHamming >= 0 && maxHamming < 64,
      "maxHamming must be in [0, 64)")
    val bands = maxHamming + 1
    (0 until bands).map { b =>
      val start = b * 64 / bands
      val len = (b + 1) * 64 / bands - start
      // len == 64 (the maxHamming=0 single-band case) needs an explicit
      // -1L mask: (1L << 64) == 1L under Java shift semantics, so the
      // naive mask would be 0 and every signature would land in bucket 0
      // — then maxBucket capping silently drops exact-duplicate pairs
      val mask = if (len >= 64) -1L else (1L << len) - 1
      struct(lit(b).as("band"),
        call_function("shiftright", hashCol, lit(start))
          .bitwiseAND(lit(mask)).as("bucket"))
    }
  }

  def hashNearDupPairs(hashes: DataFrame, maxHamming: Int,
                       maxBucket: Int = 64): DataFrame = {
    val banded = hashes.select(col("id"), col("phash"),
        explode(array(bandSlices(maxHamming, col("phash")): _*)).as("u"))
      .select(col("id"), col("phash"), col("u.band").as("band"),
        col("u.bucket").as("bucket"))
    Dedup.boundedBucketPairs(banded, Seq("band", "bucket"), maxBucket,
        Seq(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.phash").as("pa"), col("b.phash").as("pb")))
      .distinct()
      .withColumn("hamming",
        call_function("bit_count",
          col("pa").bitwiseXOR(col("pb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Near-dup CLUSTERS at 64-bit-signature grain: [[hashNearDupPairs]]
    * candidates → [[Dedup.connectedComponents]] (large-star/small-star,
    * O(log n) rounds) → one survivor per cluster (the min id —
    * deterministic, rerun-stable, the same survivor rule as
    * [[Dedup.dedupClusters]]). The pair list alone under-deletes:
    * A~B, B~C must drop two of three even when A~C's Hamming distance
    * missed the bound — clustering is what a media dedup actually
    * ships. Output: (id, cluster_id, is_survivor) for EVERY input
    * signature; singletons survive as their own cluster.
    */
  def hashDedupClusters(hashes: DataFrame, maxHamming: Int,
                        maxBucket: Int = 64): DataFrame = {
    val pairs = hashNearDupPairs(hashes, maxHamming, maxBucket)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val cc = graft.operators.Dedup.connectedComponents(pairs)
    hashes.select(col("id")).distinct()
      .join(cc.withColumnRenamed("component", "__comp"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__comp"), col("id")).as("cluster_id"))
      .withColumn("is_survivor", col("id") === col("cluster_id"))
  }

  /** [[hashDedupClusters]] at image grain: decode → pHash → cluster —
    * the q152 connected-components shape composed over the image
    * modality (verdict r7 #8).
    */
  def imageDedupClusters(spark: SparkSession, media: DataFrame,
                         maxHamming: Int = 3,
                         idColName: String = "media_id",
                         contentColName: String = "content",
                         maxBucket: Int = 64,
                         rebalance: Boolean = false): DataFrame =
    hashDedupClusters(
      imageHashes(spark, media, idColName, contentColName, rebalance),
      maxHamming, maxBucket)

  /** Incremental (batch-vs-corpus) dedup at 64-bit-signature grain —
    * [[graft.operators.Dedup.incrementalDedup]]'s media sibling: a new
    * ingest batch of signatures (pHash, audio fingerprint, frame hash)
    * is admitted against an existing corpus WITHOUT the corpus ever
    * self-joining. Probe-first discipline: corpus band rows are
    * restricted to the batch's touched buckets (left_semi) before the
    * occupancy cap, so per-ingest cost tracks the batch. Near edges
    * (batch↔corpus and batch↔batch, Hamming ≤ `maxHamming`) feed
    * [[Dedup.connectedComponents]]; a batch signature connected to any
    * corpus signature is rejected with `dup_of` = the smallest matching
    * corpus id, within-batch groups keep the smallest batch id.
    * Corpus and batch id spaces must be disjoint (same contract as the
    * text operator). At maxHamming=0 connectivity is signature
    * equality (transitive), which is what lets the q199 oracle state
    * the expected output in plain SQL.
    * Output: (id, is_admitted, dup_of) for every batch row.
    */
  /** The banded form of an (id, phash) frame — one row per pigeonhole
    * slice: (id, phash, band, bucket). This is the at-rest layout of a
    * persisted signature index (bucket-pruned streaming probes scan it
    * by `bucket`), and the probe-side frame of the incremental dedup.
    * `maxHamming` must match between index build and probe — it fixes
    * the band count.
    */
  def bandedHashes(hashes: DataFrame, maxHamming: Int): DataFrame =
    hashes.select(col("id"), col("phash"),
        explode(array(bandSlices(maxHamming, col("phash")): _*)).as("u"))
      .select(col("id"), col("phash"), col("u.band").as("band"),
        col("u.bucket").as("bucket"))

  def incrementalHashDedup(corpusHashes: DataFrame, batchHashes: DataFrame,
                           maxHamming: Int = 3,
                           maxBucket: Int = 64): DataFrame =
    incrementalHashDedupAgainstIndex(
      bandedHashes(corpusHashes, maxHamming), batchHashes, maxHamming,
      maxBucket)

  /** [[incrementalHashDedup]] with the corpus side ALREADY banded —
    * the form a persisted signature index stores, so a streaming sink
    * can hand in a bucket-pruned scan of the stored index instead of
    * re-banding the corpus every trigger.
    */
  def incrementalHashDedupAgainstIndex(corpusBanded: DataFrame,
                                       batchHashes: DataFrame,
                                       maxHamming: Int = 3,
                                       maxBucket: Int = 64): DataFrame = {
    def ham(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("bit_count", a.bitwiseXOR(b)).cast("int")
    val bandedB = bandedHashes(batchHashes, maxHamming)
    // probe-first: only corpus rows in batch-touched buckets enter the
    // cap window — the per-trigger sort is O(probed buckets)
    val bandedC = corpusBanded
      .join(bandedB.select("band", "bucket").distinct(),
        Seq("band", "bucket"), "left_semi")
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("id"))
    val cappedC = bandedC
      .withColumn("__rn", row_number().over(wBucket))
      .filter(col("__rn") <= maxBucket).drop("__rn")
    val candBC = bandedB.select(col("id").as("id_b"),
        col("phash").as("pb"), col("band"), col("bucket"))
      .join(cappedC.select(col("id").as("id_c"), col("phash").as("pc"),
        col("band"), col("bucket")), Seq("band", "bucket"))
      .select(col("id_b"), col("id_c"), col("pb"), col("pc")).distinct()
      .filter(ham(col("pb"), col("pc")) <= maxHamming)
      .select(col("id_b").as("src"), col("id_c").as("dst"))
    val candBB = Dedup.boundedBucketPairs(bandedB, Seq("band", "bucket"),
        maxBucket, Seq(col("a.id").as("id_b"), col("b.id").as("id_c"),
          col("a.phash").as("pb"), col("b.phash").as("pc")))
      .distinct()
      .filter(ham(col("pb"), col("pc")) <= maxHamming)
      .select(col("id_b").as("src"), col("id_c").as("dst"))
    val cc = Dedup.connectedComponents(candBC.union(candBB))
    val compCorpusMin = cc
      .join(corpusBanded.select(col("id")).distinct(), "id")
      .groupBy(col("component")).agg(min(col("id")).as("corpus_min"))
    batchHashes.select(col("id")).distinct()
      .join(cc, Seq("id"), "left")
      .join(compCorpusMin, Seq("component"), "left")
      .select(col("id"),
        (col("component").isNull ||
          (col("corpus_min").isNull && col("id") === col("component")))
          .as("is_admitted"),
        when(col("corpus_min").isNotNull, col("corpus_min"))
          .when(col("id") =!= col("component"), col("component"))
          .otherwise(lit(null).cast("long")).as("dup_of"))
  }

  /** Per-frame perceptual hashes for MJPEG-AVI clips: one
    * (video_id, frame_idx, phash) row per decodable frame — real JPEG
    * decode ([[decodeMjpegFrames]]) + the image [[pHashOfImage]], inside
    * the same map-only per-partition decode shape as [[imageHashes]]
    * (no exchange by default; `rebalance` opts in). Non-MJPG payloads
    * yield no rows.
    */
  def videoFrameHashes(spark: SparkSession, media: DataFrame,
                       idColName: String = "media_id",
                       contentColName: String = "content",
                       rebalance: Boolean = false): DataFrame = {
    val selected = media.select(idColName, contentColName)
    val laid = if (rebalance) selected.repartition(col(idColName))
               else selected
    val rdd = laid.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        Option(r.getAs[Array[Byte]](1)).flatMap(decodeVideoFrames)
          .toSeq.flatMap(_.zipWithIndex.map { case (img, i) =>
            Row(r.getLong(0), i, pHashOfImage(img))
          })
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("video_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("phash", LongType, nullable = false))))
  }

  /** Video-pair overlap at frame-signature grain: two clips pair when
    * they share at least `minShared` distinct frame signatures within
    * Hamming distance `maxHamming` (a re-encoded/resized copy shares
    * nearly all of them; unrelated clips share none). Candidate frame
    * matches come from the SAME pigeonhole banding + bounded buckets as
    * [[hashNearDupPairs]] — per-signature rows, never an all-frames
    * self-join — then aggregate to (id_a, id_b, n_shared), id_a < id_b.
    * When no bucket caps, the result equals the all-pairs definition a
    * SQL oracle states. Input: (video_id, phash) — extra columns (e.g.
    * frame_idx) are ignored; repeats of a signature inside one clip
    * count once.
    */
  def frameOverlapPairs(frames: DataFrame, maxHamming: Int = 3,
                        minShared: Int = 2,
                        maxBucket: Int = 1024): DataFrame = {
    val f = frames.select(col("video_id"), col("phash")).distinct()
    val banded = f.select(col("video_id").as("id"), col("phash"),
        explode(array(bandSlices(maxHamming, col("phash")): _*)).as("u"))
      .select(col("id"), col("phash"), col("u.band").as("band"),
        col("u.bucket").as("bucket"))
    Dedup.boundedBucketPairs(banded, Seq("band", "bucket"), maxBucket,
        Seq(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.phash").as("pa"), col("b.phash").as("pb")))
      .distinct()
      .filter(call_function("bit_count",
        col("pa").bitwiseXOR(col("pb"))).cast("int") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(countDistinct(least(col("pa"), col("pb")),
        greatest(col("pa"), col("pb"))).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Incremental (batch-vs-corpus) VIDEO dedup at frame-signature
    * grain: a batch clip is rejected when it shares ≥ `minShared`
    * distinct frame signatures (within Hamming `maxHamming`) with any
    * single corpus clip — or, within the batch, with an
    * earlier-admitted clip ([[frameOverlapPairs]]' threshold as an
    * admission rule, [[incrementalHashDedup]]'s component labeling).
    * `corpusFrames`/`batchFrames` are (video_id, phash) frames — id
    * spaces disjoint. Probe-first: corpus rows restrict to the batch's
    * touched buckets before capping, so per-ingest cost tracks the
    * batch. Output: (id, is_admitted, dup_of) per batch video.
    */
  def incrementalFrameDedup(corpusFrames: DataFrame,
                            batchFrames: DataFrame,
                            maxHamming: Int = 3, minShared: Int = 2,
                            maxBucket: Int = 1024): DataFrame =
    incrementalFrameDedupAgainstIndex(
      bandedHashes(corpusFrames.select(col("video_id").as("id"),
        col("phash")).distinct(), maxHamming),
      batchFrames, maxHamming, minShared, maxBucket)

  /** [[incrementalFrameDedup]] with the corpus side already banded
    * (the persisted frame-index layout — one row per distinct
    * (video, signature) per band slice).
    */
  def incrementalFrameDedupAgainstIndex(corpusBanded: DataFrame,
                                        batchFrames: DataFrame,
                                        maxHamming: Int = 3,
                                        minShared: Int = 2,
                                        maxBucket: Int = 1024): DataFrame = {
    def ham(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("bit_count", a.bitwiseXOR(b)).cast("int")
    val bandedB = bandedHashes(
      batchFrames.select(col("video_id").as("id"), col("phash")).distinct(),
      maxHamming)
    val bandedC = corpusBanded
      .join(bandedB.select("band", "bucket").distinct(),
        Seq("band", "bucket"), "left_semi")
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bucket")).orderBy(col("id"))
    val cappedC = bandedC
      .withColumn("__rn", row_number().over(wBucket))
      .filter(col("__rn") <= maxBucket).drop("__rn")
    def overlapEdges(left: DataFrame, right: DataFrame): DataFrame =
      left.select(col("id").as("id_b"), col("phash").as("pb"),
          col("band"), col("bucket"))
        .join(right.select(col("id").as("id_c"), col("phash").as("pc"),
          col("band"), col("bucket")), Seq("band", "bucket"))
        .filter(col("id_b") =!= col("id_c"))
        .select(col("id_b"), col("id_c"), col("pb"), col("pc")).distinct()
        .filter(ham(col("pb"), col("pc")) <= maxHamming)
        .groupBy(col("id_b"), col("id_c"))
        .agg(countDistinct(least(col("pb"), col("pc")),
          greatest(col("pb"), col("pc"))).as("n_shared"))
        .filter(col("n_shared") >= minShared)
        .select(col("id_b").as("src"), col("id_c").as("dst"))
    val bc = overlapEdges(bandedB, cappedC)
    val bb = overlapEdges(bandedB, bandedB)
      .filter(col("src") < col("dst")) // one edge per unordered pair
    val cc = Dedup.connectedComponents(bc.union(bb))
    val compCorpusMin = cc
      .join(corpusBanded.select(col("id")).distinct(), "id")
      .groupBy(col("component")).agg(min(col("id")).as("corpus_min"))
    batchFrames.select(col("video_id").as("id")).distinct()
      .join(cc, Seq("id"), "left")
      .join(compCorpusMin, Seq("component"), "left")
      .select(col("id"),
        (col("component").isNull ||
          (col("corpus_min").isNull && col("id") === col("component")))
          .as("is_admitted"),
        when(col("corpus_min").isNotNull, col("corpus_min"))
          .when(col("id") =!= col("component"), col("component"))
          .otherwise(lit(null).cast("long")).as("dup_of"))
  }

  /** Video near-duplicate pairs end-to-end: real MJPEG frame decode →
    * per-frame pHash → frame-signature overlap. The honest video-dedup
    * operator for the codec the JDK can read; clips in other codecs
    * contribute no frames and therefore no pairs.
    */
  def videoNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3, minShared: Int = 2,
                        idColName: String = "media_id",
                        contentColName: String = "content",
                        maxBucket: Int = 1024,
                        rebalance: Boolean = false): DataFrame =
    frameOverlapPairs(
      videoFrameHashes(spark, media, idColName, contentColName, rebalance),
      maxHamming, minShared, maxBucket)

  /** 64-bit audio fingerprint: decode 16-bit PCM, mix channels, split
    * the sample stream into 65 equal windows, mean energy per window,
    * bit i = energy(i+1) > energy(i) — the energy-delta-sign signature
    * (the Shazam-family shape reduced to one band; Wang 2003). Positive
    * volume scaling multiplies every window's energy equally, so the
    * comparisons — and the fingerprint — are GAIN-INVARIANT by
    * construction. Honest bounds: it is NOT time-shift-invariant (no
    * overlapping windows) and one energy profile can collide across
    * different audio; tune `maxHamming` against measured distances like
    * any LSH parameter. None for undecodable or sub-130-sample payloads.
    */
  /** Decode 16-bit little-endian PCM to channel-mixed frame values plus
    * the sample rate — the shared front end of both audio fingerprints.
    * None for non-PCM payloads or clips under `minFrames`.
    */
  private def decodePcmFrames(bytes: Array[Byte],
                              minFrames: Int): Option[(Float, Array[Long])] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian ||
            f.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = ais.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = ais.read(buf) }
          val pcm = bos.toByteArray
          val ch = f.getChannels
          val nFrames = (pcm.length / 2) / ch
          if (nFrames < minFrames) None
          else {
            val frames = new Array[Long](nFrames)
            var i = 0
            while (i < nFrames) {
              var s = 0L
              var c = 0
              while (c < ch) {
                val o = 2 * (i * ch + c)
                s += (((pcm(o + 1) & 0xff) << 8) | (pcm(o) & 0xff)).toShort
                c += 1
              }
              frames(i) = s
              i += 1
            }
            Some((f.getSampleRate, frames))
          }
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    decodePcmFrames(bytes, minFrames = 130).map { case (_, frames) =>
      val nFrames = frames.length
      val e = new Array[Double](65)
      var w = 0
      while (w < 65) {
        val a = w * nFrames / 65
        val b = math.max((w + 1) * nFrames / 65, a + 1)
        var s = 0.0
        var j = a
        while (j < math.min(b, nFrames)) {
          s += frames(j).toDouble * frames(j); j += 1
        }
        e(w) = s / (math.min(b, nFrames) - a)
        w += 1
      }
      var hash = 0L
      var k = 0
      while (k < 64) { if (e(k + 1) > e(k)) hash |= (1L << k); k += 1 }
      hash
    }

  /** 64-bit SPECTRAL audio fingerprint — the Haitsma–Kalker robust-hash
    * shape ("A Highly Robust Audio Fingerprint System", 2002) reduced
    * to one clip signature: 9 time windows × 9 log-spaced frequency
    * bands (Goertzel power at each band center), bit(w, b) = sign of
    * the time-delta of the band-delta,
    * `(E(w,b) − E(w,b+1)) − (E(w+1,b) − E(w+1,b+1)) > 0` — 8×8 = 64
    * bits. GAIN-INVARIANT by construction (positive scaling multiplies
    * every energy by the same factor; double differences keep their
    * sign) and FREQUENCY-SENSITIVE where [[audioFingerprint]]'s single
    * broadband energy profile is not: two clips with the same loudness
    * envelope but different spectra (a hum vs speech) now separate.
    * Honest bounds: one signature per clip is not time-shift-invariant
    * and is far coarser than a production per-frame constellation —
    * tune `maxHamming` against measured distances, like any LSH
    * parameter. Plugs into [[hashNearDupPairs]] /
    * [[incrementalHashDedup]] / the streaming media admission sink as a
    * `bytes => Option[Long]` hasher.
    */
  def audioSpectralFingerprint(bytes: Array[Byte]): Option[Long] =
    decodePcmFrames(bytes, minFrames = 512).map { case (rate, frames) =>
      val nFrames = frames.length
      val nW = 9; val nB = 9
      // log-spaced band centers from 300 Hz to ~rate/2·0.9, Goertzel
      // power per (window, band)
      val fMin = 300.0
      val fMax = math.min(rate / 2.0 * 0.9, 3600.0)
      val e = Array.ofDim[Double](nW, nB)
      var w = 0
      while (w < nW) {
        val a = w * nFrames / nW
        val b = math.max((w + 1) * nFrames / nW, a + 1)
        val len = math.min(b, nFrames) - a
        var bi = 0
        while (bi < nB) {
          val freq = fMin * math.pow(fMax / fMin, bi.toDouble / (nB - 1))
          val omega = 2.0 * math.Pi * freq / rate
          val coeff = 2.0 * math.cos(omega)
          var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
          var j = a
          while (j < a + len) {
            s0 = frames(j).toDouble + coeff * s1 - s2
            s2 = s1; s1 = s0
            j += 1
          }
          e(w)(bi) = (s1 * s1 + s2 * s2 - coeff * s1 * s2) / len
          bi += 1
        }
        w += 1
      }
      var hash = 0L
      var i = 0
      while (i < 64) {
        val w0 = i / 8; val b0 = i % 8
        val d = (e(w0)(b0) - e(w0)(b0 + 1)) -
          (e(w0 + 1)(b0) - e(w0 + 1)(b0 + 1))
        if (d > 0) hash |= (1L << i)
        i += 1
      }
      hash
    }

  /** Per-clip audio fingerprints: (id, phash), undecodable rows dropped —
    * [[imageHashes]]' audio sibling.
    */
  def audioHashes(spark: SparkSession, media: DataFrame,
                  idColName: String = "media_id",
                  contentColName: String = "content",
                  rebalance: Boolean = false): DataFrame = {
    val selected = media.select(idColName, contentColName)
    val laid = if (rebalance) selected.repartition(col(idColName))
               else selected
    val rdd = laid.rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          Option(r.getAs[Array[Byte]](1))
            .flatMap(audioFingerprint)
            .map(h => Row(r.getLong(0), h))
        }
      }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("phash",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Audio near-duplicate pairs — [[imageNearDupPairs]]' audio sibling
    * over [[audioFingerprint]] signatures, same banding/cap/verify.
    */
  def audioNearDupPairs(spark: SparkSession, media: DataFrame,
                        maxHamming: Int = 3,
                        idColName: String = "media_id",
                        contentColName: String = "content",
                        maxBucket: Int = 64): DataFrame =
    hashNearDupPairs(audioHashes(spark, media, idColName, contentColName),
      maxHamming, maxBucket)

  /** Constellation LANDMARKS — the per-frame fingerprint shape the
    * one-signature [[audioSpectralFingerprint]] honestly is not (Wang
    * 2003's anchor/target hashing, ISMIR): the clip is windowed
    * (`winFrames` samples, `hopFrames` hop), each window's spectral
    * PEAK band (argmax of `nBands` log-spaced Goertzel powers) becomes
    * a constellation point, and each anchor window pairs with its next
    * `fanout` windows into a landmark key `(peakA, peakB, dt)` stamped
    * with the anchor's window offset. TIME-SHIFT-INVARIANT matching
    * falls out: shifting audio by k hops shifts every offset by k but
    * changes no key, so a true match concentrates its key hits at ONE
    * offset delta — which [[landmarkMatchPairs]] counts as votes.
    * Gain-invariant (argmax survives positive scaling). Near-silent
    * windows (RMS under 5% of the clip RMS) emit no landmarks —
    * silence is the stopword of audio matching. None for non-PCM or
    * clips shorter than two windows. Output: (landmarkKey, anchorWindow).
    */
  def audioLandmarks(bytes: Array[Byte], nBands: Int = 16,
                     winFrames: Int = 256, hopFrames: Int = 128,
                     fanout: Int = 3): Option[Array[(Int, Int)]] =
    decodePcmFrames(bytes, minFrames = winFrames + hopFrames)
      .map { case (rate, frames) =>
        val nW = (frames.length - winFrames) / hopFrames + 1
        val fMin = 300.0
        val fMax = math.min(rate / 2.0 * 0.9, 3600.0)
        // clip-level RMS for the silence gate (relative ⇒ gain-invariant)
        var sumSq = 0.0
        var i = 0
        while (i < frames.length) {
          sumSq += frames(i).toDouble * frames(i); i += 1
        }
        val clipRms = math.sqrt(sumSq / frames.length)
        val peaks = new Array[Int](nW) // -1 = silent window
        var w = 0
        while (w < nW) {
          val a = w * hopFrames
          var wSq = 0.0
          var j = a
          while (j < a + winFrames) {
            wSq += frames(j).toDouble * frames(j); j += 1
          }
          val winRms = math.sqrt(wSq / winFrames)
          if (winRms < 0.05 * clipRms) peaks(w) = -1
          else {
            var best = 0; var bestP = -1.0
            var bi = 0
            while (bi < nBands) {
              val freq =
                fMin * math.pow(fMax / fMin, bi.toDouble / (nBands - 1))
              val omega = 2.0 * math.Pi * freq / rate
              val coeff = 2.0 * math.cos(omega)
              var s1 = 0.0; var s2 = 0.0
              var k = a
              while (k < a + winFrames) {
                val s0 = frames(k).toDouble + coeff * s1 - s2
                s2 = s1; s1 = s0
                k += 1
              }
              val p = s1 * s1 + s2 * s2 - coeff * s1 * s2
              if (p > bestP) { bestP = p; best = bi }
              bi += 1
            }
            peaks(w) = best
          }
          w += 1
        }
        val out = Array.newBuilder[(Int, Int)]
        var t = 0
        while (t < nW) {
          if (peaks(t) >= 0) {
            var dt = 1
            while (dt <= fanout && t + dt < nW) {
              if (peaks(t + dt) >= 0)
                out += (((peaks(t) * nBands + peaks(t + dt)) * (fanout + 1)
                  + dt, t))
              dt += 1
            }
          }
          t += 1
        }
        out.result()
      }

  /** Per-clip landmark table: (id, lkey, toff) — [[audioHashes]]' shape
    * at landmark grain, the frame a persisted constellation index
    * stores. Undecodable rows contribute no landmarks.
    */
  def audioLandmarkTable(spark: SparkSession, media: DataFrame,
                         idColName: String = "media_id",
                         contentColName: String = "content",
                         nBands: Int = 16, winFrames: Int = 256,
                         hopFrames: Int = 128, fanout: Int = 3,
                         rebalance: Boolean = false): DataFrame = {
    val selected = media.select(idColName, contentColName)
    val laid = if (rebalance) selected.repartition(col(idColName))
               else selected
    val rdd = laid.rdd.mapPartitions { it =>
      it.flatMap { r =>
        Option(r.getAs[Array[Byte]](1))
          .flatMap(b => audioLandmarks(b, nBands, winFrames, hopFrames,
            fanout))
          .toSeq.flatMap(_.map { case (k, t) => Row(r.getLong(0), k, t) })
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lkey", IntegerType, nullable = false),
      StructField("toff", IntegerType, nullable = false))))
  }

  /** Offset-coherent landmark matching — the Shazam vote histogram as a
    * relational aggregate: clips sharing a landmark key vote for the
    * offset delta between their anchors; a TRUE match (copy, shifted
    * copy, re-encode) concentrates votes at one delta, unrelated clips
    * scatter. Output one row per matched unordered pair:
    * (id_a, id_b, votes, t_offset) with id_a < id_b, `votes` = the
    * winning delta's count (ties break to the larger delta — stated, so
    * an oracle can mirror it), kept when votes ≥ `minVotes`.
    *
    * Scale: ONE equi-join on the landmark key. Keys hit by more than
    * `maxKeyFreq` clips are DROPPED first (the IR stopword move — a key
    * that common identifies nothing and only manufactures join volume),
    * so per-key join fan-out is bounded by `maxKeyFreq`² and the plan
    * never approaches an all-pairs clip join. The key-frequency
    * aggregate and the vote histogram are both map-side-combinable hash
    * aggregates.
    */
  def landmarkMatchPairs(landmarks: DataFrame, minVotes: Int = 3,
                         maxKeyFreq: Int = 64): DataFrame = {
    val l = landmarks.select(col("id"), col("lkey"), col("toff")).distinct()
    val rare = l.groupBy(col("lkey"))
      .agg(countDistinct(col("id")).as("kf"))
      .filter(col("kf") <= maxKeyFreq)
      .select(col("lkey"))
    val pruned = l.join(rare, "lkey")
    val votes = pruned.as("a").join(pruned.as("b"), Seq("lkey"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (col("b.toff") - col("a.toff")).as("delta"))
      .groupBy(col("id_a"), col("id_b"), col("delta"))
      .agg(count(lit(1)).as("c"))
    votes.groupBy(col("id_a"), col("id_b"))
      .agg(max(struct(col("c"), col("delta"))).as("m"))
      .select(col("id_a"), col("id_b"), col("m.c").as("votes"),
        col("m.delta").as("t_offset"))
      .filter(col("votes") >= minVotes)
  }

  /** Catalog name for a stored landmark index at `path` (path-derived,
    * so two indexes never collide in the shared session catalog). */
  private[graft] def landmarkIndexTableName(path: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
    s"graft_lmk_${h}_landmarks"
  }

  /** Persist a constellation index: the corpus's (id, lkey, toff)
    * landmarks as a BUCKETED catalog table at `path`, bucketed AND
    * sorted by `lkey` — the [[graft.operators.TextAnalysis.bm25WriteIndex]]
    * layout at landmark grain. An ingest batch's key set becomes an
    * IN-list probe that reads only the matching bucket files
    * (`SelectedBucketsCount`), so per-ingest I/O tracks the BATCH's
    * landmarks, not the stored corpus — the serving property that lets
    * a million-clip constellation index answer "is this clip a shifted
    * copy of anything we have?" without ever rescanning itself.
    */
  def landmarkWriteIndex(spark: SparkSession, landmarks: DataFrame,
                         path: String, buckets: Int = 64): Unit = {
    import org.apache.spark.sql.SaveMode
    val table = landmarkIndexTableName(path)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path, "landmarks"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_lmk_meta.json"),
      s"""{"layout":"lmk-v1","buckets":$buckets}""")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    createLandmarkTable(spark, table, path, buckets)
    landmarks.select(col("id").cast("long").as("id"),
        col("lkey").cast("int").as("lkey"),
        col("toff").cast("int").as("toff")).distinct()
      .write.mode(SaveMode.Overwrite).insertInto(table)
  }

  private def createLandmarkTable(spark: SparkSession, table: String,
                                  path: String, buckets: Int): Unit =
    spark.sql(
      s"""CREATE TABLE $table (id BIGINT, lkey INT, toff INT)
         |USING parquet OPTIONS (path '$path/landmarks')
         |CLUSTERED BY (lkey) SORTED BY (lkey) INTO $buckets BUCKETS
         |""".stripMargin)

  /** Idempotent catalog attach for a stored landmark index: a FRESH
    * session (serving restart) re-binds to the on-disk layout via pure
    * DDL — bucket count comes from the index's own `_lmk_meta.json`,
    * so the catalog entry can never disagree with the files.
    */
  private[graft] def ensureLandmarkTable(spark: SparkSession,
                                         path: String): String = {
    val table = landmarkIndexTableName(path)
    if (!spark.catalog.tableExists(table)) {
      val meta = java.nio.file.Files.readString(
        java.nio.file.Paths.get(path, "_lmk_meta.json"))
      val buckets = "\"buckets\":(\\d+)".r.findFirstMatchIn(meta)
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalStateException(
          s"no bucket count in $path/_lmk_meta.json"))
      createLandmarkTable(spark, table, path, buckets)
    }
    table
  }

  /** Probe a [[landmarkWriteIndex]] store with an ingest batch's
    * landmarks: batch-vs-corpus offset-coherent matching whose corpus
    * side is bucket-pruned to the batch's keys (driver-collected
    * IN-list, capped at `maxKeys` with a full-scan fallback — a batch
    * is small by the incremental contract). Votes, tie-break, and the
    * stopword cap (key frequency counted over corpus ∪ batch at the
    * probed keys — pruning other keys cannot change those counts)
    * match [[landmarkMatchPairs]] exactly: the result equals the
    * in-memory operator over corpus ∪ batch restricted to
    * corpus-batch pairs (pinned in WebMediaSpec). Id spaces must be
    * disjoint. Output: (id_a, id_b, votes, t_offset), id_a < id_b.
    */
  def landmarkMatchAgainstStoredIndex(spark: SparkSession, path: String,
                                      batchLandmarks: DataFrame,
                                      minVotes: Int = 3,
                                      maxKeyFreq: Int = 64,
                                      maxKeys: Int = 1 << 16): DataFrame = {
    val batch = batchLandmarks.select(col("id").cast("long").as("id"),
      col("lkey").cast("int").as("lkey"),
      col("toff").cast("int").as("toff")).distinct()
    val keys = batch.select(col("lkey")).distinct()
      // collect-bound: <= maxKeys+1 distinct landmark keys (limit-capped)
      .limit(maxKeys + 1).collect().map(_.getInt(0))
    val corpus0 = spark.table(ensureLandmarkTable(spark, path))
    // literal/join crossover (the Streams.keysFilter rule): a literal
    // IN is what fires bucket pruning, but only while the list is
    // small; past ~1k keys pruning would select nearly every bucket
    // anyway and the literal list bloats the plan — switch to a
    // broadcast semi join (plan size O(1) in key count)
    val corpus =
      if (keys.length > maxKeys) corpus0
      else if (keys.length <= 1024)
        corpus0.filter(col("lkey").isInCollection(keys.toIndexedSeq))
      else corpus0.join(
        broadcast(batch.select(col("lkey")).distinct()),
        Seq("lkey"), "left_semi")
    val kf = corpus.select("id", "lkey").unionByName(batch.select("id", "lkey"))
      .groupBy(col("lkey")).agg(countDistinct(col("id")).as("kf"))
      .filter(col("kf") <= maxKeyFreq).select(col("lkey"))
    val votes = corpus.join(kf, "lkey").as("c")
      .join(batch.join(kf, "lkey").as("b"), Seq("lkey"))
      .filter(col("c.id") =!= col("b.id"))
      .select(least(col("c.id"), col("b.id")).as("id_a"),
        greatest(col("c.id"), col("b.id")).as("id_b"),
        when(col("c.id") < col("b.id"), col("b.toff") - col("c.toff"))
          .otherwise(col("c.toff") - col("b.toff")).as("delta"))
      .groupBy(col("id_a"), col("id_b"), col("delta"))
      .agg(count(lit(1)).as("c"))
    votes.groupBy(col("id_a"), col("id_b"))
      .agg(max(struct(col("c"), col("delta"))).as("m"))
      .select(col("id_a"), col("id_b"), col("m.c").as("votes"),
        col("m.delta").as("t_offset"))
      .filter(col("votes") >= minVotes)
  }

  /** Audio match pairs end-to-end: PCM decode → constellation landmarks
    * → offset-coherent votes. The time-shift-robust audio dedup
    * operator; [[audioNearDupPairs]] (one signature per clip) remains
    * the cheaper shift-SENSITIVE form.
    */
  def audioMatchPairs(spark: SparkSession, media: DataFrame,
                      minVotes: Int = 3,
                      idColName: String = "media_id",
                      contentColName: String = "content",
                      maxKeyFreq: Int = 64,
                      rebalance: Boolean = false): DataFrame =
    landmarkMatchPairs(
      audioLandmarkTable(spark, media, idColName, contentColName,
        rebalance = rebalance),
      minVotes, maxKeyFreq)

  def extractFeatures(spark: SparkSession, media: DataFrame,
                      dim: Int = 8,
                      rebalance: Boolean = false): DataFrame = {
    val selected = media.select("media_id", "media_type", "content")
    val laid = if (rebalance) selected.repartition(col("media_id"))
               else selected
    val rdd = laid.rdd
      .mapPartitions { it =>
        // per-task init happens once here (codec/model load in production)
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val nb = if (bytes == null) 0 else bytes.length
          // MJPG and GIF clips get a REAL pixel-pooled feature (decode
          // every frame, average the 32×32 grayscale resamples); the
          // stub now covers only codecs the JDK cannot read
          val mj = if (bytes == null || r.getString(1) != "video") None
                   else decodeVideoFrames(bytes)
          val feat = if (bytes == null) null
                     else mj.map(fs => mjpegPooledFeature(fs, dim).toSeq)
                       .getOrElse(decodeStub(bytes, dim).toSeq)
          val img = if (bytes == null || r.getString(1) != "image") None
                    else decodeImage(bytes)
          val aud = if (bytes == null || r.getString(1) != "audio") None
                    else decodeAudio(bytes)
          val vid = if (bytes == null || r.getString(1) != "video") None
                    else decodeVideoMeta(bytes)
          Row(r.getLong(0), r.getString(1), nb, feat,
            img.map(d => Long.box(d._1.toLong))
              .orElse(vid.map(d => Long.box(d._2.toLong))).orNull,
            img.map(d => Long.box(d._2.toLong))
              .orElse(vid.map(d => Long.box(d._3.toLong))).orNull,
            img.map(d => Long.box(d._3)).orNull,
            aud.map(d => Long.box(d._1)).orNull,
            aud.map(d => Long.box(d._2)).orNull,
            aud.map(d => Long.box(d._3)).orNull,
            vid.map(_._1).orNull,
            vid.map(d => Long.box(d._4)).orNull)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
