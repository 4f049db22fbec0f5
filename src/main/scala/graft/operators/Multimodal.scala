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
  * sample rate, frame count, and an exact signed-sample sum. Only VIDEO
  * decode stays STUBBED (`decodeStub` — no video codec in the JDK): a
  * deterministic fake feature vector from the bytes. Everything around
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
    StructField("sample_sum", LongType, nullable = true)))

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
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = (i % 200) - 100
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
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
    * Decode is CPU-bound, and media blobs often arrive clustered by size
    * (one parquet file per source), so hash-repartition on media_id first —
    * expected bytes per task even out regardless of input file layout.
    * Image rows decode for REAL (JDK codecs); A/V rows take the stub.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      dim: Int = 8): DataFrame = {
    val rdd = media.select("media_id", "media_type", "content")
      .repartition(col("media_id")).rdd
      .mapPartitions { it =>
        // per-task init happens once here (codec/model load in production)
        javax.imageio.ImageIO.setUseCache(false)
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val nb = if (bytes == null) 0 else bytes.length
          val feat = if (bytes == null) null
                     else decodeStub(bytes, dim).toSeq
          val img = if (bytes == null || r.getString(1) != "image") None
                    else decodeImage(bytes)
          val aud = if (bytes == null || r.getString(1) != "audio") None
                    else decodeAudio(bytes)
          Row(r.getLong(0), r.getString(1), nb, feat,
            img.map(d => Long.box(d._1.toLong)).orNull,
            img.map(d => Long.box(d._2.toLong)).orNull,
            img.map(d => Long.box(d._3)).orNull,
            aud.map(d => Long.box(d._1)).orNull,
            aud.map(d => Long.box(d._2)).orNull,
            aud.map(d => Long.box(d._3)).orNull)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
