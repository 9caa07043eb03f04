package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus batch feature-extraction
  * operators.
  *
  * The actual media decode is STUBBED (this container has no image/
  * audio libraries): `fakeDecodeFeatures` derives a deterministic
  * feature vector from the raw bytes (a normalized byte histogram), so
  * the Spark-side contract — schema, partition-preserving per-batch
  * processing, output shape — is real and tested, and swapping the
  * stub for a JNI/codec decoder changes only the inner function.
  *
  * Scale notes: mapPartitions keeps the decode batched per partition
  * (one codec init per partition, not per row), never collects, and
  * preserves the input partitioning.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Synthesize a deterministic media table from any keyed frame —
    * stands in for `spark.read.format("binaryFile")` on a media corpus.
    */
  def synthesize(df: DataFrame, idCol: String, seedCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol).cast("long"), lit(3)) + 1).cast("int")).as("modality"),
      // payload bytes derived from the seed column — deterministic
      to_binary(sha2(col(seedCol).cast("string"), 256), lit("hex")).as("payload"),
      map(lit("codec"), lit("stub"), lit("origin"), col(seedCol).cast("string")).as("meta"))

  private val histSize = 16

  /** STUB decode: normalized 16-bin byte histogram as the "feature
    * vector". Replace with a real decoder (JNI image codec / resampler)
    * without touching the surrounding plan.
    */
  private def fakeDecodeFeatures(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](histSize)
    if (payload != null && payload.nonEmpty) {
      payload.foreach(b => hist((b & 0xFF) / (256 / histSize)) += 1.0)
      val n = payload.length.toDouble
      var i = 0
      while (i < histSize) { hist(i) /= n; i += 1 }
    }
    hist
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Batch feature extraction over the payload column: one pass per
    * partition, rows processed in partition-sized batches (the Scala
    * analog of a pandas-batched UDF).
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featSchema)
    media.select("media_id", "modality", "payload").mapPartitions { rows =>
      // per-partition init happens here (codec handle, model session, …)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
          if (payload == null) 0L else payload.length.toLong,
          fakeDecodeFeatures(payload))
      }
    }(enc)
  }

  /** Deterministic frame sampling: every `stride`-th byte window of the
    * payload becomes a "frame" (the video frame-sample pattern with the
    * codec stubbed — a real pipeline swaps the byte slice for a decoded
    * frame). posexplode keeps frame index; slicing is columnar.
    */
  def sampleFrames(media: DataFrame, stride: Int, frameLen: Int): DataFrame =
    media
      .filter(col("modality") === "video" && length(col("payload")) >= frameLen)
      .select(col("media_id"),
        posexplode(transform(
          sequence(lit(0), floor((length(col("payload")) - frameLen) / stride).cast("int")),
          i => col("payload").substr(i * stride + 1, lit(frameLen)))))
      .toDF("media_id", "frame_idx", "frame")
}
