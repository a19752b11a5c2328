package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads travel as opaque `binary`
  * columns with typed metadata structs; decode / feature-extract / resize /
  * frame-sample run batched per partition (the Scala analog of Pandas-UDF
  * `mapInPandas` batching — same schema contract, same partition-wise batch
  * shape).
  *
  * The actual codec step is STUBBED (media libraries are not in this
  * container): [[FakeCodec]] produces deterministic pseudo-features from the
  * payload bytes. The Spark-side plumbing — binary schema, metadata struct,
  * partition-batched transform, output schema — is real and tested; swapping
  * FakeCodec for a JNI/FFI codec changes nothing structurally.
  */
object Multimodal {

  /** Typed media metadata carried next to the payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png | wav | mp4 | ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  final case class MediaFeatures(
      media_id: Long, media_type: String, n_bytes: Long,
      sha_prefix: String, feature: Array[Float])

  /** ==== STUB ==== deterministic fake decode: real systems put libjpeg /
    * ffmpeg here; the container has neither, so features derive from the
    * bytes (stable, testable). Everything around this call is production
    * plumbing.
    */
  object FakeCodec {
    def decodeAndEmbed(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) {
        h = (h ^ (payload(i) & 0xffL)) * 0x100000001b3L
        out(i % dim) += ((h >>> 32).toInt % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Build a media table from any table with an id + string payload — the
    * sandbox stand-in for reading real blobs; binary column + typed meta.
    */
  def synthesizeMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "utf-8").as("payload"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(xxhash64(col(idCol)), lit(3)) + 1).cast("int")).as("media_type"),
        lit("raw").as("format"),
        (pmod(xxhash64(col(idCol), lit("w")), lit(1920)) + 1).cast("int").as("width"),
        (pmod(xxhash64(col(idCol), lit("h")), lit(1080)) + 1).cast("int").as("height"),
        pmod(xxhash64(col(idCol), lit("d")), lit(600000)).as("duration_ms")).as("meta"))

  /** Partition-batched decode + feature extraction. Binary payloads never
    * hit the driver; each task decodes its partition's batch — identical
    * batch shape to `mapInPandas` in PySpark.
    */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "payload", "meta.media_type")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          val mtype = if (r.isNullAt(2)) "unknown" else r.getString(2)
          val feat = FakeCodec.decodeAndEmbed(payload, dim)
          MediaFeatures(id, mtype, payload.length.toLong,
            f"${SimHash64.hashBytes(payload)}%016x".take(8), feat)
        }
      }
  }

  /** Frame sampling for video payloads: deterministic offsets every
    * `everyMs`; payload slicing is the stub (real: ffmpeg seek+decode). The
    * explode keeps one row per sampled frame — the shape a caption/OCR stage
    * consumes.
    */
  def sampleFrames(media: DataFrame, everyMs: Long = 10000L): DataFrame =
    media.where(col("meta.media_type") === "video")
      .select(col("media_id"), col("meta.duration_ms").as("duration_ms"),
        posexplode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs)))
          .as(Seq("frame_idx", "frame_ts_ms")))
}
