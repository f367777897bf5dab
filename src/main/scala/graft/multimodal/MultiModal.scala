package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `BinaryType` content plus
  * typed metadata, with decode / feature-extraction / frame-sampling
  * stages shaped for 100 TB (per-partition batch processing, no driver
  * round trips, schema known up front).
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * clearly-marked DETERMINISTIC FAKE standing in for a real decoder (in
  * production: a JNI/FFI codec or a vectorized Python worker). Everything
  * around it — the asset schema, the `mapPartitions` batch shape, the
  * partition-preserving pipeline, frame sampling — is the real thing and
  * is what the tests exercise.
  */
object MultiModal {

  /** One media asset: content opaque, metadata typed. */
  case class MediaAsset(
      asset_id: Long,
      kind: String,            // "image" | "audio" | "video"
      content: Array[Byte],
      meta_width: Int,         // declared metadata (may disagree w/ bytes)
      meta_height: Int,
      meta_sample_rate: Int)

  /** Decoder output: fixed-length feature vector + verified properties. */
  case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      digest: Long,
      feature: Array[Float])

  val FeatureDim = 8

  /** ======================= DECODE STUB =============================
    * Deterministic fake decoder. A real implementation would parse the
    * container format and decode pixels/samples; this derives a stable
    * pseudo-feature from the bytes so the surrounding pipeline (batching,
    * schema, partitioning) is fully testable without codecs. Swap this
    * single function for a real codec binding in production.
    * ================================================================= */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L // fixed seed; per-asset determinism only
    content.foreach { b => h = h * 31 + b }
    val out = new Array[Float](FeatureDim)
    var i = 0
    var s = h
    while (i < FeatureDim) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = ((s >>> 40).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  private def fnv(content: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    content.foreach { b => h = (h ^ (b & 0xffL)) * 0x100000001b3L }
    h
  }

  /** Feature extraction as a per-partition batch map — the Scala analog
    * of `mapInPandas`: one iterator in, one iterator out, executor-local,
    * no shuffle, preserves partitioning. This is the stage where a real
    * decoder would amortize model/codec init across the partition. */
  def extractFeatures(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      // per-partition init happens here (codec handles, model weights)
      it.map { a =>
        AssetFeatures(a.asset_id, a.kind, a.content.length.toLong,
          fnv(a.content), decodeStub(a.content))
      }
    }
  }

  /** Frame sampling for video-like assets: every `stride` bytes is a
    * "frame" offset (the fake stand-in for keyframe indices). posexplode
    * keeps it declarative — one row per sampled frame, no UDTF. */
  def sampleFrames(assets: DataFrame, stride: Int): DataFrame =
    assets
      .withColumn("n_frames",
        greatest(lit(1), (length(col("content")) / stride).cast(IntegerType)))
      .select(col("asset_id"), col("kind"),
        posexplode(sequence(lit(0), col("n_frames") - 1))
          .as(Seq("frame_idx", "frame_no")))
      .select(col("asset_id"), col("kind"), col("frame_idx"),
        (col("frame_no") * stride).cast(LongType).as("byte_offset"))

  /** Wrap an arbitrary (id, string) DataFrame as assets — used by tests
    * and demos to synthesize binary content without media files. */
  def syntheticAssets(src: DataFrame, idCol: String,
      payloadCol: String): DataFrame =
    src.select(
      col(idCol).cast(LongType).as("asset_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video").as("kind"),
      col(payloadCol).cast(BinaryType).as("content"),
      lit(64).as("meta_width"), lit(64).as("meta_height"),
      lit(16000).as("meta_sample_rate"))
}
