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

  /** ====================== RESIZE STUB ==============================
    * Deterministic fake resize: a real implementation decodes, scales,
    * re-encodes; this one derives the "resized" payload by strided byte
    * sampling so output size tracks the target dimensions and content
    * stays a pure function of the input. The pipeline contract it
    * preserves — binary in, smaller binary out, metadata updated, pure
    * per-row — is exactly what a codec-backed version must satisfy.
    * ================================================================= */
  def resizeStub(content: Array[Byte], targetW: Int,
      targetH: Int): Array[Byte] = {
    val targetLen = math.max(1, math.min(content.length, targetW * targetH / 64))
    val stride = math.max(1, content.length / targetLen)
    content.indices.collect { case i if i % stride == 0 => content(i) }.toArray
  }

  /** Resize stage: per-partition batch map, metadata rewritten to the
    * target dims alongside the (stubbed) re-encoded payload. */
  def resize(assets: Dataset[MediaAsset], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaAsset] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        a.copy(content = resizeStub(a.content, targetW, targetH),
          meta_width = targetW, meta_height = targetH)
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
