package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `BinaryType` content plus
  * typed metadata, with decode / feature-extraction / frame-sampling
  * stages shaped for 100 TB (per-partition batch processing, no driver
  * round trips, schema known up front).
  *
  * Image decode is REAL: `decodeImage` parses PNG/JPEG/BMP/GIF bytes
  * with the pure-JDK `javax.imageio` codec (no external libs), and
  * `extractFeatures` uses it for every decodable image payload. Audio
  * and video have no JDK codec, so `decodeStub` remains the
  * clearly-marked DETERMINISTIC FAKE for those kinds (in production: a
  * JNI/FFI codec or a vectorized Python worker) — the asset schema,
  * `mapPartitions` batch shape, partition-preserving pipeline and frame
  * sampling are identical for both paths.
  */
object MultiModal {

  /** Decoded raster properties: verified dims + per-channel means. */
  case class DecodedImage(width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** One image-bearing row: the opaque multimodal column + its id. */
  case class ImageAsset(doc_id: Long, content: Array[Byte])

  /** `decodeImages` output row (means exact for solid-color fixtures). */
  case class ImageDecoded(doc_id: Long, width: Long, height: Long,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL image decode via javax.imageio: parses the container format,
    * decodes pixels, returns verified dimensions and per-channel means.
    * None when the bytes are not a supported image — callers fall back
    * to the stub (audio/video) or drop the row (corrupt input at scale
    * is data, not an exception). */
  def decodeImage(content: Array[Byte]): Option[DecodedImage] = {
    // ImageIO returns null for unrecognized bytes but THROWS for
    // recognized-but-corrupt containers — and not only IOException: the
    // JDK readers surface CMMException (corrupt ICC profile),
    // IndexOutOfBounds (truncated GIF), IllegalArgument... All of it is
    // data at corpus scale, so every non-fatal failure maps to None.
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      Some(DecodedImage(w, h, sr.toDouble / n, sg.toDouble / n,
        sb.toDouble / n))
    }
  }

  /** Encode a solid-color PNG (test/fixture input for the real decoder:
    * a genuine PNG container the ImageIO reader must parse). */
  def encodePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic PNG ingest: one real PNG per id, whose dimensions and
    * solid fill color are pure functions of the id — which is exactly
    * what makes the decode stage oracle-checkable (the oracle predicts
    * the decoded metadata from the same formulas). */
  def syntheticPngAssets(ids: Dataset[Long])(
      implicit spark: SparkSession): Dataset[ImageAsset] = {
    import spark.implicits._
    ids.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.map { d =>
        val w = (8 + d % 13).toInt
        val h = (8 + d % 7).toInt
        val rgb = (((d % 256) << 16) | (((d * 7) % 256) << 8) |
          ((d * 13) % 256)).toInt
        ImageAsset(d, encodePng(w, h, rgb))
      }
    }
  }

  /** REAL decode stage: per-partition batch map over binary image
    * content — same shape as `extractFeatures`, but the decoder is
    * javax.imageio, not a stub. Undecodable rows are dropped (at corpus
    * scale corrupt media is filtered, not thrown). */
  def decodeImages(assets: Dataset[ImageAsset])(
      implicit spark: SparkSession): Dataset[ImageDecoded] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        decodeImage(a.content).map(d =>
          ImageDecoded(a.doc_id, d.width.toLong, d.height.toLong,
            d.mean_r, d.mean_g, d.mean_b))
      }
    }
  }

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
    * Deterministic fake decoder for the kinds the JDK has NO codec for
    * (audio, video) and for undecodable image bytes. Images use the real
    * `decodeImage` above. This derives a stable pseudo-feature from the
    * bytes so the surrounding pipeline (batching, schema, partitioning)
    * is fully testable; swap for a JNI/FFI codec binding in production.
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
    * no shuffle, preserves partitioning. Image payloads get the REAL
    * javax.imageio decode (verified dims + channel means as the leading
    * feature components); audio/video and undecodable bytes fall back to
    * the labeled stub. Per-partition init (codec cache config here;
    * model weights in production) is amortized across the batch. */
  def extractFeatures(assets: Dataset[MediaAsset])(
      implicit spark: SparkSession): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val feature =
          (if (a.kind == "image") decodeImage(a.content) else None) match {
            case Some(d) => Array(d.width.toFloat, d.height.toFloat,
              d.mean_r.toFloat, d.mean_g.toFloat, d.mean_b.toFloat,
              0f, 0f, 0f)
            case None => decodeStub(a.content)
          }
        AssetFeatures(a.asset_id, a.kind, a.content.length.toLong,
          fnv(a.content), feature)
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
