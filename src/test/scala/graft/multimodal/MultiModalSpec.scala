package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Readers

class MultiModalSpec extends AnyFunSuite {
  implicit lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val assets = MultiModal.syntheticAssets(
    Readers.table(spark, "/root/testdata/sf0.001", "documents"),
    "doc_id", "text")

  test("asset schema: opaque binary + typed metadata") {
    val f = assets.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("content") == "binary")
    assert(f("kind") == "string" && f("meta_width") == "integer")
  }

  test("feature extraction is deterministic, partition-shaped, typed") {
    val ds = assets.as[MultiModal.MediaAsset]
    val a = MultiModal.extractFeatures(ds).collect()
      .map(x => x.asset_id -> x).toMap
    val b = MultiModal.extractFeatures(ds.repartition(7)).collect()
      .map(x => x.asset_id -> x).toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    a.foreach { case (id, fa) =>
      // independent of partitioning: the decode stub is pure per-asset
      assert(fa.digest == b(id).digest)
      assert(fa.feature.toSeq == b(id).feature.toSeq)
      assert(fa.feature.length == MultiModal.FeatureDim)
      assert(fa.n_bytes > 0)
    }
  }

  test("resize stage: real rescale for images, pass-through otherwise") {
    val media = Seq(
      MultiModal.MediaAsset(1L, "image",
        MultiModal.encodePng(20, 14, 0x405060), 20, 14, 0),
      MultiModal.MediaAsset(2L, "image",
        MultiModal.encodePng(8, 8, 0x112233), 8, 8, 0),
      MultiModal.MediaAsset(3L, "audio",
        "not an image".getBytes("UTF-8"), 0, 0, 16000),
      // DECODABLE non-image payload: ImageIO could read frame 0 of this
      // animated GIF — the kind gate must keep resize's hands off it
      MultiModal.MediaAsset(4L, "video",
        MultiModal.encodeGif(6, 6, Seq(0x111111, 0x222222)), 0, 0, 0))
    val ds = media.toDS()
    val r1 = MultiModal.resize(ds, 16, 10).collect()
      .map(a => a.asset_id -> a).toMap
    val r2 = MultiModal.resize(ds.repartition(3), 16, 10).collect()
      .map(a => a.asset_id -> a).toMap
    // image payloads: really re-encoded — decode verifies target dims and
    // that the solid fill survives the bilinear scale exactly
    Seq(1L -> 0x405060, 2L -> 0x112233).foreach { case (id, rgb) =>
      val a = r1(id)
      assert(a.meta_width == 16 && a.meta_height == 10)
      val d = MultiModal.decodeImage(a.content).get
      assert(d.width == 16 && d.height == 10)
      assert(d.mean_r == ((rgb >> 16) & 0xff).toDouble &&
        d.mean_g == ((rgb >> 8) & 0xff).toDouble &&
        d.mean_b == (rgb & 0xff).toDouble)
      assert(a.content.toSeq == r2(id).content.toSeq) // partition-invariant
    }
    // non-image payload: untouched, metadata preserved
    assert(r1(3L).content.toSeq == media(2).content.toSeq)
    assert(r1(3L).meta_sample_rate == 16000 && r1(3L).meta_width == 0)
    // decodable VIDEO payload: still untouched — both frames survive
    assert(r1(4L).content.toSeq == media(3).content.toSeq)
    assert(MultiModal.decodeVideoFrames(r1(4L).content).length == 2)
  }

  test("real WAV decode: javax.sound.sampled round trip is sample-exact") {
    val samples = Array.tabulate(200)(i => ((i % 7) * 100 - 300).toShort)
    val wav = MultiModal.encodeWav(16000, samples)
    // genuine RIFF/WAVE container from the JDK writer
    assert(wav.take(4).toSeq == "RIFF".getBytes("US-ASCII").toSeq)
    assert(wav.slice(8, 12).toSeq == "WAVE".getBytes("US-ASCII").toSeq)
    val d = MultiModal.decodeWav(wav).get
    assert(d.sample_rate == 16000 && d.n_samples == 200)
    assert(d.mean_sample == samples.map(_.toLong).sum.toDouble / 200)
    assert(d.peak_sample == samples.map(s => math.abs(s.toInt)).max)
    // non-audio bytes are rejected, not mis-decoded
    assert(MultiModal.decodeWav("not audio".getBytes("UTF-8")).isEmpty)
  }

  test("direct WAV codec == javax.sound stack, both directions") {
    // the hot path parses/writes RIFF directly (AudioSystem takes a
    // JVM-global provider lock per call - the r13 100x probe measured
    // the 16-thread decode running at single-thread speed); this pin
    // keeps the fast codec honest against the REAL stack: the direct
    // parser must read JDK-written containers identically, and the JDK
    // reader must accept direct-written containers identically, so the
    // fast path can never drift into a private format
    val cases = Seq(
      (8000, Array.tabulate(64)(i => ((i * 37) % 1999 - 999).toShort)),
      (16000, Array[Short](0, 0, 0)),
      (44100, Array[Short](Short.MinValue, Short.MaxValue)),
      (12000, Array.empty[Short]))
    cases.foreach { case (rate, samples) =>
      val jdk = MultiModal.encodeWav(rate, samples)
      val direct = MultiModal.encodeWavDirect(rate, samples)
      val viaJdk = MultiModal.decodeWav(direct)
      val viaDirectOfJdk = MultiModal.decodeWavDirect(jdk)
      val viaDirect = MultiModal.decodeWavDirect(direct)
      val truth = MultiModal.decodeWav(jdk)
      assert(viaJdk == truth, s"JDK reader rejects direct container @$rate")
      assert(viaDirectOfJdk == truth,
        s"direct parser misreads JDK container @$rate")
      assert(viaDirect == truth, s"direct round trip differs @$rate")
    }
    // rejection set matches: garbage, truncated header, stereo refusal
    assert(MultiModal.decodeWavDirect("not audio".getBytes("UTF-8")).isEmpty)
    assert(MultiModal.decodeWavDirect(
      MultiModal.encodeWav(8000, Array[Short](1, 2)).take(20)).isEmpty)
    val truncated = MultiModal.encodeWavDirect(8000, Array[Short](1, 2, 3))
    assert(MultiModal.decodeWavDirect(truncated.dropRight(2)).isEmpty,
      "data chunk overrunning the buffer must be rejected, not read")
    // crafted chunk size near 2^31: `off + 8 + sz` overflows Int and
    // would bypass the bounds guard without Long arithmetic (r13 advice)
    val crafted = MultiModal.encodeWavDirect(8000, Array[Short](1, 2, 3))
    def putLe32(buf: Array[Byte], o: Int, v: Int): Unit = {
      buf(o) = (v & 0xff).toByte; buf(o + 1) = ((v >> 8) & 0xff).toByte
      buf(o + 2) = ((v >> 16) & 0xff).toByte
      buf(o + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(crafted, 40, Int.MaxValue - 4) // data-chunk size field
    assert(MultiModal.decodeWavDirect(crafted).isEmpty,
      "near-2^31 chunk size must hit the Long bounds guard, not wrap")
    putLe32(crafted, 16, Int.MaxValue - 4) // fmt-chunk size field
    assert(MultiModal.decodeWavDirect(crafted).isEmpty)
  }

  test("extractFeatures uses the real WAV decoder for audio assets") {
    val wav = MultiModal.encodeWav(8000, Array.fill(50)(123.toShort))
    val ds = Seq(MultiModal.MediaAsset(1L, "audio", wav, 0, 0, 8000)).toDS()
    val f = MultiModal.extractFeatures(ds).collect().head
    assert(f.feature.take(4).toSeq == Seq(8000f, 50f, 123f, 123f))
  }

  test("real PNG decode: javax.imageio round trip is pixel-exact") {
    val png = MultiModal.encodePng(12, 9, 0x345678)
    // real PNG container: magic bytes, parsed by the actual codec
    assert(png.take(4).toSeq ==
      Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val d = MultiModal.decodeImage(png).get
    assert(d.width == 12 && d.height == 9)
    assert(d.mean_r == 0x34.toDouble && d.mean_g == 0x56.toDouble &&
      d.mean_b == 0x78.toDouble)
    // non-image bytes are rejected, not mis-decoded
    assert(MultiModal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("extractFeatures uses the real decoder for image assets") {
    val png = MultiModal.encodePng(10, 5, 0x102030)
    val ds = Seq(MultiModal.MediaAsset(1L, "image", png, 10, 5, 0)).toDS()
    val f = MultiModal.extractFeatures(ds).collect().head
    assert(f.feature.take(5).toSeq ==
      Seq(10f, 5f, 0x10.toFloat, 0x20.toFloat, 0x30.toFloat))
  }

  test("decodeImages dataset stage matches the fixture formulas") {
    val ids = spark.range(0, 50).as[Long]
    val out = MultiModal.decodeImages(MultiModal.syntheticPngAssets(ids))
      .collect()
    assert(out.length == 50)
    out.foreach { r =>
      assert(r.width == 8 + r.doc_id % 13)
      assert(r.height == 8 + r.doc_id % 7)
      assert(r.mean_r == (r.doc_id % 256).toDouble)
      assert(r.mean_g == ((r.doc_id * 7) % 256).toDouble)
      assert(r.mean_b == ((r.doc_id * 13) % 256).toDouble)
    }
  }

  test("real multi-frame GIF decode walks every frame pixel-exactly") {
    val gif = MultiModal.encodeGif(12, 8, Seq(0x112233, 0xa0b0c0, 0xff00ee))
    assert(new String(gif.take(6), "US-ASCII") == "GIF89a")
    val frames = MultiModal.decodeVideoFrames(gif)
    assert(frames.length == 3)
    assert(frames.forall(f => f.width == 12 && f.height == 8))
    assert(frames.map(f => (f.mean_r, f.mean_g, f.mean_b)) == Seq(
      (0x11.toDouble, 0x22.toDouble, 0x33.toDouble),
      (0xa0.toDouble, 0xb0.toDouble, 0xc0.toDouble),
      (0xff.toDouble, 0x00.toDouble, 0xee.toDouble)))
    assert(MultiModal.decodeVideoFrames("not video".getBytes("UTF-8")).isEmpty)
  }

  test("sampleVideoFrames emits every stride-th real frame") {
    val ids = spark.range(0, 30).as[Long]
    val out = MultiModal.sampleVideoFrames(
      MultiModal.syntheticGifAssets(ids), stride = 2).collect()
    out.foreach { f =>
      assert(f.frame_idx % 2 == 0)
      assert(f.n_frames == 2 + f.doc_id % 5)
      assert(f.width == 8 + f.doc_id % 11 && f.height == 8 + f.doc_id % 6)
      assert(f.mean_r == ((f.doc_id + 17 * f.frame_idx) % 256).toDouble)
    }
    // every doc contributes ceil(n_frames / 2) sampled frames
    val perDoc = out.groupBy(_.doc_id).view.mapValues(_.length)
    (0L until 30L).foreach { d =>
      assert(perDoc(d) == (2 + d % 5 + 1) / 2)
    }
  }

  test("extractFeatures uses the real frame decoder for video assets") {
    val gif = MultiModal.encodeGif(10, 5, Seq(0x102030, 0x405060))
    val ds = Seq(MultiModal.MediaAsset(1L, "video", gif, 10, 5, 0)).toDS()
    val f = MultiModal.extractFeatures(ds).collect().head
    assert(f.feature.take(6).toSeq ==
      Seq(10f, 5f, 2f, 0x10.toFloat, 0x20.toFloat, 0x30.toFloat))
  }

  test("frame sampling yields stride-aligned offsets per asset") {
    val frames = MultiModal.sampleFrames(assets, stride = 100)
    val one = frames.filter(col("asset_id") === 1L)
      .orderBy("frame_idx").collect()
    assert(one.nonEmpty)
    one.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("frame_idx") == i)
      assert(r.getAs[Long]("byte_offset") == i * 100L)
    }
    // every asset produces at least one frame
    val n = frames.select("asset_id").distinct().count()
    assert(n == assets.count())
  }
}
