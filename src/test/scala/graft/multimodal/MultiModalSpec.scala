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

  test("resize stage: deterministic, shrinks payload, rewrites metadata") {
    val ds = assets.as[MultiModal.MediaAsset]
    val r1 = MultiModal.resize(ds, 32, 32).collect().map(a => a.asset_id -> a).toMap
    val r2 = MultiModal.resize(ds.repartition(5), 32, 32).collect()
      .map(a => a.asset_id -> a).toMap
    val orig = ds.collect().map(a => a.asset_id -> a).toMap
    assert(r1.keySet == orig.keySet)
    r1.foreach { case (id, a) =>
      assert(a.meta_width == 32 && a.meta_height == 32)
      assert(a.content.length <= orig(id).content.length)
      assert(a.content.toSeq == r2(id).content.toSeq) // partition-invariant
    }
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
