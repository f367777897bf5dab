package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed pins for the trained-classifier arithmetic
  * (graft.ops.HashedLinear) — the DuckDB differential proves the whole
  * chain, this spec documents the pieces: the labeler threshold, the
  * rate-difference weight formula on a corpus small enough to verify
  * by hand, and the order/partitioning independence of training. */
class HashedLinearSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def prep(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text").select(col("doc_id"),
      HashedLinear.labelCol("text").as("label"),
      expr(HashedLinear.bucketsExprSql("text")).as("bk"))

  test("labelCol: +1 iff stopword ratio >= 6%") {
    // 1 stopword in 16 tokens = 6.25% -> +1; 1 in 17 = 5.9% -> -1
    val pos = ("the " + Seq.fill(15)("xq").mkString(" "), 1L)
    val neg = ("the " + Seq.fill(16)("xq").mkString(" "), -1L)
    val got = Seq((1L, pos._1), (2L, neg._1)).toDF("doc_id", "text")
      .select(col("doc_id"), HashedLinear.labelCol("text").as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> pos._2, 2L -> neg._2))
  }

  test("trainRateDiff matches the hand-computed rate difference") {
    // two docs, one per class, tiny vocab; weights must be
    // S*pos_b/pos_tot - S*neg_b/neg_tot with truncating division
    val df = prep(Seq(
      (1L, "the the xq"),   // +1 (2/3 stopwords)
      (2L, "xq xq xq xq xq xq xq xq xq xq xq xq xq xq xq xq xq"))) // -1
    val w = HashedLinear.trainRateDiff(df, "label", "bk")
    def bucket(t: String): Int =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000003).toInt %
        HashedLinear.Buckets
    val (bThe, bXq) = (bucket("the"), bucket("xq"))
    val s = HashedLinear.Scale
    // pos tokens: the,the,xq (pos_tot=3); neg tokens: 17x xq
    assert(w(bThe) == s * 2 / 3 - 0L)
    assert(w(bXq) == s * 1 / 3 - s * 17 / 17)
    assert(w.zipWithIndex.forall { case (v, i) =>
      i == bThe || i == bXq || v == 0L })
  }

  test("training is partitioning-independent") {
    val base = (1L to 200L).map(i =>
      (i, if (i % 3 == 0) "the a of word" + i else s"w$i x$i y$i z$i w$i"))
    val a = HashedLinear.trainRateDiff(prep(base), "label", "bk")
    val b = HashedLinear.trainRateDiff(
      prep(base.reverse).repartition(7), "label", "bk")
    assert(a.toSeq == b.toSeq)
  }

  test("scoreColumn equals the sum of per-token weights") {
    val df = prep(Seq((1L, "the the xq")))
    val w = Array.tabulate(HashedLinear.Buckets)(i => (i % 5).toLong - 2L)
    def bucket(t: String): Int =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000003).toInt %
        HashedLinear.Buckets
    val expected = Seq("the", "the", "xq").map(t => w(bucket(t))).sum
    val got = df.select(HashedLinear.scoreColumn(col("bk"), w)).head.getLong(0)
    assert(got == expected)
  }
}
