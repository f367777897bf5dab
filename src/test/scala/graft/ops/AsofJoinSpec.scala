package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Edge semantics of the union+window as-of join: inclusive ties,
  * missing keys, strictly-later right rows, multiple carried updates. */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of: ties inclusive, gaps null, latest state carried") {
    val left = Seq(
      (1L, 10L, "e1"),  // before any right row → null
      (1L, 20L, "e2"),  // tie with right t=20 → matches (inclusive)
      (1L, 35L, "e3"),  // after updates at 20 and 30 → carries 30
      (2L, 50L, "e4"),  // key with no right rows → null
      (3L, 5L,  "e5"))  // key 3 right exists only later → null
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 20L, "r@20"),
      (1L, 30L, "r@30"),
      (3L, 99L, "r@99"))
      .toDF("k", "t", "payload")

    val out = AsofJoin.asofBackward(left, right,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "t",
        payload = Seq("payload"))
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap

    assert(out == Map(
      "e1" -> None, "e2" -> Some("r@20"), "e3" -> Some("r@30"),
      "e4" -> None, "e5" -> None))
  }

  test("left rows survive 1:1 (no fan-out, no loss)") {
    val left = (1 to 100).map(i => (i.toLong % 5, i.toLong, i)).toDF("k", "t", "id")
    val right = Seq((0L, 0L, "base")).toDF("k", "t", "payload")
    val out = AsofJoin.asofBackward(left, right, "k", "k", "t", "t",
      Seq("payload"))
    assert(out.count() == 100)
    assert(out.select("id").distinct().count() == 100)
  }
}
