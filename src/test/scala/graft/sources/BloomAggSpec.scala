package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed bloom build must produce bit-identical filters to
  * the single-threaded reference build, regardless of partitioning —
  * OR is commutative/associative and the hash positions are
  * deterministic, so any partition split folds to the same bytes. */
class BloomAggSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("executor-folded bits == reference build, any partitioning") {
    import spark.implicits._
    val values = (0L until 1000L).map(_ * 31L + 7L)
    val m = FileBloom.sizeFor(values.size)
    val want = FileBloom.build(values.iterator, m, 4)
    Seq(1, 4, 13).foreach { parts =>
      val got = values.toDF("v").repartition(parts)
        .agg(FileBloom.bitsAgg(col("v"), lit(m)).as("bits"))
        .collect()(0).getAs[Array[Byte]]("bits")
      assert(got.sameElements(want), s"mismatch at $parts partitions")
    }
    // and the folded filter honors the bloom contract
    assert(values.forall(FileBloom.mightContain(want, m, 4, _)))
  }
}
