package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The r14 vector VALIDATION CONTRACT, pinned where the pathological-
  * embeddings differential sweep found the failures: a zero-norm
  * cosine is 0/0 double division — IEEE NaN (ANSI DIVIDE_BY_ZERO
  * covers integral/decimal division only), which poisons every
  * downstream similarity and the cross-engine exact-hash compare —
  * and an un-clamped huge coordinate is a thrown long overflow under
  * ANSI — one garbage embedding failing a 1000-executor job or
  * silently corrupting its output. `VectorOps.prepared` drops
  * zero/non-finite-norm vectors; `KMeans.quantize` clamps coordinates
  * to [-1, 1]. Real unit-ish corpora pass both untouched (the full
  * sf0.01 differential is hash-unchanged). */
class VectorEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture = {
    import spark.implicits._
    val dim = 8
    def v(f: Int => Double) = (0 until dim).map(i => f(i).toFloat).toArray
    Seq(
      (0L, v(_ => 0.0)),                   // zero vector
      (1L, v(i => (i % 3) - 1.0)),         // base
      (2L, v(i => (i % 3) - 1.0)),         // exact duplicate (cos 1)
      (3L, v(i => -((i % 3) - 1.0))),      // antipodal (cos -1)
      (4L, v(_ => 1e18)),                  // huge coordinates
      (5L, v(_ => Float.NaN.toDouble))     // NaN coordinates
    ).toDF("vec_id", "embedding")
  }

  test("prepared drops zero- and non-finite-norm vectors, keeps the rest") {
    val pv = VectorOps.prepared(fixture, "vec_id", "embedding")
    val kept = pv.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 3L, 4L),
      s"validation gate kept $kept (want zero vec 0 and NaN vec 5 out)")
    // downstream cosines are total on the survivors — no ANSI throw,
    // and the degenerate geometry is exact
    val a = pv.select(col("vec_id").as("ia"), col("v").as("va"),
      col("nrm").as("na"))
    val b = pv.select(col("vec_id").as("ib"), col("v").as("vb"),
      col("nrm").as("nb"))
    val cos = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb"))
          .as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // sqrt rounding means nrm*nrm != dot by an ulp — the geometry is
    // exact to ~2 ulps, not bit-exact (the cross-engine compare is
    // still exact because BOTH engines compute the identical fold)
    assert(math.abs(cos((1L, 2L)) - 1.0) < 1e-14,
      "exact duplicate must score cos ~ 1")
    assert(math.abs(cos((1L, 3L)) + 1.0) < 1e-14,
      "antipodal must score cos ~ -1")
    cos.values.foreach(c => assert(!c.isNaN && math.abs(c) <= 1.0 + 1e-14))
  }

  test("quantize saturates huge and NaN coordinates at +-127") {
    val q = KMeans.quantize(fixture)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(q(4L).forall(_ == 127L), "1e18 must clamp to 127, not overflow")
    // NaN clamps through least(greatest(NaN,-1),1): NaN sorts greatest
    // in BOTH engines' total orders, so least(NaN, 1) = 1 -> 127
    assert(q(5L).forall(_ == 127L))
    assert(q(0L).forall(_ == 0L))
    q.values.flatten.foreach(x => assert(x >= -127L && x <= 127L))
  }

  // r20 optimization round: the codegen'd scaled-distance / Long-dot
  // expressions replace the interpreted HOF folds in the vector hot
  // path — these pins hold them bit-equal to the HOF reference
  // formulations (including the null-element / length-mismatch / null-
  // input contract zip_with's padding implies), the same discipline
  // OpsSpec pins for graft_dot vs dotHof.
  private def sqDistHof(x: org.apache.spark.sql.Column,
      sv: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(x, sv, (a, b) => (a * n - b) * (a * n - b)),
      lit(0L), (acc, v) => acc + v)

  test("scaledSqDist is bit-equal to the HOF fold incl. null/mismatch") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Long](1L, -2L, 3L), Seq[java.lang.Long](4L, 5L, -6L), 3L),
      (2L, Seq[java.lang.Long](127L, -127L, 0L), Seq[java.lang.Long](-381L, 381L, 7L), 5L),
      (3L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 2L, 3L), 2L),
      (4L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L), 2L), // mismatch
      (5L, Seq[java.lang.Long](0L, 0L, 0L), Seq[java.lang.Long](0L, 0L, 0L), 1L))
      .toDF("id", "x", "sv", "n")
    val got = rows.select(col("id"),
        graft.functions.VectorExpressions
          .scaledSqDist(col("x"), col("sv"), col("n")).as("g"),
        sqDistHof(col("x"), col("sv"), col("n")).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2),
        s"null disagreement at id=${r.getLong(0)}: $r")
      if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(2),
        s"value disagreement at id=${r.getLong(0)}: $r")
    }
    // null rows exactly where the HOF nulls: null element + mismatch
    val nulls = got.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    assert(nulls == Set(3L, 4L), s"null set was $nulls")
  }

  test("dotLong is bit-equal to the HOF fold incl. null/mismatch") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Long](1L, -2L, 3L), Seq[java.lang.Long](4L, 5L, -6L)),
      (2L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, 2L, 3L)),
      (3L, Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L)))
      .toDF("id", "a", "b")
    val got = rows.select(col("id"),
        graft.functions.VectorExpressions.dotLong(col("a"), col("b")).as("g"),
        aggregate(zip_with(col("a"), col("b"), _ * _), lit(0L),
          (acc, v) => acc + v).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null disagreement: $r")
      if (!r.isNullAt(1)) assert(r.getLong(1) == r.getLong(2), s"$r")
    }
    assert(got.filter(_.isNullAt(1)).map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("single-shuffle update equals the exploded reference formulation") {
    import spark.implicits._
    // 3 clusters, 4-dim rectangular vectors, negatives included
    val assigned = (0 until 30).map { i =>
      (i.toLong, (i % 3).toLong,
        Seq((i % 7).toLong - 3, (i % 5).toLong, -(i % 11).toLong, 2L))
    }.toDF("vec_id", "cid", "q")
    val ref = assigned
      .select(col("cid"), posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy("cid", "dim")
      .agg(sum("x").as("sx"), count(lit(1)).as("cnt"))
      .groupBy("cid")
      .agg(max(col("cnt")).as("n"),
        transform(array_sort(collect_list(struct(col("dim"), col("sx")))),
          e => e.getField("sx")).as("sv"))
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val got = KMeans.update(assigned, dims = 4)
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(got == ref)
    val gotPq = Pq.update(assigned.withColumn("sub", lit(0L)), sd = 4)
      .select("cid", "n", "sv")
      .as[(Long, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(gotPq == ref)
  }
}
