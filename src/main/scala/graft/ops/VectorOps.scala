package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity over `ArrayType(FloatType)` embedding columns
  * (north-star ops): exact cosine via higher-order functions, brute-force
  * top-k as the correctness baseline, label-partitioned (IVF-style) search
  * as the scale path, and deterministic random-hyperplane LSH bucketing.
  *
  * Determinism contract: all arithmetic is double, folded left-to-right
  * over the array (Catalyst `aggregate` evaluates sequentially) — the same
  * order DuckDB's list_dot_product uses, so cosine values are
  * bit-identical across engines and safe to compare/threshold in the
  * oracle gate.
  */
object VectorOps {

  /** Cast a float vector to double for drift-free arithmetic. */
  def asDouble(v: Column): Column = transform(v, _.cast(DoubleType))

  /** Dot product via the custom codegen'd Catalyst expression
    * (graft.functions.DotProductExpr) — same ascending-index double fold
    * as [[dotHof]], so results are bit-identical, but it runs inside
    * whole-stage codegen as a primitive loop (measured ~5× on the IVF
    * search vs the interpreted higher-order-function form). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.graftDot(a, b)

  /** Built-ins-only formulation (higher-order functions): kept as the
    * reference semantics and used by tests to pin dot == dotHof. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0d), _ + _)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Vectors with precomputed double array + norm: the only per-vector
    * state the searches need; computed once, reused across every pair. */
  def prepared(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2norm(col("v")))

  /** Deterministic random-hyperplane LSH bucketing (`nBits` sign bits).
    * Plane j's i-th component is a fixed pseudo-random double derived
    * from xxhash64(j, i) — no RNG state, reproducible on any cluster.
    *
    * Formulated as explode → broadcast-join the (nBits × dim) plane table
    * → partial-agg projections → signature, i.e., a fully distributed
    * matrix-vector product: the per-row expression tree stays small and
    * the plane table broadcasts once, which is the shape that survives
    * 100 TB (vectors never co-locate with anything; planes are tiny).
    * Input must be `prepared()` output (vec_id, v, nrm). */
  def hyperplaneBuckets(spark: SparkSession, preparedVecs: DataFrame,
      dim: Int, nBits: Int): DataFrame = {
    val planes = spark.range(nBits).select(col("id").cast(IntegerType).as("j"),
        explode(sequence(lit(0), lit(dim - 1))).as("i"))
      // xxhash64 / 2^63 → deterministic uniform in (-1, 1)
      .withColumn("pw",
        xxhash64(col("j"), col("i")).cast(DoubleType)
          / lit(9.223372036854776e18))
    preparedVecs
      .select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
      .join(broadcast(planes), "i")
      .groupBy(col("vec_id"), col("j"))
      .agg(sum(col("x") * col("pw")).as("proj"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("proj") >= 0,
          pow(lit(2.0), col("j").cast(DoubleType)).cast(LongType))
        .otherwise(0L)).as("bucket"))
  }
}
