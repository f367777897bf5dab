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

  /** Deterministic sub-cell split for cell-size capping (shared by
    * pipeline_knn_ivf and pipeline_semantic_dedup): an oversized cell
    * of `cellN` members is cut into ⌈cellN/cap⌉ sub-cells by the
    * multiplicative id hash, bounding pair work at ~cap·n. ONE
    * definition with its SQL twin below — the Spark and oracle sides
    * must stay bit-identical for the differential test to mean
    * anything. */
  def subCell(id: Column, cellNName: String, cap: Int): Column =
    Sampling.hash32(id) % expr(s"($cellNName + ${cap - 1}) div $cap")

  /** DuckDB twin of [[subCell]] — interpolate into oracle SQL. */
  def subCellSql(idExpr: String, cellNExpr: String, cap: Int): String =
    s"((($idExpr % 1000000007 + 1000000007) % 1000000007)\n" +
      s"                 * 2654435761) % 4294967296\n" +
      s"                 % (($cellNExpr + ${cap - 1}) // $cap)"

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
    * state the searches need; computed once, reused across every pair.
    *
    * VALIDATION CONTRACT (r14, found by the pathological-embeddings
    * differential sweep): vectors whose norm is ZERO or NON-FINITE are
    * DROPPED here — a zero-norm cosine is 0/0 double division, which
    * follows IEEE (ANSI's DIVIDE_BY_ZERO covers integral/decimal
    * division only) and yields NaN; that NaN, like any NaN/Inf
    * coordinate, then poisons every similarity it touches and breaks
    * the cross-engine exact-hash compare (the engines need not agree
    * on NaN payload/ordering in results). Dropping at the one prep
    * point keeps every
    * downstream cosine total; the oracles replay the identical
    * `nrm > 0 AND nrm < inf` predicate (NaN compares GREATER than
    * +inf in BOTH engines' total orders, so the same clause excludes
    * it cross-engine). Real corpora (unit-normalized-ish embeddings)
    * pass the gate untouched — the full sf0.01 differential is
    * hash-unchanged by this filter. */
  def prepared(vecs: DataFrame, idCol: String, vecCol: String): DataFrame =
    vecs.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .filter(col("nrm") > 0 && col("nrm") < Double.PositiveInfinity)

  /** Component i of hyperplane j, as an exact double both engines can
    * reproduce: Knuth multiplicative hash of the flat index mapped to
    * (-1, 1). Every step is IEEE-exact (k < 2³² has ≤ 32 significant
    * bits; /2³² and ·2 are power-of-two scalings; the final −1 keeps
    * ≤ 32 significant bits), so a SQL twin computing the same integer
    * recurrence gets bit-identical plane weights — which is what makes
    * the LSH bucketing fully oracle-checkable, unlike an xxhash64-seeded
    * plane only Spark can compute. */
  def planeWeight(j: Int, i: Int, dim: Int): Double = {
    val k = ((j.toLong * dim + i) * 2654435761L) % 4294967296L
    k.toDouble / 4294967296.0 * 2.0 - 1.0
  }

  /** Deterministic random-hyperplane LSH signature (`nBits` sign bits)
    * for a prepared double vector column: bit j = [v · plane_j ≥ 0].
    *
    * The planes are inlined as array literals — the driver-side constant
    * the plan broadcasts for free — and each projection is one codegen'd
    * sequential dot product, so the whole signature is a narrow per-row
    * map: ZERO shuffles until whatever aggregation consumes the bucket.
    * (The previous formulation exploded components and joined a plane
    * table — two shuffles per signature; this one survives 100 TB
    * strictly better AND is reproducible in the DuckDB oracle.) */
  def hyperplaneSignature(v: Column, dim: Int, nBits: Int): Column = {
    require(nBits <= 62, "signature must fit a positive long")
    (0 until nBits).map { j =>
      val plane = (0 until dim).map(i => planeWeight(j, i, dim))
      when(dot(v, typedLit(plane)) >= 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
  }

  /** (vec_id, bucket) per vector. Input must be `prepared()` output. */
  def hyperplaneBuckets(preparedVecs: DataFrame, dim: Int,
      nBits: Int): DataFrame =
    preparedVecs.select(col("vec_id"),
      hyperplaneSignature(col("v"), dim, nBits).as("bucket"))
}
