package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, integer-exact Lloyd's k-means over int8-quantized
  * embeddings — the missing "train the IVF index" step in front of
  * `pipeline_knn_ivf` (which partitions by externally-given labels).
  *
  * Cross-engine exactness is the whole design: a float-mean centroid is
  * NOT portable (parallel double summation is order-dependent), so
  *   - points are quantized to integers first (floor(x·127) — one IEEE
  *     multiply + floor, bit-identical in any engine);
  *   - a centroid is represented EXACTLY as (n, Σq) — member count and
  *     per-dimension integer sum — never as a rounded mean;
  *   - squared distance to the rational centroid s/n is compared via the
  *     scaled integer form  A = Σ_i (n·x_i − s_i)²,  dist = A / n²:
  *     A is integer-exact in any summation order, and the single
  *     double division of two exactly-representable integers is
  *     correctly rounded, hence bit-identical in Spark and DuckDB.
  *
  * Magnitudes: |q| ≤ 127, so with n members A ≤ dims·(2·127·n)² —
  * ~1e14 for n = 5 000 at dims = 64, comfortably inside both the 2⁵³
  * double-exact window and Long. (A cluster of ~10⁹ members would need
  * the DECIMAL(38,0) twin of this arithmetic; at that point you shard
  * k-means per IVF cell anyway.)
  *
  * Scale posture: each iteration is one broadcast of k tiny (n, Σq)
  * rows against the point set (map-side argmin via `min_by`, partial
  * aggregation) plus one fixed-width shuffle of (cid, dim, Σ) pairs —
  * dims·k rows out of the combine. No driver-side state, no collect;
  * the iteration count is a compile-time constant, so the whole train
  * is a single lazy Catalyst plan.
  */
object KMeans {

  /** Quantized point set: (vec_id, q: array<long>) from an embedding
    * column of float vectors. Coordinates are CLAMPED to [-1, 1] before
    * scaling (r14, pathological-embeddings sweep): the int8 design
    * assumes unit-ish embeddings (|q| ≤ 127 underwrites every overflow
    * bound in this file), and an un-clamped 1e18 coordinate overflows
    * the Long floor under ANSI mode — one corrupt vector must degrade
    * to a saturated ±127, never fail the job. Real corpora sit well
    * inside the clamp (max |x| = 0.578 across tracked sfs — the sf0.01
    * differential is hash-unchanged); the oracles replay the identical
    * LEAST/GREATEST clamp. */
  def quantize(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(least(greatest(x.cast(DoubleType), lit(-1.0)),
          lit(1.0)) * 127).cast(LongType)).as("q"))

  /** Centroids after `iters` Lloyd rounds, k seeded from the first k
    * vec_ids (deterministic farthest-point init would also work; first-k
    * is the portable choice every engine replays trivially).
    *
    * Returns (cid, n, sv): member count and per-dim integer sums of the
    * LAST assignment. A cluster that loses all members simply drops out
    * (k shrinks) — the oracle's identical arithmetic drops it too.
    */
  def train(points: DataFrame, k: Int, iters: Int,
      dims: Int): DataFrame = {
    var cent = points.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), lit(1L).as("n"), col("q").as("sv"))
    for (_ <- 1 to iters) cent = update(assign(points, cent), dims)
    cent
  }

  /** The (point × centroid) frame with the EXACT scaled-integer
    * distance — the ONE definition of Σ(n·x − s)²/n² every consumer
    * ranks by: [[assign]] takes the argmin, the pruned-ANN probe
    * (EmbeddingTableQueries.probeCells) takes rank ≤ nProbe, and the
    * DuckDB oracles replay the identical arithmetic. Extracted (r20
    * second review pass) so the two Spark copies cannot silently
    * desynchronize from each other or from the committed cells. */
  def centroidDistances(points: DataFrame,
      centroids: DataFrame): DataFrame =
    points.crossJoin(broadcast(centroids))
      // r20 optimization round: the HOF fold aggregate(zip_with(...))
      // evaluates interpreted (outside whole-stage codegen) and
      // allocates a 64-element intermediate array per (point, centroid)
      // pair — ScaledSqDistExpr is the codegen'd twin with identical
      // exact-Long arithmetic (guide §4; the graft_dot precedent)
      .withColumn("a",
        graft.functions.VectorExpressions.scaledSqDist(
          col("q"), col("sv"), col("n")))
      .withColumn("dist",
        col("a").cast(DoubleType) / (col("n") * col("n")).cast(DoubleType))

  /** Argmin assignment of every point to its nearest centroid:
    * dist = Σ(n·x − s)² / n² with ties broken by lowest cid. `min_by`
    * over a (dist, cid) struct keeps the argmin partially-aggregable —
    * no window sort, map-side combine does the k-way comparison. */
  def assign(points: DataFrame, centroids: DataFrame): DataFrame =
    centroidDistances(points, centroids)
      .groupBy("vec_id")
      .agg(min_by(struct(col("cid"), col("q")),
        struct(col("dist"), col("cid"))).as("best"))
      .select(col("vec_id"), col("best.cid").as("cid"),
        col("best.q").as("q"))

  /** Update step: exact (n, Σq) per centroid, as ONE partial-aggregable
    * shuffle of per-dim column sums (r20 optimization round, guide
    * §2.3/§2.4): `dims` sum aggregates over `q[i]` + a member count,
    * reassembled into the sum vector in dim order. The previous shape —
    * posexplode to (cid, dim, x), groupBy (cid, dim), groupBy (cid) —
    * fanned every point into `dims` shuffle rows and paid a second
    * Exchange for the reassembly; this one combines map-side to k rows
    * of `dims` longs per task and shuffles only those. Results are
    * identical for the rectangular inputs every caller feeds (vectors
    * exactly `dims` long, as quantize/slices construct): per-dim Long
    * sums are order-independent, `sum` skips the same nulls the
    * exploded sum skipped, and `get()` nulls past-the-end indices the
    * exploded form never produced. */
  def update(assigned: DataFrame, dims: Int): DataFrame =
    assigned
      .groupBy("cid")
      .agg(count(lit(1)).as("n"),
        array((0 until dims).map(i =>
          sum(get(col("q"), lit(i)))): _*).as("sv"))
}
