package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PRODUCT QUANTIZATION (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the next compression rung
  * past int8 scalar quantization (`KMeans.quantize`) and IVF cells
  * (`pipeline_knn_ivf`): the embedding is split into `m` contiguous
  * subspaces and each subvector is replaced by the id of its nearest
  * codeword in a per-subspace codebook, so a dims-float vector
  * compresses to m small codes and distance to a query is computed
  * WITHOUT decompression via ADC (asymmetric distance computation) —
  * per-subspace lookup tables built once per query, then a table-sum
  * per corpus vector.
  *
  * Cross-engine exactness (the KMeans discipline, per subspace):
  *   - subvectors are int8-quantized first (`KMeans.quantize` clamp +
  *     floor — bit-identical in any engine);
  *   - a codeword is EXACTLY (n, Σq): member count + per-dim integer
  *     sum, never a rounded mean; nearest-codeword compares
  *     A = Σ_i (n·x_i − s_i)², dist = A/n² — order-independent integer
  *     numerator, one correctly-rounded double division, ties to the
  *     lowest cid;
  *   - an ADC distance is the sum of m such doubles, which IS
  *     order-dependent — so both engines fold the per-subspace terms
  *     in the SAME fixed order (sub 0..m−1): Spark aggregates over a
  *     subspace-sorted array, DuckDB list_reduce's a `list(d ORDER BY
  *     sub)` — identical IEEE addition sequence, bit-identical sums.
  *
  * Scale posture: training touches only (vec_id, sub, subvector) rows —
  * m·n fixed-width rows, one broadcast of the m·k codebook per Lloyd
  * round, partial-aggregable everywhere (the KMeans shuffle shape with
  * `sub` appended to every key). Encoding is one broadcast join.
  * ADC search shuffles per-(query, neighbor, sub) lookup hits — m rows
  * per candidate, grouped map-side — and never touches the original
  * vectors, which is the point: at 100 TB the float embeddings stay in
  * cold storage and the scan reads m bytes per vector. Codebook
  * constants are data-bounded at test SFs (k = 16 per subspace over
  * 500–2000 vectors); production PQ uses k = 256 — the identical plan
  * with a bigger broadcast, still metadata-sized (m·256 rows).
  */
object Pq {

  /** Subspace slicing of an integer vector frame (vec_id, q): `m` rows
    * per vector, `sd` dims each (subspace `s` takes dims
    * [s·sd, (s+1)·sd)); `keep` columns ride along unchanged. */
  def slices(pts: DataFrame, m: Int, sd: Int,
      keep: Seq[String] = Seq.empty): DataFrame = {
    val kept = keep.map(col)
    pts.select(col("vec_id") +: kept :+
        explode(sequence(lit(0), lit(m - 1))).as("sub") :+ col("q"): _*)
      .select(col("vec_id") +: kept :+ col("sub").cast(LongType).as("sub") :+
        expr(s"slice(q, sub * $sd + 1, $sd)").as("q"): _*)
  }

  /** Int8-quantized subvectors: (vec_id, sub, q: array<long>) — `m`
    * rows per vector, `sd` dims each, from the full quantized vector. */
  def subPoints(embeddings: DataFrame, m: Int, sd: Int): DataFrame =
    slices(KMeans.quantize(embeddings), m, sd)

  /** OPQ-lite dimension permutation (the integer-exact slice of OPQ's
    * idea): plain PQ slices CONTIGUOUS dims, so a few high-variance
    * dims can land in one subspace and starve the rest — its codebook
    * then spends all k codewords on that subspace's spread while
    * others' dims go underfit. Full OPQ learns a rotation (float
    * matrix work the exact-hash gate cannot make bit-portable);
    * the permutation variant rebalances with integer arithmetic only:
    * rank dims by the exact variance SURROGATE n·Σx² − (Σx)² (the
    * variance numerator — same argsort, no division) and deal ranks
    * to subspaces in SNAKE order (pos even: left-to-right; pos odd:
    * right-to-left), so every subspace receives one dim from each
    * variance octile. Returns (dim, sub, pos): a 64-row frame —
    * metadata, broadcast to apply. Ties rank by dim, so both engines
    * produce the identical permutation. */
  def snakeMapping(quantized: DataFrame, m: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").desc, col("dim")) // 64 rows: one-task window is the point
    quantized.select(posexplode(col("q")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg((count(lit(1)) * sum(col("x") * col("x")) -
        sum(col("x")) * sum(col("x"))).as("v"))
      .withColumn("r", row_number().over(w).cast(LongType) - 1)
      .select(col("dim").cast(LongType).as("dim"),
        when((col("r") / m).cast(LongType) % 2 === 0, col("r") % m)
          .otherwise(lit(m - 1) - col("r") % m).as("sub"),
        (col("r") / m).cast(LongType).as("pos"))
  }

  /** Permuted int8 subvectors: (vec_id, sub, q) under a (dim, sub,
    * pos) mapping — [[subPoints]] with the subspace assignment coming
    * from the broadcast mapping instead of contiguous slicing. The
    * output feeds [[train]]/[[encode]]/[[adcTables]] UNCHANGED: the
    * permutation is pure input layout, invisible to the PQ machinery
    * (exactly as OPQ's rotation is to FAISS's). */
  def permutedSubPoints(embeddings: DataFrame,
      mapping: DataFrame): DataFrame =
    permutedSlices(KMeans.quantize(embeddings), mapping)

  /** [[permutedSubPoints]] over an ALREADY-integer vector frame
    * (vec_id, q: array<long>) — the permuted twin of [[slices]], for
    * corpora that are integer at the source (the anisotropic audit
    * fixture) rather than quantized floats. */
  def permutedSlices(quantized: DataFrame,
      mapping: DataFrame): DataFrame =
    quantized
      .select(col("vec_id"), posexplode(col("q")).as(Seq("dim", "x")))
      .join(broadcast(mapping), "dim")
      .groupBy("vec_id", "sub")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("x")))),
        e => e.getField("x")).as("q"))

  /** Portable integer floor division — truncating div + pmod, so both
    * engines agree for negative sums too. The quotient is exact (the
    * numerator is a multiple of `n`), so the IEEE divide is exact. */
  private def floorDiv(s: Column, n: Column): Column =
    ((s - pmod(s, n)) / n).cast(LongType)

  /** IVF-PQ residuals (the FAISS IVFPQ layout, Jégou et al. §IV):
    * each point's coordinates relative to its coarse cell's ROUNDED
    * integer centroid c_i = floor(s_i / n) — rounding once per cell
    * keeps residuals integer-exact and cross-engine portable (the
    * exact rational s/n would force per-cell scale factors that a
    * SHARED residual codebook cannot absorb). Input `assigned` is
    * KMeans.assign output (vec_id, cid, q); |r_i| ≤ 254. */
  def residuals(assigned: DataFrame, centroids: DataFrame): DataFrame =
    assigned.join(broadcast(centroids), "cid")
      .select(col("vec_id"), col("cid"),
        zip_with(col("q"), col("sv"),
          (q, sv) => q - floorDiv(sv, col("n"))).as("q"))

  /** The `nprobe` nearest coarse cells per point — the IVF probe list.
    * Exact centroid distances (A/n², ties to lowest cid); the window
    * sorts k rows per point (k = cell count, a constant), so the
    * partition is never skewed regardless of corpus size. */
  def probeCells(points: DataFrame, centroids: DataFrame,
      nprobe: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))
    points.crossJoin(broadcast(centroids))
      .withColumn("a",
        graft.functions.VectorExpressions.scaledSqDist(
          col("q"), col("sv"), col("n")))
      .withColumn("dist",
        col("a").cast(DoubleType) / (col("n") * col("n")).cast(DoubleType))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= nprobe)
      .select(col("vec_id"), col("cid"))
  }

  /** Per-subspace codebooks after `iters` Lloyd rounds: (sub, cid, n,
    * sv) — k codewords per subspace, seeded from the first k vec_ids
    * (the portable first-k convention of [[KMeans.train]]). A codeword
    * that loses all members drops out of its subspace only. */
  def train(pts: DataFrame, k: Int, iters: Int,
      sd: Int = 8): DataFrame = {
    var cb = pts.filter(col("vec_id") < k)
      .select(col("sub"), col("vec_id").as("cid"), lit(1L).as("n"),
        col("q").as("sv"))
    for (_ <- 1 to iters) cb = update(assign(pts, cb), sd)
    cb
  }

  /** Argmin codeword per (vec_id, sub): broadcast the m·k codebook,
    * map-side `min_by` argmin — KMeans.assign with `sub` in the join
    * and group keys. */
  def assign(pts: DataFrame, codebook: DataFrame): DataFrame =
    pts.join(broadcast(codebook), "sub")
      // codegen'd twin of the HOF fold — identical exact-Long
      // arithmetic (r20 optimization round, guide §4)
      .withColumn("a",
        graft.functions.VectorExpressions.scaledSqDist(
          col("q"), col("sv"), col("n")))
      .withColumn("dist",
        col("a").cast(DoubleType) / (col("n") * col("n")).cast(DoubleType))
      .groupBy("vec_id", "sub")
      .agg(min_by(struct(col("cid"), col("q")),
        struct(col("dist"), col("cid"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.cid").as("cid"),
        col("best.q").as("q"))

  /** Update step: exact (n, Σq) per (sub, cid) — KMeans.update keyed by
    * subspace too: one partial-aggregable shuffle of `sd` per-dim column
    * sums (r20 optimization round, guide §2.3/§2.4 — the explode +
    * double-groupBy shape shuffled sd rows per subvector and paid a
    * second Exchange to reassemble). Identical results for the
    * rectangular sd-long subvectors every caller constructs. */
  def update(assigned: DataFrame, sd: Int = 8): DataFrame =
    assigned
      .groupBy("sub", "cid")
      .agg(count(lit(1)).as("n"),
        array((0 until sd).map(i =>
          sum(get(col("q"), lit(i)))): _*).as("sv"))

  /** PQ codes: (vec_id, sub, code) — the m-byte compressed form. */
  def encode(pts: DataFrame, codebook: DataFrame): DataFrame =
    assign(pts, codebook)
      .select(col("vec_id"), col("sub"), col("cid").as("code"))

  /** ADC lookup tables for a query point set: (query_id, sub, cid, d)
    * — the squared distance from each query subvector to every codeword,
    * dist = A/n² exactly as in [[assign]]. m·k rows per query:
    * metadata-sized, broadcastable. */
  def adcTables(queries: DataFrame, codebook: DataFrame): DataFrame =
    queries.join(broadcast(codebook), "sub")
      .withColumn("a",
        graft.functions.VectorExpressions.scaledSqDist(
          col("q"), col("sv"), col("n")))
      .select(col("query_id"), col("sub"), col("cid"),
        (col("a").cast(DoubleType) /
          (col("n") * col("n")).cast(DoubleType)).as("d"))

  /** ADC distance of every (query, corpus vector) pair: join codes to
    * the broadcast tables on (sub, code) and fold the m per-subspace
    * terms in FIXED subspace order 0..m−1 — the order both engines
    * replay, so the double sum is bit-identical. Never touches the
    * original vectors. */
  def adcDistances(codes: DataFrame, tables: DataFrame): DataFrame =
    codes.join(broadcast(tables),
        codes("sub") === tables("sub") && codes("code") === tables("cid"))
      .select(codes("vec_id").as("neighbor_id"), col("query_id"),
        codes("sub").as("sub"), col("d"))
      .groupBy("query_id", "neighbor_id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("sub"), col("d")))),
          e => e.getField("d")),
        lit(0.0d), (acc, v) => acc + v).as("dist"))
}
