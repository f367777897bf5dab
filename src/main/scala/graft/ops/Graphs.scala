package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed graph primitives over edge DataFrames — PageRank and
  * triangle counting — in the join+aggregate formulation that scales to
  * billion-node graphs (no driver-side adjacency, no collect of any
  * per-node state).
  *
  * Determinism: all arithmetic is INTEGER (ranks are int64 scaled by
  * `scale`, divisions are floor divisions that Spark's `div` and
  * DuckDB's `//` compute identically for the non-negative operands
  * here), so results are bit-identical across engines, partitionings
  * and re-runs — the same trick as the integer-exact Lloyd iteration in
  * [[KMeans]]. Floating-point PageRank would be order-sensitive under
  * Spark's non-deterministic partial-sum order and could never be
  * hash-compared against an oracle.
  */
object Graphs {

  /** Fixed-iteration integer PageRank.
    *
    * `edges` = (src: long, dst: long, w: long) weighted directed
    * multigraph, already aggregated (one row per (src, dst)). Returns
    * (v, r) with r the int64 rank scaled by `scale` after exactly
    * `iters` iterations from the uniform start r0 = scale.
    *
    * Update rule (all floor divisions):
    *   in(v)  = Σ_{(s,v,w)} (r(s) * w) div wout(s)
    *   dang   = (Σ_{s: no out-edge} r(s)) div |V|
    *   r'(v)  = (15*scale) div 100  +  (85 * (in(v) + dang)) div 100
    *
    * Scale posture: ranks live in a DataFrame keyed by node — never on
    * the driver. Each iteration is ONE shuffle pair (join edges⋈ranks
    * on src, then groupBy dst); the dangling mass is a 1-row aggregate
    * cross-joined back as a broadcast, not a collect. The edge+outw
    * frame is materialized once and reused across iterations (on a
    * cluster: persist/checkpoint it and co-partition edges by src so
    * every iteration's join is shuffle-free on the edge side). Ranks
    * are cut per iteration (localCheckpoint here; a durable checkpoint
    * off-local, Ids.orderedId convention) so the lineage stays O(1) in
    * the iteration count instead of O(iters) replays.
    *
    * Overflow bound: r(s)*w stays in int64 while
    * scale·|V|·max(w) < 2⁶³ — at scale=10⁶ that allows a billion nodes
    * with multi-edge weights up to ~9000; shrink `scale` for heavier
    * multigraphs.
    */
  def pageRank(edges: DataFrame, iters: Int, scale: Long = 1000000L)
      : DataFrame = {
    val spark = edges.sparkSession
    val teleport = 15L * scale / 100L

    val outw = edges.groupBy("src").agg(sum("w").as("wout"))
    // reused every iteration: cut once (tiny relative to the doc scan
    // that produced it — |E| rows)
    val ew = edges.join(outw, "src").localCheckpoint(true)
    val nodes = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
      .distinct()
      .localCheckpoint(true)
    val nNodes = broadcast(nodes.agg(count(lit(1)).as("n_nodes")))

    var r = nodes.select(col("v"), lit(scale).cast(LongType).as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      r = step(ew, nodes, nNodes, r, teleport).localCheckpoint(true)
    }
    r
  }

  /** One rank update (the loop body of [[pageRank]]), un-cut. Public so
    * plan tests can assert the iteration's shape — at run time every
    * iteration is localCheckpoint'd, which hides the join/broadcast
    * structure behind an ExistingRDD scan (GraftQuery's plan-stage
    * accessor convention). */
  def step(ew: DataFrame, nodes: DataFrame, nNodes: DataFrame,
      r: DataFrame, teleport: Long): DataFrame = {
    val contrib = ew
      .join(r, ew("src") === r("v"))
      .select(col("dst").as("v"), expr("(r * w) div wout").as("c"))
      .groupBy("v").agg(sum("c").as("cin"))
    val dangShare = r.join(ew.select("src").distinct(),
        r("v") === col("src"), "left_anti")
      .agg(coalesce(sum("r"), lit(0L)).as("dm"))
      .crossJoin(nNodes)
      .select(expr("dm div n_nodes").as("dang"))
    nodes
      .join(contrib, Seq("v"), "left")
      .crossJoin(broadcast(dangShare))
      .select(col("v"),
        (lit(teleport) +
          expr("(85 * (coalesce(cin, CAST(0 AS BIGINT)) + dang)) div 100"))
          .as("r"))
  }

  /** Fixed-iteration integer HITS (Kleinberg hubs & authorities).
    *
    * `edges` = (src, dst, w) weighted directed graph (one row per
    * (src, dst)). Returns (v, authority, hub), both int64 scores
    * max-normalized to `scale` after exactly `iters` iterations from
    * the uniform hub start h0 = scale.
    *
    * Update (floor divisions, max-normalization — the integer-friendly
    * standard for HITS):
    *   a_raw(v) = Σ_{(u,v,w)} h(u)·w ; a(v) = a_raw·scale div max(a_raw)
    *   h_raw(u) = Σ_{(u,v,w)} a(v)·w ; h(u) = h_raw·scale div max(h_raw)
    * Nodes without in-(out-)edges score authority (hub) 0.
    *
    * Scale posture: same join+aggregate shape as [[pageRank]] — scores
    * stay node-keyed DataFrames, each half-step is one shuffle pair,
    * the normalizer is a 1-row max aggregate broadcast back (a
    * different scalar-handoff shape than PageRank's dangling sum:
    * divide-by-aggregate instead of add-broadcast). Overflow bound:
    * raw·scale < 2⁶³ requires scale²·w_max·deg_max < 2⁶³ — at
    * scale=10⁶ multi-edge weights×degree up to ~9·10⁶ are safe; shrink
    * `scale` beyond.
    */
  def hits(edges: DataFrame, iters: Int, scale: Long = 1000000L)
      : (DataFrame, DataFrame) = {
    val ew = edges.localCheckpoint(true)
    val nodes = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
      .distinct()
      .localCheckpoint(true)

    def halfStep(score: DataFrame, from: String, to: String): DataFrame = {
      val raw = ew.join(score, ew(from) === score("v"))
        .select(col(to).as("v"), (col("r") * col("w")).as("c"))
        .groupBy("v").agg(sum("c").as("raw"))
      val mx = broadcast(
        raw.agg(greatest(max("raw"), lit(1L)).as("mx")))
      nodes.join(raw, Seq("v"), "left")
        .crossJoin(mx)
        .select(col("v"),
          coalesce(expr(s"(raw * $scale) div mx"), lit(0L)).as("r"))
    }

    var h = nodes.select(col("v"), lit(scale).cast(LongType).as("r"))
      .localCheckpoint(true)
    var a = h
    for (_ <- 1 to iters) {
      a = halfStep(h, "src", "dst").localCheckpoint(true)
      h = halfStep(a, "dst", "src").localCheckpoint(true)
    }
    (a, h)
  }

  /** Per-node triangle participation counts via DEGREE-ORIENTED wedge
    * closure (Schank's node-iterator++: orient every undirected edge
    * from its lower-(degree, id) endpoint to the higher one, generate
    * wedges only at a node's OUT-neighbors, close with one join).
    *
    * `edges` = (a: long, b: long) canonical undirected edge set
    * (a < b, distinct, no loops). Returns (host, n_triangles): how many
    * triangles each node participates in (each triangle contributes 1
    * to each of its three members).
    *
    * Scale posture: orientation caps every node's out-degree at
    * O(√|E|), so wedge generation is O(|E|^{3/2}) TOTAL and — the part
    * that matters under power-law degree — a web-scale hub with 10⁷
    * neighbors generates NO wedges (all its edges point in); the naive
    * a<b<c triple join would square that hub. Three shuffles total
    * (degree agg, wedge self-join on the apex, closure join on the
    * (x,y) pair), all on edge-sized frames.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("v"))
      .union(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))

    // orient: u -> x iff (deg(u), u) < (deg(x), x); keep deg(x) so the
    // wedge join can order a node's out-neighbors without re-joining
    val withDeg = edges
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("u"),
      when(aLower, col("b")).otherwise(col("a")).as("x"),
      when(aLower, col("db")).otherwise(col("da")).as("dx"))
      .localCheckpoint(true) // feeds 3 plan branches (2 wedge sides + closure)

    // wedges at apex u over its out-neighbors, ordered by (deg, id) so
    // the closing edge is oriented x -> y by construction
    val p = oriented.select(col("u"), col("x"), col("dx"))
    val q = oriented.select(col("u"), col("x").as("y"), col("dx").as("dy"))
    val wedges = p.join(q, Seq("u"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val triangles = wedges.join(
      oriented.select(col("u").as("x"), col("x").as("y")), Seq("x", "y"))

    triangles
      .select(explode(array(col("u"), col("x"), col("y"))).as("host"))
      .groupBy("host").agg(count(lit(1)).as("n_triangles"))
  }
}
