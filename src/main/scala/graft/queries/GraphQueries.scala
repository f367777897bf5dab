package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.ops.Graphs
import graft.sources.Readers.table

/** Web-graph curation signals over the host link graph: PageRank and
  * triangle counts as document-quality priors — the provenance-side
  * scoring a web corpus pipeline runs BEFORE content-level filtering
  * (Common Crawl publishes exactly these per-host centrality scores,
  * and harmonic/PageRank centrality is a standard crawl-frontier and
  * quality-weighting input). The reference has no graph surface at
  * all; these extend the engine the same way the dedup family does.
  *
  * The link graph derives from documents by the urlExtract convention
  * (deterministic doc_id formulas → ~50 hosts, two out-links per doc),
  * so the ORACLE can predict every edge; what is under test is the
  * distributed iteration/closure machinery in [[graft.ops.Graphs]],
  * which is written for billion-node graphs (see its scaladoc). The
  * doc→edge extraction is the part that grows with corpus size and is
  * a narrow map + one edge-sized groupBy.
  */
object GraphQueries {

  /** (src, dst) directed host multigraph, two formula out-links per
    * document. SQL twin interpolated into both oracles below — keep in
    * lockstep. */
  private def hostEdges(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents").select(col("doc_id"))
    d.select(expr("doc_id % 50").as("src"),
        expr("(doc_id * 7 + (doc_id div 50)) % 50").as("dst"))
      .union(d.select(expr("doc_id % 50").as("src"),
        expr("(doc_id * 3 + (doc_id div 50) * 11 + 1) % 50").as("dst")))
      .filter(col("src") =!= col("dst"))
  }

  private val hostEdgesSql = """
      e0 AS (SELECT doc_id % 50 AS src,
                    (doc_id * 7 + (doc_id // 50)) % 50 AS dst
             FROM documents
             UNION ALL
             SELECT doc_id % 50,
                    (doc_id * 3 + (doc_id // 50) * 11 + 1) % 50
             FROM documents)"""

  /** One PageRank oracle iteration: rPrev/cK/dgK/rK CTE block. */
  private def prIterSql(k: Int, prev: String): String = s"""
      c$k AS (SELECT e.dst AS v, SUM(r.r * e.w // o.wout) AS cin
              FROM e JOIN o USING (src) JOIN $prev r ON r.v = e.src
              GROUP BY 1),
      dg$k AS (SELECT COALESCE(SUM(r.r), 0) AS dm
               FROM $prev r LEFT JOIN o ON r.v = o.src
               WHERE o.src IS NULL),
      r$k AS (SELECT n.v,
                CAST(150000 + (85 * (COALESCE(cin, 0) +
                  (SELECT dm FROM dg$k) // (SELECT n_nodes FROM nn))) // 100
                  AS BIGINT) AS r
              FROM n LEFT JOIN c$k USING (v))"""

  private val hostPagerank = GraftQuery(
    name = "pipeline_host_pagerank",
    doc = "Integer-exact PageRank over the host link graph, 3 fixed " +
      "iterations (damping 0.85, dangling mass redistributed, all " +
      "floor-division int64 arithmetic — see Graphs.pageRank for the " +
      "determinism and overflow analysis). The join+aggregate " +
      "formulation keeps ranks distributed: one shuffle pair per " +
      "iteration, dangling mass as a 1-row broadcast, edges " +
      "materialized once across iterations. The oracle unrolls the " +
      "identical integer recurrence as three CTE blocks, so a green " +
      "row proves the distributed iteration bit-for-bit against a " +
      "sequential replay.",
    oracle = Some(s"""
      WITH $hostEdgesSql,
      e AS (SELECT src, dst, COUNT(*) AS w FROM e0
            WHERE src <> dst GROUP BY 1, 2),
      o AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
      n AS (SELECT DISTINCT v FROM
              (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
      nn AS (SELECT COUNT(*) AS n_nodes FROM n),
      r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM n),
      ${prIterSql(1, "r0")},
      ${prIterSql(2, "r1")},
      ${prIterSql(3, "r2")}
      SELECT v AS host, r AS rank_scaled FROM r3 ORDER BY host"""),
    run = (s, dir) => {
      val edges = hostEdges(s, dir)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      Graphs.pageRank(edges, iters = 3)
        .select(col("v").as("host"), col("r").as("rank_scaled"))
        .orderBy("host")
    })

  /** One HITS half-step oracle block: raw sum from `from`-keyed scores
    * `prev`, max-normalizer, normalized `out` CTE. */
  private def hitsHalfSql(out: String, prev: String, from: String,
      to: String): String = s"""
      ${out}r AS (SELECT e.$to AS v, CAST(SUM(p.r * e.w) AS BIGINT) AS raw
             FROM e JOIN $prev p ON p.v = e.$from GROUP BY 1),
      ${out}m AS (SELECT GREATEST(MAX(raw), 1) AS mx FROM ${out}r),
      $out AS (SELECT n.v,
             CAST(COALESCE(raw * 1000000 // (SELECT mx FROM ${out}m), 0)
               AS BIGINT) AS r
             FROM n LEFT JOIN ${out}r USING (v))"""

  private val hostHits = GraftQuery(
    name = "pipeline_host_hits",
    doc = "Integer-exact HITS hubs & authorities over the host link " +
      "graph, 2 fixed iterations (Kleinberg; the directory-page vs " +
      "content-page decomposition PageRank's single score conflates — " +
      "a link farm scores high hub / low authority). Max-normalized " +
      "int64 arithmetic (Graphs.hits: the normalizer is a 1-row max " +
      "broadcast — a divide-by-aggregate scalar handoff, the shape " +
      "PageRank's dangling-sum ADD doesn't cover). Oracle unrolls the " +
      "four half-steps as identical CTE blocks.",
    oracle = Some(s"""
      WITH $hostEdgesSql,
      e AS (SELECT src, dst, COUNT(*) AS w FROM e0
            WHERE src <> dst GROUP BY 1, 2),
      n AS (SELECT DISTINCT v FROM
              (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
      h0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM n),
      ${hitsHalfSql("a1", "h0", "src", "dst")},
      ${hitsHalfSql("h1", "a1", "dst", "src")},
      ${hitsHalfSql("a2", "h1", "src", "dst")},
      ${hitsHalfSql("h2", "a2", "dst", "src")}
      SELECT n.v AS host, a2.r AS authority, h2.r AS hub
      FROM n JOIN a2 ON a2.v = n.v JOIN h2 ON h2.v = n.v
      ORDER BY host"""),
    run = (s, dir) => {
      val edges = hostEdges(s, dir)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      val (a, h) = Graphs.hits(edges, iters = 2)
      a.select(col("v").as("host"), col("r").as("authority"))
        .join(h.select(col("v").as("host"), col("r").as("hub")), "host")
        .orderBy("host")
    })

  private val hostTriangles = GraftQuery(
    name = "pipeline_host_triangles",
    doc = "Per-host triangle participation counts on the symmetrized " +
      "host graph — the clustering/link-farm signal next to PageRank " +
      "(dense mutual-link neighborhoods are a spam indicator; triangle " +
      "density feeds trust heuristics). Spark side runs the " +
      "DEGREE-ORIENTED wedge closure (Graphs.triangleCounts: out-" +
      "degrees capped at O(sqrt(E)), hub-safe, O(E^1.5) total); the " +
      "oracle counts the same triangles with the textbook canonical " +
      "a<b<c triple join — two algorithms, one answer, so the " +
      "orientation logic is differentially proven.",
    oracle = Some(s"""
      WITH $hostEdgesSql,
      e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM e0 WHERE src <> dst),
      t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM e e1 JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      m AS (SELECT x AS host FROM t UNION ALL SELECT y FROM t
            UNION ALL SELECT z FROM t)
      SELECT host, COUNT(*) AS n_triangles FROM m
      GROUP BY 1 ORDER BY host"""),
    run = (s, dir) => {
      val und = hostEdges(s, dir)
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      Graphs.triangleCounts(und).orderBy("host")
    })

  val all: Seq[GraftQuery] = Seq(hostPagerank, hostHits, hostTriangles)
}
