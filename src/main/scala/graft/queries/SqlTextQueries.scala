package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftQuery
import graft.sources.Readers
import graft.sources.Readers.table

/** Queries whose Spark form IS the SQL text — the same engine-portable
  * ANSI string runs through Spark's parser (temp views → Catalyst, the
  * SURVEY §3.3 entry point) and through DuckDB as the oracle. The
  * strongest possible differential: byte-identical query text, two
  * engines, hash-equal results. */
object SqlTextQueries {

  private def sqlQuery(name: String, doc: String, sql: String,
      tables: Seq[String]): GraftQuery =
    GraftQuery(name, doc, Some(sql), (s: SparkSession, dir: String) => {
      tables.foreach(t => table(s, dir, t).createOrReplaceTempView(t))
      s.sql(sql)
    })

  private val correlated = sqlQuery(
    name = "sql_correlated_subqueries",
    doc = "SQL entry point (SURVEY §3.3) with correlated scalar + EXISTS " +
      "subqueries — Catalyst decorrelates both into joins (no per-row " +
      "re-execution; at 100 TB a correlated rewrite is the difference " +
      "between one shuffle and a million queries). Identical text runs " +
      "in DuckDB.",
    sql = """
      SELECT c.c_custkey,
             (SELECT COUNT(*) FROM orders o
               WHERE o.o_custkey = c.c_custkey) AS n_orders,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 100000)
                  THEN 1 ELSE 0 END AS has_big
      FROM customer c
      ORDER BY c.c_custkey""",
    tables = Seq("customer", "orders"))

  private val groupingSets = sqlQuery(
    name = "sql_grouping_sets",
    doc = "Explicit GROUPING SETS (the generalization under rollup/cube) " +
      "through the SQL parser — one Expand + single aggregate pass for " +
      "three grouping levels. Identical text runs in DuckDB.",
    sql = """
      SELECT COALESCE(l_returnflag, 'ALL') AS flag,
             COALESCE(l_linestatus, 'ALL') AS status,
             COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                              (l_returnflag), ())
      ORDER BY flag, status""",
    tables = Seq("lineitem"))

  private val inSubquery = sqlQuery(
    name = "sql_in_subquery",
    doc = "IN / NOT IN subqueries through the SQL parser — planned as " +
      "left-semi/anti joins. Identical text runs in DuckDB.",
    sql = """
      SELECT p_partkey, p_brand
      FROM part
      WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                          WHERE l_quantity >= 49)
        AND p_partkey NOT IN (SELECT l_partkey FROM lineitem
                              WHERE l_returnflag = 'R'
                                AND l_quantity >= 49)
      ORDER BY p_partkey""",
    tables = Seq("part", "lineitem"))

  private val recursiveCte = sqlQuery(
    name = "sql_recursive_cte",
    doc = "WITH RECURSIVE through the SQL parser (r16; Spark 4's " +
      "recursive CTE support): a binary-tree walk over custkeys " +
      "(children 2k and 2k+1 — a deterministic hierarchy derived from " +
      "the data itself, since TPC-H has no recursive table), " +
      "accumulating depth until the frontier leaves the key domain. " +
      "The iterative-fixpoint query class (org charts, BOM explosions, " +
      "graph reachability) that pre-4.x Spark needed a driver-side " +
      "loop for — now one declarative statement whose per-level joins " +
      "Catalyst plans like any other. The child step is written as an " +
      "EQUIJOIN (frontier × VALUES(0,1) inline table, then hash join " +
      "on the computed child key) instead of the natural " +
      "`ON c = 2k OR c = 2k+1` — an OR of equalities is not a hash " +
      "join condition and degrades every level to a nested-loop scan " +
      "of the full table. At sf0.1 both forms time alike (~5 s: the " +
      "row is dominated by ~15 sequential per-level Spark jobs, the " +
      "inherent cost of recursive execution) but at 100 TB the " +
      "equijoin is the difference between per-level hash joins and " +
      "per-level full-table scans. Byte-identical text runs in " +
      "DuckDB; the " +
      "depth-profile aggregate hash-compares both engines' entire " +
      "reachable set.",
    sql = """
      WITH RECURSIVE reach(k, depth) AS (
        SELECT CAST(1 AS BIGINT) AS k, 0 AS depth
        UNION ALL
        SELECT c.c_custkey, r.depth + 1
        FROM reach r
        CROSS JOIN (VALUES (0), (1)) AS s(b)
        JOIN customer c ON c.c_custkey = r.k * 2 + s.b
        WHERE r.depth < 20
      )
      SELECT r.depth, COUNT(*) AS n,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_bal
      FROM reach r JOIN customer c ON c.c_custkey = r.k
      GROUP BY r.depth
      ORDER BY r.depth""",
    tables = Seq("customer"))

  val all: Seq[GraftQuery] =
    Seq(correlated, groupingSets, inSubquery, recursiveCte)
}
