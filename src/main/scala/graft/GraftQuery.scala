package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark plan builder plus (when ANSI-SQL-expressible)
  * a DuckDB oracle for the driver's differential correctness gate.
  *
  * Contract (SURVEY.md §5): `run` and `oracle` must produce the same rows
  * with the SAME column names (the harness sorts columns by name before
  * hashing). Determinism rules: explicit ORDER BY on a unique key in both
  * forms, no `monotonically_increasing_id`, doubles only where both engines
  * compute bit-identical values (exact decimal sums cast to double, or IEEE
  * ops over identical inputs in identical order).
  *
  * Laziness: `run` normally returns an unexecuted plan, but it MAY
  * execute jobs at call time when the operator requires materialization
  * (two-phase id assignment in graft.ops.Ids, drained streaming runs in
  * StreamingQueries, bloom-filter builds in graft.ops.RuntimeFilters). Explain-only callers should use the plan-stage
  * accessors those modules expose instead of `run`.
  */
/** @param tolerance opt-in relative epsilon for the DuckDB compare:
  *   `Some(rtol)` routes the query's oracle into
  *   `tolerance_oracle_sql.json` (compared by tools/check.py with
  *   |got−exp| ≤ rtol·|exp| on float columns, exact on the rest)
  *   instead of `oracle_sql.json` — hash-equality stays the DEFAULT and
  *   the driver's exact-hash gate never sees a designed-tolerance row.
  *   For operators whose textbook semantics need transcendentals
  *   (ln-idf BM25): ln is NOT bit-portable across engines — measured
  *   147/2000 ULP mismatches between Spark's StrictMath-codegen log
  *   and DuckDB's libm ln on the idf input range — so exact-hash would
  *   force rational contortions (r13 verdict #6). */
final case class GraftQuery(
    name: String,
    doc: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame,
    tolerance: Option[Double] = None)

object Registry {
  /** Full inventory, in SURVEY §2 order: reference-parity surface first,
    * then beyond-reference analytics, then LLM-pipeline extensions. */
  lazy val all: Seq[GraftQuery] =
    graft.queries.ParityQueries.all ++
    graft.queries.EtlJobQueries.all ++
    graft.queries.LakeQueries.all ++
    graft.queries.ExtendedQueries.all ++
    graft.queries.ScalarQueries.all ++
    graft.queries.MaintenanceQueries.all ++
    graft.queries.MorQueries.all ++
    graft.queries.WriterQueries.all ++
    graft.queries.EmbeddingTableQueries.all ++
    graft.queries.EvolutionQueries.all ++
    graft.queries.ConcurrencyQueries.all ++
    graft.queries.SqlTextQueries.all ++
    graft.queries.CoverageQueries.all ++
    graft.queries.PipelineQueries.all ++
    graft.queries.CurationQueries.all ++
    graft.queries.GraphQueries.all ++
    graft.queries.StreamingQueries.all

  lazy val byName: Map[String, GraftQuery] = all.map(q => q.name -> q).toMap
}
