package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full engine inventory (reference-parity surface,
  * beyond-reference analytics, LLM-pipeline operators) assembled from
  * [[Registry]]; every entry with an oracle is differentially checked
  * against DuckDB by the driver at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join: fact ⋈ 3 broadcast dims → per-region-year revenue. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("lake_star_revenue").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for non-SQL-expressible ops
    * and for tolerance-mode queries (those route through
    * [[toleranceSql]] — the driver's exact-hash compare cannot bound a
    * transcendental's cross-engine ULP drift, so it records its weaker
    * rows-only check while tools/check.py runs the epsilon compare). */
  def oracleSql: Map[String, String] =
    Registry.all.filter(_.tolerance.isEmpty)
      .flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap

  /** Tolerance-mode oracles: name → (oracle SQL, relative epsilon for
    * float columns). Dumped by Verify as tolerance_oracle_sql.json. */
  def toleranceSql: Map[String, (String, Double)] =
    Registry.all.flatMap(q =>
      for (sql <- q.oracle; rtol <- q.tolerance)
        yield q.name -> (sql.trim, rtol)).toMap
}
