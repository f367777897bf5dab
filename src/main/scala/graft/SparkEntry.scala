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
    * the same parquet tables. Omitted only for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
