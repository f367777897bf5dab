package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.sources.Readers.table

/** Data-lake maintenance operators (the category this engine lives in):
  * SCD-2 dimension upsert, small-file compaction, schema evolution on
  * read — each a deterministic round-trip whose oracle aggregates the
  * source, proving the maintenance op loses nothing. */
object MaintenanceQueries {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  // -------------------------------------------------------------------
  // SCD type-2 upsert (merge-into semantics on plain parquet).
  // -------------------------------------------------------------------
  private val scd2 = GraftQuery(
    name = "lake_scd2_upsert",
    doc = "Slowly-changing-dimension type 2 merge without a table " +
      "format: deterministic updates (every 7th customer upgrades to " +
      "segment VIP, +100 balance) applied as semi-join (close old " +
      "version) + anti-join (carry unchanged) + new versions — the " +
      "copy-on-write MERGE pattern for plain-parquet lakes. Whole " +
      "history reproducible in SQL → exact oracle.",
    oracle = Some("""
      WITH upd AS (SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0)
      SELECT c.c_custkey, c.c_mktsegment AS segment, c.c_acctbal AS bal,
             1 AS version,
             CASE WHEN u.c_custkey IS NULL THEN 1 ELSE 0 END AS is_current
      FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
      UNION ALL
      SELECT c.c_custkey, 'VIP' AS segment, c.c_acctbal + 100.0 AS bal,
             2 AS version, 1 AS is_current
      FROM customer c JOIN upd u ON c.c_custkey = u.c_custkey
      ORDER BY c_custkey, version"""),
    run = (s, dir) => {
      val base = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"),
          col("c_acctbal").as("bal"))
      val updKeys = base.filter(col("c_custkey") % 7 === 0)
        .select("c_custkey")
      val closed = base.join(updKeys, Seq("c_custkey"), "left_semi")
        .withColumn("version", lit(1)).withColumn("is_current", lit(0))
      val unchanged = base.join(updKeys, Seq("c_custkey"), "left_anti")
        .withColumn("version", lit(1)).withColumn("is_current", lit(1))
      val newRows = base.join(updKeys, Seq("c_custkey"), "left_semi")
        .withColumn("segment", lit("VIP"))
        .withColumn("bal", col("bal") + 100.0)
        .withColumn("version", lit(2)).withColumn("is_current", lit(1))
      closed.unionByName(unchanged).unionByName(newRows)
        .orderBy("c_custkey", "version")
    })

  // -------------------------------------------------------------------
  // Small-file compaction round-trip.
  // -------------------------------------------------------------------
  private val compaction = GraftQuery(
    name = "lake_compaction",
    doc = "Small-file compaction: fragment lineitem into 64 files, " +
      "compact to 4 with repartition, aggregate the compacted copy. " +
      "Oracle aggregates the source — the compaction moved bytes, not " +
      "rows. At 100 TB this is the scheduled maintenance that keeps " +
      "scan task counts sane; repartition(N) is the shuffle-based " +
      "rewrite (coalesce for the no-shuffle variant).",
    oracle = Some("""
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""),
    run = (s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft_compact").toString
      // the small-file problem is file COUNT, not row width — fragment a
      // working-set projection (key + the columns the downstream agg
      // reads) so the demo exercises 64-to-4 consolidation without
      // paying a double full-width table rewrite
      table(s, dir, "lineitem")
        .select("l_orderkey", "l_returnflag", "l_extendedprice")
        .repartition(64)
        .write.mode("overwrite").parquet(s"$base/fragmented")
      s.read.parquet(s"$base/fragmented").repartition(4)
        .write.mode("overwrite").parquet(s"$base/compacted")
      s.read.parquet(s"$base/compacted")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("l_returnflag")
    })

  // -------------------------------------------------------------------
  // Schema evolution on read (mergeSchema).
  // -------------------------------------------------------------------
  private val schemaEvolution = GraftQuery(
    name = "lake_schema_evolution",
    doc = "Schema evolution: two parquet generations of part (v2 adds " +
      "p_retailprice), read together with mergeSchema — old rows " +
      "surface NULL for the new column. The additive-column path every " +
      "long-lived lake table takes; oracle reconstructs the union " +
      "arithmetic from the source.",
    oracle = Some("""
      SELECT CAST(COUNT(*) * 2 AS BIGINT) AS n_rows,
             COUNT(*) AS n_with_price,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM part"""),
    run = (s, dir) => {
      val base = java.nio.file.Files
        .createTempDirectory("graft_evolve").toString
      val part = table(s, dir, "part")
      part.select("p_partkey", "p_name")
        .write.mode("overwrite").parquet(s"$base/gen=1")
      part.select("p_partkey", "p_name", "p_retailprice")
        .write.mode("overwrite").parquet(s"$base/gen=2")
      s.read.option("mergeSchema", "true").parquet(base)
        .agg(count(lit(1)).as("n_rows"),
          count(col("p_retailprice")).as("n_with_price"),
          dsum(col("p_retailprice")).as("sum_price"))
    })

  // -------------------------------------------------------------------
  // Range-clustered write layout (min/max-pruning enabler).
  // -------------------------------------------------------------------
  private val rangeLayout = GraftQuery(
    name = "lake_range_layout",
    doc = "Write-layout clustering: repartitionByRange(o_orderdate) + " +
      "sortWithinPartitions before the write puts disjoint date ranges " +
      "in each file with sorted row groups — at 100 TB that's what makes " +
      "parquet min/max statistics actually skip IO for time filters " +
      "(Z-order-lite for a single key). Round-trip filtered aggregate " +
      "must equal the oracle over the unclustered source.",
    oracle = Some("""
      SELECT year(o_orderdate) AS y, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1 ORDER BY y"""),
    run = (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_range").toString
      table(s, dir, "orders")
        .repartitionByRange(8, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("y"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("y")
    })

  val all: Seq[GraftQuery] = Seq(scd2, compaction, schemaEvolution,
    rangeLayout)
}
