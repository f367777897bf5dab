package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.ops.{Ids, TimeOps}
import graft.sources.Readers.table

/** The reference's operator surface (SURVEY.md §2) re-expressed over the
  * driver's deterministic tables so the DuckDB oracle can check every one of
  * them at sf0.01. Each query names the SURVEY §2 operators it covers.
  *
  * Scale posture: all of these are single-pass declarative plans — filters
  * and projections reach the parquet scan, aggregates are partial+final,
  * and the only wide exchanges are the ones the semantics require.
  */
object ParityQueries {

  /** Exact decimal sum surfaced as double: both engines sum exactly in
    * decimal, so the final double is bit-identical (SURVEY §5 determinism). */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  // -------------------------------------------------------------------
  // S8 + P1/P2/P5 — schema'd scan, filter, projection with rename.
  // -------------------------------------------------------------------
  private val filterProject = GraftQuery(
    name = "parity_filter_project",
    doc = "Scan+filter+rename (SURVEY §2.1 S8, §2.2 P1/P2/P5; reference " +
      "etl.py:186,195-197). Predicate and 4-column projection both push " +
      "into the parquet scan — at 100 TB this reads 4 of 6 columns of the " +
      "one matching row group set, nothing else.",
    oracle = Some("""
      SELECT event_id, user_id AS uid, value AS v, upper(event_type) AS etype
      FROM events WHERE event_type = 'view' ORDER BY event_id"""),
    run = (s, dir) => table(s, dir, "events")
      .filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id").as("uid"),
        col("value").as("v"), upper(col("event_type")).as("etype"))
      .orderBy("event_id"))

  // -------------------------------------------------------------------
  // A1 — full-row distinct (reference etl.py:76,92,177,236).
  // -------------------------------------------------------------------
  private val dedupFullRow = GraftQuery(
    name = "parity_dedup_fullrow",
    doc = "Full-row dropDuplicates on a narrow projection (SURVEY §2.4 A1). " +
      "Physically a partial+final hash aggregate on all columns; the " +
      "projection is pruned at the scan so the shuffle carries 2 columns.",
    oracle = Some("""
      SELECT DISTINCT o_orderstatus, o_orderpriority
      FROM orders ORDER BY o_orderstatus, o_orderpriority"""),
    run = (s, dir) => table(s, dir, "orders")
      .select("o_orderstatus", "o_orderpriority")
      .dropDuplicates()
      .orderBy("o_orderstatus", "o_orderpriority"))

  // -------------------------------------------------------------------
  // F1/F2/F3 + P3 + A1 — the reference `time` dimension (etl.py:215-236),
  // built from events.ts. Native exprs replace both Python UDFs.
  // -------------------------------------------------------------------
  private val timeDim = GraftQuery(
    name = "parity_time_dim",
    doc = "The reference's 8-column time dim (SURVEY §1.4): epoch-millis " +
      "ts, string start_time at second granularity (the reference quirk, " +
      "§2.8.3), hour/day/week/month/year/weekday via native exprs (F1-F3 — " +
      "no Python UDF fence, stays in whole-stage codegen), full-row dedup.",
    oracle = Some("""
      SELECT DISTINCT
        epoch_ms(ts) AS ts_ms,
        strftime(ts, '%Y-%m-%d %H:%M:%S') AS start_time,
        hour(ts) AS hour, dayofmonth(ts) AS day, weekofyear(ts) AS week,
        month(ts) AS month, year(ts) AS year, dayofweek(ts) + 1 AS weekday
      FROM events ORDER BY ts_ms"""),
    run = (s, dir) => {
      val ev = table(s, dir, "events")
        .withColumn("ts_ms", unix_millis(col("ts")))
      // LongType to match DuckDB's BIGINT-returning date-part functions.
      val withUnits = TimeOps.timeUnits(col("ts")).foldLeft(
        ev.withColumn("start_time", TimeOps.startTimeString(col("ts_ms")))) {
        case (df, (name, c)) => df.withColumn(name, c.cast(LongType))
      }
      withUnits
        .select("ts_ms", "start_time", "hour", "day", "week", "month",
          "year", "weekday")
        .dropDuplicates()
        .orderBy("ts_ms")
    })

  // -------------------------------------------------------------------
  // The `users` quirk — projection with NO dedup (etl.py:195-197;
  // SURVEY §2.8.2): one row per qualifying event.
  // -------------------------------------------------------------------
  private val usersNondedup = GraftQuery(
    name = "parity_users_nondedup",
    doc = "Reference `users` semantics (SURVEY §1.4): filtered projection " +
      "with NO dedup — one row per event, duplicates preserved. The " +
      "keyed-dedup variant is pipeline_latest_per_user (window).",
    oracle = Some("""
      SELECT event_id, user_id, event_type, value
      FROM events WHERE event_type = 'purchase' ORDER BY event_id"""),
    run = (s, dir) => table(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id"))

  // -------------------------------------------------------------------
  // J1 — two-key equi inner join (etl.py:267-270). lineitem ⋈ per-
  // (partkey,suppkey) catalog on BOTH keys.
  // -------------------------------------------------------------------
  private val joinTwoKey = GraftQuery(
    name = "parity_join_twokey",
    doc = "Two-key equi inner join (SURVEY §2.3 J1). The catalog side is a " +
      "partial+final hash aggregate; the join shuffles both sides on the " +
      "composite key once — AQE converts to broadcast when the catalog " +
      "fits. At 100 TB: bucket both sides on (partkey,suppkey) to make " +
      "this exchange-free.",
    oracle = Some("""
      WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS ps_qty,
               COUNT(*) AS ps_cnt
        FROM lineitem GROUP BY 1, 2)
      SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey,
             ps.ps_qty, ps.ps_cnt
      FROM lineitem l
      JOIN ps ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
      ORDER BY l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_suppkey"""),
    run = (s, dir) => {
      val li = table(s, dir, "lineitem")
      val ps = li.groupBy("l_partkey", "l_suppkey")
        .agg(dsum(col("l_quantity")).as("ps_qty"),
          count(lit(1)).as("ps_cnt"))
      li.join(ps, Seq("l_partkey", "l_suppkey"), "inner")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "ps_qty", "ps_cnt")
        // (orderkey, linenumber) is not unique in the synthetic data —
        // order by the full key to keep the oracle compare deterministic.
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    })

  // -------------------------------------------------------------------
  // J2 + F4-replacement — the songplays fact build: log ⋈ time dim on
  // STRING start_time equality (fan-out quirk preserved), with
  // row_number over an explicit order instead of the reference's
  // non-deterministic monotonically_increasing_id (SURVEY §5).
  // -------------------------------------------------------------------
  private val songplaysStar = GraftQuery(
    name = "parity_songplays_star",
    doc = "Reference fact-table build (SURVEY §1.4 songplays, §2.3 J2): " +
      "filtered log joined to the deduped time dim on string-equality " +
      "start_time (second granularity — the fan-out quirk, §2.8.3), id " +
      "assigned by the two-phase partition-offset pattern over an " +
      "explicit order (replaces the non-deterministic " +
      "monotonically_increasing_id, §2.8.4, WITHOUT the single-task " +
      "global window — no Exchange SinglePartition anywhere in the fact " +
      "build; see graft.ops.Ids). The time dim is small after dedup → " +
      "broadcast side.",
    oracle = Some("""
      WITH t AS (
        SELECT DISTINCT epoch_ms(ts) AS ts_ms,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS start_time,
               month(ts) AS month, year(ts) AS year
        FROM events),
      log AS (
        SELECT event_id, user_id, event_type, value,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS start_time
        FROM events WHERE event_type = 'purchase')
      SELECT ROW_NUMBER() OVER (ORDER BY l.event_id, t.ts_ms) AS songplay_id,
             l.start_time, l.event_id, l.user_id, l.value, t.month, t.year
      FROM log l JOIN t ON l.start_time = t.start_time
      ORDER BY songplay_id"""),
    run = (s, dir) =>
      Ids.orderedId(songplaysJoined(s, dir),
          Seq(col("event_id"), col("ts_ms")), "songplay_id")
        .select("songplay_id", "start_time", "event_id", "user_id", "value",
          "month", "year")
        .orderBy("songplay_id"))

  /** The pre-id fact join of parity_songplays_star (J2 broadcast shape).
    * Exposed so PlanSpec can assert the broadcast on THIS stage — the id
    * assignment checkpoints it, so the final query plan no longer shows
    * the join. */
  private[graft] def songplaysJoined(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "events")
    val timeDim = ev
      .select(unix_millis(col("ts")).as("ts_ms"),
        TimeOps.startTimeString(unix_millis(col("ts"))).as("start_time"),
        month(col("ts")).cast(LongType).as("month"),
        year(col("ts")).cast(LongType).as("year"))
      .dropDuplicates()
    val log = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"),
        TimeOps.startTimeString(unix_millis(col("ts"))).as("start_time"))
    log.join(broadcast(timeDim),
        log("start_time") === timeDim("start_time"), "inner")
      .select(log("start_time"), col("event_id"), col("user_id"),
        col("value"), col("month"), col("year"), col("ts_ms"))
  }

  // -------------------------------------------------------------------
  // S1-family — JSON parsing (the reference's whole input surface is
  // schema'd JSON). Here: JSON string column → typed field.
  // -------------------------------------------------------------------
  private val jsonExtract = GraftQuery(
    name = "parity_json_extract",
    doc = "Schema-on-read JSON (SURVEY §2.1 S1/S2 re-expressed as a " +
      "column op): get_json_object parses events.props per row inside " +
      "codegen; aggregated per event_type. No inference pass (§1.3).",
    oracle = Some("""
      SELECT event_type,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""),
    run = (s, dir) => table(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type"))

  // -------------------------------------------------------------------
  // S6/S8 — partitioned parquet sink + read-back (etl.py:99-102 et al.).
  // -------------------------------------------------------------------
  private val partitionedWrite = GraftQuery(
    name = "parity_partitioned_write",
    doc = "Hive-partitioned parquet write + read-back (SURVEY §2.1 S6/S8; " +
      "§1.3 partition columns move into the directory layout). The " +
      "round-trip aggregate must equal the oracle's aggregate over the " +
      "source table — proving the sink drops no rows and the partition " +
      "column survives the layout round-trip. At 100 TB the same layout " +
      "enables partition pruning on ship_year.",
    oracle = Some("""
      SELECT year(l_shipdate) AS ship_year,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY 1 ORDER BY ship_year"""),
    run = (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_partwrite").toString
      table(s, dir, "lineitem")
        // write the working-set projection: the partition column plus
        // what the read-back aggregate consumes (a partitioned derived
        // table, not a second full copy of the fact)
        .select(col("l_orderkey"), col("l_extendedprice"),
          year(col("l_shipdate")).as("ship_year"))
        .write.mode("overwrite").partitionBy("ship_year").parquet(out)
      s.read.parquet(out)
        .groupBy(col("ship_year").cast(LongType).as("ship_year"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("ship_year")
    })

  private val profileSummary = GraftQuery(
    name = "parity_profile_summary",
    doc = "Column profiling summary (the reference's " +
      "data_profiling.ipynb workflow as one query): per profiled " +
      "events column - row count, null count, exact distinct count, " +
      "min/max - the schema-on-read sanity pass every lake ingestion " +
      "runs first. One UNION of per-column aggregate rows; min/max " +
      "surfaced as strings (integer and varchar columns only - " +
      "double formatting is not cross-engine portable). Each aggregate " +
      "is partial+final; nothing shuffles more than the group-less agg.",
    oracle = Some("""
      SELECT * FROM (
        SELECT 'event_id' AS col, COUNT(*) AS n,
               COUNT(*) - COUNT(event_id) AS n_null,
               COUNT(DISTINCT event_id) AS n_distinct,
               CAST(MIN(event_id) AS VARCHAR) AS min_v,
               CAST(MAX(event_id) AS VARCHAR) AS max_v
        FROM events
        UNION ALL
        SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type),
               COUNT(DISTINCT event_type),
               MIN(event_type), MAX(event_type)
        FROM events
        UNION ALL
        SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
               COUNT(DISTINCT user_id),
               CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
        FROM events)
      ORDER BY col"""),
    run = (s, dir) => {
      val ev = table(s, dir, "events")
      def prof(c: String, asString: Column => Column): DataFrame =
        ev.agg(count(lit(1)).as("n"),
            (count(lit(1)) - count(col(c))).as("n_null"),
            count_distinct(col(c)).as("n_distinct"),
            asString(min(col(c))).as("min_v"),
            asString(max(col(c))).as("max_v"))
          .select(lit(c).as("col"), col("n"), col("n_null"),
            col("n_distinct"), col("min_v"), col("max_v"))
      prof("event_id", _.cast(StringType))
        .unionAll(prof("event_type", identity))
        .unionAll(prof("user_id", _.cast(StringType)))
        .orderBy("col")
    })

  val all: Seq[GraftQuery] = Seq(
    filterProject, dedupFullRow, timeDim, usersNondedup, joinTwoKey,
    songplaysStar, jsonExtract, partitionedWrite, profileSummary)
}
