package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.sources.Readers.table

/** Beyond-reference analytics (SURVEY.md §7.2 step 6): the operator
  * families the reference never exercises — groupBy aggregates, rollup /
  * cube, windows, top-k, set ops, semi/anti joins, sessionization — all
  * built-ins, all DuckDB-oracle-checkable.
  */
object LakeQueries {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact decimal sum of a 2-decimal × 2-decimal product (4-decimal
    * result), surfaced as double — bit-identical across engines. */
  private def dsumProd(a: Column, b: Column): Column =
    sum((a.cast(DecimalType(18, 2)) * b.cast(DecimalType(18, 2))))
      .cast(DoubleType)

  // -------------------------------------------------------------------
  // TPC-H Q1-shaped scan-heavy aggregate: THE bench headline.
  // -------------------------------------------------------------------
  private val aggLineitem = GraftQuery(
    name = "lake_agg_pricing",
    doc = "TPC-H Q1-shaped pricing summary. Partial aggregation happens " +
      "map-side before one 2-column-key exchange; scan reads only the 7 " +
      "needed columns with the shipdate predicate pushed down. All sums " +
      "computed exactly in decimal, surfaced as double. At 100 TB this is " +
      "bandwidth-bound on the pruned scan — the ideal shape.",
    oracle = Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    run = (s, dir) => table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-01").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount"))
          .as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).cast(DoubleType)
          .as("avg_qty"),
        dsum(col("l_discount")).as("sum_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"))

  // -------------------------------------------------------------------
  // Star join with broadcast dims.
  // -------------------------------------------------------------------
  private val starJoin = GraftQuery(
    name = "lake_star_revenue",
    doc = "Star join: orders ⋈ customer ⋈ nation ⋈ region, revenue per " +
      "region-year. nation/region (and customer at small SF) are " +
      "explicitly broadcast — zero shuffle on the dim side; the fact " +
      "table shuffles ONCE for the final 2-key aggregate. At 100 TB: " +
      "customer stops fitting in broadcast → shuffle-hash join on " +
      "o_custkey; nation/region always broadcast.",
    oracle = Some("""
      SELECT r.r_name, year(o.o_orderdate) AS order_year,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_orders
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2 ORDER BY r_name, order_year"""),
    run = (s, dir) => {
      val o = table(s, dir, "orders")
      val c = broadcast(table(s, dir, "customer"))
      val n = broadcast(table(s, dir, "nation"))
      val r = broadcast(table(s, dir, "region"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"),
          year(col("o_orderdate")).cast(LongType).as("order_year"))
        .agg(dsum(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("r_name", "order_year")
    })

  // -------------------------------------------------------------------
  // Window functions: ranking + analytic + running frame.
  // -------------------------------------------------------------------
  private val windows = GraftQuery(
    name = "lake_windows",
    doc = "Window suite per user over event time: row_number, rank on " +
      "value, lag, running count (rows frame). One hash-partition " +
      "exchange on user_id serves all four functions (same window spec " +
      "family). Scales: state is per-partition sort, no global sort.",
    oracle = Some("""
      SELECT event_id, user_id,
        ROW_NUMBER() OVER w AS rn,
        LAG(event_id) OVER w AS prev_event,
        COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""),
    run = (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          row_number().over(w).cast(LongType).as("rn"),
          lag(col("event_id"), 1).over(w).as("prev_event"),
          count(lit(1)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_n"))
        .orderBy("event_id")
    })

  // -------------------------------------------------------------------
  // Top-k per group (window + filter) — the dedup-users variant
  // ("latest level per user", SURVEY §2.8.2) generalized.
  // -------------------------------------------------------------------
  private val latestPerUser = GraftQuery(
    name = "lake_latest_per_user",
    doc = "Keyed dedup (latest event per user) — the correct-by-" +
      "construction variant of the reference's non-deduped users table " +
      "(SURVEY §2.8.2). NOT a row_number window: top-1-per-key is an " +
      "ARGMAX, so it runs as max(struct(ts, event_id, event_type)) — a " +
      "partial-aggregable hash aggregate whose map-side combine " +
      "collapses a 50%-hot user to one row per task BEFORE the " +
      "exchange, where the window form shuffles every hot-user row to " +
      "one task first (skew probe, SURVEY 6.3). The (ts, event_id) " +
      "prefix is unique, so the struct max picks the same DEFINED row " +
      "the window did; prefer this over dropDuplicates(subset), which " +
      "picks an arbitrary one.",
    oracle = Some("""
      SELECT user_id, event_id AS last_event, event_type AS last_type
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      WHERE rn = 1 ORDER BY user_id"""),
    run = (s, dir) => table(s, dir, "events")
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type")))
        .as("m"))
      .select(col("user_id"), col("m.event_id").as("last_event"),
        col("m.event_type").as("last_type"))
      .orderBy("user_id"))

  // -------------------------------------------------------------------
  // Rollup / cube.
  // -------------------------------------------------------------------
  private val rollupDocs = GraftQuery(
    name = "lake_rollup",
    doc = "ROLLUP over (lang, source) on documents: per-group, per-lang " +
      "subtotal, grand total in one pass (Expand + single aggregate — no " +
      "re-scan per level). NULL grouping markers coalesced to 'ALL'.",
    oracle = Some("""
      SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
             COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY ROLLUP (lang, source)
      ORDER BY lang, source"""),
    run = (s, dir) => table(s, dir, "documents")
      .rollup("lang", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .select(coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("sum_chars"))
      .orderBy("lang", "source"))

  private val cubeLineitem = GraftQuery(
    name = "lake_cube",
    doc = "CUBE over (l_returnflag, l_linestatus): all 4 grouping sets in " +
      "one Expand+aggregate pass.",
    oracle = Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS flag,
             COALESCE(l_linestatus, 'ALL') AS status,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY flag, status"""),
    run = (s, dir) => table(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n"), col("sum_qty"))
      .orderBy("flag", "status"))

  // -------------------------------------------------------------------
  // Set ops.
  // -------------------------------------------------------------------
  private val setOps = GraftQuery(
    name = "lake_setops",
    doc = "UNION / INTERSECT / EXCEPT over user-id sets by behavior: " +
      "users who clicked AND purchased, minus users who ever errored. " +
      "Set ops compile to aggregates/joins on the id — one narrow column " +
      "through every exchange.",
    oracle = Some("""
      (SELECT user_id FROM events WHERE event_type = 'click'
         GROUP BY user_id HAVING COUNT(*) >= 12
       INTERSECT
       SELECT user_id FROM events WHERE event_type = 'purchase'
         GROUP BY user_id HAVING COUNT(*) >= 12)
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error'
        GROUP BY user_id HAVING COUNT(*) >= 14
      ORDER BY user_id"""),
    run = (s, dir) => {
      val ev = table(s, dir, "events")
      def ids(t: String, atLeast: Long) =
        ev.filter(col("event_type") === t).groupBy("user_id")
          .agg(count(lit(1)).as("n")).filter(col("n") >= atLeast)
          .select("user_id")
      ids("click", 12).intersect(ids("purchase", 12))
        .except(ids("error", 14))
        .orderBy("user_id")
    })

  // -------------------------------------------------------------------
  // Semi / anti joins.
  // -------------------------------------------------------------------
  private val semiAnti = GraftQuery(
    name = "lake_semi_anti",
    doc = "Left-semi (EXISTS) + left-anti (NOT EXISTS): customers with " +
      "high-value orders, tagged; anti side never materializes order " +
      "columns — the semi/anti forms ship only the key through the " +
      "shuffle, unlike join+distinct.",
    oracle = Some("""
      SELECT c_custkey,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000)
                  THEN 1 ELSE 0 END AS has_big_order
      FROM customer c ORDER BY c_custkey"""),
    run = (s, dir) => {
      val c = table(s, dir, "customer")
      val big = table(s, dir, "orders")
        .filter(col("o_totalprice") > 50000).select("o_custkey")
      val withBig = c.join(big, c("c_custkey") === big("o_custkey"),
          "left_semi").select(col("c_custkey"))
        .withColumn("has_big_order", lit(1))
      val noBig = c.join(big, c("c_custkey") === big("o_custkey"),
          "left_anti").select(col("c_custkey"))
        .withColumn("has_big_order", lit(0))
      withBig.unionAll(noBig).orderBy("c_custkey")
    })

  // -------------------------------------------------------------------
  // Sessionization (gap-based) — the training-pipeline classic.
  // -------------------------------------------------------------------
  private val sessionize = GraftQuery(
    name = "lake_sessionize",
    doc = "Gap-based sessionization (30-min inactivity). NOT the lag + " +
      "cumulative-sum window pair: a per-user window funnels a hot " +
      "user (50% of a real clickstream) through one task, so session " +
      "numbers come from SkewWindows.sessionNumbers — range layout, " +
      "per-(partition,user) boundary summaries (first/last ts + " +
      "internal starts) threaded by the driver, narrow flag " +
      "re-derivation - the lag() equivalent with no per-user task " +
      "(skew-probe ratios in SURVEY 6.3). Emits per-session stats; " +
      "the streaming twin lives in graft.streaming.EventStream.",
    oracle = Some("""
      WITH marked AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w <= 1800000000 THEN 0 ELSE 1 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM marked)
      SELECT user_id, CAST(session_no AS BIGINT) AS session_no, COUNT(*) AS n_events,
             MIN(event_id) AS first_event, MAX(event_id) AS last_event,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM sess GROUP BY user_id, session_no
      ORDER BY user_id, session_no"""),
    run = (s, dir) => {
      val ev = table(s, dir, "events")
        .withColumn("__us", unix_micros(col("ts")))
      graft.ops.SkewWindows.sessionNumbers(ev, "user_id", "__us",
          Seq(col("ts"), col("event_id")), 1800000000L, "session_no")
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"),
          dsum(col("value")).as("sum_value"))
        .orderBy("user_id", "session_no")
    })

  // -------------------------------------------------------------------
  // Native session_window (the declarative twin of lake_sessionize).
  // -------------------------------------------------------------------
  private val sessionWindow = GraftQuery(
    name = "lake_session_window",
    doc = "Native session_window operator (30-min gap): Spark's built-in " +
      "merging session aggregation — same session semantics as the " +
      "lag+cumsum formulation in lake_sessionize, expressed as ONE " +
      "groupBy. The oracle derives sessions with the window-function " +
      "formulation: two different algorithms, one answer. session_start " +
      "surfaced at second granularity (string) for representation-" +
      "independent compare.",
    oracle = Some("""
      WITH marked AS (
        SELECT user_id, ts, event_id, value,
          CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w <= 1800000000 THEN 0 ELSE 1 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM marked)
      SELECT user_id,
             strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM sess GROUP BY user_id, session_no
      ORDER BY user_id, session_start"""),
    run = (s, dir) => table(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"),
        min(col("ts")).as("first_ts"))
      .select(col("user_id"),
        date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start"))

  // -------------------------------------------------------------------
  // Global top-k.
  // -------------------------------------------------------------------
  private val topkGlobal = GraftQuery(
    name = "lake_topk_orders",
    doc = "Global top-100 orders by price (tiebreak on key). Spark plans " +
      "TakeOrderedAndProject: per-partition heap + driver merge of 100×P " +
      "rows — no global sort, scales to any fact size.",
    oracle = Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
    run = (s, dir) => table(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100))

  // -------------------------------------------------------------------
  // Multi-distinct aggregate.
  // -------------------------------------------------------------------
  private val distinctAgg = GraftQuery(
    name = "lake_distinct_agg",
    doc = "Multiple exact COUNT(DISTINCT) per group in one query — Spark " +
      "expands to one aggregate per distinct set then joins; counts are " +
      "exact (the approx_count_distinct variant is bench-only, no " +
      "cross-engine oracle for a sketch).",
    oracle = Some("""
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey) AS n_customers,
             COUNT(DISTINCT o_orderpriority) AS n_prios,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    run = (s, dir) => table(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_prios"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus"))

  val all: Seq[GraftQuery] = Seq(
    aggLineitem, starJoin, windows, latestPerUser, rollupDocs, cubeLineitem,
    setOps, semiAnti, sessionize, sessionWindow, topkGlobal, distinctAgg)
}
