package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.sources.Readers.table

/** Coverage completion batch: navigation windows, outer-join matrix,
  * unpivot, deterministic train/test splitting, exact percentiles. */
object CoverageQueries {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  // -------------------------------------------------------------------
  // Navigation window functions.
  // -------------------------------------------------------------------
  private val windowNav = GraftQuery(
    name = "lake_window_nav",
    doc = "Navigation windows per user: first/last/nth event over the " +
      "full-partition frame, lead with default. One exchange serves all " +
      "four (same window family).",
    oracle = Some("""
      SELECT event_id, user_id,
             FIRST_VALUE(event_id) OVER w AS first_ev,
             LAST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ev,
             NTH_VALUE(event_id, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ev,
             LEAD(event_id, 1, -1) OVER w AS next_ev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY event_id"""),
    run = (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          first(col("event_id")).over(w).as("first_ev"),
          last(col("event_id")).over(wFull).as("last_ev"),
          nth_value(col("event_id"), 2).over(wFull).as("second_ev"),
          lead(col("event_id"), 1, -1).over(w).as("next_ev"))
        .orderBy("event_id")
    })

  // -------------------------------------------------------------------
  // Full outer join (completes the join-type matrix).
  // -------------------------------------------------------------------
  private val outerJoin = GraftQuery(
    name = "lake_outer_join",
    doc = "Full outer join customer⋈orders aggregated into a match " +
      "matrix: customers without orders, orders without (in-range) " +
      "customers, matched pairs. Null-side handling is where outer " +
      "joins go wrong — the oracle counts every cell.",
    oracle = Some("""
      SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                  WHEN o.o_orderkey IS NULL THEN 'customer_only'
                  ELSE 'matched' END AS side,
             COUNT(*) AS n,
             CAST(SUM(CAST(COALESCE(o.o_totalprice, 0.0) AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY 1 ORDER BY side"""),
    run = (s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(
          when(c("c_custkey").isNull, "order_only")
            .when(o("o_orderkey").isNull, "customer_only")
            .otherwise("matched").as("side"),
          coalesce(o("o_totalprice"), lit(0.0)).as("price"))
        .groupBy("side")
        .agg(count(lit(1)).as("n"), dsum(col("price")).as("total"))
        .orderBy("side")
    })

  // -------------------------------------------------------------------
  // Unpivot (pivot's inverse).
  // -------------------------------------------------------------------
  private val unpivot = GraftQuery(
    name = "lake_unpivot",
    doc = "Unpivot: the wide per-type counts back to long form via " +
      "stack/UNPIVOT — schema-reshaping both directions (see lake_pivot " +
      "for the forward pass).",
    oracle = Some("""
      WITH wide AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events GROUP BY user_id)
      SELECT user_id, kind, n FROM wide
      UNPIVOT (n FOR kind IN (click, view))
      ORDER BY user_id, kind"""),
    run = (s, dir) => {
      val wide = table(s, dir, "events")
        .groupBy("user_id")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("view"))
      wide.unpivot(Array(col("user_id")),
          Array(col("click"), col("view")), "kind", "n")
        .orderBy("user_id", "kind")
    })

  // -------------------------------------------------------------------
  // Deterministic train/test split (the pipeline sampling op).
  // -------------------------------------------------------------------
  private val trainTestSplit = GraftQuery(
    name = "pipeline_train_test_split",
    doc = "Deterministic held-out split: Knuth multiplicative hash of " +
      "the id (exact 64-bit arithmetic, identical in any engine) " +
      "thresholded at 90% — reproducible split with no RNG state, the " +
      "only kind that survives re-runs and backfills at 100 TB. " +
      "Summarized per (lang, split).",
    oracle = Some("""
      WITH tagged AS (
        SELECT lang,
               CASE WHEN (((doc_id % 1000000007 + 1000000007) % 1000000007) * 2654435761) % 4294967296 < 3865470566
                    THEN 'train' ELSE 'test' END AS split
        FROM documents)
      SELECT lang, split, COUNT(*) AS n
      FROM tagged GROUP BY 1, 2 ORDER BY lang, split"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(col("lang"),
        when(graft.ops.Sampling.hash32(col("doc_id"))
          < lit(3865470566L), "train").otherwise("test").as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "split"))

  // -------------------------------------------------------------------
  // Exact percentiles (attempted cross-engine parity).
  // -------------------------------------------------------------------
  private val percentiles = GraftQuery(
    name = "lake_percentiles",
    doc = "Exact interpolated percentiles (median, p90) of order totals " +
      "per status: Spark's percentile vs DuckDB's quantile_cont — both " +
      "linear interpolation over the sorted set.",
    oracle = Some("""
      SELECT o_orderstatus,
             quantile_cont(o_totalprice, 0.5) AS p50,
             quantile_cont(o_totalprice, 0.9) AS p90,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    run = (s, dir) => table(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
        percentile(col("o_totalprice"), lit(0.9)).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("o_orderstatus"))

  // -------------------------------------------------------------------
  // Higher-order array functions as user-facing ops.
  // -------------------------------------------------------------------
  private val higherOrder = GraftQuery(
    name = "lake_higher_order",
    doc = "Higher-order array functions over embeddings: filter+size " +
      "(positive-component count), exists / forall predicates, " +
      "transform+array_max (max |x|). Boolean/int outputs only — " +
      "HOF float arithmetic parity is proven elsewhere (vector suite).",
    oracle = Some("""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings)
      SELECT vec_id,
             CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_positive,
             CAST(list_bool_or(list_transform(v, x -> x > 0.3)) AS INTEGER) AS has_big,
             CAST(list_bool_and(list_transform(v, x -> abs(x) < 1.0)) AS INTEGER) AS all_small,
             list_max(list_transform(v, x -> abs(x))) AS max_abs
      FROM e ORDER BY vec_id"""),
    run = (s, dir) => {
      val v = transform(col("embedding"), _.cast(DoubleType))
      table(s, dir, "embeddings")
        .select(col("vec_id"),
          size(filter(v, _ > 0)).cast(LongType).as("n_positive"),
          exists(v, _ > 0.3).cast(IntegerType).as("has_big"),
          forall(v, x => abs(x) < 1.0).cast(IntegerType).as("all_small"),
          array_max(transform(v, x => abs(x))).as("max_abs"))
        .orderBy("vec_id")
    })

  // -------------------------------------------------------------------
  // Null-safe equality join (<=> / IS NOT DISTINCT FROM).
  // -------------------------------------------------------------------
  private val nullSafeJoin = GraftQuery(
    name = "lake_nullsafe_join",
    doc = "Null-safe equi join: keys nulled via NULLIF, joined with <=> " +
      "(IS NOT DISTINCT FROM) so null keys MATCH each other — the " +
      "semantics regular equality silently drops. Counts per key bucket.",
    oracle = Some("""
      WITH a AS (SELECT NULLIF(c_mktsegment, 'BUILDING') AS k, c_custkey
                 FROM customer),
      b AS (SELECT NULLIF(c_mktsegment, 'BUILDING') AS k,
                   COUNT(*) AS n_side_b
            FROM customer GROUP BY 1)
      SELECT COALESCE(a.k, '(null)') AS key, COUNT(*) AS n_pairs,
             MIN(b.n_side_b) AS group_size
      FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      GROUP BY 1 ORDER BY key"""),
    run = (s, dir) => {
      val c = table(s, dir, "customer")
      val a = c.select(nullif(col("c_mktsegment"), lit("BUILDING")).as("k"),
        col("c_custkey"))
      val b = c.groupBy(nullif(col("c_mktsegment"), lit("BUILDING")).as("kb"))
        .agg(count(lit(1)).as("n_side_b"))
      a.join(b, col("k") <=> col("kb"))
        .groupBy(coalesce(col("k"), lit("(null)")).as("key"))
        .agg(count(lit(1)).as("n_pairs"), min(col("n_side_b")).as("group_size"))
        .orderBy("key")
    })

  // -------------------------------------------------------------------
  // Statistical aggregates from exact moments.
  // -------------------------------------------------------------------
  private val statsExplicit = GraftQuery(
    name = "lake_stats_explicit",
    doc = "Correlation + population stddev per group, computed from " +
      "EXACT decimal moment sums (Σx, Σy, Σx², Σxy are 2-dec × 2-dec " +
      "products — exact in decimal) then identical double arithmetic. " +
      "The built-in corr/stddev use one-pass streaming updates whose " +
      "float rounding is engine-specific — moments-from-decimal is the " +
      "portable formulation, and at 100 TB it is also one aggregation " +
      "pass with map-side partials.",
    oracle = Some("""
      WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
             round((n * sxy - sx * sy) /
               sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 12) AS corr_qty_price,
             round(sqrt((n * sxx - sx * sx)) / n, 12) AS stddev_pop_qty
      FROM m ORDER BY l_returnflag"""),
    run = (s, dir) => {
      val q = col("l_quantity").cast(DecimalType(18, 2))
      val p = col("l_extendedprice").cast(DecimalType(18, 2))
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(q).cast(DoubleType).as("sx"),
          sum(p).cast(DoubleType).as("sy"),
          sum(q * q).cast(DoubleType).as("sxx"),
          sum(p * p).cast(DoubleType).as("syy"),
          sum(q * p).cast(DoubleType).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          // round(12): difference-of-products shapes can differ by one
          // ulp across engines (FMA contraction) — rounding well above
          // the noise floor restores portability without losing signal
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
              (col("n") * col("syy") - col("sy") * col("sy"))), 12)
            .as("corr_qty_price"),
          round(sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
            / col("n"), 12).as("stddev_pop_qty"))
        .orderBy("l_returnflag")
    })

  val all: Seq[GraftQuery] = Seq(
    windowNav, outerJoin, unpivot, trainTestSplit, percentiles,
    higherOrder, nullSafeJoin, statsExplicit)
}
