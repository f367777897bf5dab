package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.functions.TypedAggregators
import graft.sources.Readers.table

/** Scalar-function families (string / date / null-conditional) plus the
  * typed-Dataset Aggregator surface — each family one oracle-checked
  * query, all per-row maps that scale embarrassingly. */
object ScalarQueries {

  // -------------------------------------------------------------------
  // Typed Dataset + custom Aggregator (UDAF surface).
  // -------------------------------------------------------------------
  private val typedAgg = GraftQuery(
    name = "lake_typed_agg",
    doc = "Typed-Dataset aggregation through a custom " +
      "Aggregator[IN,BUF,OUT] (graft.functions.PricingAgg): scaled-" +
      "integer-cents buffer → exact sums under any partitioning, no " +
      "decimal in the shuffle. Demonstrates the case-class Encoder path " +
      "(groupByKey) the reference never used.",
    oracle = Some("""
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    run = (s, dir) => {
      import s.implicits._
      import TypedAggregators._
      table(s, dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .as[LineSlim]
        .groupByKey(_.l_returnflag)
        .agg(PricingAgg.toColumn.name("stats"))
        .select(col("key").as("l_returnflag"),
          col("stats.sum_qty").as("sum_qty"),
          col("stats.sum_price").as("sum_price"),
          col("stats.n_rows").as("n_rows"))
        .orderBy("l_returnflag")
    })

  // -------------------------------------------------------------------
  // String functions.
  // -------------------------------------------------------------------
  private val stringFuncs = GraftQuery(
    name = "lake_string_funcs",
    doc = "String-function family over part: case mapping, substring, " +
      "length, pad, reverse, replace, concat — all codegen'd built-ins, " +
      "pure per-row map.",
    oracle = Some("""
      SELECT p_partkey,
             upper(p_type) AS type_u,
             lower(p_brand) AS brand_l,
             substr(p_name, 1, 8) AS name8,
             CAST(length(p_name) AS BIGINT) AS name_len,
             lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
             reverse(p_brand) AS brand_rev,
             replace(p_type, ' ', '_') AS type_us,
             concat(p_brand, '|', p_type) AS brand_type
      FROM part ORDER BY p_partkey"""),
    run = (s, dir) => table(s, dir, "part")
      .select(col("p_partkey"),
        upper(col("p_type")).as("type_u"),
        lower(col("p_brand")).as("brand_l"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).cast(LongType).as("name_len"),
        lpad(col("p_size").cast(StringType), 4, "0").as("size_pad"),
        reverse(col("p_brand")).as("brand_rev"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        concat(col("p_brand"), lit("|"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey"))

  // -------------------------------------------------------------------
  // Date functions.
  // -------------------------------------------------------------------
  private val dateFuncs = GraftQuery(
    name = "lake_date_funcs",
    doc = "Date-function family over orders: add/diff/trunc/last_day/" +
      "quarter. Dates surfaced as formatted strings so the compare is " +
      "representation-independent across engines.",
    oracle = Some("""
      SELECT o_orderkey,
             strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
             strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS d_plus30,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
             strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
             strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
      FROM orders ORDER BY o_orderkey"""),
    run = (s, dir) => {
      val d = col("o_orderdate").cast(DateType)
      table(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(d, "yyyy-MM-dd").as("d"),
          date_format(date_add(d, 30), "yyyy-MM-dd").as("d_plus30"),
          datediff(lit("2002-01-01").cast(DateType), d).cast(LongType)
            .as("days_to_2002"),
          date_format(trunc(d, "month"), "yyyy-MM-dd").as("month_start"),
          date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
          quarter(d).cast(LongType).as("qtr"))
        .orderBy("o_orderkey")
    })

  // -------------------------------------------------------------------
  // Null-handling / conditional functions.
  // -------------------------------------------------------------------
  private val nullFuncs = GraftQuery(
    name = "lake_null_funcs",
    doc = "Null/conditional family over customer: nullif + coalesce " +
      "round-trip, greatest/least clamps, CASE bucketing — the " +
      "expression plumbing every cleansing pipeline leans on.",
    oracle = Some("""
      SELECT c_custkey,
             COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(bldg)') AS seg,
             GREATEST(c_acctbal, 0.0) AS bal_floor0,
             LEAST(c_acctbal, 5000.0) AS bal_cap5k,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 3000 THEN 'low'
                  ELSE 'high' END AS bal_bucket,
             CAST(c_acctbal IS NULL AS INTEGER) AS bal_is_null
      FROM customer ORDER BY c_custkey"""),
    run = (s, dir) => table(s, dir, "customer")
      .select(col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(bldg)"))
          .as("seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor0"),
        least(col("c_acctbal"), lit(5000.0)).as("bal_cap5k"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 3000, "low")
          .otherwise("high").as("bal_bucket"),
        col("c_acctbal").isNull.cast(IntegerType).as("bal_is_null"))
      .orderBy("c_custkey"))

  // -------------------------------------------------------------------
  // Grouped string aggregation (order-canonical list agg).
  // -------------------------------------------------------------------
  private val listAgg = GraftQuery(
    name = "lake_groupagg_list",
    doc = "Grouped collection aggregation with canonical ordering: " +
      "sorted collect_list joined to one string per group (collect_list " +
      "alone is partition-order-nondeterministic — sorting restores a " +
      "comparable value; same rule DuckDB needs via ORDER BY in " +
      "string_agg).",
    oracle = Some("""
      SELECT n_regionkey,
             string_agg(n_name, ',' ORDER BY n_name) AS nations,
             COUNT(*) AS n
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),
    run = (s, dir) => table(s, dir, "nation")
      .groupBy("n_regionkey")
      .agg(
        array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"),
        count(lit(1)).as("n"))
      .orderBy("n_regionkey"))

  private val mapFuncs = GraftQuery(
    name = "lake_map_funcs",
    doc = "MapType family (the one complex type the array suite didn't " +
      "cover): from_json into MapType(String, Long), element_at " +
      "lookup, map_keys cardinality, in-plan map construction " +
      "(functions.map), and the map higher-order map_filter — all " +
      "per-row, codegen-friendly. Oracle extracts the same values via " +
      "DuckDB's JSON path functions; n_hi iterates EVERY key " +
      "(list_filter over json_keys), mirroring map_filter exactly even " +
      "if a future fixture adds more prop keys. Residual delta: a " +
      "non-integer JSON number coerces to null in Spark's " +
      "MapType(_, Long) but may TRY_CAST in DuckDB — the fixture " +
      "contract (integer props) is asserted by n_keys/k_val anyway.",
    oracle = Some("""
      SELECT event_id,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
             CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
             event_type AS t_val,
             CAST(len(list_filter(json_keys(props), k ->
               TRY_CAST(json_extract(props, '$."' || k || '"') AS BIGINT)
                 >= 50)) AS BIGINT) AS n_hi
      FROM events ORDER BY event_id"""),
    run = (s, dir) => table(s, dir, "events")
      .select(col("event_id"),
        from_json(col("props"), MapType(StringType, LongType)).as("m"),
        map(lit("t"), col("event_type"),
          lit("u"), col("user_id").cast(StringType)).as("built"))
      .select(col("event_id"),
        element_at(col("m"), "k").as("k_val"),
        size(map_keys(col("m"))).cast(LongType).as("n_keys"),
        element_at(col("built"), "t").as("t_val"),
        size(map_filter(col("m"), (_, v) => v >= 50)).cast(LongType)
          .as("n_hi"))
      .orderBy("event_id"))

  private val argExtremes = GraftQuery(
    name = "lake_arg_extremes",
    doc = "Argument-extreme aggregates: max_by/min_by over a " +
      "lexicographic (o_totalprice, o_orderkey) struct — which order " +
      "carried each customer's largest and smallest total, ties broken " +
      "on the unique key so the answer is total-order deterministic " +
      "regardless of data. DuckDB's arg_max takes no struct ordering, " +
      "so the oracle states the same total order as rank-1 window rows " +
      "(DESC,DESC for max_by; ASC,ASC for min_by).",
    oracle = Some("""
      WITH r AS (SELECT o_custkey, o_orderkey,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey DESC)
            AS rx,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY CAST(o_totalprice AS DOUBLE) ASC, o_orderkey ASC)
            AS rn
        FROM orders)
      SELECT o_custkey,
             MAX(CASE WHEN rx = 1 THEN o_orderkey END) AS max_order,
             MAX(CASE WHEN rn = 1 THEN o_orderkey END) AS min_order,
             COUNT(*) AS n
      FROM r GROUP BY o_custkey ORDER BY o_custkey"""),
    run = (s, dir) => table(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice").cast(DoubleType), col("o_orderkey")))
          .as("max_order"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice").cast(DoubleType), col("o_orderkey")))
          .as("min_order"),
        count(lit(1)).as("n"))
      .orderBy("o_custkey"))

  val all: Seq[GraftQuery] = Seq(
    typedAgg, stringFuncs, dateFuncs, nullFuncs, listAgg, mapFuncs,
    argExtremes)
}
