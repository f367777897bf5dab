package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.ops.{AsofJoin, RuntimeFilters}
import graft.sources.Readers.table

/** Second wave of beyond-reference operators: as-of join, physical-join
  * strategies (bucketed co-located, salted skew, forced sort-merge),
  * richer windows (range frames, rank family), pivot, array explode,
  * JSON-scan round-trip, sketch aggregates. */
object ExtendedQueries {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  // -------------------------------------------------------------------
  // As-of join — events enriched with each user's latest order state.
  // -------------------------------------------------------------------
  private val asofJoin = GraftQuery(
    name = "lake_asof_join",
    doc = "Backward as-of join via the union+window formulation " +
      "(graft.ops.AsofJoin): one shuffle on the key, no per-row " +
      "subquery — the 100 TB shape. Differentially checked against " +
      "DuckDB's NATIVE ASOF JOIN — two completely different " +
      "implementations, one answer. Right side pre-aggregated to one row " +
      "per (custkey, orderdate) as the as-of contract requires.",
    oracle = Some("""
      WITH r AS (SELECT o_custkey, o_orderdate,
                   MAX(o_orderkey) AS last_orderkey,
                   COUNT(*) AS n_orders_day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
                 FROM orders GROUP BY 1, 2)
      SELECT e.event_id, e.user_id, r.last_orderkey, r.n_orders_day, r.day_total
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
      ORDER BY e.event_id"""),
    run = (s, dir) => {
      val r = table(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("last_orderkey"),
          count(lit(1)).as("n_orders_day"),
          dsum(col("o_totalprice")).as("day_total"))
        // o_orderdate is TIMESTAMP_NTZ in the parquet; under the UTC
        // session the cast is wall-clock-identity
        .withColumn("t_us",
          unix_micros(col("o_orderdate").cast(TimestampType)))
      val e = table(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("e_us"))
      AsofJoin.asofBackward(e, r,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "e_us", rightTime = "t_us",
          payload = Seq("last_orderkey", "n_orders_day", "day_total"))
        .select("event_id", "user_id", "last_orderkey", "n_orders_day",
          "day_total")
        .orderBy("event_id")
    })

  // -------------------------------------------------------------------
  // Bucketed co-located join — zero-exchange big⋈big.
  // -------------------------------------------------------------------
  private val bucketedJoin = GraftQuery(
    name = "lake_bucketed_join",
    doc = "Bucketed co-located join: both fact tables written " +
      "bucketBy(8, orderkey) + sortBy, then joined with NO exchange and " +
      "NO sort (PlanSpec asserts) — the pre-shuffled layout that makes " +
      "repeated fact⋈fact joins at 100 TB pay the shuffle once at write " +
      "time instead of per query.",
    oracle = Some("""
      SELECT o.o_orderpriority,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY o_orderpriority"""),
    run = (s, dir) => {
      // a crashed previous run can leave the managed location behind with
      // no catalog entry (in-memory catalog) — clear both before writing
      def reset(name: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $name")
        val wh = s.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:")
        val loc = java.nio.file.Paths.get(wh, name)
        if (java.nio.file.Files.exists(loc)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc).iterator().asScala.toSeq
            .reverse.foreach(java.nio.file.Files.delete)
        }
      }
      reset("graft_bucketed_lineitem"); reset("graft_bucketed_orders")
      // project to the join/agg columns before the bucketed write:
      // bucketed derived tables carry only what their queries read —
      // at 100 TB the bucketed copy is a curated projection, not a
      // second full copy of the fact table
      table(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_bucketed_lineitem")
      table(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_bucketed_orders")
      val li = s.table("graft_bucketed_lineitem")
      // merge hint: at tiny SF AQE would broadcast instead, hiding the
      // co-located layout this query demonstrates (SMJ with no exchange
      // and no sort on either side)
      val o = s.table("graft_bucketed_orders").hint("merge")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("o_orderpriority")
    })

  // -------------------------------------------------------------------
  // Salted skew join.
  // -------------------------------------------------------------------
  private val saltedJoin = GraftQuery(
    name = "lake_salted_join",
    doc = "Salted skew join: lineitem keyed by l_suppkey (10 suppliers → " +
      "pathological skew: every row lands in 10 of N partitions). Fact " +
      "side salts with pmod(xxhash64(rowkey), 8); dim side replicates ×8 " +
      "via explode — the shuffle spreads each hot key over 8 partitions. " +
      "Result provably identical to the unsalted join (the oracle). At " +
      "100 TB this (or AQE skew-join) is mandatory for hot keys.",
    oracle = Some("""
      SELECT s.s_name,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1 ORDER BY s_name"""),
    run = (s, dir) => {
      val nSalt = 8
      val li = table(s, dir, "lineitem")
        .withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
            lit(nSalt.toLong)))
      val sup = table(s, dir, "supplier")
        .withColumn("salt",
          explode(sequence(lit(0L), lit(nSalt.toLong - 1))))
      li.join(sup,
          li("l_suppkey") === sup("s_suppkey") &&
            li("salt") === sup("salt"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("s_name")
    })

  // -------------------------------------------------------------------
  // Forced sort-merge join (big ⋈ big posture).
  // -------------------------------------------------------------------
  private val bigBigJoin = GraftQuery(
    name = "lake_join_bigbig",
    doc = "Fact⋈fact sort-merge join (merge hint; broadcast would hide " +
      "the shape): both sides shuffle+sort on the key once — the " +
      "baseline plan when neither side fits in memory at 100 TB. " +
      "PlanSpec asserts SortMergeJoin.",
    oracle = Some("""
      SELECT year(o.o_orderdate) AS order_year,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                      CAST(1.0 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY order_year"""),
    run = (s, dir) => {
      val li = table(s, dir, "lineitem")
      val o = table(s, dir, "orders").hint("merge")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("order_year"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1.0) - col("l_discount")).cast(DecimalType(18, 2)))
            .cast(DoubleType).as("revenue"))
        .orderBy("order_year")
    })

  // -------------------------------------------------------------------
  // Runtime bloom-filter join pruning (big ⋈ big with a selective side).
  // -------------------------------------------------------------------
  private val bloomJoin = GraftQuery(
    name = "lake_join_bloom",
    doc = "lake_join_bigbig's 100 TB mitigation: the orders side carries " +
      "a ~1% selective predicate, so a bloom filter of its join keys " +
      "(graft.ops.RuntimeFilters — partial-aggregable " +
      "BloomFilterAggregate build, codegen'd might_contain probe) drops " +
      "non-matching lineitem rows AT THE SCAN, before the sort-merge " +
      "join's shuffle — the probe side shuffles ~selectivity× the rows " +
      "the plain SMJ shuffles. Bloom false positives are removed by the " +
      "join itself, so the result is provably identical to the " +
      "unfiltered plan and the oracle is the plain SQL join. " +
      "PlanSpec asserts might_contain sits between the lineitem scan " +
      "and the first exchange.",
    oracle = Some("""
      SELECT year(o.o_orderdate) AS order_year,
             COUNT(*) AS n_items,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey % 97 = 0
      GROUP BY 1 ORDER BY order_year"""),
    run = (s, dir) => {
      val sel = table(s, dir, "orders")
        .filter(col("o_orderkey") % 97 === 0)
      val li = RuntimeFilters.bloomPruned(
        table(s, dir, "lineitem"), col("l_orderkey"),
        sel.select("o_orderkey"), col("o_orderkey"))
      li.join(sel.hint("merge"), li("l_orderkey") === sel("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("order_year"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("order_year")
    })

  // -------------------------------------------------------------------
  // Dynamic partition pruning (runtime partition-level join pruning).
  // -------------------------------------------------------------------
  private val dppJoin = GraftQuery(
    name = "lake_join_dpp",
    doc = "DYNAMIC partition pruning — the partition-level sibling of " +
      "lake_join_bloom's row-level runtime filter: lineitem is laid out " +
      "hive-partitioned by ship_year, the orders dim is filtered by a " +
      "predicate whose matching YEARS are only known at runtime, and " +
      "Catalyst turns the broadcast dim into a partition filter on the " +
      "fact scan (PlanSpec asserts dynamicpruningexpression in " +
      "PartitionFilters), so non-matching partition DIRECTORIES are " +
      "never listed or read. At 100 TB this is the first-line defense " +
      "for fact⋈dim on a partition key; the bloom filter covers the " +
      "complementary case where the join key is NOT the layout key. " +
      "Oracle: same join semantics over the unpartitioned source.",
    oracle = Some("""
      WITH y AS (SELECT DISTINCT year(o_orderdate) AS ship_year
                 FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1999-06-01 00:00:00'
                   AND o_orderpriority = '1-URGENT')
      SELECT l.ship_year AS ship_year, COUNT(*) AS n_items,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM (SELECT year(l_shipdate) AS ship_year, l_extendedprice
            FROM lineitem) l
      JOIN y ON l.ship_year = y.ship_year
      GROUP BY 1 ORDER BY l.ship_year"""),
    run = (s, dir) => {
      val fdir = partitionedLineitemDir(s, dir)
      val fact = s.read.parquet(fdir)
      val dim = table(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1999-06-01").cast(TimestampType)
          && col("o_orderpriority") === "1-URGENT")
        .select(year(col("o_orderdate")).as("ship_year")).distinct()
      fact.join(broadcast(dim), "ship_year")
        .groupBy(col("ship_year").cast(LongType).as("ship_year"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy("ship_year")
    })

  /** Hive-partitioned lineitem layout (dir per ship_year) — the fact
    * side of the DPP demo; cached per sfDir (graft.TempDirs, deleted at
    * JVM exit) since the write is layout-only setup, not the measured
    * operator. */
  def partitionedLineitemDir(s: SparkSession, dir: String): String =
    graft.TempDirs.cachedDir("graft_dpp", dir) { out =>
      table(s, dir, "lineitem")
        .select(col("l_extendedprice"),
          year(col("l_shipdate")).as("ship_year"))
        .write.mode("overwrite").partitionBy("ship_year").parquet(out)
    }

  // -------------------------------------------------------------------
  // Range-frame window: trailing-30-day running total per customer.
  // -------------------------------------------------------------------
  private val windowRange = GraftQuery(
    name = "lake_window_range",
    doc = "RANGE frame window (value-based, not row-based): per-customer " +
      "trailing-30-day order total. One exchange on custkey; frame " +
      "bounds are day offsets so same-day peers aggregate together in " +
      "both engines.",
    oracle = Some("""
      SELECT o_orderkey, o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing30_total
      FROM orders ORDER BY o_orderkey"""),
    run = (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day"))
        .rangeBetween(-30, Window.currentRow)
      table(s, dir, "orders")
        .withColumn("day",
          datediff(col("o_orderdate"), lit("1970-01-01").cast(DateType)))
        .select(col("o_orderkey"), col("o_custkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast(DoubleType).as("trailing30_total"))
        .orderBy("o_orderkey")
    })

  // -------------------------------------------------------------------
  // Rank-family window: ntile / percent_rank / cume_dist / dense_rank.
  // -------------------------------------------------------------------
  private val windowRanks = GraftQuery(
    name = "lake_window_ranks",
    doc = "Ranking suite per order-status partition, fully tiebroken " +
      "(totalprice, orderkey) so ntile assignment is deterministic. " +
      "percent_rank/cume_dist are exact int-ratio doubles - bit-equal " +
      "across engines. NOT window functions: o_orderstatus has ~3 " +
      "values, so Window.partitionBy(o_orderstatus) funnels a third of " +
      "ALL orders through one task at any scale - the coarsest-key " +
      "case of the dominant-language problem. Rank comes from " +
      "SkewWindows.rankedPrefixAuto - COST-BASED (r13 verdict #3): " +
      "the per-group counts the query already aggregates feed a free " +
      "max-group probe; when every group fits one task the plain " +
      "window runs (the 4-9x small-input overhead of the two-phase " +
      "form recovered), above the threshold the range-layout form " +
      "takes over (OpsSpec pins both branches equal; the skew probes " +
      "exercise the two-phase branch). With the fully tiebroken " +
      "(unique) order every ranking function is ARITHMETIC over " +
      "(rank, n): ntile by the fill rule, percent_rank = " +
      "(rank-1)/(n-1), cume_dist = rank/n (no peers), dense_rank = " +
      "rank (no duplicates) - each one exact-integer state with a " +
      "single double division, so both engines round identically.",
    oracle = Some("""
      SELECT o_orderkey, o_orderstatus,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cdist,
             CAST(dense_rank() OVER w AS BIGINT) AS drank
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey"""),
    run = (s, dir) => {
      val t = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
      // ≤3 status rows: pinned so the branch probe and the join-back
      // share one aggregation pass instead of re-counting the corpus
      val counts = t.groupBy("o_orderstatus").agg(count(lit(1)).as("__n"))
        .localCheckpoint(true)
      graft.ops.SkewWindows.rankedPrefixAuto(t, "o_orderstatus",
          Seq(col("o_totalprice"), col("o_orderkey")), None,
          "__rank", "__cum", Some((counts, "__n")))
        .join(broadcast(counts), "o_orderstatus")
        .select(col("o_orderkey"), col("o_orderstatus"),
          graft.ops.SkewWindows.ntileFromRank("__rank", "__n", 4)
            .cast(LongType).as("quartile"),
          when(col("__n") === 1L, 0.0)
            .otherwise((col("__rank") - 1L).cast(DoubleType) /
              (col("__n") - 1L).cast(DoubleType)).as("pct_rank"),
          (col("__rank").cast(DoubleType) / col("__n").cast(DoubleType))
            .as("cdist"),
          col("__rank").as("drank"))
        .orderBy("o_orderkey")
    })

  // -------------------------------------------------------------------
  // Pivot (wide aggregation).
  // -------------------------------------------------------------------
  private val pivotEvents = GraftQuery(
    name = "lake_pivot",
    doc = "Pivot events into one column per event type (explicit value " +
      "list — no extra distinct pass to discover columns, which at " +
      "100 TB would be its own scan). Single aggregate, Expand-free.",
    oracle = Some("""
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      FROM events GROUP BY user_id ORDER BY user_id"""),
    run = (s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val pivoted = table(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)))
      types.foldLeft(pivoted) { (df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0L)))
        }
        .orderBy("user_id")
    })

  // -------------------------------------------------------------------
  // Array explode / unnest: per-dimension embedding statistics.
  // -------------------------------------------------------------------
  private val explodeUnnest = GraftQuery(
    name = "lake_explode_unnest",
    doc = "posexplode (zipped unnest) over the embedding column: " +
      "per-dimension mean/min/max across the corpus. The mean is an " +
      "EXACT fixed-point sum: x·2⁴⁰ (power-of-two multiply — exact in " +
      "IEEE, unlike ·10ⁿ), round, sum as longs, one correctly-rounded " +
      "int→double division at the end. O(1) state per group (a per-group " +
      "sorted collect_list would OOM at 100×) and portable across " +
      "engines — double→DECIMAL casts of HIGH-PRECISION values are NOT " +
      "(Java BigDecimal rounds the exact expansion, DuckDB rounds a " +
      "scaled double multiply; an INTEGRAL double like round()'s output " +
      "converts exactly in both, which is all this uses); quantization " +
      "bias ≤ 2⁻⁴¹ per element, far below float input ulp. The sum " +
      "accumulates in DECIMAL(38,0)/HUGEINT, not BIGINT: per-dimension " +
      "the long form overflows once n·|x| exceeds 2²³ (≈8.4M rows at " +
      "|x|≈1) — and diverges across engines (Spark wraps, DuckDB " +
      "promotes) — while 38 digits carry ~10²⁵ rows. The final " +
      "int→double cast is round-half-even of an exact integer in both " +
      "engines → bit-identical.",
    oracle = Some("""
      WITH ex AS (
        SELECT vec_id,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x,
               unnest(range(1, len(embedding) + 1)) AS dim
        FROM embeddings)
      SELECT dim,
             CAST(SUM(CAST(round(x * 1099511627776.0) AS HUGEINT))
                  AS DOUBLE)
               / (COUNT(*) * 1099511627776.0) AS mean_x,
             MIN(x) AS min_x,
             MAX(x) AS max_x
      FROM ex GROUP BY 1 ORDER BY dim"""),
    run = (s, dir) => table(s, dir, "embeddings")
      .select(col("vec_id"), posexplode(
        transform(col("embedding"), _.cast(DoubleType))).as(Seq("pos", "x")))
      .groupBy((col("pos") + 1).cast(LongType).as("dim"))
      .agg(
        sum(round(col("x") * lit(1099511627776.0d)).cast(DecimalType(38, 0)))
          .as("fxsum"),
        count(lit(1)).as("n"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"))
      .select(col("dim"),
        (col("fxsum").cast(DoubleType) /
          (col("n").cast(DoubleType) * lit(1099511627776.0d))).as("mean_x"),
        col("min_x"), col("max_x"))
      .orderBy("dim"))

  // -------------------------------------------------------------------
  // JSON scan with declared schema (S1/S2 as a first-class query).
  // -------------------------------------------------------------------
  private val jsonScan = GraftQuery(
    name = "parity_json_scan",
    doc = "Schema-on-read JSON source round-trip (SURVEY §2.1 S1/S2, " +
      "§1.3): documents written as JSON lines, re-read with a DECLARED " +
      "schema (zero inference passes — at 100 TB inference is a full " +
      "extra scan), aggregated. Oracle aggregates the parquet original: " +
      "proves the JSON writer/reader loses nothing.",
    oracle = Some("""
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang ORDER BY lang"""),
    run = (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_jsonscan").toString
      table(s, dir, "documents").write.mode("overwrite").json(out)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      s.read.schema(schema).json(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("lang")
    })

  // -------------------------------------------------------------------
  // Interval (range) join against a generated calendar dimension.
  // -------------------------------------------------------------------
  private val intervalJoin = GraftQuery(
    name = "lake_interval_join",
    doc = "Interval/range join: orders against a GENERATED month " +
      "calendar (sequence + explode — no stored dim) on " +
      "month_start <= d < next_month. The calendar side is tiny and " +
      "broadcast, so the non-equi predicate is a per-row scan against " +
      "~80 months, not a quadratic join; at 100 TB prefer deriving the " +
      "bucket arithmetically (date_trunc) when semantics allow — this " +
      "query proves both give the same answer.",
    oracle = Some("""
      SELECT strftime(date_trunc('month', CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_start,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1 ORDER BY month_start"""),
    run = (s, dir) => {
      val months = s.range(1).select(explode(sequence(
          lit("1995-01-01").cast(DateType), lit("2001-12-01").cast(DateType),
          expr("interval 1 month"))).as("m"))
      val o = table(s, dir, "orders")
        .withColumn("d", col("o_orderdate").cast(DateType))
      o.join(broadcast(months),
          col("d") >= col("m") && col("d") < add_months(col("m"), 1))
        .groupBy(date_format(col("m"), "yyyy-MM-dd").as("month_start"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("month_start")
    })

  // -------------------------------------------------------------------
  // CSV / ORC source round-trips (source-format matrix beyond the
  // reference's JSON+parquet).
  // -------------------------------------------------------------------
  private val csvScan = GraftQuery(
    name = "parity_csv_scan",
    doc = "CSV source round-trip with a DECLARED schema (no inference " +
      "pass): documents → csv (header, quoted) → schema'd read → " +
      "aggregate. Oracle aggregates the parquet original — the CSV " +
      "writer/reader must lose nothing, including quoted free text.",
    oracle = Some("""
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY source ORDER BY source"""),
    run = (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_csv").toString
      table(s, dir, "documents").write.mode("overwrite")
        .option("header", "true").csv(out)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType)))
      s.read.schema(schema).option("header", "true").csv(out)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("source")
    })

  private val textScan = GraftQuery(
    name = "parity_text_scan",
    doc = "Plain-text lines source (spark.read.text — the rawest " +
      "training-corpus input format): one line per document written and " +
      "re-read as a `value` column, then length-profiled. Oracle " +
      "profiles the parquet original.",
    oracle = Some("""
      SELECT CAST(length(text) AS BIGINT) AS n_chars, COUNT(*) AS n_docs
      FROM documents GROUP BY 1 ORDER BY n_chars"""),
    run = (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_text").toString
      table(s, dir, "documents").select("text")
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .groupBy(length(col("value")).cast(LongType).as("n_chars"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("n_chars")
    })

  private val orcRoundtrip = GraftQuery(
    name = "parity_orc_roundtrip",
    doc = "ORC source round-trip: lineitem → ORC (the other columnar " +
      "lake format; same pushdown/pruning machinery as parquet) → " +
      "aggregate. Oracle aggregates the parquet original.",
    oracle = Some("""
      SELECT l_linestatus, COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY 1 ORDER BY l_linestatus"""),
    run = (s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft_orc").toString
      table(s, dir, "lineitem").write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_linestatus")
    })

  // -------------------------------------------------------------------
  // Sketch aggregate (no cross-engine oracle for HLL internals).
  // -------------------------------------------------------------------
  private val approxDistinct = GraftQuery(
    name = "lake_approx_distinct",
    doc = "approx_count_distinct (HyperLogLog++, rsd 0.02) per order " +
      "status — the sketch that replaces exact COUNT(DISTINCT) at " +
      "100 TB (fixed-size state per group vs a shuffle of every " +
      "distinct value). Sketch internals are engine-specific, so the " +
      "oracle checks the sketch's CONTRACT instead of its value: the " +
      "query emits the exact distinct count plus a flag asserting the " +
      "HLL estimate landed within 5% of it (2.5σ at rsd 0.02); the " +
      "oracle recomputes the exact count and expects the flag to be 1. " +
      "Deterministic: HLL merge is a register-wise max — commutative " +
      "and associative — so the estimate is partition-order-invariant.",
    oracle = Some("""
      SELECT o_orderstatus,
             COUNT(DISTINCT o_custkey) AS exact_customers,
             COUNT(*) AS n,
             CAST(1 AS BIGINT) AS sketch_within_5pct
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    run = (s, dir) => table(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(count_distinct(col("o_custkey")).as("exact_customers"),
        count(lit(1)).as("n"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .select(col("o_orderstatus"), col("exact_customers"), col("n"),
        when(abs(col("approx") - col("exact_customers")).cast(DoubleType)
          <= col("exact_customers").cast(DoubleType) * 0.05, 1L)
          .otherwise(0L).as("sketch_within_5pct"))
      .orderBy("o_orderstatus"))

  private val approxPercentile = GraftQuery(
    name = "lake_approx_percentile",
    doc = "approx_percentile (Greenwald-Khanna sketch, accuracy 1000) " +
      "of l_quantity per return flag - the quantile sketch that " +
      "replaces an exact sort at 100 TB (bounded state per group vs a " +
      "full shuffle-sort). Sketch internals are engine-specific, so as " +
      "with lake_approx_distinct the oracle checks the CONTRACT, not " +
      "the value: GK guarantees the returned element's rank is within " +
      "eps*n of the target for ANY partition/merge order (eps = " +
      "1/accuracy); the query recounts the returned values' actual " +
      "rank interval against the p50/p95 targets (2*eps slack absorbs " +
      "rank-interval ulp at the bound) and emits the two flags the " +
      "oracle expects to be 1. The rank recount joins the tiny " +
      "per-group sketch row back broadcast - one extra scan, no sort " +
      "anywhere.",
    oracle = Some("""
      SELECT l_returnflag, COUNT(*) AS n,
             CAST(1 AS BIGINT) AS p50_within_rank_bound,
             CAST(1 AS BIGINT) AS p95_within_rank_bound
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    run = (s, dir) => {
      val li = table(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
      val sk = li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(l_quantity, array(0.5D, 0.95D), 1000)")
          .as("ap"))
        .select(col("l_returnflag"), col("ap")(0).as("a50"),
          col("ap")(1).as("a95"))
      def flag(lt: Column, le: Column, p: Double): Column = {
        val n = col("n").cast(DoubleType)
        val slack = n * 0.002 // 2*eps at accuracy 1000
        (((lt + 1).cast(DoubleType) <= n * p + slack) &&
          (le.cast(DoubleType) >= n * p - slack)).cast(LongType)
      }
      li.join(broadcast(sk), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_quantity") < col("a50"), 1L).otherwise(0L))
            .as("lt50"),
          sum(when(col("l_quantity") <= col("a50"), 1L).otherwise(0L))
            .as("le50"),
          sum(when(col("l_quantity") < col("a95"), 1L).otherwise(0L))
            .as("lt95"),
          sum(when(col("l_quantity") <= col("a95"), 1L).otherwise(0L))
            .as("le95"))
        .select(col("l_returnflag"), col("n"),
          flag(col("lt50"), col("le50"), 0.5).as("p50_within_rank_bound"),
          flag(col("lt95"), col("le95"), 0.95).as("p95_within_rank_bound"))
        .orderBy("l_returnflag")
    })

  private val cmsHeavyHitters = GraftQuery(
    name = "lake_cms_heavyhitters",
    doc = "count_min_sketch heavy-hitter audit (completes the sketch " +
      "family: HLL distinct counts, GK quantiles, CMS frequencies): " +
      "per-user event frequencies estimated from one fixed-seed CMS " +
      "(eps 0.001, confidence 0.999 - a ~160 KB partial-aggregable " +
      "sketch vs a full groupBy shuffle at 100 TB), probed for the " +
      "exact top-10 users. As with the other sketches the oracle " +
      "checks the CONTRACT, not engine internals: CMS NEVER " +
      "underestimates (hash collisions only add), and overestimates " +
      "by at most eps*N with the configured confidence - both flags " +
      "recomputed against exact counts and pinned to 1. Deterministic: " +
      "fixed seed, and CMS merge is cell-wise addition - commutative " +
      "and associative, partition-order-invariant. The probe " +
      "deserializes the ONE sketch row and queries 10 keys " +
      "driver-side - sketch-sized work, same contract-audit shape as " +
      "the GK rank recount. CAVEAT pinning within_eps_bound=1: the " +
      "eps*N bound holds with confidence 0.999, not certainty - it is " +
      "deterministic for the fixed seed on the CURRENT datasets " +
      "(verified every round), but a regenerated or larger dataset " +
      "could legitimately flip the flag without any code bug; if the " +
      "driver regenerates testdata and this row alone goes red, widen " +
      "the contract to no_underestimate (the only always-true CMS " +
      "guarantee) rather than hunting a phantom regression.",
    oracle = Some("""
      WITH c AS (SELECT user_id, COUNT(*) AS exact_n
                 FROM events GROUP BY 1),
      t AS (SELECT user_id, exact_n FROM c
            ORDER BY exact_n DESC, user_id LIMIT 10)
      SELECT user_id, exact_n,
             CAST(1 AS BIGINT) AS no_underestimate,
             CAST(1 AS BIGINT) AS within_eps_bound
      FROM t ORDER BY exact_n DESC, user_id"""),
    run = (s, dir) => {
      val ev = table(s, dir, "events").select(col("user_id"))
      val skRow = ev.agg(
        expr("count_min_sketch(user_id, 0.001d, 0.999d, 42)").as("sk"),
        count(lit(1)).as("n")).head()
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skRow.getAs[Array[Byte]]("sk")))
      val epsBound = 0.001 * skRow.getAs[Long]("n")
      val top = ev.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("user_id")).limit(10)
        .collect() // 10 rows - the heavy-hitter list itself
      import s.implicits._
      top.toSeq.map { r =>
        val uid = r.getAs[Long]("user_id")
        val exact = r.getAs[Long]("exact_n")
        val est = cms.estimateCount(uid)
        (uid, exact,
          if (est >= exact) 1L else 0L,
          if (est.toDouble <= exact.toDouble + epsBound) 1L else 0L)
      }.toDF("user_id", "exact_n", "no_underestimate", "within_eps_bound")
        .orderBy(col("exact_n").desc, col("user_id"))
    })

  private val explodeOuter = GraftQuery(
    name = "lake_explode_outer",
    doc = "Outer explode null semantics: documents' tokens filtered to " +
      "the 'qu'-prefixed subset (non-empty for ~80% of docs, empty for " +
      "the rest - BOTH branches exercised), exploded with " +
      "explode_outer so EMPTY arrays keep their row with a NULL token " +
      "- the left-join-shaped unnest a feature extraction needs when " +
      "absence is signal. A plain explode silently drops those rows; " +
      "the oracle models the outer semantics with a LEFT JOIN onto " +
      "the unnested subset. (NULL-vs-value ordering never ties: a doc " +
      "emits either NULL or tokens, not both.)",
    oracle = Some("""
      WITH t AS (SELECT doc_id,
                   list_filter(string_split(text, ' '),
                     w -> w LIKE 'qu%') AS zs
                 FROM documents),
      u AS (SELECT doc_id, unnest(zs) AS token FROM t WHERE len(zs) > 0)
      SELECT t.doc_id, u.token
      FROM t LEFT JOIN u USING (doc_id)
      ORDER BY t.doc_id, u.token"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => w.startsWith("qu")).as("zs"))
      .select(col("doc_id"), explode_outer(col("zs")).as("token"))
      .orderBy("doc_id", "token"))

  private val resampleGapfill = GraftQuery(
    name = "lake_resample_gapfill",
    doc = "Time-series resample with GAP FILLING: events downsampled to " +
      "hourly buckets per event_type over a dense generated grid " +
      "(sequence + explode from a one-row bounds aggregate - no driver " +
      "round trip), empty buckets coalesced to zero. The standard " +
      "prepare-for-training downsampling shape; at scale the grid side " +
      "is tiny (hours x types) and broadcasts into the left join. " +
      "Bucket arithmetic is integer floor division on epoch " +
      "microseconds, replayed identically by the oracle on epoch nanos " +
      "(nested floors agree).",
    oracle = Some("""
      WITH b AS (SELECT epoch_ns(min(ts)) // 3600000000000 AS h0,
                        epoch_ns(max(ts)) // 3600000000000 AS h1 FROM events),
      g AS (SELECT unnest(range((SELECT h0 FROM b),
                                (SELECT h1 FROM b) + 1)) AS h),
      grid AS (SELECT g.h, t.event_type FROM g CROSS JOIN
               (SELECT DISTINCT event_type FROM events) t),
      agg AS (SELECT epoch_ns(ts) // 3600000000000 AS h, event_type,
                     COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       AS sv
              FROM events GROUP BY 1, 2)
      SELECT grid.h, grid.event_type,
             COALESCE(a.n, 0) AS n,
             CAST(COALESCE(a.sv, 0) AS DOUBLE) AS sum_value
      FROM grid LEFT JOIN agg a USING (h, event_type)
      ORDER BY grid.h, grid.event_type"""),
    run = (s, dir) => {
      val ev = table(s, dir, "events")
        .select(expr("unix_micros(ts) div 3600000000").as("h"),
          col("event_type"), col("value"))
      val agg = ev.groupBy("h", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
      val grid = ev.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"))).as("h"))
        // explicit broadcast: the distinct event_type side is tiny at any
        // scale, but plan stats under-estimate a post-aggregate side and
        // AQE's runtime choice should not be load-bearing — pin it like
        // the other grid builders do
        .crossJoin(broadcast(ev.select("event_type").distinct()))
      grid.join(agg, Seq("h", "event_type"), "left")
        .select(col("h"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sv"), lit(0.0)).as("sum_value"))
        .orderBy("h", "event_type")
    })

  val all: Seq[GraftQuery] = Seq(
    asofJoin, bucketedJoin, saltedJoin, bigBigJoin, bloomJoin, dppJoin,
    intervalJoin,
    windowRange, windowRanks, pivotEvents, explodeUnnest, jsonScan,
    csvScan, textScan, orcRoundtrip, approxDistinct, approxPercentile,
    cmsHeavyHitters, resampleGapfill, explodeOuter)
}
