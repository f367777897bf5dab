package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Runtime join pruning: build a bloom filter from the SELECTIVE side of a
  * big⋈big join and apply it to the probe side BEFORE the join's shuffle —
  * the same trick Spark's own `InjectRuntimeFilter` rule plays, exposed as
  * a library combinator so the plan shape is explicit and testable instead
  * of depending on the optimizer's size-threshold heuristics
  * (`spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`
  * defaults to 10 GB, which no local test would ever cross).
  *
  * Mechanics — all engine-native, zero scalar UDFs:
  *   1. Build side: `BloomFilterAggregate(xxhash64(key))` — a partial-
  *      aggregable sketch; each task builds a local bloom, partials merge
  *      by bitwise OR, and only the final ~0.1–1 MB bitmap reaches the
  *      driver. One pass, no shuffle of the build rows themselves.
  *   2. Probe side: `BloomFilterMightContain(lit(bitmap), xxhash64(key))` —
  *      a codegen'd predicate evaluated row-by-row at the scan, so probe
  *      rows whose key cannot exist on the build side are dropped before
  *      they are shuffled or sorted for the join.
  *
  * False positives are fine: the join itself removes them, so the result
  * is provably identical to the unfiltered join — only the shuffled volume
  * changes (by the build side's selectivity, e.g. ~15× less here).
  *
  * At 100 TB this is the standard mitigation when a fact⋈fact join has a
  * selective dimension-side predicate but the probe scan has no partition
  * or min/max column correlated with the key: the bloom travels with the
  * task closure (broadcast-sized) and the probe shuffle shrinks from
  * "everything" to "selectivity × everything".
  *
  * The build side executes eagerly at construction (one small job) — the
  * same contract as real engines' runtime filters, which schedule the
  * build-side scan first; documented in GraftQuery's laziness note.
  */
object RuntimeFilters {

  /** Sentinel for `expectedItems`: size the bitmap from an exact
    * build-side row count (one extra tiny aggregate — the same
    * stats-before-filter pass real engines schedule). Row count upper-
    * bounds distinct keys, so auto-sizing only ever OVER-sizes. */
  val AutoSize: Long = -1L

  /** Bitmap ceiling — 8 MB of bits, the same cap Spark's own
    * `InjectRuntimeFilter` applies (`…runtime.bloomFilter.maxNumBits`).
    * The bitmap rides in task closures, so it must stay broadcast-sized
    * no matter what the build cardinality turns out to be; past the cap
    * the real fpp degrades (pruning weakens, results stay exact via the
    * subsequent join) and we say so on stderr instead of degrading
    * silently. */
  val MaxNumBits: Long = 8L * 1024 * 1024 * 8

  /** Serialized bloom bitmap of `xxhash64(key)` over `build`.
    * `expectedItems`/`fpp` size the bitmap exactly like
    * `util.sketch.BloomFilter.create` (1 M items at 1% ≈ 1.1 MB);
    * the default [[AutoSize]] measures the build side instead of
    * guessing. The sketch pass also counts build rows, so a caller-
    * supplied `expectedItems` that undershoots the real cardinality is
    * reported (stderr) rather than silently producing a saturated,
    * non-pruning bloom. */
  def bloomBitmap(build: DataFrame, buildKey: Column,
      expectedItems: Long = AutoSize, fpp: Double = 0.01): Array[Byte] = {
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(build.count(), 1024L)
    val idealBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(items, fpp)
    val numBits = math.min(idealBits, MaxNumBits)
    if (idealBits > MaxNumBits)
      System.err.println(s"[graft.RuntimeFilters] bloom for $items items " +
        s"at fpp=$fpp wants $idealBits bits > cap $MaxNumBits; capped — " +
        "effective fpp degrades (results stay exact, pruning weakens)")
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(buildKey)),
      Literal(items), Literal(numBits))
    val row = build.select(
      GraftColumnBridge.column(agg.toAggregateExpression())
        .as("bloom_bitmap"),
      count(lit(1)).as("build_rows")).head()
    val buildRows = row.getLong(1)
    if (expectedItems > 0 && buildRows > expectedItems)
      System.err.println(s"[graft.RuntimeFilters] build side has " +
        s"$buildRows rows > expectedItems=$expectedItems; bitmap is " +
        "undersized for this input — pass AutoSize or a larger estimate")
    row.getAs[Array[Byte]](0)
  }

  /** `probe` rows whose `probeKey` might exist among `build`'s `buildKey`
    * values. Superset semantics (bloom false positives pass); exact once a
    * subsequent join on the same key runs. */
  def bloomPruned(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column,
      expectedItems: Long = AutoSize, fpp: Double = 0.01): DataFrame = {
    val bitmap = bloomBitmap(build, buildKey, expectedItems, fpp)
    probe.filter(GraftColumnBridge.column(
      BloomFilterMightContain(Literal(bitmap, BinaryType),
        GraftColumnBridge.expression(xxhash64(probeKey)))))
  }
}
