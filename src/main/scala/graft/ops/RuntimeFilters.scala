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

  /** Serialized bloom bitmap of `xxhash64(key)` over `build`.
    * `expectedItems`/`fpp` size the bitmap exactly like
    * `util.sketch.BloomFilter.create` (1 M items at 1% ≈ 1.1 MB). */
  def bloomBitmap(build: DataFrame, buildKey: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): Array[Byte] = {
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      GraftColumnBridge.expression(xxhash64(buildKey)),
      Literal(expectedItems), Literal(numBits))
    build.select(GraftColumnBridge.column(agg.toAggregateExpression())
        .as("bloom_bitmap"))
      .head().getAs[Array[Byte]](0)
  }

  /** `probe` rows whose `probeKey` might exist among `build`'s `buildKey`
    * values. Superset semantics (bloom false positives pass); exact once a
    * subsequent join on the same key runs. */
  def bloomPruned(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bitmap = bloomBitmap(build, buildKey, expectedItems, fpp)
    probe.filter(GraftColumnBridge.column(
      BloomFilterMightContain(Literal(bitmap, BinaryType),
        GraftColumnBridge.expression(xxhash64(probeKey)))))
  }
}
