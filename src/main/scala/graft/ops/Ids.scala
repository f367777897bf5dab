package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-safe deterministic sequential ids.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY plans an
  * `Exchange SinglePartition`: the entire input funnels through ONE task —
  * correct at any SF, a scale-killer at 100 TB. This is the classic
  * two-phase (zipWithIndex) pattern instead:
  *
  *   1. range-repartition + sort within partitions on the key, so
  *      partition p holds a contiguous key range and ranges increase
  *      with p (materialized once — on a cluster this is the
  *      persist/checkpoint that pins the layout for both phases);
  *   2. count rows per partition — a tiny aggregate, one long per
  *      partition, collected to the driver (bounded by the partition
  *      count, the same driver-side footprint as RDD `zipWithIndex`);
  *   3. id = exclusive prefix-sum offset of the partition + the local
  *      row position, assigned in a narrow per-partition pass.
  *
  * No stage is single-task and no extra shuffle happens after the range
  * partition; the assignment pass is narrow. Output ids equal the global
  * `row_number` over `keys` whenever the key is unique (range boundaries
  * only move rows between partitions, never change global rank).
  */
object Ids {

  /** Phase 1 as a lazy plan: contiguous increasing key ranges per
    * partition, partition id attached. Exposed (pre-materialization) so
    * PlanSpec can assert the exchange is RangePartitioning — never
    * SinglePartition — on the plan that actually shuffles the data;
    * after [[orderedId]] pins it, only the narrow tail is visible. */
  private[graft] def phase1(df: DataFrame, keys: Seq[Column]): DataFrame =
    df.repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .withColumn("__pid", spark_partition_id())

  /** Append a 1-based dense sequential id column ordered by `keys`.
    *
    * PRECONDITION (asserted, not just documented): a key tie is only
    * legal between FULLY IDENTICAL rows. Ids equal the global
    * `row_number` over the keys, and the assignment is deterministic
    * under lineage recompute of a lost persisted block on a multi-node
    * cluster — with a tie between rows that differ outside the key,
    * the shuffle-fetch arrival order could silently permute which row
    * gets which id between the phase-2 offsets and the phase-3
    * assignment. Identical rows are value-indistinguishable (any
    * order among them yields the same output), so they pass — that is
    * the songplays J2 fan-out case, where the reference deliberately
    * duplicates whole fact rows. The check is FREE: phase 1 sorts by
    * key within range partitions and range partitioning co-locates
    * equal keys, so any tie is adjacent within one partition — phase 3
    * spots it during the assignment pass it already runs, no extra
    * job. Non-key columns compare structurally, with element-wise
    * equality for array/binary values (a plain Seq equality would be
    * reference equality for arrays and spuriously reject identical
    * rows).
    *
    * EAGER: phases 1-2 execute Spark jobs at call time (the layout must
    * be pinned before offsets are read), so this is not a lazy plan
    * builder — see the laziness note on GraftQuery. Locally the pinned
    * blocks are MEMORY_AND_DISK persist, materialized BY the phase-2
    * counts job itself — one pass over the input, not
    * checkpoint-then-count twice. On a NON-local master the default is
    * a durable `checkpoint` instead (one extra pass, but a lost
    * persisted block there would lineage-recompute the range shuffle
    * between phase 2 and phase 3, and the uniqueness assertion is the
    * only remaining guard); falls back to persist, with a stderr
    * warning, if no checkpoint dir is configured. Blocks live until
    * the session drops them; Bench/Verify clear caches between queries
    * (graft.Caches). DURABLE-BRANCH HYGIENE: reliable checkpoint files
    * are NOT blocks — `Caches.clearAll` (unpersist) never removes them,
    * so a long-lived non-local session accumulates one checkpoint dir
    * per orderedId call unless the cleaner is told to collect them.
    * Set `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
    * startup conf — it cannot be flipped on a running context) on any
    * cluster session that calls this repeatedly, or point
    * `setCheckpointDir` at storage with a TTL/lifecycle rule. */
  def orderedId(df: DataFrame, keys: Seq[Column], idCol: String): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val keyed = phase1(df.withColumn("__key", struct(keys: _*)), keys)
    // isLocal, not master.startsWith("local"): a local-cluster[...]
    // master HAS separate executor JVMs that can die independently —
    // it must take the durable branch like any real cluster
    val parted =
      if (!sc.isLocal && sc.getCheckpointDir.isDefined)
        keyed.checkpoint() // eager + durable: survives executor loss
      else {
        if (!sc.isLocal)
          System.err.println("[graft.Ids] non-local master without a " +
            "checkpoint dir: falling back to MEMORY_AND_DISK persist; " +
            "set spark.sparkContext.setCheckpointDir for durable ids")
        keyed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
    // phase 2: one row per partition — bounded driver-side work; this
    // action also fills the persisted blocks phase 3 reads
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .orderBy("__pid").collect()
    var acc = 0L
    val offsets: Map[Int, Long] = counts.map { r =>
      val entry = r.getInt(0) -> acc; acc += r.getLong(1); entry
    }.toMap
    // phase 3: narrow per-partition assignment (no shuffle, no window);
    // the last two columns are __key then __pid (see phase1 call above)
    val pidIdx = parted.schema.fieldIndex("__pid")
    val keyIdx = parted.schema.fieldIndex("__key")
    val outSchema = StructType(
      parted.schema.fields.take(keyIdx) :+
        StructField(idCol, LongType, nullable = false))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    // structural value equality: binary columns (Array[Byte]) compare
    // element-wise, ArrayType columns surface as Seq (WrappedArray) and
    // recurse so nested binaries compare by value too, and NaN equals
    // NaN (identical rows must never be rejected as 'differing')
    def valEq(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case (x: Array[_], y: Array[_]) =>
        x.length == y.length && x.indices.forall(i => valEq(x(i), y(i)))
      case (x: Seq[_], y: Seq[_]) =>
        x.length == y.length && x.indices.forall(i => valEq(x(i), y(i)))
      case (x: Double, y: Double) => (x.isNaN && y.isNaN) || x == y
      case (x: Float, y: Float) => (x.isNaN && y.isNaN) || x == y
      case _ => a == b
    }
    def restEq(a: Seq[Any], b: Seq[Any]): Boolean =
      a != null && b != null && a.length == b.length &&
        a.indices.forall(i => valEq(a(i), b(i)))
    parted.mapPartitions { it =>
      var started = false
      var next = 0L
      var prevKey: Row = null
      var prevRest: Seq[Any] = null
      it.map { row =>
        if (!started) { next = offsets(row.getInt(pidIdx)); started = true }
        val k = row.getStruct(keyIdx)
        val rest = row.toSeq.take(keyIdx)
        if (k == prevKey && !restEq(rest, prevRest))
          throw new IllegalStateException(
            s"Ids.orderedId requires unique keys, found duplicate: $k " +
              "between rows that differ outside the key (their id " +
              "assignment would be nondeterministic under lineage " +
              "recompute); add a tie-breaker column to the key")
        prevKey = k
        prevRest = rest
        next += 1
        Row.fromSeq(rest :+ next)
      }
    }
  }
}
