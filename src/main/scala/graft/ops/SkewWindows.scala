package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-proof per-group rank / running-sum — the two-phase scale-out for
  * `Window.partitionBy(group)` when one group dominates the corpus.
  *
  * A per-group window plans one task per group: correct at any SF, but a
  * real corpus is ~50-90% ONE language, so that task sees most of the
  * input — the classic straggler that turns a 1000-executor cluster into
  * a single machine. AQE cannot split it (a running sum depends on every
  * earlier row of the group), so the fix must be algebraic: prefix sums
  * distribute over concatenation. This is [[Ids.orderedId]]'s phase
  * pattern with the offsets keyed by (partition, group) instead of
  * partition alone:
  *
  *   1. range-repartition + sort within partitions on (group, order…) —
  *      the dominant group SPANS MANY partitions (the range sampler
  *      splits it), each holding a contiguous slice of its order;
  *   2. per-(partition, group) row counts and value sums — a partial-
  *      aggregable job whose output is bounded by
  *      partitions + distinct-groups-crossing-boundaries (each partition
  *      holds contiguous (group, order) ranges, so a group appears in
  *      at most [its-span] partitions and the collect is O(partitions +
  *      groups) rows, driver-safe like orderedId's phase 2);
  *   3. exclusive prefix offsets per group in partition order, a
  *      task-closure map, added to the narrow per-partition local
  *      rank / running sum.
  *
  * No stage is single-task, no shuffle happens after the range
  * partition, and the assignment pass is narrow. Output equals the
  * window exactly whenever (group, order…) is a TOTAL order (unique
  * tie-break) — the same precondition the single-window form needs for
  * deterministic cross-engine results anyway.
  *
  * EAGER like orderedId: phases 1-2 run Spark jobs at call time (the
  * partition layout must be pinned before offsets are read) — see the
  * laziness note on GraftQuery. Blocks are MEMORY_AND_DISK persist,
  * materialized by the phase-2 job itself; Bench/Verify drop them
  * between queries (graft.Caches).
  */
object SkewWindows {

  /** Appends `rankName` (1-based dense rank, = `row_number() OVER
    * (PARTITION BY groupCol ORDER BY order…)`) and `cumName` (running
    * sum of `valueCol` over the same frame, = `SUM(valueCol) … ROWS
    * UNBOUNDED PRECEDING..CURRENT ROW`; constantly 0 when `valueCol`
    * is None). `valueCol` must be LongType (cast upstream — integer
    * state, one division at the end, the repo-wide exactness rule).
    * (groupCol, order…) must be a total order; group values must be
    * non-null. */
  def rankedPrefix(df: DataFrame, groupCol: String, order: Seq[Column],
      valueCol: Option[String], rankName: String,
      cumName: String): DataFrame = {
    val layout = col(groupCol) +: order
    val ranged = df.repartitionByRange(layout: _*)
      .sortWithinPartitions(layout: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase 2: one row per (partition, group) — the dominant group
    // contributes its partition-span many rows, every other group ~1
    val sumExpr = valueCol.map(c => sum(col(c)))
      .getOrElse(sum(lit(0L))).as("__sum")
    val partials = ranged.groupBy(col("__pid"), col(groupCol))
      .agg(count(lit(1)).as("__cnt"), sumExpr)
      .orderBy("__pid").collect()
    val cntAcc = scala.collection.mutable.Map.empty[Any, Long]
    val sumAcc = scala.collection.mutable.Map.empty[Any, Long]
    val offsets: Map[(Int, Any), (Long, Long)] = partials.map { r =>
      val pid = r.getInt(0)
      val g = r.get(1)
      val entry = (pid, g) -> (cntAcc.getOrElse(g, 0L),
        sumAcc.getOrElse(g, 0L))
      cntAcc(g) = cntAcc.getOrElse(g, 0L) + r.getLong(2)
      sumAcc(g) = sumAcc.getOrElse(g, 0L) +
        (if (r.isNullAt(3)) 0L else r.getLong(3))
      entry
    }.toMap
    // phase 3: narrow assignment — __pid is the last field (appended
    // above), dropped from the output
    val pidIdx = ranged.schema.fieldIndex("__pid")
    val gIdx = ranged.schema.fieldIndex(groupCol)
    val valIdx = valueCol.map(ranged.schema.fieldIndex)
    val outSchema = StructType(
      ranged.schema.fields.patch(pidIdx, Nil, 1) :+
        StructField(rankName, LongType, nullable = false) :+
        StructField(cumName, LongType, nullable = false))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(outSchema)
    ranged.mapPartitions { it =>
      var curG: Any = null
      var started = false
      var rank = 0L
      var cum = 0L
      it.map { row =>
        val g = row.get(gIdx)
        if (!started || g != curG) {
          val (c0, s0) = offsets((row.getInt(pidIdx), g))
          rank = c0; cum = s0; curG = g; started = true
        }
        rank += 1
        valIdx.foreach(i => cum += row.getLong(i))
        Row.fromSeq(row.toSeq.patch(pidIdx, Nil, 1) :+ rank :+ cum)
      }
    }
  }
}
