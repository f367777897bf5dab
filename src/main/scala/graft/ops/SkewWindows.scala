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
  *   2. per-partition BOUNDARY summaries — each partition holds
  *      contiguous (group, order) ranges, so only its FIRST and LAST
  *      group can span a partition boundary; every interior group is
  *      wholly contained and provably needs offset (0, 0) / no carry-in.
  *      Phase 2 therefore emits ≤ 2 rows per partition (via
  *      [[firstLastGroups]]) and the collect is O(partitions) — safe
  *      for a driver even when the group key is per-user/per-document
  *      cardinality (10⁸-10⁹ keys at 100 TB), not just metadata-sized;
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

  /** Size of the most recent phase-2 collect (driver-side rows), keyed
    * PER OPERATOR so concurrent calls to different operators in one JVM
    * cannot cross-contaminate the probe (r11 advice — one shared var
    * could hand a test another operator's count). Test probe only:
    * OpsSpec pins it to ≤ 2 × partitions on a many-group input, the
    * property that keeps the boundary handoff driver-safe at per-user
    * group cardinality. */
  private val phase2Rows =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Most recent phase-2 collect size for `op` ("rankedPrefix",
    * "sessionNumbers", "carryForward"); -1 before the first call. */
  private[graft] def lastPhase2Rows(op: String): Int =
    Option(phase2Rows.get(op)).fold(-1)(_.intValue)

  /** Conf key for [[rankedPrefixAuto]]'s branch threshold: a group at
    * or below this many rows fits one window task comfortably, so the
    * plain per-group window wins (no probe-free two-phase overhead);
    * above it the two-phase form is the only shape that scales. */
  val SmallGroupRowsKey = "spark.graft.skewWindows.smallGroupRows"
  val SmallGroupRowsDefault = 2000000L

  private val lastBranchMap =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Branch taken by the most recent [[rankedPrefixAuto]] call in this
    * JVM: "window" or "twophase"; "" before the first call. Test probe. */
  private[graft] def lastAutoBranch: String =
    lastBranchMap.getOrDefault("rankedPrefixAuto", "")

  /** COST-BASED [[rankedPrefix]]: probes the largest group's row count
    * and dispatches — plain `Window.partitionBy` when every group fits
    * one task (`maxGroupRows <= spark.graft.skewWindows.smallGroupRows`,
    * default 2e6), the two-phase range-layout form above it. The r13
    * verdict's watch item: the two-phase rewrite costs 4-9x on
    * small/unskewed inputs where the window's one-task-per-group is
    * FINE — the cost model is the absolute size of the biggest window
    * task, which is exactly what the straggler pays at scale.
    *
    * The probe is one partial-aggregable pass over the group column
    * (map-side combine leaves one row per group per partition); callers
    * that already aggregate per-group counts pass them via
    * `precomputedCounts` (frame + count-column name) and the probe
    * costs one tiny agg over that frame instead of a corpus pass.
    * Output is IDENTICAL on both branches whenever (group, order…) is
    * a total order — OpsSpec pins the equality, and the branch taken is
    * observable via [[lastAutoBranch]]. EAGER (the probe runs a job);
    * the window branch returns a lazy plan after it. */
  def rankedPrefixAuto(df: DataFrame, groupCol: String, order: Seq[Column],
      valueCol: Option[String], rankName: String, cumName: String,
      precomputedCounts: Option[(DataFrame, String)] = None): DataFrame = {
    val threshold = df.sparkSession.conf
      .get(SmallGroupRowsKey, SmallGroupRowsDefault.toString).toLong
    val probe = precomputedCounts match {
      case Some((counts, nCol)) => counts.agg(max(col(nCol))).head()
      case None => df.groupBy(col(groupCol))
        .agg(count(lit(1)).as("__n")).agg(max(col("__n"))).head()
    }
    val maxGroupRows = if (probe.isNullAt(0)) 0L else probe.getLong(0)
    if (maxGroupRows <= threshold) {
      lastBranchMap.put("rankedPrefixAuto", "window")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      val ranked = df.withColumn(rankName,
        row_number().over(w).cast(LongType))
      valueCol match {
        case Some(v) => ranked.withColumn(cumName,
          coalesce(sum(col(v)).over(w.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)), lit(0L)))
        case None => ranked.withColumn(cumName, lit(0L))
      }
    } else {
      lastBranchMap.put("rankedPrefixAuto", "twophase")
      rankedPrefix(df, groupCol, order, valueCol, rankName, cumName)
    }
  }

  /** Streams one SORTED partition (rows already ordered by (group,
    * order…) from the range layout) and emits only its FIRST and LAST
    * group's finished summaries — the only groups that can continue
    * into a neighboring partition, hence the only rows the driver
    * boundary-handoff can ever consult. Interior groups are dropped
    * here and defaulted by phase 3 (offset (0, 0) / no carry-in), so
    * the phase-2 collect is ≤ 2 rows per partition regardless of group
    * cardinality. `init` builds a mutable accumulator from a group's
    * first row; `update` folds each subsequent row of the same group. */
  private[graft] def firstLastGroups[A <: AnyRef](it: Iterator[Row],
      gIdx: Int, init: Row => A, update: (A, Row) => Unit)
      : Iterator[(Any, A)] =
    if (!it.hasNext) Iterator.empty
    else {
      val r0 = it.next()
      val firstG = r0.get(gIdx)
      val firstA = init(r0)
      var curG = firstG
      var curA = firstA
      it.foreach { row =>
        val g = row.get(gIdx)
        if (g != curG) { curG = g; curA = init(row) }
        else update(curA, row)
      }
      if (curG == firstG) Iterator((firstG, firstA))
      else Iterator((firstG, firstA), (curG, curA))
    }

  /** Appends `outCol` — the last non-null `payloadCol` value at or
    * before each row in (group, order…) order, i.e.
    * `last(payload, ignoreNulls=true) OVER (PARTITION BY group ORDER BY
    * order… ROWS UNBOUNDED PRECEDING..CURRENT ROW)` — without a
    * per-group single task. The as-of-join carry: same boundary-handoff
    * structure as [[sessionNumbers]], but what the driver threads is
    * each boundary group's LAST NON-NULL payload (row-sized; ≤ 2 rows
    * per partition via [[firstLastGroups]]), so each
    * partition's first rows of a group inherit exactly the value the
    * window's running carry would have held entering that partition.
    * Requires a total (group, order…) order for window-identical
    * results (ties across a boundary could otherwise legally reorder
    * null/non-null neighbors — the same caveat the window form has).
    * Group values must be non-null; payload may be any type (struct
    * included). EAGER like rankedPrefix. */
  def carryForward(df: DataFrame, groupCol: String, order: Seq[Column],
      payloadCol: String, outCol: String): DataFrame = {
    val layout = col(groupCol) +: order
    val ranged = df.repartitionByRange(layout: _*)
      .sortWithinPartitions(layout: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pidIdx = ranged.schema.fieldIndex("__pid")
    val gIdx = ranged.schema.fieldIndex(groupCol)
    val pIdx = ranged.schema.fieldIndex(payloadCol)
    val sumSchema = StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      ranged.schema.fields(gIdx).copy(name = "g"),
      ranged.schema.fields(pIdx).copy(name = "p", nullable = true)))
    val sumEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(sumSchema)
    val partials = ranged.mapPartitions ({ it0 =>
      // boundary-only: first/last group's last non-null payload
      val it = it0.buffered
      if (!it.hasNext) Iterator.empty
      else {
        val pid = it.head.getInt(pidIdx)
        firstLastGroups[Array[Any]](it, gIdx,
          init = r => Array[Any](r.get(pIdx)),
          update = (a, r) => {
            val p = r.get(pIdx); if (p != null) a(0) = p
          }).map { case (g, a) => Row(pid, g, a(0)) }
      }
    })(sumEnc).collect()
    phase2Rows.put("carryForward", partials.length)
    val state = scala.collection.mutable.Map.empty[Any, Any]
    val carryIn: Map[(Int, Any), Any] =
      partials.sortBy(_.getInt(0)).map { r =>
        val pid = r.getInt(0)
        val g = r.get(1)
        val entry = (pid, g) -> state.getOrElse(g, null)
        if (r.get(2) != null) state(g) = r.get(2)
        entry
      }.toMap
    val outSchema = StructType(
      ranged.schema.fields.patch(pidIdx, Nil, 1) :+
        ranged.schema.fields(pIdx).copy(name = outCol, nullable = true))
    val outEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(outSchema)
    ranged.mapPartitions ({ it =>
      var curG: Any = null
      var started = false
      var carried: Any = null
      it.map { row =>
        val g = row.get(gIdx)
        if (!started || g != curG) {
          // interior groups have no summary row: no earlier partition
          // can hold them, so their carry-in is null by construction.
          // A partition's FIRST group however is always summarized by
          // firstLastGroups — a miss there means the contiguity
          // invariant broke, and defaulting would be silently wrong
          // (r11 advice: the default must not swallow that case)
          if (!started)
            require(carryIn.contains((row.getInt(pidIdx), g)),
              s"SkewWindows.carryForward invariant: partition " +
                s"${row.getInt(pidIdx)} first group $g has no phase-2 " +
                "summary")
          carried = carryIn.getOrElse((row.getInt(pidIdx), g), null)
          curG = g; started = true
        }
        val p = row.get(pIdx)
        if (p != null) carried = p
        Row.fromSeq(row.toSeq.patch(pidIdx, Nil, 1) :+ carried)
      }
    })(outEnc)
  }

  /** Exact top-k per group with no per-group single task: stage 1 takes
    * the local top-k within every (group, source-partition) slice — the
    * window key includes `spark_partition_id()`, so each window group is
    * bounded by a partition, never by a group — and stage 2 ranks the
    * surviving ≤ k·partitions candidates per group exactly. Any global
    * top-k row is top-k within its slice, so stage 1 loses nothing; the
    * stage-2 per-group window runs on candidate rows only (k·P, tiny at
    * any corpus size). The distributed analogue of what
    * TakeOrderedAndProject does for GLOBAL top-k. `order` must be a
    * total order for a deterministic result. */
  def topKPerGroup(df: DataFrame, groupCol: String, order: Seq[Column],
      k: Int, rankName: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w1 = Window.partitionBy(col(groupCol), col("__srcpid"))
      .orderBy(order: _*)
    val cand = df.withColumn("__srcpid", spark_partition_id())
      .withColumn("__lr", row_number().over(w1))
      .filter(col("__lr") <= k)
      .drop("__lr", "__srcpid")
    val w2 = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    cand.withColumn(rankName, row_number().over(w2).cast(LongType))
      .filter(col(rankName) <= k)
  }

  /** `ntile(k)` reconstructed from a [[rankedPrefix]] rank and the
    * group's row count by the standard fill rule — base = n div k rows
    * per bucket, the first n%k buckets take one extra — in exact
    * integer arithmetic (SQL `div`, never double `/`). `rank`/`n` are
    * COLUMN NAMES (the arithmetic needs integral div, which the Column
    * API lacks); greatest() guards the base=0 divisor on the branch
    * that is unreachable when rank > cut. */
  def ntileFromRank(rank: String, n: String, k: Int): Column = {
    val base = s"($n div $k)"
    val extra = s"($n % $k)"
    val cut = s"($extra * ($base + 1))"
    expr(s"CASE WHEN $rank <= $cut THEN ($rank - 1) div ($base + 1) + 1 " +
      s"ELSE $extra + ($rank - 1 - $cut) div greatest($base, 1) + 1 END")
  }

  /** Appends `sessCol` — the 1-based gap-sessionization number per
    * group (= `SUM(new_sess) OVER (PARTITION BY group ORDER BY order…)`
    * where `new_sess` flags a first event or an inactivity gap
    * `> gapMicros`) — without a per-group single task. lag() is
    * order-sequential, so the scale-out needs one extra piece beyond
    * [[rankedPrefix]]'s offsets: each (partition, group) summary also
    * carries its first/last event timestamps and its count of INTERNAL
    * session starts (a narrow sorted scan), and the driver threads the
    * boundary — partition p's first row of group g compares against the
    * last timestamp of g in the nearest earlier partition, exactly the
    * row lag() would have seen — while prefix-summing the session
    * offsets. Phase 3 then re-derives every flag locally from the
    * handed-off boundary timestamp. Output equals the window form
    * whenever (group, order…) is a total order and `order` is
    * timestamp-consistent (rows in `order` are also in `tsMicrosCol`
    * order within a group — ties allowed; a tie's internal order can't
    * change any gap against the threshold).
    *
    * `tsMicrosCol` must be LongType (caller derives it, e.g.
    * `unix_micros(ts)` — integer state, the repo-wide exactness rule).
    * Group values must be non-null. EAGER like rankedPrefix. */
  def sessionNumbers(df: DataFrame, groupCol: String, tsMicrosCol: String,
      order: Seq[Column], gapMicros: Long, sessCol: String): DataFrame = {
    val layout = col(groupCol) +: order
    val ranged = df.repartitionByRange(layout: _*)
      .sortWithinPartitions(layout: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pidIdx = ranged.schema.fieldIndex("__pid")
    val gIdx = ranged.schema.fieldIndex(groupCol)
    val tsIdx = ranged.schema.fieldIndex(tsMicrosCol)
    // phase 2: boundary-only summaries from a narrow sorted scan —
    // first/last ts, internal session starts; ≤ 2 rows per partition
    val sumSchema = StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      ranged.schema.fields(gIdx).copy(name = "g"),
      StructField("first_ts", LongType, nullable = false),
      StructField("last_ts", LongType, nullable = false),
      StructField("starts", LongType, nullable = false)))
    val sumEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(sumSchema)
    val partials = ranged.mapPartitions ({ it0 =>
      val it = it0.buffered
      if (!it.hasNext) Iterator.empty
      else {
        val pid = it.head.getInt(pidIdx)
        firstLastGroups[Array[Long]](it, gIdx,
          init = { r =>
            val ts = r.getLong(tsIdx)
            Array(ts, ts, 0L) // first_ts, last_ts, starts
          },
          update = { (a, r) =>
            val ts = r.getLong(tsIdx)
            if (ts - a(1) > gapMicros) a(2) += 1L
            a(1) = ts
          }).map { case (g, a) => Row(pid, g, a(0), a(1), a(2)) }
      }
    })(sumEnc).collect()
    phase2Rows.put("sessionNumbers", partials.length)
    // driver: thread boundaries + exclusive session offsets per group
    // in partition order (O(partitions) rows, same driver footprint
    // as rankedPrefix's phase 2)
    val state = scala.collection.mutable.Map.empty[Any, (Long, Long)]
    // offsets: (pid, g) -> (session offset, prev-partition last ts,
    // 1 if a previous partition holds g else 0)
    val offsets: Map[(Int, Any), (Long, Long, Long)] =
      partials.sortBy(r => r.getInt(0)).map { r =>
        val pid = r.getInt(0)
        val g = r.get(1)
        val (firstTs, lastTs, starts) =
          (r.getLong(2), r.getLong(3), r.getLong(4))
        val entry = state.get(g) match {
          case None => (pid, g) -> (0L, 0L, 0L)
          case Some((sessSoFar, prevLast)) =>
            (pid, g) -> (sessSoFar, prevLast, 1L)
        }
        val firstFlag = state.get(g) match {
          case Some((_, prevLast)) if firstTs - prevLast <= gapMicros => 0L
          case _ => 1L
        }
        val sessSoFar = state.get(g).map(_._1).getOrElse(0L)
        state(g) = (sessSoFar + firstFlag + starts, lastTs)
        entry
      }.toMap
    // phase 3: narrow re-derivation of every flag from the handed-off
    // boundary; __pid (last field) dropped
    val outSchema = StructType(
      ranged.schema.fields.patch(pidIdx, Nil, 1) :+
        StructField(sessCol, LongType, nullable = false))
    val outEnc: org.apache.spark.sql.Encoder[Row] =
      Encoders.row(outSchema)
    ranged.mapPartitions ({ it =>
      var curG: Any = null
      var started = false
      var sess = 0L
      var hasPrev = false
      var prevTs = 0L
      it.map { row =>
        val g = row.get(gIdx)
        if (!started || g != curG) {
          // interior groups have no summary row → fresh group: zero
          // session offset, no boundary timestamp to compare against.
          // The partition's FIRST group always has one (same invariant
          // tripwire as carryForward)
          if (!started)
            require(offsets.contains((row.getInt(pidIdx), g)),
              s"SkewWindows.sessionNumbers invariant: partition " +
                s"${row.getInt(pidIdx)} first group $g has no phase-2 " +
                "summary")
          val (s0, pl, hp) = offsets.getOrElse(
            (row.getInt(pidIdx), g), (0L, 0L, 0L))
          sess = s0; prevTs = pl; hasPrev = hp == 1L
          curG = g; started = true
        }
        val ts = row.getLong(tsIdx)
        if (!hasPrev || ts - prevTs > gapMicros) sess += 1
        hasPrev = true
        prevTs = ts
        Row.fromSeq(row.toSeq.patch(pidIdx, Nil, 1) :+ sess)
      }
    })(outEnc)
  }

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
    // fail fast on the driver: phase 2/3 read valueCol with getLong and
    // sum into a LongType schema — a non-Long numeric would otherwise
    // surface as an opaque ClassCastException inside a task (r11 advice)
    valueCol.foreach { v =>
      val dt = df.schema(v).dataType
      require(dt == LongType,
        s"rankedPrefix valueCol '$v' must be LongType (cast upstream — " +
          s"integer state, the repo-wide exactness rule); got $dt")
    }
    val layout = col(groupCol) +: order
    val ranged = df.repartitionByRange(layout: _*)
      .sortWithinPartitions(layout: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pidIdx = ranged.schema.fieldIndex("__pid")
    val gIdx = ranged.schema.fieldIndex(groupCol)
    val valIdx = valueCol.map(ranged.schema.fieldIndex)
    // phase 2: boundary-only (cnt, sum) summaries — ≤ 2 rows per
    // partition, a narrow sorted scan (no shuffle: the old groupBy agg
    // re-exchanged what the range layout already co-located)
    val sumSchema = StructType(Seq(
      StructField("pid", IntegerType, nullable = false),
      ranged.schema.fields(gIdx).copy(name = "g"),
      StructField("cnt", LongType, nullable = false),
      StructField("sum", LongType, nullable = false)))
    val sumEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(sumSchema)
    val partials = ranged.mapPartitions ({ it0 =>
      val it = it0.buffered
      if (!it.hasNext) Iterator.empty
      else {
        val pid = it.head.getInt(pidIdx)
        firstLastGroups[Array[Long]](it, gIdx,
          init = { r =>
            val v = valIdx.map(i => if (r.isNullAt(i)) 0L
              else r.getLong(i)).getOrElse(0L)
            Array(1L, v)
          },
          update = { (a, r) =>
            a(0) += 1L
            valIdx.foreach(i => if (!r.isNullAt(i)) a(1) += r.getLong(i))
          }).map { case (g, a) => Row(pid, g, a(0), a(1)) }
      }
    })(sumEnc).collect()
    phase2Rows.put("rankedPrefix", partials.length)
    val cntAcc = scala.collection.mutable.Map.empty[Any, Long]
    val sumAcc = scala.collection.mutable.Map.empty[Any, Long]
    val offsets: Map[(Int, Any), (Long, Long)] =
      partials.sortBy(_.getInt(0)).map { r =>
        val pid = r.getInt(0)
        val g = r.get(1)
        val entry = (pid, g) -> (cntAcc.getOrElse(g, 0L),
          sumAcc.getOrElse(g, 0L))
        cntAcc(g) = cntAcc.getOrElse(g, 0L) + r.getLong(2)
        sumAcc(g) = sumAcc.getOrElse(g, 0L) + r.getLong(3)
        entry
      }.toMap
    // phase 3: narrow assignment — __pid is the last field (appended
    // above), dropped from the output
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
          // interior groups have no summary row → offsets (0, 0); the
          // partition's FIRST group always has one (invariant tripwire)
          if (!started)
            require(offsets.contains((row.getInt(pidIdx), g)),
              s"SkewWindows.rankedPrefix invariant: partition " +
                s"${row.getInt(pidIdx)} first group $g has no phase-2 " +
                "summary")
          val (c0, s0) = offsets.getOrElse(
            (row.getInt(pidIdx), g), (0L, 0L))
          rank = c0; cum = s0; curG = g; started = true
        }
        rank += 1
        valIdx.foreach(i => cum += row.getLong(i))
        Row.fromSeq(row.toSeq.patch(pidIdx, Nil, 1) :+ rank :+ cum)
      }
    }
  }
}
