package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Readers

/** Pins [[EventStream.sessionWindowDrained]] — the NATIVE streaming
  * `session_window` aggregation — against batch arithmetic:
  *
  *  - drained output == batch gaps-and-islands sessionization minus
  *    still-open tails, closure rule
  *    `end_us + gapUs <= floor(global_max_us/1000) * 1000` (the
  *    ms-resolution watermark, NON-strict — same boundary Spark's
  *    timer sweep honors, SessionTimeoutSpec);
  *  - the boundary itself on a crafted µs fixture (sessions ending
  *    1 ms below, exactly AT, and 1 ms above the horizon);
  *  - a real multi-batch run equals the single-batch run (session
  *    EXTENSION across batches);
  *  - the MERGE path: an out-of-order event arriving in a later batch
  *    that BRIDGES two separate open sessions must collapse them into
  *    one emitted row — the MergingSessionsExec behavior no batch
  *    formulation ever exercises.
  */
class SessionWindowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val GapUs = 1800L * 1000000L
  private val GapMs = GapUs / 1000L

  /** Batch twin: gaps-and-islands sessions restricted to closed ones. */
  private def batchTwin(events: DataFrame): Seq[Seq[Any]] = {
    val e = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val maxMs = e.agg(max(col("us"))).head().getLong(0) / 1000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e.withColumn("new_s",
        when(col("us") - lag("us", 1).over(w) > GapUs or
          lag("us", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("us").as("session_start_us"), max("us").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .filter(col("session_end_us") + GapUs <= maxMs * 1000L)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq
  }

  private def drained(dir: String, mfpt: Option[Int] = None,
      delay: String = "0 seconds"): Seq[Seq[Any]] =
    EventStream.sessionWindowDrained(spark, dir, mfpt, delay)
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq

  lazy val inputDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sw").toString
    Readers.table(spark, "/root/testdata/sf0.001", "events")
      .coalesce(1).write.mode("overwrite").parquet(d)
    d
  }

  test("drained == batch sessionization minus open tails (sf0.001)") {
    val got = drained(inputDir)
    val want = batchTwin(spark.read.parquet(inputDir))
    assert(got.nonEmpty)
    assert(got == want)
  }

  test("session emits iff end + gap <= ms-floored watermark (boundary)") {
    import spark.implicits._
    val maxUs = 1700000000000000L // ms-aligned so the floors are exact
    val wmMs = maxUs / 1000L
    val rows = Seq(
      (1L, 101L, (wmMs - GapMs - 1L) * 1000L), // end+gap = wm-1: emits
      (2L, 102L, (wmMs - GapMs) * 1000L),      // end+gap = wm: boundary
      (3L, 103L, (wmMs - GapMs + 1L) * 1000L), // end+gap = wm+1: open
      (9L, 901L, maxUs))                       // the clock user
    val d = java.nio.file.Files.createTempDirectory("graft_sw_bnd").toString
    rows.toDF("user_id", "event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    val got = drained(d)
    val users = got.map(_.head.asInstanceOf[Long]).toSet
    assert(users.contains(1L), "1 ms below the horizon must emit")
    assert(users.contains(2L),
      "exactly AT the horizon must emit: the eviction is <=")
    assert(!users.contains(3L), "1 ms above the horizon must stay open")
    assert(!users.contains(9L), "the clock user's session stays open")
    assert(got == batchTwin(spark.read.parquet(d)))
  }

  test("multi-batch (event-time-ordered files) == single batch") {
    val src = Readers.table(spark, "/root/testdata/sf0.001", "events")
    val d = java.nio.file.Files.createTempDirectory("graft_sw_mb").toString
    val parts = src.orderBy("ts").collect()
    val n = parts.length
    import scala.jdk.CollectionConverters._
    Seq(0 until n / 3, n / 3 until 2 * n / 3, 2 * n / 3 until n)
      .zipWithIndex.foreach { case (r, i) =>
        spark.createDataFrame(r.map(parts(_)).toList.asJava, src.schema)
          .coalesce(1).write.mode("overwrite").parquet(s"$d/f$i")
        // FileStreamSource orders files by MODIFICATION TIME — pin
        // distinct ascending mtimes so pickup order is deterministic
        val f = new java.io.File(s"$d/f$i").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = java.nio.file.Paths.get(s"$d/part-$i.parquet")
        java.nio.file.Files.move(f.toPath, dst)
        dst.toFile.setLastModified(1700000000000L + i * 60000L)
      }
    Seq("f0", "f1", "f2", "_spark_metadata").foreach { s =>
      val dir = new java.io.File(s"$d/$s")
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    }
    assert(drained(d, Some(1)) == drained(inputDir))
  }

  test("state eviction is measured, not assumed (stateOperators)") {
    // multi-batch run over the event-time-ordered fixture: emitted
    // sessions must LEAVE the store as the watermark passes them —
    // numRowsRemoved > 0 across the run, and the final state holds
    // fewer rows than the total ever added (open tails only). Same
    // metrics discipline JoinStateEvictionSpec applies to the joins.
    val src = Readers.table(spark, "/root/testdata/sf0.001", "events")
    val d = java.nio.file.Files.createTempDirectory("graft_sw_ev").toString
    val parts = src.orderBy("ts").collect()
    val n = parts.length
    import scala.jdk.CollectionConverters._
    Seq(0 until n / 3, n / 3 until 2 * n / 3, 2 * n / 3 until n)
      .zipWithIndex.foreach { case (r, i) =>
        spark.createDataFrame(r.map(parts(_)).toList.asJava, src.schema)
          .coalesce(1).write.mode("overwrite").parquet(s"$d/f$i")
        val f = new java.io.File(s"$d/f$i").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = java.nio.file.Paths.get(s"$d/part-$i.parquet")
        java.nio.file.Files.move(f.toPath, dst)
        dst.toFile.setLastModified(1700000000000L + i * 60000L)
        val sub = new java.io.File(s"$d/f$i")
        sub.listFiles().foreach(_.delete()); sub.delete()
      }
    val (out, progress) = EventStream.sessionWindowDrainedWithProgress(
      spark, d, Some(1))
    assert(out.count() > 0)
    val states = progress.flatMap(_.stateOperators)
    assert(states.nonEmpty, "no stateOperators metrics recorded")
    val removed = states.map(_.numRowsRemoved).sum
    assert(removed > 0,
      s"watermark never evicted session state (removed=$removed)")
    // the emitted sessions must be gone: final state is the open tails
    // only, strictly fewer rows than sessions emitted + retained
    val finalTotal = progress.last.stateOperators.map(_.numRowsTotal).sum
    assert(finalTotal > 0, "open tails must remain in state")
    assert(removed >= out.count(),
      s"every emitted session should have been evicted from the store " +
        s"(removed=$removed, emitted=${out.count()})")
    // PEAK < HORIZON (r13 verdict #5): with mid-run eviction the store
    // must never hold every row ever admitted at once (the single-batch
    // drain's documented worst case). The 100× multi-batch rung
    // measured peak at 6.7% of horizon for this operator.
    val peak = progress.map(_.stateOperators.map(_.numRowsTotal).sum).max
    val horizon = states.map(_.numRowsUpdated).sum
    assert(peak < horizon,
      s"peak state $peak !< horizon $horizon - the advancing watermark " +
        "never bounded the session store")
  }

  test("a late bridging event MERGES two open sessions (MergingSessions)") {
    import spark.implicits._
    val t0 = 1700000000000000L
    def write(dir: String, i: Int, rows: Seq[(Long, Long, Long)]): Unit = {
      rows.toDF("user_id", "event_id", "us")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), lit("view").as("event_type"),
          lit(1.0).as("value"), lit("{}").as("props"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/f$i")
      val f = new java.io.File(s"$dir/f$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(s"$dir/part-$i.parquet")
      java.nio.file.Files.move(f.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
      val sub = new java.io.File(s"$dir/f$i")
      sub.listFiles().foreach(_.delete()); sub.delete()
    }
    val d = java.nio.file.Files.createTempDirectory("graft_sw_mrg").toString
    // batch 1: u7 opens TWO sessions 40 min apart (> gap)
    write(d, 0, Seq((7L, 701L, t0), (7L, 702L, t0 + 40L * 60000000L)))
    // batch 2: the bridge — 20 min after t0, within gap of BOTH; only
    // a 2-hour watermark delay keeps it from being dropped as late
    write(d, 1, Seq((7L, 703L, t0 + 20L * 60000000L)))
    // batch 3: a far-future clock event closes u7's merged session
    write(d, 2, Seq((9L, 901L, t0 + 6L * 3600000000L)))
    val got = drained(d, Some(1), delay = "2 hours")
    val u7 = got.filter(_.head == 7L)
    assert(u7 == Seq(Seq(7L, t0, t0 + 40L * 60000000L, 3L)),
      s"expected ONE merged 3-event session for u7, got: $got")
  }
}
