package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Readers

/** Pins [[EventStream.SessionTimeoutProcessor]] — the event-time-timer
  * session closer — against pure batch arithmetic:
  *
  *  - drained output == batch sessionization minus still-open tails,
  *    where "open" is the documented fire rule
  *    `floor(last_us/1000) + gapMs <= floor(global_max_us/1000)`
  *    (NON-strict — observed empirically on Spark 4.1: a timer exactly
  *    AT the final watermark fires);
  *  - the boundary itself is pinned on a crafted fixture whose
  *    sessions end exactly AT, 1 ms BEFORE, and 1 ms AFTER the final
  *    watermark — if Spark's timer sweep ever became strict
  *    `expiry < watermark`, the AT-boundary user would flip from
  *    fired to open and this suite (and the DuckDB oracle, which
  *    replays the same non-strict rule) would catch it;
  *  - a real multi-batch run (maxFilesPerTrigger=1, files split along
  *    event time) equals the single-batch drain — cross-batch session
  *    continuation, timer re-registration, and timer-close all live.
  */
class SessionTimeoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val GapUs = EventStream.SessionGapMicros
  private val GapMs = GapUs / 1000L

  /** Batch twin of the drained operator (same strict fire rule). */
  private def batchTwin(events: DataFrame): Seq[Seq[Any]] = {
    val e = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val maxMs = e.agg(max(col("us"))).head().getLong(0) / 1000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val sessions = e
      .withColumn("new_s",
        when(col("us") - lag("us", 1).over(w) > GapUs or
          lag("us", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("us").as("session_start_us"), max("us").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("sid").desc)))
      .filter(col("rn") > 1 or
        (expr("session_end_us DIV 1000") + GapMs <= maxMs))
      .select(col("user_id"), col("session_start_us"),
        col("session_end_us"), col("n_events"),
        when(col("rn") > 1, "event").otherwise("timer").as("closed_by"))
    sessions.orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq
  }

  private def drained(dir: String, mfpt: Option[Int] = None): Seq[Seq[Any]] =
    EventStream.sessionTimeoutDrained(spark, dir, mfpt)
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq

  lazy val inputDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_sess_to").toString
    Readers.table(spark, "/root/testdata/sf0.001", "events")
      .coalesce(1).write.mode("overwrite").parquet(d)
    d
  }

  test("drained == batch sessionization minus open tails (sf0.001)") {
    val got = drained(inputDir)
    val want = batchTwin(spark.read.parquet(inputDir))
    assert(got.nonEmpty)
    assert(got.count(_.last == "timer") > 0,
      "no timer-closed sessions — the timer path never ran")
    assert(got.count(_.last == "event") > 0)
    assert(got == want)
  }

  /** µs-exact fixture around the final-watermark boundary. Global max
    * event is u9's at maxUs. For a single-event user with event at t,
    * the timer sits at floor(t/1000)+GapMs and the final watermark at
    * floor(maxUs/1000): u1 one full ms below (must fire), u2 exactly
    * AT the boundary (non-strict <= ⇒ MUST fire), u3 one ms above
    * (must not fire). u4's two events are gap-separated, so its first
    * session must close by EVENT; its second ends at maxUs-GapUs, i.e.
    * its timer is also exactly at the watermark and must fire. */
  test("timer fires iff expiry <= watermark, non-strict (boundary pin)") {
    import spark.implicits._
    val maxUs = 1700000000000000L // µs, ms-aligned so the floors are exact
    val wmMs = maxUs / 1000L
    val rows = Seq(
      (1L, 101L, (wmMs - GapMs - 1L) * 1000L), // timer = wmMs-1 < wmMs
      (2L, 102L, (wmMs - GapMs) * 1000L),      // timer = wmMs, boundary
      (3L, 103L, (wmMs - GapMs + 1L) * 1000L), // timer = wmMs+1 > wmMs
      (4L, 104L, maxUs - 2L * GapUs - 1000000L), // closed by u4's next event
      (4L, 105L, maxUs - GapUs),
      (9L, 901L, maxUs))
    val d = java.nio.file.Files.createTempDirectory("graft_sess_bnd").toString
    rows.toDF("user_id", "event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    val got = drained(d)
    val byUser = got.groupBy(_.head.asInstanceOf[Long])
    assert(byUser.get(1L).exists(_.exists(_.last == "timer")),
      "u1 (1 ms below watermark) must be timer-closed")
    assert(byUser.get(2L).exists(_.exists(_.last == "timer")),
      "u2 (timer exactly AT watermark) must fire: the sweep is <=")
    assert(!byUser.contains(3L))
    assert(byUser(4L).map(_.last) == Seq("event", "timer"),
      "u4: first session closes by next event, second by boundary timer")
    assert(!byUser.contains(9L), "the clock user's own session stays open")
    assert(got == batchTwin(spark.read.parquet(d)),
      "crafted fixture must also agree with the batch twin")
  }

  test("multi-batch (event-time-ordered files) == single batch") {
    // split sf0.001 events into 3 files along event time so batches
    // arrive in event-time order (the documented cross-batch contract)
    val src = Readers.table(spark, "/root/testdata/sf0.001", "events")
    val d = java.nio.file.Files.createTempDirectory("graft_sess_mb").toString
    val parts = src.orderBy("ts").collect()
    val n = parts.length
    import scala.jdk.CollectionConverters._
    Seq(0 until n / 3, n / 3 until 2 * n / 3, 2 * n / 3 until n)
      .zipWithIndex.foreach { case (r, i) =>
        spark.createDataFrame(
          r.map(parts(_)).toList.asJava, src.schema)
          .coalesce(1).write.mode("overwrite").parquet(s"$d/f$i")
        // one file per trigger. FileStreamSource orders files by
        // MODIFICATION TIME (not name), so pin distinct ascending
        // mtimes explicitly — event-time pickup order must not depend
        // on how fast the three writes above happened to land.
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
    val multi = drained(d, Some(1))
    val single = drained(inputDir)
    // closed_by is batch-split-dependent for NON-last sessions: a >gap
    // pause that straddles a batch boundary can expire the timer in a
    // batch BEFORE the one carrying the next event ("timer" multi-batch
    // vs "event" single-batch) — same session bounds either way. So the
    // session identity (user, start, end, n_events) must match exactly
    // for ALL rows, and closed_by only for each user's LAST session
    // (which has no later event by definition, so its label can't
    // depend on where the batch boundaries fell).
    assert(multi.map(_.dropRight(1)) == single.map(_.dropRight(1)))
    def lastPerUser(rows: Seq[Seq[Any]]): Map[Any, Any] =
      rows.groupBy(_.head).map { case (u, ss) =>
        u -> ss.maxBy(_(1).asInstanceOf[Long]).last
      }
    assert(lastPerUser(multi) == lastPerUser(single))
  }
}
