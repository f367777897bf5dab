package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Readers

/** TIMER-STATE migration pins ([[EventStream.sessionTimeoutMigratedDrained]]):
  * the session processor's 4 → 8 state-partition rebuild must carry
  * each open session's ValueState AND re-register its pending
  * event-time timer. The oracle row (`stream_session_migration`)
  * checks the values; this spec pins the structure —
  *
  *   (a) run-1 ∪ run-2 rows == unbroken batch sessionization on
  *       (user, start, end, n_events) (closed_by is split-dependent
  *       at the boundary by construction: a gap that elapses within
  *       the historic horizon closes by timer there but by the next
  *       event in an unbroken run — same bounds either way);
  *   (b) the new checkpoint physically carries 8 state partitions;
  *   (c) POWER: sessions actually STRADDLE the cut (start ≤ cut < end),
  *       and at least one migrated session closes BY TIMER in run 2 —
  *       the row a dropped-timer bug would silently delete.
  */
class SessionMigrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val GapUs = EventStream.SessionGapMicros

  // time-split at the event-time midpoint; assert the corpus has no
  // cross-cut pair inside the 1 ms timer-floor ambiguity window (the
  // registry fixture nudges instead — here a loud failure is better,
  // it means the driver corpus changed shape)
  lazy val fixture: (String, String, String, Long) = {
    val events = Readers.table(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val b = events.agg(min(unix_micros(col("ts"))),
      max(unix_micros(col("ts")))).head()
    val target = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    // the cut must land INSIDE some session or the migration carries
    // nothing in flight: take the same-user consecutive pair with
    // gap <= Gap - 1 ms (safely outside the timer-floor ambiguity for
    // THIS pair) whose midpoint is nearest the corpus time midpoint
    val cut = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("prev_us", lag("us", 1).over(w))
      .filter(col("prev_us").isNotNull &&
        col("us") - col("prev_us") > 0L &&
        col("us") - col("prev_us") <= GapUs - 1000L)
      .select(((col("prev_us") + col("us")) / 2).cast("long").as("mid"))
      .withColumn("d", abs(col("mid") - target))
      .orderBy("d").limit(1).head().getLong(0)
    val ambiguous = events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("prev_us", lag("us", 1).over(w))
      .filter(col("prev_us").isNotNull &&
        col("prev_us") <= cut && col("us") > cut &&
        col("us") - col("prev_us") > GapUs - 1000L &&
        col("us") - col("prev_us") <= GapUs)
      .count()
    assert(ambiguous == 0L,
      "sf0.001 has a cross-cut gap inside the 1 ms timer-floor window")
    // plant ONE synthetic user with an open session ending just before
    // the cut and NO live events: its timer (end + gap) expires after
    // the historic watermark but before the corpus max, so the session
    // can ONLY close via the timer re-registered by handleInitialState
    // - the row a dropped-timer bug deletes. sf0.001's organic users
    // all have post-cut events, which re-register timers on arrival
    // and so cannot witness that bug.
    val fullMaxUs = b.getLong(1)
    assert(fullMaxUs >= cut + GapUs + 60000000L,
      "corpus too short to host the planted open tail")
    val planted = {
      val sq = spark; import sq.implicits._
      Seq(
        (900000001L, cut - 300000000L, 9999999L, "view", 1.0, "{}"),
        (900000002L, cut - 60000000L, 9999999L, "view", 1.0, "{}"))
        .toDF("event_id", "us", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    }
    val augmented = events.unionByName(planted)
    val base = java.nio.file.Files
      .createTempDirectory("graft_sess_migr_spec").toString
    augmented.filter(unix_micros(col("ts")) <= cut)
      .write.mode("overwrite").parquet(s"$base/historic")
    augmented.filter(unix_micros(col("ts")) > cut)
      .write.mode("overwrite").parquet(s"$base/live")
    augmented.write.mode("overwrite").parquet(s"$base/full")
    val ds = EventStream.rocksDrainSession(spark)
    import ds.implicits._
    val out = EventStream.eventsStream(ds, s"$base/historic")
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[EventStream.TypedUserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new EventStream.SessionTimeoutProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
    val q = out.toDF().writeStream.outputMode(OutputMode.Append())
      .format("parquet").option("path", s"$base/run1")
      .option("checkpointLocation", s"$base/oldCkpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (base, s"$base/oldCkpt", s"$base/live", cut)
  }

  private def statePartitionCount(ckpt: String): Int =
    new java.io.File(s"$ckpt/state/0").listFiles()
      .count(f => f.isDirectory && f.getName.forall(_.isDigit))

  test("timer-state 4 -> 8 rebuild: split == unbroken, 8 partitions") {
    val (base, oldCkpt, liveDir, cut) = fixture
    val schema = org.apache.spark.sql
      .Encoders.product[EventStream.SessionTimeoutRow].schema
    val run1 = spark.read.schema(schema).parquet(s"$base/run1")
    val (run2, newCkpt) =
      EventStream.sessionTimeoutMigratedDrained(spark, oldCkpt, liveDir, 8)
    val union = run1.unionByName(run2)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq

    // unbroken truth: the augmented full corpus, single unbroken drain
    val unbroken = EventStream
      .sessionTimeoutDrained(spark, s"$base/full")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq
    assert(union.nonEmpty && union == unbroken)

    assert(statePartitionCount(oldCkpt) == 4)
    assert(statePartitionCount(newCkpt) == 8,
      "the migrated session checkpoint must carry 8 state partitions")

    // POWER (c1): sessions straddle the cut — the migration moved a
    // session that was genuinely in flight
    assert(union.exists(r => r(1).asInstanceOf[Long] <= cut &&
      r(2).asInstanceOf[Long] > cut),
      "no session straddles the cut - the migration test is vacuous")

    // POWER (c2): some migrated session (ends before the cut, so its
    // state crossed untouched by any live event) closes BY TIMER in
    // run 2 — this row disappears if handleInitialState drops the
    // timer re-registration
    val run2Rows = run2.collect().map(_.toSeq).toSeq
    assert(run2Rows.exists(r => r(2).asInstanceOf[Long] <= cut &&
      r(4) == "timer"),
      "no pre-cut session timer-closed in run 2 - a dropped timer " +
        "would be invisible to this corpus")
  }

  test("power: without the bootstrap the live half alone differs") {
    val (base, _, liveDir, _) = fixture
    val schema = org.apache.spark.sql
      .Encoders.product[EventStream.SessionTimeoutRow].schema
    val run1 = spark.read.schema(schema).parquet(s"$base/run1")
    val plain = EventStream.sessionTimeoutDrained(spark, liveDir)
    val union = run1.unionByName(plain)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq
    val unbroken = EventStream
      .sessionTimeoutDrained(spark, s"$base/full")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .orderBy("user_id", "session_start_us")
      .collect().map(_.toSeq).toSeq
    assert(union != unbroken,
      "live half alone already matches - the corpus cannot distinguish " +
        "a working bootstrap from an ignored one")
  }
}
