package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The r11-verdict #2 pin: the drained streaming family must run — and
  * agree with itself — on BOTH state-store providers. The default
  * HDFS-backed provider holds each partition's state in executor
  * memory (fine at test sizes, the scaling wall at real 100 TB state);
  * `RocksDBStateStoreProvider` is the production posture — off-heap
  * local RocksDB per partition, changelog checkpointing. The toggle is
  * `EventStream.StateStoreKey` on the PARENT session; the drain
  * session re-reads it per drain, so one suite can exercise both.
  *
  * Coverage: a mapGroupsWithState drain (custom keyed state), the
  * bucketed stream-stream join (4 state stores per partition), and
  * lateDataDrained — whose TWO sequential AvailableNow runs share one
  * checkpoint, i.e. a real stop-and-restart where run 2 must restore
  * run 1's committed watermark from RocksDB-checkpointed state. */
class StateStoreProviderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withProvider[T](name: String)(body: => T): T = {
    spark.conf.set(EventStream.StateStoreKey, name)
    try body finally spark.conf.unset(EventStream.StateStoreKey)
  }

  test("provider toggle reaches the drain session") {
    withProvider("rocksdb") {
      assert(EventStream.drainSession(spark)
        .conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
    }
    // default restored: hdfs provider after the toggle is unset
    assert(EventStream.drainSession(spark)
      .conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("HDFSBackedStateStoreProvider"))
    withProvider("bogus") {
      intercept[IllegalArgumentException](EventStream.drainSession(spark))
    }
  }

  test("mapGroupsWithState drain: rocksdb == hdfs") {
    val hdfs = EventStream.sessionCountsDrained(spark, s"$sf/events.parquet")
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val rocks = withProvider("rocksdb") {
      EventStream.sessionCountsDrained(spark, s"$sf/events.parquet")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
    }
    assert(rocks.nonEmpty && rocks == hdfs)
  }

  test("bucketed stream-stream join drain: rocksdb == hdfs") {
    val hdfs = EventStream.streamStreamJoinDrained(spark, s"$sf/events.parquet")
      .orderBy("user_id", "signup_id", "purchase_id")
      .collect().map(_.toSeq).toSeq
    val rocks = withProvider("rocksdb") {
      EventStream.streamStreamJoinDrained(spark, s"$sf/events.parquet")
        .orderBy("user_id", "signup_id", "purchase_id")
        .collect().map(_.toSeq).toSeq
    }
    assert(rocks.nonEmpty && rocks == hdfs)
  }

  test("transformWithState drain equals batch aggregation") {
    import org.apache.spark.sql.functions._
    val got = EventStream.userStatsDrained(spark, s"$sf/events.parquet")
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val want = graft.sources.Readers.table(spark, sf, "events")
      .groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("event_type")).as("n_event_types"),
        min(unix_micros(col("ts"))).as("first_ts_us"),
        max(unix_micros(col("ts"))).as("last_ts_us"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("transformWithState state carries across REAL micro-batches") {
    import org.apache.spark.sql.SaveMode
    // 3 landing files + maxFilesPerTrigger=1 → AvailableNow runs 3
    // micro-batches; ValueState and the MapState distinct-set must
    // restore per batch and the monotone fold must land on the same
    // final answer as the single-batch drain
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tws_multi").toString
    graft.sources.Readers.table(spark, sf, "events")
      .repartition(3)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events")
    val multi =
      EventStream.userStatsDrained(spark, s"$dir/events", Some(1))
        .orderBy("user_id").collect().map(_.toSeq).toSeq
    val single = EventStream.userStatsDrained(spark, s"$sf/events.parquet")
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(multi.nonEmpty && multi == single)
  }

  test("checkpoint restart (late-data two-run drain) on rocksdb == hdfs") {
    val hdfs = EventStream.lateDataDrained(spark, sf)
      .orderBy("window_start_s", "event_type")
      .collect().map(_.toSeq).toSeq
    val rocks = withProvider("rocksdb") {
      EventStream.lateDataDrained(spark, sf)
        .orderBy("window_start_s", "event_type")
        .collect().map(_.toSeq).toSeq
    }
    assert(rocks.nonEmpty && rocks == hdfs)
  }

  test("rocksdb CHANGELOG checkpointing: restart drain still exact") {
    // the 100 TB checkpoint posture: per-batch changelogs instead of
    // full snapshot uploads (snapshots go async/periodic). The restart
    // in lateDataDrained forces run 2 to RESTORE from a checkpoint
    // written under changelog mode — replaying changelog onto snapshot
    // — so an incomplete changelog would corrupt the windowed counts.
    val baseline = EventStream.lateDataDrained(spark, sf)
      .orderBy("window_start_s", "event_type")
      .collect().map(_.toSeq).toSeq
    val key = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val ds = EventStream.drainSession(spark)
    ds.conf.set(key, "true")
    try {
      val changelog = withProvider("rocksdb") {
        EventStream.lateDataDrained(spark, sf)
          .orderBy("window_start_s", "event_type")
          .collect().map(_.toSeq).toSeq
      }
      assert(changelog.nonEmpty && changelog == baseline)
    } finally ds.conf.unset(key)
  }

  test("value-state TTL expires idle state across a restart") {
    // TTL is the no-timer state bound: an idle key's state is simply
    // gone after the duration. Two sequential runs share a checkpoint
    // (the lateData restart pattern); run 2 starts well past the 1 ms
    // TTL, so the TTL'd counter must read as EMPTY (prev == 0) while
    // the control run without TTL restores run 1's count — proving the
    // expiry is the TTL, not a restart artifact.
    //
    // Trigger.Once, NOT AvailableNow: TTL requires
    // TimeMode.ProcessingTime, and in that mode the operator reports
    // shouldRunAnotherBatch on every processing-time advance — i.e.
    // always — so AvailableNow's multi-batch executor loops no-data
    // batches indefinitely (observed: thousands of stages before the
    // kill). The single-batch trigger is the deterministic way to
    // drive a processing-time-mode query to a stop; this sharp edge
    // is also why every production drain here uses TimeMode.None or
    // EventTime.
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.functions.{col, unix_micros}
    def run(ttl: Boolean): Seq[Seq[Any]] = {
      val ds = EventStream.rocksDrainSession(spark)
      import ds.implicits._
      val land = java.nio.file.Files
        .createTempDirectory(s"graft_ttl_land_$ttl").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_ttl_ck_$ttl").toString
      val events = graft.sources.Readers.table(spark, sf, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tsMicros"))
      def drainOnce(tag: String): Seq[Seq[Any]] = {
        val src = ds.readStream.schema(events.schema).parquet(land)
          .as[EventStream.TypedUserEvent]
          .groupByKey(_.user_id)
          .transformWithState(new TtlCountProcessor(ttl),
            org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
            org.apache.spark.sql.streaming.OutputMode.Update())
        // foreachBatch, not the memory sink: run 2 RECOVERS from run
        // 1's checkpoint, which the memory sink refuses ("does not
        // support recovering from checkpoint location")
        val rows = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
        val q = src.toDF().writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            rows.synchronized { rows ++= df.collect().map(_.toSeq) }; ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.Once()).start() // see the header comment
        q.awaitTermination()
        rows.sortBy(_.head.asInstanceOf[Long]).toSeq
      }
      events.filter(col("event_id") % 2 === 0)
        .write.mode("overwrite").parquet(land)
      drainOnce("r1")
      Thread.sleep(200) // >> the 1 ms TTL
      events.filter(col("event_id") % 2 =!= 0)
        .coalesce(1).write.mode("append").parquet(land)
      drainOnce("r2")
    }
    val ttlRun = run(ttl = true)
    assert(ttlRun.nonEmpty && ttlRun.forall(_(1) == 0L),
      "TTL'd state must read empty on the post-TTL restart")
    val control = run(ttl = false)
    assert(control.exists(r => r(1).asInstanceOf[Long] > 0L),
      "control without TTL must restore run 1's counts - else the " +
        "TTL run proves nothing")
  }
}

/** Per-user counter whose ValueState carries a 1 ms TTL (or none, for
  * the control): emits (user_id, prev_count, batch_count) so the test
  * can see exactly what state survived into this run. */
class TtlCountProcessor(ttl: Boolean)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, EventStream.TypedUserEvent, (Long, Long, Long)] {
  import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, TimerValues, ValueState}
  import org.apache.spark.sql.{Encoders => E}
  @transient private var n: ValueState[Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: TimeMode): Unit = {
    val cfg =
      if (ttl) TTLConfig(java.time.Duration.ofMillis(1)) else TTLConfig.NONE
    n = getHandle.getValueState[Long]("n", E.scalaLong, cfg)
  }

  override def handleInputRows(key: Long,
      rows: Iterator[EventStream.TypedUserEvent],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val prev = if (n.exists()) n.get() else 0L
    val batch = rows.size.toLong
    n.update(prev + batch)
    Iterator.single((key, prev, batch))
  }
}
