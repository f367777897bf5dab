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
}
