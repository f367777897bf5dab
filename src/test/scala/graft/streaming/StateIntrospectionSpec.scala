package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Readers

/** Spark's state data source (`format("statestore")`) over
  * transformWithState checkpoints — the OPERATIONAL surface for 100 TB
  * state: inspect what a production job has accumulated (per-key
  * ValueState, MapState entries, registered timers) as a DataFrame,
  * without stopping the job or instrumenting the processor. At real
  * state sizes this is how state is audited, backfilled-from, and
  * debugged; the checkpoint is the contract, so every read-back here
  * must equal the BATCH-computed truth exactly:
  *
  *  - `stateVarName=totals` (ValueState) == per-user count/min/max;
  *  - `stateVarName=seen_types` (MapState) == the distinct
  *    (user, event_type) pairs, one row per map ENTRY;
  *  - `readRegisteredTimers` on the session-timeout checkpoint == the
  *    still-open tails' timers (fired timers are swept with the state
  *    they closed — their users must NOT appear).
  */
class StateIntrospectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rocksDrainSession(): SparkSession =
    EventStream.rocksDrainSession(spark)

  private def typedEvents(ds: SparkSession, src: DataFrame) = {
    import ds.implicits._
    src.select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tsMicros"))
      .as[EventStream.TypedUserEvent]
  }

  /** Drain `processor` over sf0.001 events with a PERSISTENT checkpoint
    * (the drain helpers use temp checkpoints; introspection needs the
    * path) and return that checkpoint dir. */
  private def drainWithCheckpoint(name: String,
      build: SparkSession => DataFrame): String = {
    val ds = rocksDrainSession()
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft_state_ck_$name").toString
    val q = build(ds).writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(s"graft_state_introspect_$name")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ckpt
  }

  lazy val statsCkpt: String = drainWithCheckpoint("stats", { ds =>
    import ds.implicits._
    typedEvents(ds, EventStream.eventsStream(ds, s"$sf/events.parquet"))
      .groupByKey(_.user_id)
      .transformWithState(new EventStream.UserStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      .toDF()
  })

  test("ValueState read-back == batch per-user aggregate") {
    val got = spark.read.format("statestore").option("path", statsCkpt)
      .option("stateVarName", "totals").load()
      .select(col("key.value").as("user_id"),
        col("value.nEvents").as("n"), col("value.firstUs").as("f"),
        col("value.lastUs").as("l"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val want = Readers.table(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), min(unix_micros(col("ts"))).as("f"),
        max(unix_micros(col("ts"))).as("l"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("MapState read-back == batch distinct (user, event_type) pairs") {
    val got = spark.read.format("statestore").option("path", statsCkpt)
      .option("stateVarName", "seen_types").load()
      .select(col("key.value").as("user_id"),
        col("user_map_key.value").as("event_type"),
        col("user_map_value.value").as("seen"))
      .collect().map(_.toSeq).toSeq
    assert(got.forall(_.last == true))
    val want = Readers.table(spark, sf, "events")
      .select("user_id", "event_type").distinct()
      .collect().map(r => Seq(r.get(0), r.get(1), true)).toSeq
    assert(got.toSet == want.toSet && got.size == want.size)
  }

  test("registered-timer read-back == still-open session tails") {
    val ckpt = drainWithCheckpoint("sess", { ds =>
      import ds.implicits._
      typedEvents(ds,
        EventStream.eventsStream(ds, s"$sf/events.parquet")
          .withWatermark("ts", "0 seconds"))
        .groupByKey(_.user_id)
        .transformWithState(new EventStream.SessionTimeoutProcessor,
          org.apache.spark.sql.streaming.TimeMode.EventTime(),
          OutputMode.Append())
        .toDF()
    })
    val timers = spark.read.format("statestore").option("path", ckpt)
      .option("readRegisteredTimers", "true").load()
    val got = timers
      .select(col("key.value").as("user_id"),
        col("expiration_timestamp_ms").as("expiry_ms"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    // batch truth: per-user last event; open tail iff its timer is
    // ABOVE the final watermark (the non-strict <= sweep fired the rest)
    val gapMs = EventStream.SessionGapMicros / 1000L
    val lastByUser = Readers.table(spark, sf, "events")
      .groupBy("user_id").agg(max(unix_micros(col("ts"))).as("last_us"))
    val wmMs = Readers.table(spark, sf, "events")
      .agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000L
    val want = lastByUser
      .select(col("user_id"),
        (expr("last_us DIV 1000") + gapMs).as("expiry_ms"))
      .filter(col("expiry_ms") > wmMs)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty, "no open tails on this corpus — test has no power")
    assert(got == want)
  }
}
