package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twin of the batch event analytics (SURVEY.md
  * §2.6: the reference is batch-only; this is the §7 extension).
  *
  * Correctness scope per SURVEY §7.4.4: there is no DuckDB oracle for
  * streaming, so these are demo/throughput surfaces proven by ScalaTest
  * equivalence against the batch formulation (windowedCountsBatch) on the
  * same input — the streaming and batch plans must agree row-for-row once
  * the stream is fully drained.
  */
object EventStream {

  /** Micro-batch-friendly schema: ts already µs-precision timestamp
    * (produced by Readers.table or the test fixture writer). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window aggregate over a parquet directory
    * stream. Append mode: windows emit once the watermark passes —
    * bounded state, the only formulation that survives an unbounded
    * stream at scale. */
  def windowedCounts(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(inputDir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Batch twin used by tests to check the drained stream. */
  def windowedCountsBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  case class UserEvent(user_id: Long, event_id: Long, tsMicros: Long)
  case class UserSessionState(nEvents: Long, lastTsMicros: Long, nSessions: Long)
  case class UserSessionCount(user_id: Long, n_events: Long, n_sessions: Long)

  /** Custom keyed state via mapGroupsWithState: per-user running event
    * and gap-session (30 min) counts — the stateful-operator surface
    * (KeyValueGroupedDataset) the 100 TB streaming path needs. Update
    * mode; state is O(1) per user. */
  def sessionCounts(spark: SparkSession, inputDir: String)
      : Dataset[UserSessionCount] = {
    import spark.implicits._
    spark.readStream.schema(eventSchema).parquet(inputDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tsMicros"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, events: Iterator[UserEvent],
         state: GroupState[UserSessionState]) =>
          val sorted = events.toSeq.sortBy(e => (e.tsMicros, e.event_id))
          var st = state.getOption.getOrElse(UserSessionState(0L, Long.MinValue, 0L))
          sorted.foreach { e =>
            val newSession = st.lastTsMicros == Long.MinValue ||
              e.tsMicros - st.lastTsMicros > 1800000000L
            st = UserSessionState(st.nEvents + 1, e.tsMicros,
              st.nSessions + (if (newSession) 1 else 0))
          }
          state.update(st)
          UserSessionCount(uid, st.nEvents, st.nSessions)
      }
  }

  /** Drain helper for tests/demos: run a streaming DF to a memory sink
    * until all available input is processed, return the materialized
    * table. */
  def drainToMemory(spark: SparkSession, streaming: DataFrame,
      name: String, outputMode: OutputMode): DataFrame = {
    val q = streaming.writeStream.outputMode(outputMode)
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
