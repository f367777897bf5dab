package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
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

  /** Custom keyed state via mapGroupsWithState over any streaming
    * events frame (ts must be TimestampType): per-user running event
    * and gap-session (30 min) counts — the stateful-operator surface
    * (KeyValueGroupedDataset) the 100 TB streaming path needs. Update
    * mode; state is O(1) per user. */
  def sessionCountsFrom(events: DataFrame)(
      implicit spark: SparkSession): Dataset[UserSessionCount] = {
    import spark.implicits._
    events
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

  def sessionCounts(spark: SparkSession, inputDir: String)
      : Dataset[UserSessionCount] =
    sessionCountsFrom(
      spark.readStream.schema(eventSchema).parquet(inputDir))(spark)

  /** Drained stream-STATIC enrichment join (the standard streaming
    * pattern the others don't cover: an unbounded stream joined to a
    * bounded dimension): events ⋈ broadcast dim on user_id, then a
    * windowless grouped aggregate, drained with Trigger.AvailableNow.
    * The static side broadcasts once per micro-batch planning — no
    * state grows with the stream except the per-group aggregate. */
  def staticJoinCountsDrained(spark: SparkSession, eventsPath: String,
      dim: DataFrame, dimKey: String, groupCol: String): DataFrame = {
    val ev = eventsStream(spark, eventsPath)
    val agg = ev.join(broadcast(dim), ev("user_id") === dim(dimKey))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_value"))
    drainToTable(spark, agg, "graft_stream_enrich", OutputMode.Complete())
  }

  /** Drained streaming exact dedup: dropDuplicates on `keys` (state =
    * one entry per distinct key — at scale, bound it with
    * `withWatermark` + dropDuplicatesWithinWatermark), run to
    * completion with Trigger.AvailableNow. Emits ONLY the key columns:
    * the distinct key set is deterministic even though which physical
    * row wins the race is not. */
  def dedupDrained(spark: SparkSession, eventsPath: String,
      keys: Seq[String]): DataFrame = {
    val deduped = eventsStream(spark, eventsPath)
      .select(keys.map(col): _*)
      .dropDuplicates(keys)
    drainToTable(spark, deduped, "graft_stream_dedup", OutputMode.Append())
  }

  /** Drained stateful run: sessionCountsFrom over the driver's events
    * table, executed with Trigger.AvailableNow to completion. Update
    * mode re-emits a user's row on every batch that touches it, so the
    * final answer is the per-user MAX over the sink — valid because
    * both counters are monotone non-decreasing. Oracle-checkable: the
    * final state equals the batch lag-gap sessionization. */
  def sessionCountsDrained(spark: SparkSession, eventsPath: String)
      : DataFrame = {
    implicit val sp: SparkSession = spark
    val counts = sessionCountsFrom(eventsStream(spark, eventsPath))
    drainToTable(spark, counts.toDF(), "graft_stream_sessions",
        OutputMode.Update())
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"),
        max(col("n_sessions")).as("n_sessions"))
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

  /** Schema of the driver's events.parquet as the streaming source sees
    * it under the required nanosAsLong session config: `ts` arrives as
    * raw int64 nanoseconds and is rebuilt into a µs TimestampType right
    * after the scan (same floor conversion as Readers.table). */
  val rawEventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-stream over the driver's events table (TIMESTAMP(NANOS)
    * parquet). Declared schema — a streaming source can never afford an
    * inference pass, it would race the arriving files. The streaming
    * file source only monitors DIRECTORIES; when handed a single
    * parquet file (the driver's layout) it is exposed through a
    * symlinked temp directory — a metadata-only operation, no data
    * copy, and exactly how a production stream would point at a
    * landing directory instead of one file. */
  def eventsStream(spark: SparkSession, eventsPath: String): DataFrame = {
    require(
      spark.conf.get(graft.sources.Readers.NanosAsLongKey, "false") == "true",
      s"set ${graft.sources.Readers.NanosAsLongKey}=true in the " +
        "SparkSession builder before streaming the events table")
    val p = java.nio.file.Paths.get(eventsPath)
    val dir =
      if (java.nio.file.Files.isDirectory(p)) eventsPath
      else symlinkDirs.computeIfAbsent(p.toAbsolutePath.toString, { _ =>
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src")
        java.nio.file.Files.createSymbolicLink(
          d.resolve(p.getFileName), p.toAbsolutePath)
        d.toString
      })
    graft.sources.Readers.tsFromNanos(
      spark.readStream.schema(rawEventSchema).parquet(dir))
  }

  /** One symlink dir per source file for the JVM's lifetime — repeated
    * drains (bench passes, test suites) must not litter the temp dir. */
  private val symlinkDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val drainId = new java.util.concurrent.atomic.AtomicLong(0)

  /** Run a streaming frame to a fresh memory-sink table with
    * Trigger.AvailableNow and return it. After the new drain SUCCEEDS,
    * the previous drain's table for the same prefix is dropped: a
    * memory sink holds its whole result on the driver, and by the time
    * drain N completes its sequential caller (bench pass / verify /
    * test suite) has finished consuming table N−1 — without the drop,
    * every pass leaks one full result set. Bookkeeping is updated only
    * on success, so a failed start/drain can neither drop a live table
    * nor record a table that was never created. Same-prefix drains are
    * sequential by contract (each query family drains from one caller
    * at a time). */
  private def drainToTable(spark: SparkSession, df: DataFrame,
      prefix: String, mode: OutputMode): DataFrame = {
    val name = s"${prefix}_${drainId.incrementAndGet()}"
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(name)
    Option(lastDrain.put(prefix, name))
      .filter(_ != name)
      .foreach(spark.catalog.dropTempView(_))
    out
  }
  private val lastDrain =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Oracle-checkable drained run (SURVEY §7.4.4's drained case): the
    * 5-minute tumbling-window aggregate executed as a REAL streaming
    * query — file source → stateful agg → memory sink — with
    * `Trigger.AvailableNow`, which processes everything available in
    * bounded micro-batches and stops. Complete output mode so the final
    * (post-last-watermark) windows are emitted too; the drained result
    * must equal the batch twin row-for-row, which is exactly what the
    * DuckDB oracle checks. Window starts surface as epoch seconds —
    * integer bucket arithmetic both engines share. */
  def windowedCountsDrained(spark: SparkSession, eventsDir: String)
      : DataFrame = {
    val agg = eventsStream(spark, eventsDir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
          .as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start_s"),
        col("event_type"), col("n"), col("sum_value"))
    drainToTable(spark, agg, "graft_stream_windows", OutputMode.Complete())
  }
}
