package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.{Ids, TimeOps}

/** The reference's log-data pipeline (SURVEY.md §3.2; reference
  * etl.py:136-314): users, time, songplays builders.
  *
  * The two Python UDFs (etl.py:215-220) are native expressions here
  * (TimeOps) — no BatchEvalPython fence, the whole chain stays in
  * whole-stage codegen. Reference quirks preserved: `users` not deduped,
  * `start_time` a second-granularity STRING, the fact-to-time join a
  * string equality that can fan out (SURVEY §2.8.2-3).
  */
object LogPipeline {

  /** Input dedup + the pipeline's only predicate (etl.py:177,186). */
  def nextSongEvents(logData: DataFrame): DataFrame =
    logData.dropDuplicates().filter(col("page") === "NextSong")

  /** `users` dim: 5-col projection, NO dedup — one row per NextSong
    * event; a user who upgraded appears with both levels (etl.py:195-197). */
  def usersTable(logData: DataFrame): DataFrame =
    usersFromCleaned(nextSongEvents(logData))

  /** Variant over an already-cleaned (deduped+filtered) event frame —
    * lets a multi-sink job persist the shared prefix once (SURVEY §3.2). */
  def usersFromCleaned(cleaned: DataFrame): DataFrame =
    cleaned.select("userId", "firstName", "lastName", "gender", "level")

  /** Deterministic keyed-dedup variant (SURVEY §7.2.6): latest level per
    * user by event time — what the reference arguably intended. An
    * ARGMAX aggregate (max over a struct ordered by the event key),
    * not a row_number window: partial-aggregable, so a hot user
    * collapses map-side instead of funneling every row through one
    * task — the lake_latest_per_user scale shape. The struct's
    * (ts, sessionId, itemInSession) prefix orders events; the trailing
    * payload fields only break (impossible-after-dedup) full ties
    * deterministically. */
  def usersLatest(logData: DataFrame): DataFrame =
    nextSongEvents(logData)
      .groupBy("userId")
      .agg(max(struct(col("ts"), col("sessionId"), col("itemInSession"),
        col("firstName"), col("lastName"), col("gender"), col("level")))
        .as("m"))
      .select(col("userId"), col("m.firstName").as("firstName"),
        col("m.lastName").as("lastName"), col("m.gender").as("gender"),
        col("m.level").as("level"))

  /** `time` dim (etl.py:215-236): epoch-millis ts + STRING start_time +
    * six int units, full-row dedup. Written partitioned (year, month). */
  def timeTable(logData: DataFrame): DataFrame =
    timeFromCleaned(nextSongEvents(logData))

  def timeFromCleaned(cleaned: DataFrame): DataFrame = {
    val base = cleaned
      .withColumn("start_time", TimeOps.startTimeString(col("ts")))
      .withColumn("ts_ts", TimeOps.epochMillisToTs(col("ts")))
    TimeOps.timeUnits(col("ts_ts")).foldLeft(base) {
        case (df, (name, c)) => df.withColumn(name, c.cast(IntegerType))
      }
      .select("ts", "start_time", "hour", "day", "week", "month", "year",
        "weekday")
      .dropDuplicates()
  }

  /** `songplays` fact (etl.py:257-297): NextSong events ⋈ song catalog on
    * the two-key (title, artist_name) — the single-key join is wrong, see
    * SURVEY §2.3 J1 — then ⋈ time dim on STRING start_time (fan-out
    * quirk), id from monotonically_increasing_id for reference fidelity
    * (non-deterministic across runs — excluded from oracle comparisons;
    * use songplaysDeterministic for compared output). */
  def songplaysTable(logData: DataFrame, songData: DataFrame,
      time: DataFrame): DataFrame =
    songplaysFromCleaned(nextSongEvents(logData), songData, time)

  def songplaysFromCleaned(cleaned: DataFrame, songData: DataFrame,
      time: DataFrame): DataFrame = {
    val base = songplayBase(cleaned, songData, time)
    base.select(
      monotonically_increasing_id().as("songplay_id") +: factCols: _*)
  }

  /** Deterministic twin: sequential id over (sessionId, itemInSession,
    * ts, song_id) replaces the partition-encoded id (SURVEY §5
    * determinism rule). Assigned with the two-phase partition-offset
    * pattern (graft.ops.Ids) — a global-window row_number would funnel
    * the whole fact through one task, a scale-killer at 100 TB. */
  def songplaysDeterministic(logData: DataFrame, songData: DataFrame,
      time: DataFrame): DataFrame = {
    val keys = Seq(col("sessionId"), col("itemInSession"), col("ts"),
      col("song_id"))
    Ids.orderedId(songplayBase(nextSongEvents(logData), songData, time),
        keys, "songplay_id")
      .select(col("songplay_id") +: factCols: _*)
  }

  private val factCols = Seq("start_time", "userId", "level", "song_id",
    "artist_id", "sessionId", "location", "userAgent", "month", "year")
    .map(col)

  private def songplayBase(cleaned: DataFrame, songData: DataFrame,
      time: DataFrame): DataFrame = {
    val log = cleaned
      .withColumn("start_time", TimeOps.startTimeString(col("ts")))
    // Narrow the catalog to the join keys + carried ids BEFORE the join:
    // avoids the ambiguous `year` (song year vs time-dim year) and keeps
    // the broadcast payload minimal.
    val songs = SongPipeline.cleanSongData(songData)
      .select("song_id", "artist_id", "title", "artist_name")
    // J1: two-key equi inner join (etl.py:267-270). The song catalog is
    // the small side — broadcast it explicitly (at lake scale the event
    // log is orders of magnitude larger than the catalog).
    val joined = log.join(broadcast(songs),
      songs("title") === log("song") &&
        songs("artist_name") === log("artist"), "inner")
    // J2: string-equality join to the (already 8-col-deduped) time dim
    // for month/year (etl.py:282-297). NO re-dedup here: two distinct ts
    // in the same second are distinct time rows with equal start_time, so
    // the join fans out — exactly as the reference computes (§2.8.3).
    val t = time.select(col("start_time").as("t_start_time"), col("month"),
      col("year"))
    joined.join(broadcast(t),
        joined("start_time") === t("t_start_time"), "inner")
      .drop("t_start_time")
  }

  /** Hive-layout sinks (etl.py:236,297). Small-files guard, but NOT a
    * plain hash-repartition on the layout keys: (year, month) has FEW
    * distinct values, so hashing on it collapses the write to
    * dirs-many tasks (measured: the 10× probe's songplays write lost
    * its parallelism). repartitionByRange on (layout keys, finer key)
    * keeps the full partition count — each range partition is
    * contiguous in (year, month), so a dir is written by the handful
    * of partitions covering its range: files-per-dir bounded by the
    * partition count (not tasks×dirs), parallelism intact. */
  def writeTime(time: DataFrame, outDir: String): Unit =
    time.repartitionByRange(col("year"), col("month"), col("ts"))
      .write.mode("overwrite").partitionBy("year", "month").parquet(outDir)

  def writeSongplays(songplays: DataFrame, outDir: String): Unit =
    songplays
      .repartitionByRange(col("year"), col("month"), col("sessionId"),
        col("start_time"))
      .write.mode("overwrite").partitionBy("year", "month")
      .parquet(outDir)
}
