package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.GraftQuery

/** The composed Sparkify ETL job as an ORACLE-CHECKED query (the one
  * bench row that previously had no CORRECTNESS entry). The Spark side
  * runs the real thing end-to-end — synthesize reference-shaped JSON
  * from the events table (SparkifyBenchInput), run SparkifyJob (all
  * five parquet sinks, shared log prefix persisted once), then read
  * the five SINK DIRECTORIES back and canonicalize every row of every
  * table into one (tbl, rowstr) frame. The oracle replays the entire
  * chain — synthesis, full-row dedup, NextSong filter, time-dim
  * derivation, the two-key song join and the fan-out start_time join —
  * in pure SQL over the same events table, so a drop anywhere in the
  * composed job (a lost partition column, a sink that skipped rows, a
  * dedup that over-collapsed) breaks the hash.
  *
  * Canonical-string rules (SURVEY §5 determinism): integers and strings
  * only — every double in the synthesized corpus is an integral
  * constant, cast to BIGINT before stringification (double formatting
  * is not cross-engine portable); nulls are coalesced to '' explicitly
  * (not left to concat_ws's skip rule); `songplay_id` is excluded
  * (monotonically_increasing_id, non-deterministic by design —
  * SURVEY §2.8.5; its deterministic twin is oracled separately by
  * parity_songplays_star).
  */
object EtlJobQueries {

  /** Canonical '|'-joined row string: longs/strings only, null → ''. */
  private def rowStr(cols: Column*): Column =
    concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(""))): _*)

  private val sparkifyFull = GraftQuery(
    name = "etl_sparkify_full",
    doc = "The reference's whole main() (etl.py:316-334) composed and " +
      "oracle-checked: five sinks written (songs year/artist_id-" +
      "partitioned, time+songplays year/month-partitioned), read back " +
      "from disk, canonicalized to (tbl, rowstr). Proves the §3.2 " +
      "shared-prefix job AND its sinks against a full SQL replay.",
    oracle = Some("""
      WITH log AS (
        SELECT
          'artist_' || (event_id % 100) AS artist,
          'fn_' || user_id AS firstName,
          CASE WHEN user_id % 2 = 0 THEN 'F' ELSE 'M' END AS gender,
          'ln_' || user_id AS lastName,
          CASE WHEN value > 50.0 THEN 'paid' ELSE 'free' END AS level,
          CASE WHEN event_type = 'view' THEN 'Home' ELSE 'NextSong' END
            AS page,
          event_id // 20 AS sessionId,
          'song_' || (event_id % 500) AS song,
          epoch_ms(ts) AS ts,
          CAST(user_id AS VARCHAR) AS userId
        FROM events
      ),
      cleaned AS (SELECT DISTINCT * FROM log WHERE page = 'NextSong'),
      catalog AS (
        SELECT 'AR_' || (i % 100) AS artist_id,
               'artist_' || (i % 100) AS artist_name,
               CAST(1990 + i % 30 AS BIGINT) AS year,
               'SO_' || i AS song_id,
               'song_' || i AS title
        FROM range(500) t(i)
      ),
      timedim AS (
        SELECT DISTINCT
          ts,
          strftime(epoch_ms(ts), '%Y-%m-%d %H:%M:%S') AS start_time,
          hour(epoch_ms(ts)) AS hour,
          dayofmonth(epoch_ms(ts)) AS day,
          weekofyear(epoch_ms(ts)) AS week,
          month(epoch_ms(ts)) AS month,
          year(epoch_ms(ts)) AS year,
          dayofweek(epoch_ms(ts)) + 1 AS weekday
        FROM cleaned
      ),
      songplays AS (
        SELECT strftime(epoch_ms(c.ts), '%Y-%m-%d %H:%M:%S') AS start_time,
               c.userId, c.level, s.song_id, s.artist_id, c.sessionId,
               t.month, t.year
        FROM cleaned c
        JOIN catalog s
          ON s.title = c.song AND s.artist_name = c.artist
        JOIN timedim t
          ON t.start_time = strftime(epoch_ms(c.ts), '%Y-%m-%d %H:%M:%S')
      )
      SELECT tbl, rowstr FROM (
        SELECT 'songs' AS tbl,
               song_id || '|' || title || '|' || artist_id || '|' ||
                 CAST(year AS VARCHAR) || '|200' AS rowstr
        FROM (SELECT DISTINCT song_id, title, artist_id, year FROM catalog)
        UNION ALL
        SELECT 'artists' AS tbl,
               artist_id || '|' || artist_name || '|||' AS rowstr
        FROM catalog
        UNION ALL
        SELECT 'users' AS tbl,
               userId || '|' || firstName || '|' || lastName || '|' ||
                 gender || '|' || level AS rowstr
        FROM cleaned
        UNION ALL
        SELECT 'time' AS tbl,
               CAST(ts AS VARCHAR) || '|' || start_time || '|' ||
                 CAST(hour AS VARCHAR) || '|' || CAST(day AS VARCHAR) ||
                 '|' || CAST(week AS VARCHAR) || '|' ||
                 CAST(month AS VARCHAR) || '|' || CAST(year AS VARCHAR) ||
                 '|' || CAST(weekday AS VARCHAR) AS rowstr
        FROM timedim
        UNION ALL
        SELECT 'songplays' AS tbl,
               start_time || '|' || userId || '|' || level || '|' ||
                 song_id || '|' || artist_id || '|' ||
                 CAST(sessionId AS VARCHAR) || '|Testville|ua|' ||
                 CAST(month AS VARCHAR) || '|' || CAST(year AS VARCHAR)
                 AS rowstr
        FROM songplays
      ) ORDER BY tbl, rowstr"""),
    run = (s, dir) => {
      val (songPath, logPath) =
        graft.etl.SparkifyBenchInput.prepare(s, dir)
      // one JVM-lifetime out dir per sfDir; the job overwrites it on
      // every call, so each bench pass re-pays (and re-measures) all
      // five sinks — only the dir allocation is cached
      val out = graft.TempDirs.cachedDir("graft_sparkify_sink", dir)(_ => ())
      graft.etl.SparkifyJob.run(s, songPath, logPath, Some(out))
      def sink(name: String): DataFrame = s.read.parquet(s"$out/$name")
      val songs = sink("songs").select(lit("songs").as("tbl"),
        rowStr(col("song_id"), col("title"), col("artist_id"),
          col("year"), col("duration").cast(LongType)).as("rowstr"))
      val artists = sink("artists").select(lit("artists").as("tbl"),
        rowStr(col("artist_id"), col("name"), col("location"),
          col("longitude").cast(LongType),
          col("latitude").cast(LongType)).as("rowstr"))
      val users = sink("users").select(lit("users").as("tbl"),
        rowStr(col("userId"), col("firstName"), col("lastName"),
          col("gender"), col("level")).as("rowstr"))
      val time = sink("time").select(lit("time").as("tbl"),
        rowStr(col("ts"), col("start_time"), col("hour"), col("day"),
          col("week"), col("month"), col("year"),
          col("weekday")).as("rowstr"))
      val songplays = sink("songplays").select(lit("songplays").as("tbl"),
        rowStr(col("start_time"), col("userId"), col("level"),
          col("song_id"), col("artist_id"), col("sessionId"),
          col("location"), col("userAgent"), col("month"),
          col("year")).as("rowstr"))
      songs.union(artists).union(users).union(time).union(songplays)
        .orderBy("tbl", "rowstr")
    })

  val all: Seq[GraftQuery] = Seq(sparkifyFull)
}
