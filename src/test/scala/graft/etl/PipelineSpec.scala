package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Readers

/** Reference-parity semantics on synthesized Sparkify-shaped fixtures
  * (SURVEY.md §5: golden counts, dedup behavior, J1 selectivity, J2
  * fan-out, quirk preservation). */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  lazy val (songPath, logPath) = SparkifyFixtures.write()
  lazy val songData = Readers.songData(spark, songPath)
  lazy val logData = Readers.logData(spark, logPath)

  test("declared schemas survive read (no inference)") {
    assert(songData.schema == Readers.songSchema)
    assert(logData.schema == Readers.logSchema)
    // userId stays a STRING (reference quirk §2.8.7)
    assert(logData.schema("userId").dataType.typeName == "string")
  }

  test("full-row input dedup collapses duplicate files/lines (A1)") {
    assert(songData.count() == 5)                      // 4 + 1 dup file
    assert(SongPipeline.cleanSongData(songData).count() == 4)
    assert(logData.count() == 8)                       // 7 + 1 dup line
    assert(logData.dropDuplicates().count() == 7)
  }

  test("NextSong filter keeps only plays (P5)") {
    assert(LogPipeline.nextSongEvents(logData).count() == 5)
  }

  test("songs table: 5 columns, deduped") {
    val songs = SongPipeline.songsTable(songData)
    assert(songs.columns.toSeq ==
      Seq("song_id", "title", "artist_id", "year", "duration"))
    assert(songs.count() == 4)
  }

  test("artists table: renamed columns, NOT deduped (quirk §2.8.2)") {
    val artists = SongPipeline.artistsTable(songData)
    assert(artists.columns.toSeq ==
      Seq("artist_id", "name", "location", "longitude", "latitude"))
    assert(artists.count() == 4) // one per cleaned song row, dups kept
  }

  test("users table: one row per NextSong event, level change kept") {
    val users = LogPipeline.usersTable(logData)
    assert(users.count() == 5)
    val u13 = users.filter(col("userId") === "13")
      .select("level").distinct().collect().map(_.getString(0)).toSet
    assert(u13 == Set("free", "paid")) // upgraded user appears twice
  }

  test("usersLatest keeps exactly the newest row per user") {
    val latest = LogPipeline.usersLatest(logData)
    assert(latest.count() == 4) // users 10,11,12,13
    assert(latest.filter(col("userId") === "13").select("level")
      .collect().head.getString(0) == "paid")
  }

  test("time table: golden derivation row (notebook cell 41 semantics)") {
    val t = LogPipeline.timeTable(logData)
    assert(t.columns.toSeq == Seq("ts", "start_time", "hour", "day",
      "week", "month", "year", "weekday"))
    val row = t.filter(col("ts") === SparkifyFixtures.GoldenTs).collect().head
    assert(row.getString(1) == "2018-11-20 16:02:50") // STRING start_time
    assert(row.getInt(2) == 16 && row.getInt(3) == 20 &&
      row.getInt(4) == 47 && row.getInt(5) == 11 &&
      row.getInt(6) == 2018 && row.getInt(7) == 3) // weekday 1=Sunday
  }

  test("time table keeps two rows for same-second distinct ts") {
    val t = LogPipeline.timeTable(logData)
    assert(t.filter(col("start_time") === "2018-11-21 07:20:07")
      .count() == 2)
  }

  test("J1 two-key join resolves same-title songs correctly") {
    val sp = LogPipeline.songplaysDeterministic(logData, songData,
      LogPipeline.timeTable(logData))
    val bySong = sp.groupBy("song_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySong("SOGRAFT0000000001") == 1) // Nova Ray's Blue Sky
    assert(bySong("SOGRAFT0000000002") == 1) // Echo Fields' Blue Sky
    // title-only join would be ambiguous: 2 matches per Blue Sky event
    val titleOnly = LogPipeline.nextSongEvents(logData)
      .join(SongPipeline.cleanSongData(songData),
        col("title") === col("song"), "inner")
    assert(titleOnly.filter(col("song") === "Blue Sky").count() == 4)
  }

  test("J2 string-equality join fans out on same-second rows (§2.8.3)") {
    val sp = LogPipeline.songplaysDeterministic(logData, songData,
      LogPipeline.timeTable(logData))
    // 2 fan-out events × 2 time rows + 2 singleton matches = 6
    assert(sp.count() == 6)
    assert(sp.filter(col("song_id") === "SOGRAFT0000000004").count() == 4)
  }

  test("songplays schema and id determinism") {
    val t = LogPipeline.timeTable(logData)
    val sp = LogPipeline.songplaysDeterministic(logData, songData, t)
    assert(sp.columns.toSeq == Seq("songplay_id", "start_time", "userId",
      "level", "song_id", "artist_id", "sessionId", "location",
      "userAgent", "month", "year"))
    val ids = sp.select("songplay_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (1L to 6L)) // contiguous, deterministic
    // reference-fidelity variant: unique but non-contiguous ids
    val ref = LogPipeline.songplaysTable(logData, songData, t)
    val refIds = ref.select("songplay_id").collect().map(_.getLong(0))
    assert(refIds.distinct.length == refIds.length)
  }

  test("SparkifyJob builds and writes all five tables with persist") {
    val out = java.nio.file.Files.createTempDirectory("graft_full").toString
    val res = SparkifyJob.run(spark, songPath, logPath, Some(out))
    assert(res.songs.count() == 4 && res.artists.count() == 4)
    assert(res.users.count() == 5 && res.time.count() == 5)
    assert(res.songplays.count() == 6)
    Seq("songs", "artists", "users", "time", "songplays").foreach { t =>
      assert(spark.read.parquet(s"$out/$t").count() > 0, s"$t empty")
    }
    // the partitioned fact lost no columns to the layout
    assert(spark.read.parquet(s"$out/songplays").columns.toSet
      .contains("songplay_id"))
  }

  test("partitioned writes round-trip (S6)") {
    val out = java.nio.file.Files.createTempDirectory("graft_songs").toString
    SongPipeline.writeSongs(SongPipeline.songsTable(songData), out)
    val back = spark.read.parquet(out)
    assert(back.count() == 4)
    // partition columns moved to directory layout and back (§1.3)
    assert(back.columns.toSet ==
      Set("song_id", "title", "duration", "year", "artist_id"))
  }
}
