package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Sparkify-shaped JSON inputs at BENCH scale, synthesized once per
  * sfDir (TempDirs cache) from the events table — the composed-job bench
  * row (`etl_sparkify_full`) needs reference-shaped song/log JSON big
  * enough for the §3.2 shared-prefix-persist claim to be measurable,
  * and the golden test fixtures (SparkifyFixtures) are 7 rows by design.
  *
  * Every NextSong row two-key-matches exactly one catalog row by
  * construction: log rows carry (song_(e%500), artist_(e%100)) and the
  * 500-row catalog pairs song_s with artist_(s%100); since 500 is a
  * multiple of 100, (e%500)%100 = e%100. `view` events map to the Home
  * page (filtered by the pipeline, preserving the reference's
  * page-selectivity shape); length always equals duration so any
  * length-based join variant matches too.
  */
object SparkifyBenchInput {

  /** Returns (songDataPath, logDataPath); builds them on first call per
    * sfDir, cached for the JVM's lifetime after. */
  def prepare(spark: SparkSession, sfDir: String): (String, String) = {
    val root = graft.TempDirs.cachedDir("graft_sparkify_in", sfDir) { out =>
      val ev = graft.sources.Readers.table(spark, sfDir, "events")
      val log = ev.select(
        concat(lit("artist_"), pmod(col("event_id"), lit(100L))).as("artist"),
        lit("Logged In").as("auth"),
        concat(lit("fn_"), col("user_id")).as("firstName"),
        when(col("user_id") % 2 === 0, "F").otherwise("M").as("gender"),
        (col("event_id") % 20L).as("itemInSession"),
        concat(lit("ln_"), col("user_id")).as("lastName"),
        lit(200.0).as("length"),
        when(col("value") > 50.0, "paid").otherwise("free").as("level"),
        lit("Testville").as("location"),
        lit("PUT").as("method"),
        when(col("event_type") === "view", lit("Home"))
          .otherwise(lit("NextSong")).as("page"),
        lit(1.54e12).as("registration"),
        expr("event_id div 20").as("sessionId"),
        concat(lit("song_"), pmod(col("event_id"), lit(500L))).as("song"),
        lit(200).as("status"),
        unix_millis(col("ts")).as("ts"),
        lit("ua").as("userAgent"),
        col("user_id").cast("string").as("userId"))
      log.write.mode("overwrite").json(s"$out/log-data")
      val songs = spark.range(500).select(
        concat(lit("AR_"), pmod(col("id"), lit(100L))).as("artist_id"),
        lit(null).cast(DoubleType).as("artist_latitude"),
        lit("").as("artist_location"),
        lit(null).cast(DoubleType).as("artist_longitude"),
        concat(lit("artist_"), pmod(col("id"), lit(100L))).as("artist_name"),
        lit(200.0).as("duration"),
        lit(1L).as("num_songs"),
        concat(lit("SO_"), col("id")).as("song_id"),
        concat(lit("song_"), col("id")).as("title"),
        (lit(1990L) + col("id") % 30L).as("year"))
      songs.coalesce(1).write.mode("overwrite").json(s"$out/song-data")
    }
    (s"$root/song-data", s"$root/log-data")
  }
}
