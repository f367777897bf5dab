package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's song-data pipeline (SURVEY.md §3.1; reference
  * etl.py:42-134): songs + artists dimension builders, as pure
  * DataFrame → DataFrame functions (composable, path-free — readers live
  * in graft.sources.Readers).
  *
  * Quirk preservation is deliberate (SURVEY §2.8): input dedup is
  * full-row; `songs` dedups its 5-column projection; `artists` does NOT
  * dedup after projection — one row per source song row.
  */
object SongPipeline {

  /** Full-row input dedup (etl.py:76). */
  def cleanSongData(songData: DataFrame): DataFrame =
    songData.dropDuplicates()

  /** `songs` dim: 5-col projection, deduped (etl.py:91-92). Written
    * partitioned by (year, artist_id) — etl.py:101. */
  def songsTable(songData: DataFrame): DataFrame =
    cleanSongData(songData)
      .select("song_id", "title", "artist_id", "year", "duration")
      .dropDuplicates()

  /** `artists` dim: projection+rename, NO dedup (etl.py:117-119 —
    * SURVEY §2.8.2). */
  def artistsTable(songData: DataFrame): DataFrame =
    cleanSongData(songData).select(
      col("artist_id"),
      col("artist_name").as("name"),
      col("artist_location").as("location"),
      col("artist_longitude").as("longitude"),
      col("artist_latitude").as("latitude"))

  /** Partitioned parquet write used by the reference for `songs`
    * (etl.py:99-102): overwrite, hive layout year/artist_id. The
    * repartition on the layout keys routes each hive dir to ONE task —
    * without it every task holding rows for a combo writes its own
    * file, i.e. up to tasks×dirs tiny files (the classic small-files
    * amplification; at lake scale it is the difference between a
    * listable table and a namenode incident). Output rows and layout
    * are identical — only the file count per dir changes. */
  def writeSongs(songs: DataFrame, outDir: String): Unit =
    songs.repartition(col("year"), col("artist_id"))
      .write.mode("overwrite")
      .partitionBy("year", "artist_id").parquet(outDir)
}
