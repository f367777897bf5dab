package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Schema'd, path-injectable readers (SURVEY.md §2.1 S1-S5, S8).
  *
  * Every query in the engine takes `(SparkSession, sfDir)` and reads via
  * these helpers, so the same plan runs against any scale factor (and, on a
  * real cluster, any object-store URI — the path is the only binding).
  *
  * Scale posture: parquet scans here are the leaves of every plan; Catalyst
  * pushes filters/projections into them (verified in PlanSpec). At 100 TB the
  * same code reads a partitioned lake layout — nothing below assumes local
  * files.
  */
object Readers {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Session config every graft session must set at BUILD time (Bench,
    * Verify, TestSpark all do): lets the vectorized parquet reader accept
    * the events table's TIMESTAMP(NANOS) column as a nanos long. Set once
    * at construction — a per-read `spark.conf.set` would be racy under
    * concurrent queries sharing the session. */
  val NanosAsLongKey = "spark.sql.legacy.parquet.nanosAsLong"

  /** Parquet scan of one driver table (SURVEY §2.1 S8).
    *
    * `events.ts` is physically TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects; we read it as a nanos long and rebuild a
    * microsecond TimestampType with integer division (`div`, not `/` —
    * int64 nanos overflow double precision). Floor semantics match what
    * DuckDB's TIMESTAMP_NS → epoch_us/epoch_ms conversions produce. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    if (name == "events") {
      require(spark.conf.get(NanosAsLongKey, "false") == "true",
        s"set $NanosAsLongKey=true in the SparkSession builder " +
          "(session-level, once) before reading the events table")
      tsFromNanos(spark.read.parquet(path))
    } else spark.read.parquet(path)
  }

  /** The ONE nanos→µs `ts` rebuild, shared by the batch reader above
    * and the streaming source (graft.streaming.EventStream) so the two
    * can never diverge on the oracle-parity-critical floor semantics.
    * `div` (integral), never `/` — int64 nanos overflow double. */
  def tsFromNanos(df: DataFrame): DataFrame =
    df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000")))

  // ---------------------------------------------------------------------
  // Sparkify-shaped sources (reference parity; SURVEY §1.2, §2.1 S1/S2).
  // Declared schemas transcribed from the reference's hand-profiled ones
  // (reference etl.py:60-71 and etl.py:153-172) — fixed schema-on-read, no
  // inference pass (the reference's second, inferred song read —
  // etl.py:261 — is deliberately NOT reproduced; SURVEY §1.3).
  // ---------------------------------------------------------------------

  /** Song metadata schema (reference etl.py:60-71). */
  val songSchema: StructType = StructType(Seq(
    StructField("artist_id", StringType),
    StructField("artist_latitude", DoubleType),
    StructField("artist_location", StringType),
    StructField("artist_longitude", DoubleType),
    StructField("artist_name", StringType),
    StructField("duration", DoubleType),
    StructField("num_songs", LongType),
    StructField("song_id", StringType),
    StructField("title", StringType),
    StructField("year", LongType)))

  /** App event-log schema (reference etl.py:153-172). `userId` is a STRING
    * ("" for logged-out rows) and `registration` epoch-millis-as-double —
    * both reference quirks preserved on purpose (SURVEY §2.8.7). */
  val logSchema: StructType = StructType(Seq(
    StructField("artist", StringType),
    StructField("auth", StringType),
    StructField("firstName", StringType),
    StructField("gender", StringType),
    StructField("itemInSession", LongType),
    StructField("lastName", StringType),
    StructField("length", DoubleType),
    StructField("level", StringType),
    StructField("location", StringType),
    StructField("method", StringType),
    StructField("page", StringType),
    StructField("registration", DoubleType),
    StructField("sessionId", LongType),
    StructField("song", StringType),
    StructField("status", IntegerType),
    StructField("ts", LongType),
    StructField("userAgent", StringType),
    StructField("userId", StringType)))

  /** JSON scan with a declared schema (SURVEY §2.1 S1/S2; glob-capable S4).
    * Schema-on-read with no inference job — at lake scale an inference pass
    * is a full extra scan of the input, so it is never the default here. */
  def json(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  def songData(spark: SparkSession, path: String): DataFrame =
    json(spark, songSchema, path)

  def logData(spark: SparkSession, path: String): DataFrame =
    json(spark, logSchema, path)
}
