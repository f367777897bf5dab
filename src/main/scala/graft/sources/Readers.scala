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
    * `events.ts` has shipped as BOTH physical units across driver data
    * generations: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts as a nanos long under [[NanosAsLongKey]], rebuilt here with
    * integer division — `div`, not `/`, int64 nanos overflow double
    * precision) and TIMESTAMP(MICROS) (natively a µs TimestampType, no
    * rebuild). The unit is probed from the parquet FOOTER (the schema-only
    * read below plans no jobs), so one binary works against either data
    * generation — exactly the schema-drift tolerance a lake reader needs.
    * Floor semantics of the nanos path match DuckDB's TIMESTAMP_NS →
    * epoch_us conversions, so the two paths agree on oracle parity. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    // Memoize the CONSTRUCTED DataFrame per (session, content-keyed
    // path): a bare `spark.read.parquet` re-runs DataSource resolution,
    // file listing and footer schema inference on the DRIVER on every
    // call — measured at ~80 ms each, ~2 s per whole-registry pass
    // before a single task runs (r20; guide §6 "file listing cached per
    // session", §5 "the driver should do almost no data work"). This is
    // the path-injectable equivalent of registering the table in a
    // catalog once: pure METADATA reuse — the scan itself still
    // executes from the parquet files on every action, nothing about
    // results or data blocks is cached. Staleness is handled by the
    // same content key the events footer probe uses (size + mtime +
    // fileKey/child fold), so a fixture rewriting a path in place gets
    // a fresh plan. The outer map is a WeakHashMap keyed on the SESSION
    // OBJECT (a DataFrame is bound to the session that analyzed it):
    // identity is exact — no hash-reuse serving a stopped session's
    // frame — and a stopped, unreferenced session's entries become
    // collectible instead of pinning its plans for the JVM's life
    // (r20 review findings). Construction runs OUTSIDE any map lock
    // (putIfAbsent, benign duplicate resolution) so concurrent first
    // reads never serialize on the ~80 ms resolution I/O.
    val perSession = {
      val got = dfCache.synchronized(dfCache.get(spark))
      if (got != null) got
      else dfCache.synchronized {
        var m = dfCache.get(spark)
        if (m == null) {
          m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
          dfCache.put(spark, m)
        }
        m
      }
    }
    val key = s"$name:${tsCacheKey(path)}"
    val hit = perSession.get(key)
    if (hit != null) hit
    else {
      val built =
        if (name == "events") {
          require(spark.conf.get(NanosAsLongKey, "false") == "true",
            s"set $NanosAsLongKey=true in the SparkSession builder " +
              "(session-level, once) before reading the events table")
          normalizeTs(spark.read.parquet(path))
        } else spark.read.parquet(path)
      if (perSession.size() > 64) perSession.clear() // stale-key bound
      val prev = perSession.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  private val dfCache = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  /** Normalize the events `ts` column to a session-zoned µs TimestampType
    * whatever the file's physical unit surfaced as:
    *   - LongType            → TIMESTAMP(NANOS) read under nanosAsLong:
    *                           floor-divide to µs ([[tsFromNanos]]);
    *   - TimestampNTZType    → TIMESTAMP(MICROS, isAdjustedToUTC=false):
    *                           reinterpret as session-zone wall clock.
    *                           Sessions here run UTC, so epoch extraction
    *                           (unix_millis/micros) matches DuckDB's naive
    *                           TIMESTAMP arithmetic on the same file;
    *   - TimestampType       → already µs, pass through.
    * Every downstream ts consumer (time dims, windows, watermarks, as-of
    * joins) sees ONE type, so a data-generation swap can never half-break
    * the query surface again. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => tsFromNanos(df)
    case TimestampNTZType =>
      // The NTZ→TimestampType cast reinterprets wall-clock in the SESSION
      // timezone; only under UTC do both data generations agree on epoch
      // values (and match DuckDB's naive TIMESTAMP arithmetic). Enforced
      // here because the method is public — a non-UTC caller would get a
      // silent event-time shift, not an error, without this.
      require(
        df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
        "normalizeTs requires spark.sql.session.timeZone=UTC (set in the " +
          "SparkSession builder, like Bench/Verify/TestSpark do): the " +
          "TIMESTAMP_NTZ branch reinterprets wall-clock in the session " +
          "zone, so a non-UTC session would shift epoch values")
      df.withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast(TimestampType))
    case _                => df
  }

  /** Footer-only probe of the events table's `ts` surfaced type (no jobs
    * planned). The streaming source needs it BEFORE declaring its scan
    * schema — a declared ts:Long over a MICROS file would silently read
    * raw µs as "nanos" and collapse event time 1000×.
    *
    * Which type a MICROS file SURFACES as depends on
    * `spark.sql.parquet.inferTimestampNTZ.enabled` (default on:
    * isAdjustedToUTC=false → TimestampNTZType; disabled → TimestampType).
    * Both branches normalize to the same µs TimestampType under the
    * required UTC session ([[normalizeTs]]), so the config only changes
    * WHICH branch runs, never the values.
    *
    * Cached on the resolved absolute path + content metadata — the raw
    * path string alone would go stale if a fixture rewrites the same
    * path with the other data generation, or alias a file reached via
    * both relative and absolute spellings. For a parquet DIRECTORY the
    * key folds the CHILDREN's metadata (count + total size + max
    * mtime): the directory's own stat is useless for staleness — its
    * length is filesystem-constant and its mtime second-granular, so an
    * in-place rewrite within one second (exactly the case the key
    * targets) could alias (r11 advice). A rewrite always changes child
    * names/sizes (parquet part files are freshly named), so the folded
    * key cannot serve a stale footer type. Non-local/unstat-able paths
    * fall back to the path string (object-store URIs don't get rewritten
    * in place mid-JVM). */
  def eventsTsType(spark: SparkSession, path: String): DataType =
    tsTypeCache.computeIfAbsent(tsCacheKey(path), { _ =>
      spark.read.parquet(path).schema.fields
        .find(_.name == "ts").map(_.dataType)
        .getOrElse(TimestampType)
    })

  private def tsCacheKey(path: String): String =
    try {
      val p = java.nio.file.Paths.get(path).toAbsolutePath.normalize
      val f = p.toFile
      if (f.isDirectory) {
        val kids = f.listFiles()
        if (kids == null) path
        else {
          var sz = 0L
          var mt = 0L
          kids.foreach { k => sz += k.length(); mt = mt max k.lastModified() }
          s"$p@d${kids.length}:$sz:$mt"
        }
      } else if (f.exists) {
        // fold the filesystem fileKey (inode) in: a delete+recreate of
        // a single file can land with the same length inside one mtime
        // tick, but it always gets a fresh inode (r20 review finding)
        val fk =
          try String.valueOf(java.nio.file.Files.readAttributes(p,
            classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey)
          catch { case _: Exception => "" }
        s"$p@${f.length}:${f.lastModified}:$fk"
      }
      else path
    } catch { case _: Exception => path }

  private val tsTypeCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataType]()

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
