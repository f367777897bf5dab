package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-node evidence for the r12 transformWithState processors: the
  * StatefulProcessor instances ([[graft.streaming.EventStream.UserStatsProcessor]],
  * `SessionTimeoutProcessor`) are serialized from the driver into REAL
  * executor JVMs here (`local-cluster[2,1,1024]`), where
  * closure-capture and serialization bugs actually surface — a
  * `local[n]` drain shares one JVM and can hide a non-serializable or
  * stale-captured field. RocksDB state stores also open in the
  * executor processes, not the driver. `TwsClusterSpec` launches this
  * via spark-submit (the OrderedIdClusterCheck pattern: a second
  * SparkContext cannot share the test JVM) and asserts on the verdict
  * line.
  *
  * Checks on the sf0.001 events table:
  *   (1) the drained tws user-stats equal the batch aggregation;
  *   (2) the drained timer-closed sessions equal the batch
  *       sessionization minus still-open tails (the non-strict
  *       `expiry <= watermark` rule from SessionTimeoutSpec).
  * Exits nonzero on any failure.
  */
object TwsClusterCheck {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .appName("tws-cluster-check")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Readers.NanosAsLongKey, "true")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
      .getOrCreate()
    val sc = spark.sparkContext
    try {
      require(!sc.isLocal, s"master ${sc.master} reports isLocal=true")
      import graft.streaming.EventStream

      // (1) composed typed state across executor JVMs
      val gotStats = EventStream
        .userStatsDrained(spark, s"$sf/events.parquet")
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      val wantStats = graft.sources.Readers.table(spark, sf, "events")
        .groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          count_distinct(col("event_type")).as("n_event_types"),
          min(unix_micros(col("ts"))).as("first_ts_us"),
          max(unix_micros(col("ts"))).as("last_ts_us"))
        .orderBy("user_id").collect().map(_.toSeq).toSeq
      require(gotStats.nonEmpty, "tws user-stats drained empty")
      require(gotStats == wantStats,
        s"tws user-stats != batch aggregation (got ${gotStats.size} rows, " +
          s"want ${wantStats.size})")

      // (2) event-time timers across executor JVMs
      val gotSess = EventStream
        .sessionTimeoutDrained(spark, s"$sf/events.parquet")
        .orderBy("user_id", "session_start_us")
        .collect().map(_.toSeq).toSeq
      val gapUs = EventStream.SessionGapMicros
      val gapMs = gapUs / 1000L
      val e = graft.sources.Readers.table(spark, sf, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val maxMs = e.agg(max(col("us"))).head().getLong(0) / 1000L
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val wantSess = e
        .withColumn("new_s",
          when(col("us") - lag("us", 1).over(w) > gapUs or
            lag("us", 1).over(w).isNull, 1L).otherwise(0L))
        .withColumn("sid", sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("us").as("session_start_us"),
          max("us").as("session_end_us"), count(lit(1)).as("n_events"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("user_id").orderBy(col("sid").desc)))
        .filter(col("rn") > 1 or
          (expr("session_end_us DIV 1000") + gapMs <= maxMs))
        .select(col("user_id"), col("session_start_us"),
          col("session_end_us"), col("n_events"),
          when(col("rn") > 1, "event").otherwise("timer").as("closed_by"))
        .orderBy("user_id", "session_start_us")
        .collect().map(_.toSeq).toSeq
      require(gotSess.nonEmpty, "session-timeout drained empty")
      require(gotSess.exists(_.last == "timer"),
        "no timer-closed sessions — the timer path never ran on cluster")
      require(gotSess == wantSess,
        s"session-timeout != batch twin (got ${gotSess.size} rows, " +
          s"want ${wantSess.size})")

      // scalastyle:off println
      println(s"[clustercheck] OK tws stats=${gotStats.size} rows, " +
        s"sessions=${gotSess.size} rows " +
        s"(timer-closed ${gotSess.count(_.last == "timer")})")
      // scalastyle:on println
    } finally spark.stop()
  }
}
