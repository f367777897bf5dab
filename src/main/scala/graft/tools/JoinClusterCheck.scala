package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-node evidence for the TOGGLED RocksDB provider path (r12
  * verdict #4): `TwsClusterCheck` proves the transformWithState
  * processors (RocksDB-forced by Spark) on separate executor JVMs;
  * this check proves the `EventStream.StateStoreKey=rocksdb` toggle
  * itself there, on the two drains whose state layout is the most
  * demanding — the bucketed stream-stream join (4 state stores per
  * partition, keyed on the derived (user, hour-bucket)) and the
  * late-data TWO-RUN restart (run 2 restores run 1's committed
  * watermark and windowed state from RocksDB checkpoint files written
  * by executor-side stores). `JoinClusterSpec` launches this via
  * spark-submit and asserts on the verdict line.
  *
  * Checks on the sf0.001 events table, all under rocksdb:
  *   (1) drained bucketed inner join == batch join replay (inner
  *       emissions never wait on the watermark, so exact equality);
  *   (2) lateDataDrained under rocksdb == the same drain under the
  *       default HDFS-backed provider (both on this cluster) — the
  *       restart must restore identical watermark + window state from
  *       either provider's checkpoint.
  * Exits nonzero on any failure.
  */
object JoinClusterCheck {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .appName("join-cluster-check")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Readers.NanosAsLongKey, "true")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
      .config(graft.streaming.EventStream.StateStoreKey, "rocksdb")
      .getOrCreate()
    val sc = spark.sparkContext
    try {
      require(!sc.isLocal, s"master ${sc.master} reports isLocal=true")
      import graft.streaming.EventStream

      // (1) bucketed join, RocksDB stores opening inside executor JVMs
      val gotJoin = EventStream
        .streamStreamJoinDrained(spark, s"$sf/events.parquet")
        .orderBy("user_id", "signup_id", "purchase_id")
        .collect().map(_.toSeq).toSeq
      val events = graft.sources.Readers.table(spark, sf, "events")
      val a = events.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("signup_id"),
          col("ts").as("a_ts"))
      val b = events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"),
          col("event_id").as("purchase_id"), col("ts").as("b_ts"))
      val wantJoin = a.join(b,
          col("user_id") === col("b_user") &&
            col("b_ts") >= col("a_ts") &&
            col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("user_id"), col("signup_id"), col("purchase_id"))
        .orderBy("user_id", "signup_id", "purchase_id")
        .collect().map(_.toSeq).toSeq
      require(gotJoin.nonEmpty, "rocksdb join drained empty")
      require(gotJoin == wantJoin,
        s"rocksdb bucketed join != batch replay (got ${gotJoin.size} " +
          s"rows, want ${wantJoin.size})")

      // (2) checkpoint-restart drain: rocksdb == hdfs, both on-cluster
      val rocksLate = EventStream.lateDataDrained(spark, sf)
        .orderBy("window_start_s", "event_type")
        .collect().map(_.toSeq).toSeq
      spark.conf.set(EventStream.StateStoreKey, "hdfs")
      val hdfsLate = EventStream.lateDataDrained(spark, sf)
        .orderBy("window_start_s", "event_type")
        .collect().map(_.toSeq).toSeq
      require(rocksLate.nonEmpty, "late-data drain empty")
      require(rocksLate == hdfsLate,
        s"late-data restart differs across providers (rocksdb " +
          s"${rocksLate.size} rows, hdfs ${hdfsLate.size})")

      // scalastyle:off println
      println(s"[clustercheck] OK rocksdb join=${gotJoin.size} rows, " +
        s"late-data restart=${rocksLate.size} rows (== hdfs)")
      // scalastyle:on println
    } finally spark.stop()
  }
}
