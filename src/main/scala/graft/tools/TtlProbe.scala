package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** TTL-EVICTION rung for the monotone user-stats processors (r14
  * verdict #6) — the last streaming family without a measured
  * multi-batch eviction story. Their state is key-bounded by
  * construction (one row per user; nothing for a watermark to evict),
  * so their production eviction is TTL: idle users expire from the
  * store after a processing-time duration, per state primitive.
  *
  * Layout: watermark rungs slice by EVENT TIME, but this corpus's
  * users live the whole horizon (median lifetime ≈ the full month), so
  * a time-slice leaves every user hot in every batch and TTL would
  * measure nothing. The eviction-shaped workload is USER CHURN — each
  * batch brings a cohort of users who then go idle — so the landing
  * splits by user cohort (`user_id % nFiles`, one file per cohort,
  * ascending pinned mtimes, distributed build). That layout also makes
  * the TTL run's OUTPUT bit-identical to the no-TTL run (a key touched
  * in exactly one batch can never be aggregated across an expiry
  * boundary), which the probe asserts — eviction must reclaim memory,
  * never change answers.
  *
  * Run per landing file (`maxFilesPerTrigger=1`, AvailableNow, RocksDB)
  * twice: `ttl_ms=0` (the retain-everything baseline: final state =
  * every user ever seen) and a TTL sized to a few batch walls, so
  * cohorts admitted early expire while later batches still run.
  * Reported per run: wall, per-batch numRowsTotal, numRowsRemoved sum,
  * final state — numbers for SURVEY §6.7. */
object TtlProbe {

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val workDir = args(1)
    val nFiles = if (args.length > 2) args(2).toInt else 8
    val ttlMs = if (args.length > 3) args(3).toLong else 10000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Readers.NanosAsLongKey, "true")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation",
        "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Caches.quietNoisyLogs()
    spark.conf.set(EventStream.StateStoreKey, "rocksdb")

    // churn-cohort landing: cohort i = users with user_id % nFiles == i,
    // one parquet file per cohort, ascending pinned mtimes
    // (FileStreamSource lists by mtime) → maxFilesPerTrigger=1 admits
    // one cohort per micro-batch, which then goes idle
    val ev = graft.sources.Readers.table(spark, srcDir, "events")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nIn = ev.count()
    val landing = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(workDir, "landing")).toString
    (0 until nFiles).foreach { i =>
      val tmp = s"$workDir/slice$i"
      ev.filter(pmod(col("user_id"), lit(nFiles)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(s"$landing/part-$i.parquet")
      java.nio.file.Files.move(part.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    ev.unpersist()
    System.err.println(s"[probe] landing dir: $landing ($nIn rows, " +
      s"$nFiles user-cohort files)")

    def run(tag: String, ttl: Long): Long = {
      val t0 = System.nanoTime()
      val (df, progress) =
        if (ttl > 0)
          EventStream.userStatsTtlDrainedWithProgress(
            spark, landing, Some(1), ttl)
        else
          EventStream.userStatsDrainedWithProgress(spark, landing, Some(1))
      val out = df.orderBy("user_id").collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val withState = progress.filter(_.stateOperators.nonEmpty)
      val perBatch = withState
        .map(_.stateOperators.map(_.numRowsTotal).sum)
      val removed = withState
        .map(_.stateOperators.map(_.numRowsRemoved).sum).sum
      val fin = perBatch.lastOption.getOrElse(0L)
      println(f"""{"query":"stream_tws_user_stats_$tag","wall_s":""" +
        f"""$wall%.1f,"batches":${withState.size},""" +
        s""""n_out":${out.length},"ttl_ms":$ttl,""" +
        s""""peak_state":${perBatch.max},"final_state":$fin,""" +
        s""""removed":$removed,""" +
        s""""state_per_batch":${perBatch.mkString("[", ",", "]")}}""")
      graft.Caches.clearAll(spark)
      // answers must not depend on eviction: fingerprint the result
      java.util.Arrays.hashCode(out.map(_.hashCode): Array[Int])
    }

    val base = run("nottl", 0L)
    val ttld = run("ttl", ttlMs)
    require(base == ttld,
      "TTL run's drained output differs from the no-TTL baseline")
    System.err.println("[probe] outputs identical across TTL runs")
    Console.out.flush()
    // halt, don't stop(): see MultiBatchProbe's RocksDB teardown note
    Runtime.getRuntime.halt(0)
  }
}
