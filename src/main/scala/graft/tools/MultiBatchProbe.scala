package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Multi-batch streaming rung (r13 verdict #5): the 100× join/session
  * drains re-run as REAL multi-batch executions — the events corpus is
  * split into time-quantile files with ascending mtimes and streamed
  * with `maxFilesPerTrigger=1`, so the watermark advances BETWEEN
  * micro-batches and state evicts DURING the run instead of only at
  * the final-batch commit (the single-file AvailableNow drain is one
  * micro-batch, so its peak state is the whole horizon — documented in
  * SURVEY §6.7 as the honest worst case; this probe turns the
  * "watermark keeps state bounded" claim into measured peak-vs-horizon
  * numbers at the 100× rung).
  *
  * Usage: runMain graft.tools.MultiBatchProbe <srcSfDir> <workDir> [nFiles]
  * Prints one JSON line per probed query:
  *   {"query":…,"wall_s":…,"batches":…,"n_out":…,
  *    "peak_state":…,"final_state":…,"removed":…,"horizon_rows":…}
  * where horizon_rows = Σ numRowsUpdated (every row ever admitted to
  * state) — peak_state < horizon_rows is the bounded-state claim. */
object MultiBatchProbe {

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val workDir = args(1)
    val nFiles = if (args.length > 2) args(2).toInt else 8
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
    // RocksDB on both rungs — the 100 TB posture, like-for-like with
    // the single-batch rung of SURVEY §6.7
    spark.conf.set(EventStream.StateStoreKey, "rocksdb")

    // Time-split landing dir, built DISTRIBUTED (no driver collect —
    // the 100× corpus is 10M rows): event-time quantile cuts, one
    // parquet file per slice, ascending pinned mtimes
    // (FileStreamSource lists by mtime) → maxFilesPerTrigger=1 yields
    // nFiles real micro-batches with an advancing watermark.
    val ev = graft.sources.Readers.table(spark, srcDir, "events")
    val withUs = ev.withColumn("__us", unix_micros(col("ts")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nIn = withUs.count()
    val cuts = withUs.stat.approxQuantile("__us",
      (1 until nFiles).map(_.toDouble / nFiles).toArray, 0.001)
      .map(_.toLong)
    val landing = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(workDir, "landing")).toString
    val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
    (0 until nFiles).foreach { i =>
      val tmp = s"$workDir/slice$i"
      withUs.filter(col("__us") >= bounds(i) &&
          col("__us") < bounds(i + 1)).drop("__us")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(s"$landing/part-$i.parquet")
      java.nio.file.Files.move(part.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    withUs.unpersist()
    System.err.println(s"[probe] landing dir: $landing ($nIn rows, " +
      s"$nFiles time-quantile files)")

    def stats(progress: Seq[
        org.apache.spark.sql.streaming.StreamingQueryProgress])
        : (Long, Long, Long, Long, Int) = {
      val per = progress.map { p =>
        val ops = p.stateOperators
        (ops.map(_.numRowsTotal).sum, ops.map(_.numRowsRemoved).sum,
          ops.map(_.numRowsUpdated).sum)
      }
      (if (per.isEmpty) 0L else per.map(_._1).max,
        per.lastOption.map(_._1).getOrElse(0L),
        per.map(_._2).sum, per.map(_._3).sum, per.size)
    }

    def report(query: String,
        run: () => (org.apache.spark.sql.DataFrame, Seq[
          org.apache.spark.sql.streaming.StreamingQueryProgress])): Unit = {
      val t0 = System.nanoTime()
      val (df, progress) = run()
      val nOut = df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val (peak, fin, removed, horizon, batches) = stats(progress)
      println(f"""{"query":"$query","wall_s":$wall%.1f,""" +
        s""""batches":$batches,"n_out":$nOut,"peak_state":$peak,""" +
        s""""final_state":$fin,"removed":$removed,""" +
        s""""horizon_rows":$horizon}""")
      graft.Caches.clearAll(spark)
    }

    report("stream_stream_join_mb", () =>
      EventStream.streamStreamJoinDrainedWithProgress(
        spark, landing, Some(1)))
    report("stream_session_window_mb", () =>
      EventStream.sessionWindowDrainedWithProgress(
        spark, landing, Some(1)))
    report("stream_session_timeout_mb", () =>
      EventStream.sessionTimeoutDrainedWithProgress(
        spark, landing, Some(1)))
    Console.out.flush()
    // halt, don't stop(): RocksDB's JNI logger callback races provider
    // unload during context teardown (SIGABRT in LoggerJniCallback::Logv
    // AFTER all output — observed on the first 100× run). A diagnostics
    // main has nothing to flush through the shutdown hooks; halt skips
    // the race. Production drains never tear down the context per run.
    Runtime.getRuntime.halt(0)
  }
}
