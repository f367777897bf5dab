package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Readers

/** The r12 verdict #2 pin: stream-stream join WATERMARK EVICTION as
  * measured state metrics, not a docstring. Both exact-join layouts add
  * a derived hour-bucket equi-key (`EventStream.bucketedJoinSides`).
  * Since r20 every conjunct of both joins is LINEAR in the watermarked
  * columns (the hotkey left edge is the strict `b_bts > a_ts − 5 min`,
  * exactly the old floor bound on the 5-min-aligned b_bts domain), so
  * `StreamingJoinHelper` must extract the state value watermark
  * cleanly — the "Failed to extract state value watermark" WARN the
  * former `div`-floor conjunct logged on every run is pinned ABSENT
  * here by a log capture, and across a multi-batch run with an
  * advancing watermark `StreamingQueryProgress.stateOperators` must
  * show buffered join rows being REMOVED, with the final retained
  * state well below the run's peak. If eviction were broken the state
  * would be monotone non-decreasing until the final batch — exactly
  * what these assertions reject.
  */
class JoinStateEvictionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** sf0.001 events split into 4 files along EVENT TIME with pinned
    * ascending mtimes (FileStreamSource orders by mtime), so
    * maxFilesPerTrigger=1 yields 4 real micro-batches whose watermark
    * advances between them. */
  lazy val multiFileDir: String = {
    val src = Readers.table(spark, "/root/testdata/sf0.001", "events")
    val d = java.nio.file.Files.createTempDirectory("graft_evict").toString
    val rows = src.orderBy("ts").collect()
    val n = rows.length
    import scala.jdk.CollectionConverters._
    (0 until 4).foreach { i =>
      spark.createDataFrame(
        rows.slice(i * n / 4, (i + 1) * n / 4).toList.asJava, src.schema)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/f$i")
      val f = new java.io.File(s"$d/f$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(s"$d/part-$i.parquet")
      java.nio.file.Files.move(f.toPath, dst)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
      val dir = new java.io.File(s"$d/f$i")
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    d
  }

  /** (peak state rows, final state rows, total removed, batches) over
    * the run's symmetric-hash-join operator. */
  private def joinStateStats(
      progress: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])
      : (Long, Long, Long, Int) = {
    val perBatch = progress.map { p =>
      val ops = p.stateOperators.filter(
        _.operatorName.toLowerCase.contains("join"))
      (ops.map(_.numRowsTotal).sum, ops.map(_.numRowsRemoved).sum)
    }
    (perBatch.map(_._1).max, perBatch.last._1, perBatch.map(_._2).sum,
      perBatch.size)
  }

  test("exact bucketed join: state evicts as the watermark advances") {
    val (df, progress) = EventStream
      .streamStreamJoinDrainedWithProgress(spark, multiFileDir, Some(1))
    val multi = df.orderBy("user_id", "signup_id", "purchase_id")
      .collect().map(_.toSeq).toSeq
    val single = EventStream
      .streamStreamJoinDrained(spark,
        "/root/testdata/sf0.001/events.parquet")
      .orderBy("user_id", "signup_id", "purchase_id")
      .collect().map(_.toSeq).toSeq
    assert(multi.nonEmpty && multi == single,
      "multi-batch join result must equal the single-batch drain")

    val (peak, fin, removed, batches) = joinStateStats(progress)
    assert(batches >= 4, s"expected >= 4 micro-batches, got $batches")
    assert(removed > 0,
      "no buffered join rows were ever removed - eviction never ran")
    assert(fin < peak,
      s"final state $fin !< peak $peak - state never drained")
    // the final watermark is max(ts) - 1h; everything older than its
    // join horizon must be gone, so the residue is a small tail, not
    // the bulk of the stream
    assert(fin < peak / 2,
      s"final state $fin >= half of peak $peak - eviction is not " +
        "keeping up with the watermark")
    // PEAK < HORIZON (r13 verdict #5): horizon = every row ever
    // admitted to join state (Σ numRowsUpdated); a multi-batch run
    // with mid-run eviction must never hold the whole horizon at once
    // (a single-batch drain does exactly that - the documented §6.7
    // worst case this pin distinguishes). The 100× multi-batch rung
    // measured peak at 13% of horizon; at 4 sf0.001 batches the bound
    // is looser but must still be strict.
    val horizon = progress.flatMap(_.stateOperators.filter(
      _.operatorName.toLowerCase.contains("join")))
      .map(_.numRowsUpdated).sum
    assert(peak < horizon,
      s"peak state $peak !< horizon $horizon - the run buffered the " +
        "entire stream at once despite the advancing watermark")
  }

  test("hotkey join: every conjunct is watermark-extractable (r20) — " +
      "no StreamingJoinHelper WARN, state evicts, output unchanged") {
    // capture WARN-level events for the duration of the drained run:
    // the pre-r20 floor conjunct logged 'Failed to extract state
    // value watermark' at EVERY micro-batch plan, so an empty capture
    // across a 4-batch run proves extraction now succeeds
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val appender = new org.apache.logging.log4j.core.appender
        .AbstractAppender("graft-warn-capture", null, null, false,
          Array.empty) {
      override def append(
          e: org.apache.logging.log4j.core.LogEvent): Unit =
        captured.add(e.getMessage.getFormattedMessage)
    }
    appender.start()
    val rootCfg = ctx.getConfiguration.getRootLogger
    rootCfg.addAppender(appender,
      org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    val (df, progress) =
      try EventStream.streamStreamJoinHotkeyDrainedWithProgress(
        spark, multiFileDir, Some(1))
      finally {
        rootCfg.removeAppender("graft-warn-capture")
        ctx.updateLoggers()
        appender.stop()
      }
    val warns = captured.toArray(Array.empty[String])
      .filter(_.contains("Failed to extract state value watermark"))
    assert(warns.isEmpty,
      s"state-watermark extraction still fails: ${warns.headOption}")
    val multi = df.orderBy("user_id", "signup_id", "purchase_bucket_us")
      .collect().map(_.toSeq).toSeq
    val single = EventStream
      .streamStreamJoinHotkeyDrained(spark,
        "/root/testdata/sf0.001/events.parquet")
      .orderBy("user_id", "signup_id", "purchase_bucket_us")
      .collect().map(_.toSeq).toSeq
    assert(multi.nonEmpty && multi == single,
      "multi-batch hotkey result must equal the single-batch drain")

    val (peak, fin, removed, batches) = joinStateStats(progress)
    assert(batches >= 4, s"expected >= 4 micro-batches, got $batches")
    assert(removed > 0, "hotkey join state never evicted")
    assert(fin < peak,
      s"final state $fin !< peak $peak - state never drained")
    // with extraction working on every conjunct the plateau is what
    // the window implies: a small tail of the horizon, not the bulk
    assert(fin < peak / 2,
      s"final state $fin >= half of peak $peak - the extracted " +
        "horizon is not evicting at what the condition implies")
    // the watermarked dedup feeding the join must also stay bounded
    val dedupRemoved = progress.flatMap(_.stateOperators)
      .filter(_.operatorName.toLowerCase.contains("dedup"))
      .map(_.numRowsRemoved).sum
    assert(dedupRemoved > 0,
      "dropDuplicatesWithinWatermark state never expired")
  }
}
