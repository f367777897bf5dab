package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Readers

/** Pins [[EventStream.UserStatsBootstrapProcessor]] — transformWithState
  * seeded with a batch snapshot (`StatefulProcessorWithInitialState`).
  * The contract: stream half (odd event_ids) over state bootstrapped
  * from the batch half (even event_ids), monotone-folded with the
  * snapshot, equals the full-corpus batch aggregation. The power check
  * matters as much as the equality: the same processor WITHOUT initial
  * state on the same stream half must NOT equal the full answer —
  * otherwise the equality test would pass even if the bootstrap were
  * silently ignored. */
class TwsBootstrapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def fullBatchAnswer: Seq[Seq[Any]] =
    Readers.table(spark, sf, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_event_types"),
        min(unix_micros(col("ts"))).as("first_ts_us"),
        max(unix_micros(col("ts"))).as("last_ts_us"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq

  test("bootstrapped stream half + snapshot fold == full batch answer") {
    val got = EventStream.userStatsBootstrapDrained(spark, sf)
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got == fullBatchAnswer)
  }

  test("power check: WITHOUT the bootstrap the same stream half differs") {
    // the odd-half events alone under the plain (no-initial-state)
    // processor: if this equaled the full answer, the corpus could not
    // distinguish a working bootstrap from an ignored one
    val oddOnly = {
      val d = java.nio.file.Files.createTempDirectory("graft_boot_odd")
      Readers.table(spark, sf, "events")
        .filter(col("event_id") % 2 =!= 0)
        .coalesce(1).write.mode("overwrite").parquet(d.toString)
      EventStream.userStatsDrained(spark, d.toString)
        .orderBy("user_id").collect().map(_.toSeq).toSeq
    }
    assert(oddOnly != fullBatchAnswer,
      "odd half alone already equals the full answer - test has no power")
  }

  test("multi-batch stream half (maxFilesPerTrigger=1) == full answer") {
    // a 3-file events layout so the stream half really arrives in 3
    // micro-batches (handleInitialState on batch one, then two batches
    // of read-modify-write on the seeded state); every stat is monotone
    // and order-insensitive, so any split must agree with the batch
    // answer — this proves bootstrap + continuation, not just bootstrap
    val d = java.nio.file.Files.createTempDirectory("graft_boot_mb")
    Readers.table(spark, sf, "events")
      .repartition(3).write.mode("overwrite").parquet(s"$d/events.parquet")
    val got3 = EventStream.userStatsBootstrapDrained(spark, d.toString,
      Some(1)).orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(got3 == fullBatchAnswer)
  }
}
