package graft.queries

import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.streaming.EventStream

/** Structured-Streaming surfaces that ARE oracle-checkable: drained
  * (`Trigger.AvailableNow`) runs whose final state must equal the batch
  * answer (SURVEY §7.4.4 — unbounded streams have no DuckDB oracle, a
  * drained stream does). The un-drainable surfaces (watermarked append,
  * mapGroupsWithState) stay ScalaTest-proven in EventStreamSpec.
  *
  * Eager-execution note: like the id-assigning queries (graft.ops.Ids),
  * `run` here executes the streaming job at call time and returns the
  * materialized sink table — a GraftQuery's contract is "produce the
  * result rows", not "stay a lazy plan".
  */
object StreamingQueries {

  private val streamWindowedCounts = GraftQuery(
    name = "stream_windowed_counts",
    doc = "Streaming 5-minute tumbling-window count+sum per event_type, " +
      "run as a real micro-batch streaming query (parquet file source → " +
      "stateful window agg → memory sink) drained with " +
      "Trigger.AvailableNow. The oracle recomputes the same windows in " +
      "batch SQL (integer floor-division bucketing on epoch nanos) — a " +
      "drained stream must agree with batch exactly. Streaming state is " +
      "bounded: one (window, event_type) group per 5-minute bucket.",
    oracle = Some("""
      SELECT (epoch_ns(ts) // 300000000000) * 300 AS window_start_s,
             event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""),
    run = (s, dir) =>
      EventStream.windowedCountsDrained(s, s"$dir/events.parquet")
        .orderBy("window_start_s", "event_type"))

  val all: Seq[GraftQuery] = Seq(streamWindowedCounts)
}
