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

  private val streamSlidingCounts = GraftQuery(
    name = "stream_sliding_counts",
    doc = "Streaming SLIDING-window count+sum per event_type (10-minute " +
      "windows every 5 minutes — each event in exactly 2 overlapping " +
      "windows), drained with Trigger.AvailableNow. Covers the " +
      "overlapping-assignment variant stream_windowed_counts' tumbling " +
      "windows cannot: state is length/slide x tumbling, the " +
      "amplification knob noted in EventStream.slidingCountsDrained. " +
      "The oracle expands each event into its two window starts " +
      "(unnest of the floor-bucket and its predecessor) and " +
      "re-aggregates in batch — a drained stream must agree exactly.",
    oracle = Some("""
      WITH w AS (SELECT event_type, value,
             unnest(list_value(
               (epoch_ns(ts) // 300000000000) * 300 - 300,
               (epoch_ns(ts) // 300000000000) * 300)) AS window_start_s
           FROM events)
      SELECT window_start_s, event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM w GROUP BY 1, 2 ORDER BY 1, 2"""),
    run = (s, dir) =>
      EventStream.slidingCountsDrained(s, s"$dir/events.parquet")
        .orderBy("window_start_s", "event_type"))

  private val streamSessionCounts = GraftQuery(
    name = "stream_session_counts",
    doc = "Drained mapGroupsWithState run: per-user event and " +
      "gap-session (30 min) counts held as O(1) custom keyed state " +
      "(KeyValueGroupedDataset), executed as a real Update-mode " +
      "streaming query to completion via Trigger.AvailableNow. The " +
      "oracle recomputes the final state in batch SQL (lag-gap " +
      "sessionization over µs-floored timestamps — the same floor the " +
      "nanos scan applies). Works because the events table arrives as " +
      "one source file = one micro-batch; a multi-file layout would " +
      "need event-time ordering guarantees across batches (noted in " +
      "EventStream).",
    oracle = Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
                 FROM events),
      x AS (SELECT user_id,
              CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                     ORDER BY ts_us, event_id) IS NULL
                    OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                         ORDER BY ts_us, event_id) > 1800000000
                   THEN 1 ELSE 0 END AS new_session
            FROM e)
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(new_session) AS BIGINT) AS n_sessions
      FROM x GROUP BY user_id ORDER BY user_id"""),
    run = (s, dir) =>
      EventStream.sessionCountsDrained(s, s"$dir/events.parquet")
        .orderBy("user_id"))

  private val streamDedupExact = GraftQuery(
    name = "stream_dedup_exact",
    doc = "Streaming exact dedup: dropDuplicates on (user_id, " +
      "event_type) over the event stream — the streaming twin of the " +
      "batch hash-dedup pass, state is one entry per distinct key. " +
      "Drained with Trigger.AvailableNow; only the KEY columns are " +
      "emitted (which physical row arrives first is racy, the distinct " +
      "key set is deterministic), so the drained sink equals DISTINCT " +
      "in batch SQL exactly.",
    oracle = Some("""
      SELECT DISTINCT user_id, event_type FROM events
      ORDER BY user_id, event_type"""),
    run = (s, dir) =>
      EventStream.dedupDrained(s, s"$dir/events.parquet",
          Seq("user_id", "event_type"))
        .orderBy("user_id", "event_type"))

  private val streamStaticJoin = GraftQuery(
    name = "stream_static_join",
    doc = "Stream-static enrichment join: the event stream joined to " +
      "the broadcast customer dimension on user_id, aggregated per " +
      "market segment, drained with Trigger.AvailableNow — the " +
      "enrich-then-aggregate shape every production event pipeline " +
      "runs. Oracle = the same join in batch SQL; a drained stream " +
      "must agree exactly.",
    oracle = Some("""
      SELECT c.c_mktsegment, COUNT(*) AS n_events,
             CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events e JOIN customer c ON c.c_custkey = e.user_id
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""),
    run = (s, dir) => {
      val dim = graft.sources.Readers.table(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      EventStream.staticJoinCountsDrained(s, s"$dir/events.parquet",
          dim, "c_custkey", "c_mktsegment")
        .orderBy("c_mktsegment")
    })

  private val streamLateData = GraftQuery(
    name = "stream_late_data",
    doc = "Watermark/late-data semantics, drained and oracle-checked: " +
      "the events table is re-delivered as two engineered micro-batches " +
      "via two sequential Trigger.AvailableNow runs sharing ONE " +
      "checkpoint (the watermark is persisted state, as in a production " +
      "restart; a read-limit split does NOT work - AvailableNow plans " +
      "all files into one batch). Run 1 = everything from stream start " +
      "+30min on, run 2 = the first 30 minutes, arriving late. After " +
      "batch 1 the watermark sits at max(ts)-10min, so append mode must " +
      "DROP every batch-2 row and emit exactly the windows whose end <= " +
      "final watermark. The oracle predicts both effects in batch SQL " +
      "from the same split predicate: aggregate only the on-time rows, " +
      "keep only finalized windows. Green = the engine's late-drop and " +
      "append-finalization cutoffs both match the spec.",
    oracle = Some("""
      WITH b AS (SELECT epoch_ns(min(ts)) // 1000 AS mn_us,
                        epoch_ns(max(ts)) // 1000 AS mx_us FROM events)
      SELECT (epoch_ns(e.ts) // 300000000000) * 300 AS window_start_s,
             e.event_type, COUNT(*) AS n,
             CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events e, b
      WHERE epoch_ns(e.ts) // 1000 >= b.mn_us + 1800000000
        AND ((epoch_ns(e.ts) // 300000000000) * 300 + 300) * 1000000
            <= (b.mx_us // 1000 - 600000) * 1000
      GROUP BY 1, 2 ORDER BY 1, 2"""),
    run = (s, dir) =>
      EventStream.lateDataDrained(s, dir)
        .orderBy("window_start_s", "event_type"))

  private val streamDedupWatermarked = GraftQuery(
    name = "stream_dedup_watermarked",
    doc = "BOUNDED-STATE streaming dedup: dropDuplicatesWithinWatermark " +
      "on user_id over the watermarked event stream - the variant of " +
      "stream_dedup_exact whose state EXPIRES (a key is held only " +
      "within the watermark horizon), i.e. the formulation that " +
      "survives an unbounded stream at 100 TB. Drained with " +
      "Trigger.AvailableNow; only the key column is emitted (first " +
      "arrival is racy, the key set is not), so the drained sink " +
      "equals batch DISTINCT exactly.",
    oracle = Some("""
      SELECT DISTINCT user_id FROM events ORDER BY user_id"""),
    run = (s, dir) =>
      EventStream.dedupWithinWatermarkDrained(s, s"$dir/events.parquet",
          Seq("user_id"))
        .orderBy("user_id"))

  private val streamSessionRows = GraftQuery(
    name = "stream_session_rows",
    doc = "Drained flatMapGroupsWithState run: one row PER 30-minute " +
      "gap session per user (the multi-row stateful emission surface; " +
      "mapGroupsWithState can only emit one row per key per batch). " +
      "State is the open session only - O(1) per user. The oracle " +
      "recomputes the per-session rows in batch SQL: lag-gap flags, " +
      "running session index, group by (user, session). Same " +
      "single-file = one micro-batch drain contract as " +
      "stream_session_counts.",
    oracle = Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
                 FROM events),
      x AS (SELECT user_id, ts_us, event_id,
              CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                     ORDER BY ts_us, event_id) IS NULL
                    OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                         ORDER BY ts_us, event_id) > 1800000000
                   THEN 1 ELSE 0 END AS new_session
            FROM e),
      s AS (SELECT user_id,
              SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts_us, event_id
                ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM x)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             COUNT(*) AS n_events
      FROM s GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""),
    run = (s, dir) =>
      EventStream.sessionRowsDrained(s, s"$dir/events.parquet")
        .orderBy("user_id", "session_idx"))

  private val streamStreamJoin = GraftQuery(
    name = "stream_stream_join",
    doc = "STREAM-STREAM inner join, drained: signup events joined to " +
      "purchase events of the same user within one hour after the " +
      "signup - two unbounded sides with buffered state, watermarks on " +
      "both and an event-time range condition so state stays bounded " +
      "to the watermark horizon at scale. Inner-join emissions never " +
      "wait on the watermark, so the drained result equals the batch " +
      "join exactly; the oracle replays it over the same " +
      "microsecond-floored timestamps the nanos scan produces. " +
      "Implementation is hot-key-safe (r12): a derived hour-bucket " +
      "equi-key with a two-replica purchase explosion spreads a hot " +
      "user's state over its active hours and bounds matcher scans " +
      "to one bucket — identical output, no O(hot-key²) comparison " +
      "grind (EventStream.bucketedJoinSides).",
    oracle = Some("""
      SELECT a.user_id, a.event_id AS signup_id, b.event_id AS purchase_id
      FROM events a JOIN events b ON a.user_id = b.user_id
       AND a.event_type = 'signup' AND b.event_type = 'purchase'
       AND epoch_ns(b.ts) // 1000 >= epoch_ns(a.ts) // 1000
       AND epoch_ns(b.ts) // 1000 <= epoch_ns(a.ts) // 1000 + 3600000000
      ORDER BY a.user_id, signup_id, purchase_id"""),
    run = (s, dir) =>
      EventStream.streamStreamJoinDrained(s, s"$dir/events.parquet")
        .orderBy("user_id", "signup_id", "purchase_id"))

  private val streamOuterJoin = GraftQuery(
    name = "stream_outer_join",
    doc = "STREAM-STREAM LEFT OUTER join, drained: like " +
      "stream_stream_join, but unmatched signups null-pad — and in " +
      "streaming they do so only on STATE EVICTION, when the global " +
      "watermark (min of both sides) passes a_ts + 1 hour. The " +
      "drained result therefore differs from the batch outer join by " +
      "exactly the unmatched signups younger than (final watermark - " +
      "1 hour), which are still buffered at drain end. The oracle " +
      "REPLAYS that cutoff (inner matches + unmatched lefts with " +
      "a_ts + 1h < min(max_a, max_b) - 1h) - the streaming-vs-batch " +
      "outer-join delta pinned as a differential contract instead of " +
      "papered over. Same hot-key-safe bucketed layout as " +
      "stream_stream_join (the un-exploded signup side stays the " +
      "left side, so unmatched signups still null-pad exactly once).",
    oracle = Some("""
      WITH a AS (SELECT user_id, event_id AS signup_id,
                        epoch_ns(ts) // 1000 AS a_us
                 FROM events WHERE event_type = 'signup'),
      b AS (SELECT user_id AS b_user, event_id AS purchase_id,
                   epoch_ns(ts) // 1000 AS b_us
            FROM events WHERE event_type = 'purchase'),
      wm AS (SELECT LEAST((SELECT MAX(a_us) FROM a),
                          (SELECT MAX(b_us) FROM b))
                    - 3600000000 AS w),
      matched AS (SELECT user_id, signup_id, purchase_id
                  FROM a JOIN b ON user_id = b_user
                   AND b_us >= a_us AND b_us <= a_us + 3600000000),
      evicted AS (SELECT user_id, signup_id,
                         CAST(NULL AS BIGINT) AS purchase_id
                  FROM a CROSS JOIN wm
                  WHERE a_us + 3600000000 < w
                    AND NOT EXISTS (SELECT 1 FROM b
                      WHERE b_user = user_id
                        AND b_us >= a_us AND b_us <= a_us + 3600000000))
      SELECT user_id, signup_id, purchase_id
      FROM (SELECT * FROM matched UNION ALL SELECT * FROM evicted)
      ORDER BY user_id, signup_id, purchase_id NULLS FIRST"""),
    run = (s, dir) =>
      EventStream.streamStreamOuterDrained(s, s"$dir/events.parquet")
        .orderBy("user_id", "signup_id", "purchase_id"))

  private val streamStreamJoinHotkey = GraftQuery(
    name = "stream_stream_join_hotkey",
    doc = "Stream-stream join with a PER-KEY EMISSION CAP on the hot " +
      "side (r11 verdict #1): purchases collapse to at most one row " +
      "per (user, 5-minute bucket) via dropDuplicatesWithinWatermark " +
      "BEFORE the windowed join, so a signup emits at most 13 " +
      "(signup, purchase-activity-bucket) rows however dense the hot " +
      "user's purchases — the output-bounding variant a 100 TB " +
      "pipeline runs when the exact join's per-pair fan-out is itself " +
      "the bottleneck. Semantics deliberately differ from " +
      "stream_stream_join (bucket presence, not pairs; window = " +
      "bucket starts in [floor_5m(a_ts), a_ts+1h]) and the oracle " +
      "replays exactly those semantics in batch SQL: DISTINCT " +
      "purchase buckets per user, joined to signups on the same " +
      "bucket-start window.",
    oracle = Some("""
      WITH a AS (SELECT user_id, event_id AS signup_id,
                        epoch_ns(ts) // 1000 AS a_us
                 FROM events WHERE event_type = 'signup'),
      pb AS (SELECT DISTINCT user_id AS b_user,
                    (epoch_ns(ts) // 1000 // 300000000) * 300000000 AS b_us
             FROM events WHERE event_type = 'purchase')
      SELECT a.user_id, a.signup_id, pb.b_us AS purchase_bucket_us
      FROM a JOIN pb ON a.user_id = pb.b_user
       AND pb.b_us >= (a.a_us // 300000000) * 300000000
       AND pb.b_us <= a.a_us + 3600000000
      ORDER BY user_id, signup_id, purchase_bucket_us"""),
    run = (s, dir) =>
      EventStream.streamStreamJoinHotkeyDrained(s, s"$dir/events.parquet")
        .orderBy("user_id", "signup_id", "purchase_bucket_us"))

  private val streamTwsUserStats = GraftQuery(
    name = "stream_tws_user_stats",
    doc = "Drained transformWithState run (Spark 4's arbitrary-stateful-" +
      "processing v2, the successor to map/flatMapGroupsWithState): " +
      "per-user event count, DISTINCT event-type count, and first/last " +
      "event time, held as composed typed state primitives — a " +
      "ValueState scalar aggregate plus a MapState distinct-set whose " +
      "per-batch cost is O(keys touched), not O(state) (each primitive " +
      "is its own RocksDB column family; Spark supports the operator " +
      "only on RocksDBStateStoreProvider, so this row also exercises " +
      "the 100 TB state posture end-to-end on every run). All stats " +
      "are order-insensitive and monotone, so the drain is correct " +
      "under any batch split; the oracle recomputes the final state in " +
      "batch SQL over the same microsecond-floored timestamps.",
    oracle = Some("""
      SELECT user_id, COUNT(*) AS n_events,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
             MIN(epoch_ns(ts) // 1000) AS first_ts_us,
             MAX(epoch_ns(ts) // 1000) AS last_ts_us
      FROM events GROUP BY user_id ORDER BY user_id"""),
    run = (s, dir) =>
      EventStream.userStatsDrained(s, s"$dir/events.parquet")
        .orderBy("user_id"))

  private val streamTwsBootstrap = GraftQuery(
    name = "stream_tws_bootstrap",
    doc = "Drained StatefulProcessorWithInitialState run - the STATE " +
      "MIGRATION surface: even event_ids are the 'historical archive' " +
      "aggregated in batch into per-user snapshots (scalar totals + the " +
      "distinct event-type SET, so the MapState is seeded entry-by-" +
      "entry, not just the ValueState); odd event_ids then stream " +
      "through the processor starting from that state - how a " +
      "production pipeline backfills history and goes live without " +
      "replaying the archive through the stream. Emitted rows are " +
      "cumulative totals with bootstrap included, so the monotone fold " +
      "over sink UNION snapshot (batch-only users never stream a row) " +
      "must equal the FULL-corpus aggregation, which is exactly what " +
      "the oracle computes - a snapshot ignored, a lost set entry, or " +
      "an unseeded scalar all shift streamed users' totals and fail " +
      "the hash compare. RocksDB-forced like every tws drain.",
    oracle = Some("""
      SELECT user_id, COUNT(*) AS n_events,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
             MIN(epoch_ns(ts) // 1000) AS first_ts_us,
             MAX(epoch_ns(ts) // 1000) AS last_ts_us
      FROM events GROUP BY user_id ORDER BY user_id"""),
    run = (s, dir) =>
      EventStream.userStatsBootstrapDrained(s, dir).orderBy("user_id"))

  private val streamStateMigration = GraftQuery(
    name = "stream_state_migration",
    doc = "END-TO-END OFFLINE STATE-REPARTITION run - the operational " +
      "answer to a stateful query's frozen state-partition count (it " +
      "is read from the checkpoint at every restart, so scaling a hot " +
      "job means rebuilding its state): the original 4-partition " +
      "query's checkpoint over the historic half (even event_ids, " +
      "built once per JVM as the pre-existing production state) is " +
      "read back via the statestore data source, re-bucketed to 8 " +
      "state partitions through the initial-state bootstrap surface " +
      "(Spark's own first-batch exchange does the re-hash), and the " +
      "live half (odd event_ids) resumes against the new checkpoint. " +
      "The fold over sink UNION snapshot must equal the FULL-corpus " +
      "per-user aggregation - a key lost or doubled anywhere in " +
      "read-back, re-bucket, or resume shifts some user's totals and " +
      "fails the hash compare. StateMigrationSpec additionally pins " +
      "that the new checkpoint physically carries 8 partitions and " +
      "that its own state equals the full-corpus truth.",
    oracle = Some("""
      SELECT user_id, COUNT(*) AS n_events,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
             MIN(epoch_ns(ts) // 1000) AS first_ts_us,
             MAX(epoch_ns(ts) // 1000) AS last_ts_us
      FROM events GROUP BY user_id ORDER BY user_id"""),
    run = (s, dir) =>
      EventStream.stateMigrationDrained(s, dir).orderBy("user_id"))

  private val streamSessionMigration = GraftQuery(
    name = "stream_session_migration",
    doc = "END-TO-END TIMER-STATE migration - the hard half of the " +
      "offline state-repartition recipe (stream_state_migration moves " +
      "fold state; session state also carries a PENDING EVENT-TIME " +
      "TIMER per open session): the original 4-partition session query " +
      "runs the historic half of events (time-split at the event-time " +
      "midpoint, nudged off the 1 ms timer-floor ambiguity window), " +
      "its open-session state is read back via the statestore source, " +
      "and an 8-partition query resumes on the live half through " +
      "StatefulProcessorWithInitialState, RE-REGISTERING every open " +
      "session's closing timer in handleInitialState. Emitted rows " +
      "from both runs together must equal the UNBROKEN full-corpus " +
      "session answer (stream_session_timeout's oracle) - a session " +
      "STRADDLING the migration boundary only comes out right if both " +
      "its state and its timer crossed; a dropped timer leaves " +
      "pre-migration idle sessions unclosed (missing rows), a stale " +
      "one double-fires (extra rows), and either fails the hash.",
    oracle = Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
                 FROM events),
      mx AS (SELECT MAX(ts_us) // 1000 AS max_ms FROM e),
      x AS (SELECT user_id, ts_us, event_id,
              CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                     ORDER BY ts_us, event_id) IS NULL
                    OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                         ORDER BY ts_us, event_id) > 1800000000
                   THEN 1 ELSE 0 END AS new_session
            FROM e),
      s AS (SELECT user_id, ts_us,
              SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts_us, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM x),
      g AS (SELECT user_id, sid, MIN(ts_us) AS session_start_us,
              MAX(ts_us) AS session_end_us, COUNT(*) AS n_events
            FROM s GROUP BY user_id, sid),
      r AS (SELECT g.*, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY sid DESC) AS rn FROM g)
      SELECT user_id, session_start_us, session_end_us, n_events
      FROM r, mx
      WHERE rn > 1 OR session_end_us // 1000 + 1800000 <= max_ms
      ORDER BY user_id, session_start_us"""),
    run = (s, dir) =>
      EventStream.sessionMigrationDrained(s, dir)
        .select("user_id", "session_start_us", "session_end_us", "n_events")
        .orderBy("user_id", "session_start_us"))

  private val streamSessionTimeout = GraftQuery(
    name = "stream_session_timeout",
    doc = "Drained transformWithState run with EVENT-TIME TIMERS - the " +
      "production closure path for gap sessions that " +
      "flatMapGroupsWithState's NoTimeout drains explicitly defer: a " +
      "30-minute session closes when a newer event from the same user " +
      "exceeds the gap (closed_by='event') OR when the watermark passes " +
      "the timer registered at last_event + gap (closed_by='timer'), " +
      "which also CLEARS the key's state - the property that bounds " +
      "state on an unbounded stream (an idle user costs nothing one gap " +
      "after their last event). Spark's timer sweep is non-strict " +
      "(expiry <= watermark, boundary-pinned in SessionTimeoutSpec), " +
      "and with watermark delay 0 the final watermark is " +
      "floor(global_max_us/1000), so the drained answer is pure batch " +
      "arithmetic: every session except still-open tails with " +
      "floor(last_us/1000) + 1800000 > floor(max_us/1000) - which is " +
      "exactly what the oracle replays. RocksDB-forced like every " +
      "transformWithState drain.",
    oracle = Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
                 FROM events),
      mx AS (SELECT MAX(ts_us) // 1000 AS max_ms FROM e),
      x AS (SELECT user_id, ts_us, event_id,
              CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                     ORDER BY ts_us, event_id) IS NULL
                    OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                         ORDER BY ts_us, event_id) > 1800000000
                   THEN 1 ELSE 0 END AS new_session
            FROM e),
      s AS (SELECT user_id, ts_us,
              SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts_us, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM x),
      g AS (SELECT user_id, sid, MIN(ts_us) AS session_start_us,
              MAX(ts_us) AS session_end_us, COUNT(*) AS n_events
            FROM s GROUP BY user_id, sid),
      r AS (SELECT g.*, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY sid DESC) AS rn FROM g)
      SELECT user_id, session_start_us, session_end_us, n_events,
             CASE WHEN rn > 1 THEN 'event' ELSE 'timer' END AS closed_by
      FROM r, mx
      WHERE rn > 1 OR session_end_us // 1000 + 1800000 <= max_ms
      ORDER BY user_id, session_start_us"""),
    run = (s, dir) =>
      EventStream.sessionTimeoutDrained(s, s"$dir/events.parquet")
        .orderBy("user_id", "session_start_us"))

  private val streamForeachBatchUpsert = GraftQuery(
    name = "stream_foreachbatch_upsert",
    doc = "Drained foreachBatch UPSERT sink: the event stream, split " +
      "into 4 landing files and read with maxFilesPerTrigger=1 so " +
      "Trigger.AvailableNow runs 4 real micro-batches, each SCD1-" +
      "merged into a parquet target (latest event per user + running " +
      "count) — the streaming SINK surface memory sinks can't show " +
      "(production pipelines merge, not append). The merge combinator " +
      "(max latest-struct, sum count) is associative+commutative, so " +
      "the final target is independent of the batch split and equals " +
      "the batch latest-per-user answer, which is what the oracle " +
      "checks. State lives in the target table itself — restart-safe.",
    oracle = Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
                        value
                 FROM events),
      r AS (SELECT user_id, ts_us, event_id, value,
              row_number() OVER (PARTITION BY user_id
                ORDER BY ts_us DESC, event_id DESC) AS rk,
              COUNT(*) OVER (PARTITION BY user_id) AS n_events
            FROM e)
      SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
             value AS last_value, CAST(n_events AS BIGINT) AS n_events
      FROM r WHERE rk = 1 ORDER BY user_id"""),
    run = (s, dir) =>
      EventStream.foreachBatchUpsertDrained(s, dir)
        .orderBy("user_id"))

  private val streamSessionWindow = GraftQuery(
    name = "stream_session_window",
    doc = "NATIVE streaming session windows - Spark's built-in " +
      "session_window aggregation run as a real watermarked append " +
      "query (the declarative twin of the transformWithState session " +
      "processors; state merging is the ENGINE's, MergingSessionsExec, " +
      "not custom code). 30-min gap per user, 0-second watermark: a " +
      "session emits exactly once its end + gap falls behind the " +
      "final watermark, so the oracle is the gaps-and-islands session " +
      "derivation restricted to CLOSED sessions (end + gap <= " +
      "ms-floored max event time - Spark tracks watermarks at " +
      "millisecond resolution). session_end_us is the last event time " +
      "(window.end minus the gap), the tws processors' convention. " +
      "Cross-batch session MERGING is pinned in SessionWindowSpec (a " +
      "time-split two-batch run must equal the single-batch run). " +
      "File sink: session output is data-sized.",
    oracle = Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
                 FROM events),
      mx AS (SELECT MAX(ts_us // 1000) AS max_ms FROM e),
      x AS (SELECT user_id, ts_us, event_id,
              CASE WHEN lag(ts_us) OVER (PARTITION BY user_id
                     ORDER BY ts_us, event_id) IS NULL
                    OR ts_us - lag(ts_us) OVER (PARTITION BY user_id
                         ORDER BY ts_us, event_id) > 1800000000
                   THEN 1 ELSE 0 END AS new_session
            FROM e),
      s AS (SELECT user_id, ts_us, event_id,
              SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts_us, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM x),
      g AS (SELECT user_id, sid, MIN(ts_us) AS session_start_us,
              MAX(ts_us) AS session_end_us, COUNT(*) AS n_events
            FROM s GROUP BY user_id, sid)
      SELECT user_id, session_start_us, session_end_us, n_events
      FROM g, mx
      WHERE session_end_us + 1800000000 <= max_ms * 1000
      ORDER BY user_id, session_start_us"""),
    run = (s, dir) =>
      EventStream.sessionWindowDrained(s, s"$dir/events.parquet")
        .orderBy("user_id", "session_start_us"))

  private val streamManifestSink = GraftQuery(
    name = "stream_manifest_sink",
    doc = "EXACTLY-ONCE streaming ingest through the manifest log " +
      "(r15) - the seam where the streaming family meets the " +
      "lakehouse family (Delta's txn/setTransaction action): each " +
      "micro-batch (4 event-cohort landing files, maxFilesPerTrigger=" +
      "1, pinned mtimes) lands parquet files and publishes ONE atomic " +
      "manifest carrying an (appId, batchId) txn marker; a replayed " +
      "batch finds its marker IN THE LOG and no-ops. The run then " +
      "re-executes the ENTIRE stream against a fresh checkpoint - " +
      "total streaming-checkpoint loss, the replay case batchId-keyed " +
      "version dirs (stream_foreachbatch_upsert) cannot survive - and " +
      "requires the log to still end at v3. Oracle: per-user count / " +
      "decimal-sum / last-ts over the raw events - ANY double-ingest " +
      "the txn protocol let through doubles a count and fails the " +
      "hash, as does any batch wrongly skipped. Txn markers fold " +
      "through checkpoints (CheckpointPolicy every=2 fires mid-run) " +
      "and survive manifest pruning - ManifestSinkSpec pins both plus " +
      "the check-then-publish race. At 100 TB: append-only data " +
      "files, one small JSON per batch, metadata-sized replay.",
    oracle = Some("""
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             MAX(epoch_ns(ts) // 1000) AS last_ts_us
      FROM events GROUP BY user_id ORDER BY user_id"""),
    run = (s, dir) =>
      graft.streaming.ManifestSink.ingested(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"),
          max(col("ts_us")).as("last_ts_us"))
        .orderBy("user_id"))

  private val streamSinkPoint = GraftQuery(
    name = "stream_sink_point",
    doc = "INDEXED reads over the STREAMING-ingested table (r16): " +
      "stream_manifest_sink's micro-batches now land through the " +
      "single-pass writer, so each batch's commit carries per-file " +
      "[min,max] user_id/ts_us stats AND event_id bloom sidecars " +
      "folded inside the write loop itself - the streaming table is " +
      "servable by every manifest index class the moment a batch " +
      "commits, with zero read-back IO on the hot ingest path (the " +
      "production property: a streaming lakehouse writer that lands " +
      "unindexed files forces every downstream read to full-scan " +
      "until the next OPTIMIZE). This query point-looks-up one " +
      "event_id through the bloom prune and range-filters a user " +
      "band through the planning-time stats prune, over the table " +
      "the exactly-once replay protocol built - so the oracle " +
      "(raw-corpus replay) also re-proves no batch was double-" +
      "ingested into the index path. At 100 TB: the prune decides " +
      "'which of the stream's thousands of batch files' from " +
      "metadata + KB sidecars, never from data.",
    oracle = Some("""
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
             CAST(value AS DOUBLE) AS value
      FROM events
      WHERE event_id = 2024 OR
            (user_id BETWEEN 2 AND 3 AND event_id % 97 = 0)
      ORDER BY event_id"""),
    run = (s, dir) => {
      val root = graft.streaming.ManifestSink.ingestRoot(s, dir)
      val latest = graft.sources.ManifestLog.latestVersion(root).get
      val point = graft.sources.ManifestLog
        .readVersionPoint(s, root, latest, "event_id", 2024L)
        .filter(col("event_id") === 2024L)
      val band = graft.sources.ManifestLog
        .readVersionIndexed(s, root, latest)
        .filter(col("user_id").between(2, 3) &&
          col("event_id") % 97 === 0)
      point.unionByName(band).distinct()
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("value"))
        .orderBy("event_id")
    })

  private val streamCdcSource = GraftQuery(
    name = "stream_cdc_source",
    doc = "DataSource-V2 STREAMING SOURCE over the manifest log's " +
      "version tail (r15) - offsets ARE versions: a custom " +
      "MicroBatchStream (with SupportsAdmissionControl and native " +
      "Trigger.AvailableNow support) plans each micro-batch as the " +
      "files ADDED by the next maxVersionsPerTrigger=1 versions of " +
      "stream_manifest_sink's table, read by executor-side parquet " +
      "Group readers and stamped _commit_version - so the streaming " +
      "consumer is driven by the same LOG that drives every snapshot " +
      "read (a landed-but-never-committed file is invisible here " +
      "exactly as it is there), not by directory listings. The drain " +
      "runs 4 REAL micro-batches (one per committed version; " +
      "ManifestCdcSourceSpec pins the batch count, per-batch rows, " +
      "cursor semantics, and that a REWRITING commit fails loudly " +
      "rather than replaying as a row feed). Oracle: per-user " +
      "count/decimal-sum with versions_seen = distinct cohorts, over " +
      "the raw events - a version skipped, double-admitted, or " +
      "mis-stamped fails the hash. At 100 TB each trigger reads one " +
      "batch's files; admission control, not table size, bounds it.",
    oracle = Some("""
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             CAST(COUNT(DISTINCT event_id % 4) AS BIGINT) AS versions_seen
      FROM events GROUP BY user_id ORDER BY user_id"""),
    run = (s, dir) => {
      val root = graft.streaming.ManifestSink.ingestRoot(s, dir)
      val (rows, _) = graft.streaming.ManifestSink.cdcDrained(s, root)
      rows.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
            .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"),
          countDistinct(col("_commit_version")).as("versions_seen"))
        .orderBy("user_id")
    })

  private val streamCdcImages = GraftQuery(
    name = "stream_cdc_images",
    doc = "STREAMING CHANGE IMAGES (r17) - the row-level " +
      "_change_type feed served through Structured Streaming, the " +
      "half stream_cdc_source explicitly rejects (its append-only " +
      "row feed throws on rewrites and deletion vectors - that loud " +
      "rejection is retained and pinned): the DSv2 source's " +
      "mode=versions cursor feed paces the drain (offsets ARE " +
      "versions, maxVersionsPerTrigger=1 admission, AvailableNow " +
      "pinning), and a foreachBatch bridge plans readChangeImages " +
      "over each micro-batch's exact version range - the pre/post " +
      "full-outer join cannot be expressed as independent DSv2 " +
      "input partitions, which is what the bridge exists for. Each " +
      "batch lands idempotently in a batchId-keyed dir. The drain " +
      "walks the SCD1 ladder's 4 versions as 4 REAL micro-batches " +
      "(ManifestCdcSourceSpec pins batch count, drained == batch-" +
      "feed equality, and the MOR path: a deletion-vector ladder " +
      "streams delete images while the row feed still throws). " +
      "Oracle: the SAME raw-corpus image reconstruction as " +
      "lake_cdc_rowimages - so the streamed feed provably equals " +
      "the batch feed row for row. At 100 TB each trigger reads " +
      "only its versions' touched files, never the table.",
    oracle = Some("""
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
                        value, event_id % 4 AS b FROM events),
      st AS (SELECT v.b_max AS v, user_id,
               MAX(struct_pack(ts_us := ts_us, event_id := event_id,
                               value := value)) AS latest,
               COUNT(*) AS n_events
             FROM e CROSS JOIN (VALUES (0), (1), (2), (3)) v(b_max)
             WHERE e.b <= v.b_max GROUP BY 1, 2),
      j AS (SELECT COALESCE(n.v, o.v + 1) AS v,
                   COALESCE(n.user_id, o.user_id) AS user_id,
                   CASE WHEN o.user_id IS NULL THEN 'insert'
                        WHEN n.user_id IS NULL THEN 'delete'
                        WHEN n.latest <> o.latest OR
                             n.n_events <> o.n_events THEN 'update'
                        ELSE 'none' END AS cls,
                   o.latest AS ol, o.n_events AS oe,
                   n.latest AS nl, n.n_events AS ne
            FROM st n FULL JOIN (SELECT * FROM st WHERE v <= 2) o
              ON n.v = o.v + 1 AND n.user_id = o.user_id),
      f AS (
        SELECT v, user_id, 'insert' AS ct, nl AS img, ne AS nev
        FROM j WHERE cls = 'insert'
        UNION ALL
        SELECT v, user_id, 'delete', ol, oe FROM j WHERE cls = 'delete'
        UNION ALL
        SELECT v, user_id, 'update_preimage', ol, oe
        FROM j WHERE cls = 'update'
        UNION ALL
        SELECT v, user_id, 'update_postimage', nl, ne
        FROM j WHERE cls = 'update')
      SELECT CAST(v AS BIGINT) AS _commit_version, user_id,
             ct AS _change_type, img.ts_us AS ts_us,
             img.event_id AS event_id, CAST(img.value AS DOUBLE) AS value,
             CAST(nev AS BIGINT) AS n_events
      FROM f ORDER BY _commit_version, user_id, _change_type"""),
    run = (s, dir) => {
      val root = MaintenanceQueries.manifestEventsRoot(s, dir)
      val (rows, progress) =
        graft.streaming.ManifestSink.cdcImagesDrained(s, root,
          keys = Seq("user_id"))
      require(progress.count(_.numInputRows > 0) == 4,
        s"the 4-version ladder must drain as 4 real micro-batches: " +
          s"${progress.map(_.numInputRows).toList}")
      rows.select(col("_commit_version"), col("user_id"),
          col("_change_type"), col("latest.ts_us").as("ts_us"),
          col("latest.event_id").as("event_id"),
          col("latest.value").as("value"), col("n_events"))
        .orderBy("_commit_version", "user_id", "_change_type")
    })

  val all: Seq[GraftQuery] = Seq(streamWindowedCounts, streamSlidingCounts,
    streamSessionCounts,
    streamDedupExact, streamStaticJoin, streamLateData, streamStreamJoin,
    streamDedupWatermarked, streamSessionRows, streamForeachBatchUpsert,
    streamOuterJoin, streamStreamJoinHotkey, streamTwsUserStats,
    streamSessionTimeout, streamTwsBootstrap, streamStateMigration,
    streamSessionMigration, streamSessionWindow, streamManifestSink,
    streamSinkPoint, streamCdcSource, streamCdcImages)
}
