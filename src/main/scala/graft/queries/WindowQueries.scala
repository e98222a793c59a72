package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-contract queries + DuckDB oracles for event-time windowed
  * aggregation over `events.ts` (streaming extension, SURVEY.md §7.4:
  * the reference has no event time at all — §2.2).
  *
  * These run here as batch queries so the DuckDB oracle can check them;
  * [[graft.streaming.StreamingPipeline]] applies the *same* logical
  * windows under Structured Streaming with a watermark, and the
  * MemoryStream parity suite asserts batch ≡ streaming on identical
  * input. Spark window starts are epoch-aligned; so is DuckDB's
  * `time_bucket` for minute-granularity buckets (its 2000-01-01 origin
  * is a multiple of 15 minutes past the epoch), so the two agree
  * exactly.
  */
object WindowQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tumbling 15-minute windows per event type.
    "events_window_tumbling" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
          col("event_type"), col("n"))),

    // Sliding 30-minute windows every 15 minutes (each event lands in
    // exactly two windows).
    "events_window_sliding" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "30 minutes", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("event_type"), col("n"))),

    // Per-user session windows with a 5-minute inactivity gap.
    "events_session" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("session_window.start").as("s_start"),
          col("session_window.end").as("s_end"), col("user_id"), col("n"))),

    // Finalized-horizon dedup — the deterministic batch twin of the
    // streaming dropDuplicatesWithinWatermark tier (E52): earliest
    // event per (user, type) within each 15-minute horizon bucket,
    // ties broken by event_id. StreamingSpec pins stream ≡ twin on
    // bucket-local duplicates; this row hash-checks the twin itself.
    "events_dedup_horizon" -> ((s, dir) =>
      graft.streaming.StreamingPipeline.horizonDedupBatch(
          Tables.events(s, dir).select("event_id", "ts", "user_id", "event_type"),
          Seq("user_id", "event_type"), "ts", "15 minutes", "event_id")),

    // Batch twin of E124's transformWithState running totals
    // (StreamingPipeline.RunningTotalProcessor): the processor's state
    // after each input row IS the cumulative (count, cents) over the
    // key's event-time history, so the per-event state trajectory is
    // SQL-expressible as unbounded-preceding window aggregates —
    // one row per event, ties broken by event_id exactly like the
    // single-threaded per-key iterator order the stream guarantees.
    // StreamingSpec pins the streaming operator's cross-batch state;
    // this row hash-checks the same arithmetic against DuckDB.
    "events_running_totals" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      Tables.events(s, dir).select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("running_count"),
        sum(floor(col("value") * 100).cast("long")).over(w)
          .as("running_cents"))
    }))

  val oracles: Map[String, String] = Map(
    "events_window_tumbling" ->
      """SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) AS w_start,
        |       time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |         + INTERVAL '15 minutes' AS w_end,
        |       event_type, count(*) AS n
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "events_window_sliding" ->
      """WITH t AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |x AS (SELECT unnest([time_bucket(INTERVAL '15 minutes', ts),
        |                     time_bucket(INTERVAL '15 minutes', ts)
        |                       - INTERVAL '15 minutes']) AS w_start,
        |             event_type
        |      FROM t)
        |SELECT w_start, event_type, count(*) AS n FROM x GROUP BY 1, 2""".stripMargin,

    // Gaps-and-islands: a session breaks only when the gap to the
    // previous event EXCEEDS the timeout — Spark merges an event at
    // exactly prev + gap into the running session (verified by
    // WindowSemanticsSpec; a strict < here would silently diverge the
    // day two fixture timestamps land exactly one gap apart).
    "events_session" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |m AS (SELECT user_id, ts,
        |             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                       <= INTERVAL '5 minutes'
        |                  THEN 0 ELSE 1 END AS brk
        |      FROM e),
        |g AS (SELECT user_id, ts,
        |             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                            ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT min(ts) AS s_start, max(ts) + INTERVAL '5 minutes' AS s_end,
        |       user_id, count(*) AS n
        |FROM g GROUP BY user_id, sid""".stripMargin,

    "events_dedup_horizon" ->
      """WITH r AS (
        |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
        |         row_number() OVER (
        |           PARTITION BY user_id, event_type,
        |             time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
        |           ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |  FROM events)
        |SELECT event_id, ts, user_id, event_type FROM r WHERE rn = 1""".stripMargin,

    "events_running_totals" ->
      """SELECT user_id, event_id,
        |       count(*) OVER w AS running_count,
        |       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS running_cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY CAST(ts AS TIMESTAMP), event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        .stripMargin)
}
