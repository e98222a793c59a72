package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the window-boundary semantics the DuckDB oracles rely on:
  * half-open session windows (a gap of exactly the timeout starts a
  * new session) and epoch-aligned tumbling starts.
  */
class WindowSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session window: gap of exactly the timeout MERGES; beyond it breaks") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:05:00")), // exactly 5:00 gap -> Spark merges
      (1L, ts("2024-01-01 10:10:01")), // 5:01 gap -> new session
      (2L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    val out = ev.groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").cast("string"), col("user_id"), col("n"))
      .as[(String, Long, Long)].collect().toSet
    // This inclusive-boundary behavior is what the events_session
    // DuckDB oracle mirrors with `<= INTERVAL` (a strict < would
    // diverge exactly here).
    assert(out == Set(
      ("2024-01-01 10:00:00", 1L, 2L),
      ("2024-01-01 10:10:01", 1L, 1L),
      ("2024-01-01 10:00:00", 2L, 1L)))
  }

  test("tumbling windows are epoch-aligned (matching DuckDB time_bucket)") {
    val ev = Seq(ts("2024-03-07 23:52:30")).toDF("ts")
    val w = ev.select(window(col("ts"), "15 minutes").getField("start").cast("string"))
      .as[String].collect().head
    assert(w == "2024-03-07 23:45:00")
  }

  test("running totals: identical-ts ties resolve by event_id, not input order") {
    // events_running_totals was hash-red in round 5: with nano fixtures
    // Spark ordered by micro-truncated ts while DuckDB kept full
    // precision, so sub-microsecond near-ties reordered rows within a
    // user and shifted every subsequent running sum. With both engines
    // on microsecond timestamps the ORDER BY (ts, event_id) tiebreak is
    // total and deterministic — this plants an exact tie (and a
    // reversed-input near-tie) to pin that the tiebreak, not input
    // order, decides the trajectory.
    val t0 = ts("2024-01-01 10:00:00")
    val ev = Seq( // deliberately out of event_id order
      (7L, 30L, t0, 3.0),               // exact tie with event_id 10
      (7L, 10L, t0, 1.0),
      (7L, 20L, new Timestamp(t0.getTime + 1), 2.0)) // 1ms later
      .toDF("user_id", "event_id", "ts", "value")
      .repartition(2) // shuffle away any residual input ordering
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val out = ev.select(col("event_id"),
        count(lit(1)).over(w).as("rc"),
        sum(floor(col("value") * 100).cast("long")).over(w).as("cents"))
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((10L, 1L, 100L), (30L, 2L, 400L), (20L, 3L, 600L)))
  }
}
