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
}
