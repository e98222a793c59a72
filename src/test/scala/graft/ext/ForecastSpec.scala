package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Holt linear-trend smoothing (E305): exactness on constant and
  * perfectly linear series (closed-form fixed points of the
  * recurrence), the ≥ 2-point guard, and fixture-row coherence.
  */
class ForecastSpec extends SparkSpec {
  import Forecast._

  test("a constant series yields zero trend and exact forecasts") {
    val (l, b) = holtFit(IndexedSeq.fill(10)(7.0), 0.5, 0.5, 0.3, 0.7)
    assert(l === 7.0 && b === 0.0)
  }

  test("a perfectly linear series is tracked exactly: level rides the " +
      "line, trend equals the slope") {
    val y = (1 to 12).map(t => 3.0 + 2.0 * t)
    val (l, b) = holtFit(y, 0.5, 0.5, 0.3, 0.7)
    assert(math.abs(l - y.last) < 1e-12, s"level $l != ${y.last}")
    assert(math.abs(b - 2.0) < 1e-12, s"trend $b != 2.0")
  }

  test("fewer than two points refuses") {
    intercept[IllegalArgumentException] {
      holtFit(IndexedSeq(1.0), 0.5, 0.5, 0.3, 0.7)
    }
  }

  test("forecast audit coheres: nonnegative MAEs and the verdict " +
      "recomputes from its own columns") {
    val a = graft.queries.AnalyticsQueries
      .queries("events_forecast_audit")(spark, sfDir).localCheckpoint(false)
    assert(a.count() === 5)
    val neg = a.filter(col("mae_holt") < 0 || col("mae_naive") < 0 ||
      col("mae_snaive") < 0)
    assert(neg.isEmpty, "a negative MAE")
    val bad = a.filter(col("holt_beats_naive") =!=
      (col("mae_holt") < col("mae_naive")))
    assert(bad.isEmpty, "verdict disagrees with the emitted MAEs")
  }

  test("residual anomaly detector: exactly the planted spike trips, " +
      "and verdicts recompute from their own columns") {
    val a = graft.queries.AnalyticsQueries
      .queries("events_forecast_anomaly")(spark, sfDir).localCheckpoint(false)
    val hits = a.filter(col("is_anomaly")).collect()
    assert(hits.length === 1, s"expected only the plant, got ${hits.length}")
    assert(hits(0).getAs[String]("event_type") === "view",
      "the anomaly is not on the planted type")
    val bad = a.filter(col("is_anomaly") =!=
      (col("abs_err") > lit(3.0) * col("train_mar")))
    assert(bad.isEmpty, "a verdict disagrees with its own threshold")
  }

  test("fixture rows cohere: 5 types x holdout days, abs_err matches " +
      "|actual - forecast|") {
    val r = graft.queries.AnalyticsQueries
      .queries("events_holt_forecast")(spark, sfDir).localCheckpoint(false)
    assert(r.select("event_type").distinct().count() === 5)
    val perType = r.groupBy("event_type").agg(count(lit(1)).as("n"))
      .select("n").distinct().collect()
    assert(perType.length === 1, "holdout length differs across types")
    val bad = r.filter(
      abs(col("abs_err") - abs(col("n_actual") - col("forecast"))) > 1e-5)
    assert(bad.isEmpty, "abs_err disagrees with |actual - forecast|")
  }
}
