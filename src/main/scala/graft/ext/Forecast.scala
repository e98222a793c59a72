package graft.ext

/** Holt linear-trend exponential smoothing (E305) — the engine's
  * predictive family: level + trend state folded once over an
  * ordered, zero-filled series, h-step forecasts ŷ(T+h) = l_T + h·b_T.
  * No seasonality term (this is Holt's linear method, not the full
  * Holt-Winters triple — named honestly).
  *
  * Determinism contract: the recurrence is a pure sequential fold —
  * l′ = α·y + (1−α)(l + b), b′ = β(l′ − l) + (1−β)b, initialized
  * l₁ = y₁, b₁ = y₂ − y₁ and consuming y₂..y_T — and α/(1−α)/β/(1−β)
  * are passed as SEPARATE literals (the MmrLambda discipline: both
  * engines parse the same decimal text to the same IEEE doubles; a
  * derived 1−α differs at the ulp). The DuckDB oracle replays the
  * fold as a recursive CTE with the identical expression tree —
  * prototyped bit-identical against this fold.
  *
  * Scale shape: the series is CALENDAR-bounded (one value per period
  * per key), never data-bounded — collecting it is the documented
  * bounded-driver-state discipline (the E78 gap-fill argument), and
  * the corpus-sized work is only the zero-filled aggregation.
  */
object Forecast {

  /** Fold the Holt recurrence over `y` (length ≥ 2); returns the
    * final (level, trend).
    */
  def holtFit(y: IndexedSeq[Double], alpha: Double, oneMinusAlpha: Double,
      beta: Double, oneMinusBeta: Double): (Double, Double) = {
    val (l, b, _) = holtFitResiduals(y, alpha, oneMinusAlpha, beta,
      oneMinusBeta)
    (l, b)
  }

  /** [[holtFit]] plus the one-step-ahead TRAIN residuals
    * r_t = y_t − (l_{t−1} + b_{t−1}) observed at each consumed step —
    * the calibration series a residual-based anomaly detector
    * thresholds on (E307). Same fold, residual read before each
    * update, so the oracle's recursive CTE replays both from one
    * chain.
    */
  def holtFitResiduals(y: IndexedSeq[Double], alpha: Double,
      oneMinusAlpha: Double, beta: Double, oneMinusBeta: Double)
      : (Double, Double, IndexedSeq[Double]) = {
    require(y.length >= 2, s"Holt needs >= 2 points, got ${y.length}")
    var l = y(0)
    var b = y(1) - y(0)
    val res = IndexedSeq.newBuilder[Double]
    var t = 1
    while (t < y.length) {
      res += y(t) - (l + b)
      val lPrev = l
      l = alpha * y(t) + oneMinusAlpha * (l + b)
      b = beta * (l - lPrev) + oneMinusBeta * b
      t += 1
    }
    (l, b, res.result())
  }
}
