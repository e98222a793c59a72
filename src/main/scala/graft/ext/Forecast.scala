package graft.ext

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

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

  /** DISTRIBUTED per-series fit (E312, VERDICT r13 #2): the identical
    * JVM fold as a UDF over a series' ordered, zero-filled value
    * array — one executor task per series instead of a driver loop in
    * |series|. `(y, tTrain) → (level, trend, mean |train residual|)`,
    * with the fold consuming exactly `y.take(tTrain)` (the 80% train
    * prefix) and the residual mean folded in day order — byte-for-byte
    * the arithmetic of [[holtFitResiduals]] plus E307's calibration
    * fold, so the driver-loop formulation, this distributed one, the
    * E308 streaming processor, and the DuckDB recursive-CTE oracle all
    * agree bit-exactly (HoltDistributedSpec pins the first three).
    * The array itself is CALENDAR-bounded per series (one value per
    * day), so per-task state stays bounded at any corpus size; the
    * per-series row count is the only thing that grows, and it grows
    * across executors, not on the driver.
    */
  def holtFitStateUdf(alpha: Double, oneMinusAlpha: Double,
      beta: Double, oneMinusBeta: Double): UserDefinedFunction =
    udf((y: Seq[Double], tTrain: Int) => {
      val (l, b, res) = holtFitResiduals(y.take(tTrain).toIndexedSeq,
        alpha, oneMinusAlpha, beta, oneMinusBeta)
      val mar = res.foldLeft(0.0)((a, r) => a + math.abs(r)) /
        res.length.toDouble
      (l, b, mar)
    })

  /** Distributed per-series forecast AUDIT (E306's arithmetic off the
    * driver): `(y, tTrain) → (n_holdout, mae_holt, mae_naive,
    * mae_snaive, holt_beats_naive)` — holdout MAEs folded in day
    * order (the oracle's `list_reduce ORDER BY rn`), one division at
    * the end, seasonal lag 7.
    */
  def holtAuditUdf(alpha: Double, oneMinusAlpha: Double,
      beta: Double, oneMinusBeta: Double): UserDefinedFunction =
    udf((ys: Seq[Double], tTrain: Int) => {
      val y = ys.toIndexedSeq
      val (l, b) = holtFit(y.take(tTrain), alpha, oneMinusAlpha, beta,
        oneMinusBeta)
      val hold = tTrain until y.length
      val n = hold.length.toDouble
      def mae(err: Int => Double): Double =
        hold.foldLeft(0.0)((a, i) => a + err(i)) / n
      val mH = mae(i => math.abs(y(i) - (l + (i - tTrain + 1) * b)))
      val mN = mae(i => math.abs(y(i) - y(tTrain - 1)))
      val mS = mae(i => math.abs(y(i) - y(i - 7)))
      (hold.length.toLong, mH, mN, mS, mH < mN)
    })
}
