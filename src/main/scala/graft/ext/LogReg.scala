package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** In-engine logistic-regression training by batch gradient descent —
  * the round-9 upgrade of the E166 quality gate from "serve fixed
  * published weights" to "fit the weights on the engine's own
  * features, then serve them" (the fastText-style quality-classifier
  * loop every curation pipeline runs: fit on a proxy label, audit
  * calibration, gate the corpus).
  *
  * Scale shape (the k-means/BPE iterate discipline): the feature frame
  * is standardized once (one aggregation for per-feature mean/stddev,
  * rounded to 6 decimals and folded back as literals), then every
  * descent step is ONE partial-aggregatable corpus pass — five
  * gradient sums + the log-loss in a single `agg` — followed by an
  * O(1) driver collect. Weights never live in executors; the corpus
  * never shuffles (aggregation partials only); `steps` passes over a
  * cached feature frame is exactly how MLlib's own LBFGS/GD drivers
  * iterate at cluster scale.
  *
  * Determinism (what lets DuckDB replay the fit): all arithmetic that
  * enters the next step is rounded to 6 decimals INSIDE the engine's
  * own `round` — feature means/stddevs, per-step gradient means, and
  * the updated weights `round(w − η·round(g, 6), 6)` — so double
  * fold-order and libm noise (~1e-13, far below the grain) never
  * accumulates across steps. The oracle unrolls the same steps as
  * generated SQL (the `Bpe.oracleChain` pattern) with the identical
  * round points.
  *
  * Input contract: `feats` has `doc_id`, `y` (0.0/1.0 label) and raw
  * feature columns `x1..x4`. Empty input is rejected (stats are
  * undefined); a zero-variance feature standardizes with divisor 1.
  */
object LogReg {

  /** Descent steps (weight updates). Step rows 0..Steps are emitted —
    * row 0 is the zero initialization, row k the weights after k
    * updates, each with the log-loss AT those weights.
    */
  val Steps = 8

  /** Learning rate — sane for standardized features (|z| stays in the
    * well-conditioned sigmoid range for the first dozens of steps).
    */
  val Eta = 0.5

  /** Per-feature standardization constants (rounded to 6 decimals). */
  final case class FeatStats(m: Array[Double], s: Array[Double])

  /** One emitted trajectory row: weights AFTER `step` updates and the
    * mean log-loss evaluated at them.
    */
  final case class FitStep(step: Int, bias: Double, w1: Double, w2: Double,
      w3: Double, w4: Double, logLoss: Double)

  private val Xs = (1 to 4).map(i => s"x$i")

  /** Mean/stddev_pop per feature, engine-rounded to 6 decimals. */
  def featStats(feats: DataFrame): FeatStats = {
    val aggs = Xs.flatMap { x =>
      Seq(round(avg(col(x)), 6).as(s"m_$x"),
        round(stddev_pop(col(x)), 6).as(s"s_$x"))
    }
    val rows = feats.agg(aggs.head, aggs.tail: _*).collect()
    require(rows.nonEmpty && !rows(0).isNullAt(0),
      "logreg fit needs a non-empty feature frame")
    val r = rows(0)
    FeatStats(
      Xs.indices.map(i => r.getDouble(2 * i)).toArray,
      Xs.indices.map(i => r.getDouble(2 * i + 1)).toArray)
  }

  /** Standardized feature columns from rounded stats (zero stddev →
    * divisor 1, matching the oracle's CASE).
    */
  def standardized(feats: DataFrame, st: FeatStats): DataFrame = {
    val cols = Xs.zipWithIndex.map { case (x, i) =>
      val div = if (st.s(i) == 0.0) 1.0 else st.s(i)
      ((col(x) - lit(st.m(i))) / lit(div)).as(x)
    }
    feats.select(col("doc_id") +: col("y") +: cols: _*)
  }

  /** Fit: returns the standardization stats and the full step
    * trajectory (`Steps` + 1 rows; last row carries the final
    * weights). `x` must be the [[standardized]] frame, cached by the
    * caller if the corpus is large — each step re-scans it once.
    */
  def fit(x: DataFrame, steps: Int = Steps, eta: Double = Eta): Seq[FitStep] = {
    require(steps >= 1, "need at least one descent step")
    var w = Array.fill(5)(0.0) // bias, w1..w4
    val out = Seq.newBuilder[FitStep]
    for (k <- 0 to steps) {
      val z = Xs.zipWithIndex.foldLeft(lit(w(0)).cast("double")) {
        case (acc, (xc, i)) => acc + lit(w(i + 1)) * col(xc)
      }
      val sig = lit(1.0) / (lit(1.0) + exp(-z))
      val resid = sig - col("y")
      val n = count(lit(1)).cast("double")
      // gradient means rounded IN-ENGINE, then the update rounded
      // IN-ENGINE from the rounded gradient — the oracle's exact order
      val gb = round(sum(resid) / n, 6)
      val gs = Xs.map(xc => round(sum(resid * col(xc)) / n, 6))
      val loss = round(-sum(col("y") * log(greatest(sig, lit(1e-12))) +
        (lit(1.0) - col("y")) * log(greatest(lit(1.0) - sig, lit(1e-12)))) / n, 6)
      val upd = (gb +: gs).zipWithIndex.map { case (g, i) =>
        round(lit(w(i)) - lit(eta) * g, 6).as(s"nw$i")
      }
      val r: Row = x.agg(loss.as("loss"), upd: _*).collect()(0)
      out += FitStep(k, w(0), w(1), w(2), w(3), w(4), r.getDouble(0))
      w = (0 until 5).map(i => r.getDouble(i + 1)).toArray
    }
    out.result()
  }

  /** Held-out evaluation (E208): one row (n, log_loss) — the mean
    * log-loss of the weights `w` over a [[standardized]] frame. Same
    * formula and round point as the in-fit loss, so evaluating the
    * final weights on the TRAIN frame reproduces the trajectory's last
    * log_loss exactly; pointing it at the val frame (standardized with
    * the TRAIN stats — the serving contract) is the generalization
    * check the E205 leakage-safe split exists to make honest. One
    * partial-aggregatable pass, O(1) output.
    */
  def lossAt(x: DataFrame, w: FitStep): DataFrame = {
    val ws = Array(w.bias, w.w1, w.w2, w.w3, w.w4)
    val z = Xs.zipWithIndex.foldLeft(lit(ws(0)).cast("double")) {
      case (acc, (xc, i)) => acc + lit(ws(i + 1)) * col(xc)
    }
    val sig = lit(1.0) / (lit(1.0) + exp(-z))
    val n = count(lit(1)).cast("double")
    x.agg(count(lit(1)).as("n"),
      round(-sum(col("y") * log(greatest(sig, lit(1e-12))) +
        (lit(1.0) - col("y")) * log(greatest(lit(1.0) - sig, lit(1e-12)))) / n, 6)
        .as("log_loss"))
  }

  // -----------------------------------------------------------------
  // DuckDB oracle: the same fit replayed as unrolled SQL steps
  // -----------------------------------------------------------------

  /** CTE chain replaying standardization + `steps` descent steps over
    * a caller-supplied feature CTE `f(doc_id, y, x1..x4)` (raw
    * features; `y` already 0.0/1.0). Produces:
    *   - `xs(doc_id, y, x1..x4)` — standardized features;
    *   - `wt0..wt{steps}` — 1-row weight tables (b, w1..w4);
    *   - `g0..g{steps}` — per-step gradient/loss rows;
    *   - `fitsteps(step, bias, w_ttr, w_stop, w_len, w_ntok,
    *     log_loss)` — the trajectory, row k = weights after k updates
    *     + loss at them.
    * Round points mirror [[fit]] exactly.
    */
  def oracleChain(steps: Int = Steps, eta: Double = Eta): String = {
    val sb = new StringBuilder
    val statCols = Xs.map(x =>
      s"round(avg($x), 6) AS m_$x, round(stddev_pop($x), 6) AS s_$x")
      .mkString(",\n         ")
    sb.append(
      s""",
         |st AS MATERIALIZED (
         |  SELECT $statCols
         |  FROM f),
         |xs AS MATERIALIZED (
         |  SELECT doc_id, y,
         |${Xs.map(x => s"         ($x - m_$x) / (CASE WHEN s_$x = 0 THEN 1.0 ELSE s_$x END) AS $x").mkString(",\n")}
         |  FROM f, st),
         |wt0 AS MATERIALIZED (SELECT CAST(0 AS DOUBLE) AS b,
         |  ${Xs.map(x => s"CAST(0 AS DOUBLE) AS w_$x").mkString(", ")})""".stripMargin)
    for (k <- 0 to steps) {
      val z = s"(b + ${Xs.map(x => s"w_$x * $x").mkString(" + ")})"
      val sig = s"(1.0 / (1.0 + exp(-$z)))"
      sb.append(
        s""",
           |g$k AS MATERIALIZED (
           |  SELECT round(sum($sig - y) / count(*), 6) AS gb,
           |${Xs.map(x => s"         round(sum(($sig - y) * $x) / count(*), 6) AS g_$x").mkString(",\n")},
           |         round(-sum(y * ln(greatest($sig, 1e-12))
           |                    + (1.0 - y) * ln(greatest(1.0 - $sig, 1e-12)))
           |               / count(*), 6) AS loss
           |  FROM xs, wt$k)""".stripMargin)
      if (k < steps) sb.append(
        s""",
           |wt${k + 1} AS MATERIALIZED (
           |  SELECT round(b - $eta * gb, 6) AS b,
           |${Xs.map(x => s"         round(w_$x - $eta * g_$x, 6) AS w_$x").mkString(",\n")}
           |  FROM wt$k, g$k)""".stripMargin)
    }
    sb.append(",\nfitsteps AS MATERIALIZED (\n")
    sb.append((0 to steps).map { k =>
      s"  SELECT CAST($k AS INTEGER) AS step, b AS bias, " +
        "w_x1 AS w_ttr, w_x2 AS w_stop, w_x3 AS w_len, w_x4 AS w_ntok, " +
        s"loss AS log_loss FROM wt$k, g$k"
    }.mkString("", "\n  UNION ALL\n", ")"))
    sb.toString
  }

  /** [[standardized]] in SQL over a CTE `src(doc_id, y, x1..x4)` using
    * the chain's TRAIN stats `st` — the held-out twin of the chain's
    * own `xs`.
    */
  def standardizeSql(src: String): String =
    s"""SELECT doc_id, y,
       |${Xs.map(x => s"       ($x - m_$x) / (CASE WHEN s_$x = 0 THEN 1.0 ELSE s_$x END) AS $x").mkString(",\n")}
       |FROM $src, st""".stripMargin

  /** [[lossAt]] in SQL: one (subset, n, log_loss) row for the weight
    * table `wt` evaluated over the standardized CTE `xsrc`.
    */
  def lossAtSql(subset: String, xsrc: String, wt: String): String = {
    val z = s"(b + ${Xs.map(x => s"w_$x * $x").mkString(" + ")})"
    val sig = s"(1.0 / (1.0 + exp(-$z)))"
    s"""SELECT '$subset' AS subset, count(*) AS n,
       |       round(-sum(y * ln(greatest($sig, 1e-12))
       |                  + (1.0 - y) * ln(greatest(1.0 - $sig, 1e-12)))
       |             / count(*), 6) AS log_loss
       |FROM $xsrc, $wt""".stripMargin
  }
}
