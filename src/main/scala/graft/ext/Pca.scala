package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed top-component PCA over an embedding column — the
  * dimensionality-reduction / whitening primitive of an embedding
  * pipeline (dead-dimension triage, compression ahead of ANN, drift
  * monitoring between embedding model versions).
  *
  * Scale shape (the MLlib / [[Similarity.centroids]] discipline): the
  * corpus-sized stages are two partial-aggregatable passes — per-dim
  * means (d rows out) and the upper-triangle second-moment matrix
  * (d·(d+1)/2 rows out, built scan-side as a per-row index pair array,
  * exploded, one groupBy) — so executors reduce N·d² products down to
  * a d²-bounded table and the driver holds O(d²) state, never O(N).
  * Power iteration then runs ON THE DRIVER over the d×d matrix (d = 64
  * here; 8 iterations of a 64×64 mat-vec is microseconds — shipping it
  * to the cluster would be pure overhead), and the resulting component
  * is broadcast back as literals into one codegen DotProduct per row
  * for projection. At 100 TB nothing changes: the two aggregation
  * passes scale with N, the driver math does not.
  *
  * Every driver-side fixed point is rounded (means/cov 6, iteration
  * vectors w 9 → v 6) so the DuckDB oracle replays the whole chain —
  * means, covariance, every power-iteration step, projection — from
  * the raw table, value for value: the fit is CHECKED, not trusted.
  */
object Pca {

  /** Number of power-iteration steps — fixed (not convergence-tested)
    * so the oracle's generated CTE chain replays the identical count.
    * The operator's artifact is therefore the t-STEP ITERATE, defined
    * exactly, not "the eigenvector": on a near-isotropic corpus (this
    * fixture's embeddings) the eigengap is small and the iterate still
    * drifts at step 8 — which is fine, because both engines compute
    * the identical drift and the component's QUALITY is pinned
    * separately (PcaSpec: Rayleigh quotient non-decreasing per step —
    * the power-iteration law — and ≥ every coordinate axis at the
    * final step). A deployment chasing the true eigenvector raises
    * the count; the mechanism is step-count-generic.
    */
  val PowerIters = 8

  /** Per-dim means (round 6) and the FULL symmetric covariance matrix
    * (round 6, E[XY] − E[X]E[Y] over the 6-rounded fixed points),
    * collected to the driver: d + d² doubles of driver state.
    */
  def covariance(vecs: DataFrame, dim: Int)
      : (IndexedSeq[Double], Array[Array[Double]]) = {
    val x = vecs.select(posexplode(col("vec")).as(Seq("d", "val")))
    val means = x.groupBy(col("d")).agg(round(avg(col("val")), 6).as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val m = IndexedSeq.tabulate(dim)(means)
    // Upper-triangle index-pair products built scan-side: the inner
    // slice starts at the outer index, so each (i ≤ j) pair appears
    // once per row — N·d(d+1)/2 exploded rows into ONE aggregation.
    val s = vecs.select(explode(expr(
        "flatten(transform(vec, (xi, i) -> " +
          "transform(slice(vec, i + 1, size(vec) - i), (xj, jj) -> " +
          "struct(i AS i, i + jj AS j, xi * xj AS p))))")).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.p").as("p"))
      .groupBy(col("i"), col("j")).agg(round(avg(col("p")), 6).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val c = Array.tabulate(dim, dim) { (i, j) =>
      val key = (math.min(i, j), math.max(i, j))
      BigDecimal(s(key) - m(i) * m(j))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (m, c)
  }

  /** Dominant eigenvector by fixed-count power iteration over the
    * driver-resident matrix: v₀ = 1⃗, then `iters` rounds of
    * wᵢ = round(Σⱼ Cᵢⱼ·vⱼ, 9), v = round(w/‖w‖, 6). The per-step
    * rounding is what makes the SQL replay exact — both engines
    * converge onto the same fixed-point grid each step.
    */
  def powerIterate(c: Array[Array[Double]], iters: Int): IndexedSeq[Double] = {
    val dim = c.length
    var v = IndexedSeq.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      val w = IndexedSeq.tabulate(dim) { i =>
        val raw = (0 until dim).map(j => c(i)(j) * v(j)).sum
        BigDecimal(raw).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val n = math.sqrt(w.map(x => x * x).sum)
      v = w.map(x => BigDecimal(x / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    v
  }

  /** (means, top component) for an (id, vec) frame. */
  def fit(vecs: DataFrame, dim: Int): (IndexedSeq[Double], IndexedSeq[Double]) = {
    val (m, c) = covariance(vecs, dim)
    (m, powerIterate(c, PowerIters))
  }

  /** Variance accounting for a fitted component: Rayleigh quotient
    * λ = round(Σᵢ vᵢ·round(Σⱼ Cᵢⱼvⱼ, 9), 6) (the captured variance —
    * same fixed-point mat-vec rule as the iteration, so the oracle
    * replays it), total variance = round(Σᵢ Cᵢᵢ, 6), and the explained
    * share — the number that says whether one component is worth
    * keeping before anyone projects anything.
    */
  def varianceAccount(c: Array[Array[Double]], v: IndexedSeq[Double])
      : (Double, Double, Double) = {
    val dim = c.length
    val w = IndexedSeq.tabulate(dim) { i =>
      BigDecimal((0 until dim).map(j => c(i)(j) * v(j)).sum)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val lambda = BigDecimal(v.zip(w).map { case (a, b) => a * b }.sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val trace = BigDecimal((0 until dim).map(i => c(i)(i)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val explained = BigDecimal(lambda / trace)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (lambda, trace, explained)
  }

  /** Per-row projection onto the fitted component: one codegen
    * DotProduct against the literal component, minus the constant
    * mean offset (Σ(x−m)·v = x·v − m·v) — scan-side, no shuffle, the
    * serving shape of a trained projection.
    */
  def project(vecs: DataFrame, means: IndexedSeq[Double],
      comp: IndexedSeq[Double]): DataFrame = {
    val offset = means.zip(comp).map { case (a, b) => a * b }.sum
    vecs.select(col("id"),
      round(Similarity.dot(col("vec"), typedLit(comp)) - lit(offset), 6)
        .as("proj"))
  }
}
