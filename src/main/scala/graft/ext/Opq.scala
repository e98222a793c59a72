package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned OPQ rotation — the PARAMETRIC variant of Ge et al. 2013
  * ("Optimized Product Quantization", CVPR 2013, §4): compute the
  * data's full PCA basis, then allocate principal directions to the
  * `numSub` PQ subspaces so each carries a comparable VARIANCE
  * PRODUCT (the paper's eigenvalue-allocation rule — minimizing the
  * bound on quantization distortion), and rotate the corpus into that
  * basis before PQ. This is the data-driven answer to E273/E274's
  * honest negative: the variance-balanced PERMUTATION (zero training)
  * measured ≤ raw on this fixture; a learned rotation is the next
  * rung the paper itself names.
  *
  * Machinery: the covariance comes from the E269 Gram aggregator
  * ([[Pca.covariance]] — d²-bounded aggregation, O(d²) driver state);
  * the FULL eigendecomposition runs on the driver via cyclic JACOBI
  * sweeps (textbook symmetric-eigen algorithm; d = 64 ⇒ microseconds,
  * the [[Pca.powerIterate]] driver-math discipline), fixed sweep
  * count so the result is a deterministic function of the covariance.
  * The rotation is orthogonal by construction (a product of Givens
  * rotations), so L2 — and therefore the exact ground truth every
  * recall audit ranks against — is EXACTLY preserved (up to the
  * centering translation, which preserves distances too).
  *
  * Audit contract (the E274 discipline): OpqSpec re-runs the
  * ADC-recall audit over raw vs balanced-permutation vs OPQ-rotated
  * chains on the fixture and RECORDS the measured verdict either way
  * — an honest negative is acceptable, an unaudited rotation is not.
  * The rotation is not expressible as a DuckDB replay (a 64×64
  * eigendecomposition has no reasonable SQL form), so the audit lives
  * in the spec tier, not the oracle gate — stated openly here rather
  * than hidden behind a weaker rows-only gate row.
  */
object Opq {

  /** Fixed Jacobi sweep count: 10 full cyclic sweeps drive every
    * off-diagonal of a 64×64 covariance far below double precision's
    * noise floor (convergence is quadratic once sweeps localize);
    * fixed — not convergence-tested — so the decomposition is a pure
    * function of its input (the [[Pca.PowerIters]] discipline).
    */
  val JacobiSweeps = 10

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * returns (eigenvalues, eigenvectors as COLUMNS of `v`), sorted by
    * descending eigenvalue (ties: lower original index first, for
    * determinism). Textbook Givens-rotation sweeps — public
    * knowledge, no library.
    */
  def jacobiEigen(c0: Array[Array[Double]],
      sweeps: Int = JacobiSweeps): (Array[Double], Array[Array[Double]]) = {
    val n = c0.length
    val a = c0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until n - 1; q <- p + 1 until n) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-300) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val t =
          if (theta >= 0.0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
          else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
        val cth = 1.0 / math.sqrt(t * t + 1.0)
        val sth = t * cth
        // rows/cols p and q of A
        var i = 0
        while (i < n) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = cth * aip - sth * aiq
          a(i)(q) = sth * aip + cth * aiq
          i += 1
        }
        i = 0
        while (i < n) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = cth * api - sth * aqi
          a(q)(i) = sth * api + cth * aqi
          i += 1
        }
        // accumulate the rotation into V's columns p, q
        i = 0
        while (i < n) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = cth * vip - sth * viq
          v(i)(q) = sth * vip + cth * viq
          i += 1
        }
      }
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = Array.tabulate(n, n)((r, k) => v(r)(order(k)))
    (evals, evecs) // evecs(·)(k) = k-th eigenvector (column)
  }

  /** Eigenvalue allocation (Ge et al. §4.2): deal the descending
    * principal directions across `numSub` buckets of `subDim` slots,
    * greedily giving each next direction to the OPEN bucket with the
    * smallest current log-variance product (ties: lower bucket id) —
    * balancing Π λ per subspace, which the paper shows minimizes the
    * distortion bound for independent subspace quantizers. Returns
    * bucket-major eigen indices: output dim `m·subDim + s` reads
    * eigenvector `alloc(m)(s)`.
    */
  def eigenAllocation(evals: Array[Double], numSub: Int,
      subDim: Int): IndexedSeq[IndexedSeq[Int]] = {
    require(evals.length == numSub * subDim)
    val buckets = Array.fill(numSub)(Vector.empty[Int])
    val logSum = new Array[Double](numSub)
    for (k <- evals.indices) {
      val open = (0 until numSub).filter(m => buckets(m).size < subDim)
      val m = open.minBy(m => (logSum(m), m))
      buckets(m) = buckets(m) :+ k
      logSum(m) += math.log(math.max(evals(k), 1e-12))
    }
    buckets.toIndexedSeq.map(_.toIndexedSeq)
  }

  /** The learned rotation for `vecs (id, part, vec)`: R's row
    * `m·subDim + s` is eigenvector `alloc(m)(s)ᵀ`. Returns (means, R)
    * — rotate as R·(v − mean).
    */
  def rotationFor(vecs: DataFrame, dim: Int, numSub: Int, subDim: Int)
      : (IndexedSeq[Double], Array[Array[Double]]) = {
    val (means, cov) = Pca.covariance(vecs.select(col("id"), col("vec")), dim)
    val (evals, evecs) = jacobiEigen(cov)
    val alloc = eigenAllocation(evals, numSub, subDim)
    val rows = alloc.flatten.map(k =>
      Array.tabulate(dim)(i => evecs(i)(k)))
    (means, rows.toArray)
  }

  /** Apply the rotation executor-side: out_j = Σ_i R(j)(i)·(v_i − m_i)
    * — a per-row mat-vec UDF (the rotated corpus feeds the PQ
    * TRAINING/audit tier, not a per-query hot path; a deployment
    * would bake R into the embedding export).
    */
  def rotate(vecs: DataFrame, means: IndexedSeq[Double],
      r: Array[Array[Double]]): DataFrame =
    vecs.select(col("id"), col("part"),
      rotateUdf(means.toArray, r)(col("vec")).as("vec"))

  /** Rotate ONE vector column in place, keeping every other column —
    * the serve-path form (r15): [[graft.ext.AnnIndex]] rotates query
    * vectors against the rotation persisted in the artifact, whatever
    * the surrounding schema.
    */
  def rotateCol(df: DataFrame, vecCol: String, means: Array[Double],
      r: Array[Array[Double]]): DataFrame =
    df.withColumn(vecCol, rotateUdf(means, r)(col(vecCol)))

  private def rotateUdf(m: Array[Double], r: Array[Array[Double]]) =
    udf((v: Seq[Double]) => {
      val n = r.length
      val out = new Array[Double](n)
      var j = 0
      while (j < n) {
        var acc = 0.0
        var i = 0
        val row = r(j)
        while (i < m.length) { acc += row(i) * (v(i) - m(i)); i += 1 }
        out(j) = acc
        j += 1
      }
      out
    })
}
