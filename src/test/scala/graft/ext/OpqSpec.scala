package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** E316: the learned (parametric) OPQ rotation, audited the E274 way —
  * mechanism proofs (orthogonality, eigen residuals, allocation
  * balance) plus the MEASURED recall verdict of raw vs
  * balanced-permutation vs OPQ-rotated ADC over the same exact-L2
  * truth. The verdict is recorded either way (E274's permutation was
  * an honest negative; the paper's learned rotation is the next rung
  * and gets the same treatment).
  */
class OpqSpec extends SparkSpec {

  private val (numSub, subDim, dim) = (16, 4, 64)
  private val (nq, k, mult) = (10, 5, 5)

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  test("the learned rotation is orthogonal and diagonalizes: " +
      "R·Rᵀ = I, eigen residuals vanish, eigenvalues descend to trace") {
    val (_, cov) = Pca.covariance(corpus.select(col("id"), col("vec")), dim)
    val (evals, evecs) = Opq.jacobiEigen(cov)
    // eigenvalues descend and sum to the trace
    assert(evals.zip(evals.tail).forall { case (a, b) => a >= b })
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    assert(math.abs(evals.sum - trace) < 1e-9 * math.max(1.0, math.abs(trace)))
    // columns are orthonormal
    for (a <- 0 until dim; b <- a until dim) {
      val d = (0 until dim).map(i => evecs(i)(a) * evecs(i)(b)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"V not orthonormal at ($a,$b): $d")
    }
    // C·x = λ·x for every pair (residual below double-noise scale)
    val scale = math.max(1.0, evals.map(math.abs).max)
    for (kk <- 0 until dim) {
      val x = (0 until dim).map(i => evecs(i)(kk))
      val res = (0 until dim).map { i =>
        val cx = (0 until dim).map(j => cov(i)(j) * x(j)).sum
        math.abs(cx - evals(kk) * x(i))
      }.max
      assert(res < 1e-8 * scale, s"eigenpair $kk residual $res")
    }
  }

  test("eigenvalue allocation fills every subspace and balances the " +
      "log-variance products") {
    val evals = Array.tabulate(dim)(i => math.exp(-(i % 7)) * (dim - i))
    val alloc = Opq.eigenAllocation(evals, numSub, subDim)
    assert(alloc.size === numSub)
    assert(alloc.forall(_.size === subDim))
    assert(alloc.flatten.sorted === (0 until dim))
    val logs = alloc.map(_.map(kk =>
      math.log(math.max(evals(kk), 1e-12))).sum)
    // greedy balance: the spread is bounded by one eigen-log step,
    // far tighter than the naive contiguous split
    val naive = (0 until numSub).map(m => (0 until subDim).map(s =>
      math.log(math.max(evals(m * subDim + s), 1e-12))).sum)
    assert(logs.max - logs.min <= naive.max - naive.min,
      "greedy allocation balances worse than the contiguous split")
  }

  test("rotation preserves L2 (orthogonal + translation), so the raw " +
      "exact truth stays the audit's truth") {
    val c = corpus.limit(40).localCheckpoint(false)
    val (means, r) = Opq.rotationFor(c, dim, numSub, subDim)
    val rot = Opq.rotate(c, means, r).localCheckpoint(false)
    val l2 = (a: String, b: String) => aggregate(
      zip_with(col(a), col(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    def pairD(df: DataFrame) = df.alias("x").join(df.alias("y"),
        col("x.id") < col("y.id"))
      .select(col("x.id").as("i"), col("y.id").as("j"),
        l2("x.vec", "y.vec").as("d"))
    val drift = pairD(c).alias("r").join(pairD(rot).alias("q"),
        col("r.i") === col("q.i") && col("r.j") === col("q.j"))
      .select(max(abs(col("r.d") - col("q.d"))).as("m")).head().getDouble(0)
    assert(drift < 1e-9, s"rotation distorted L2 by $drift")
  }

  /** The E226/E274 recall audit over a search corpus vs raw truth. */
  private def recallOf(searchC: DataFrame, c: DataFrame): (Double, Double) = {
    val adcAll = Similarity.pqAdcTopK(searchC, numSub, subDim, nq, k * mult)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .localCheckpoint(false)
    val l2 = aggregate(
      zip_with(col("qv"), col("vec"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val q = c.filter(col("id") < nq)
      .select(col("id").as("qid"), col("vec").as("qv"))
    val exact = q.join(c.select(col("id"), col("vec")),
        col("id") =!= col("qid"))
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        l2.as("d"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("d"), col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(false)
    def hits(df: DataFrame): Double =
      df.join(exact, Seq("query_id", "neighbor_id")).count().toDouble /
        (nq * k).toDouble
    (hits(adcAll.filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"))),
      hits(adcAll.select(col("query_id"), col("neighbor_id"))))
  }

  test("VERDICT (recorded either way): ADC recall of raw vs balanced " +
      "permutation vs learned OPQ rotation over the same exact truth") {
    val c = corpus.localCheckpoint(false)
    val (means, r) = Opq.rotationFor(c, dim, numSub, subDim)
    val rotated = Opq.rotate(c, means, r).localCheckpoint(false)
    val perm = Similarity.balancedPerm(c, numSub, subDim)
    val balanced = c.select(col("id"), col("part"),
      array(perm.map(i => col("vec").getItem(i)): _*).as("vec"))
    val (rawK, rawH) = recallOf(c, c)
    val (balK, balH) = recallOf(balanced, c)
    val (opqK, opqH) = recallOf(rotated, c)
    info(f"recall@$k%d      raw=$rawK%.3f balanced=$balK%.3f opq=$opqK%.3f")
    info(f"rerank-horizon raw=$rawH%.3f balanced=$balH%.3f opq=$opqH%.3f")
    // the audit must MEASURE, not presume: sanity-bound every number
    // and require a non-degenerate chain; the comparative verdict is
    // recorded (info above + SCALING.md), win or lose
    for (x <- Seq(rawK, rawH, balK, balH, opqK, opqH))
      assert(x >= 0.0 && x <= 1.0)
    assert(opqH > 0.0, "rotated chain found nothing — degenerate, not a verdict")
  }
}
