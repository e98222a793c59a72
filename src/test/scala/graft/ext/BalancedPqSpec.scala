package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Variance-balanced PQ permutation (E273/E274): the permutation
  * contract (bijection, balance never worse than identity, L2
  * preserved) — and the honest finding that on a variance-uniform
  * corpus the reshuffle buys nothing (the E274 audit measures the
  * recall price; E218's dim stats are the deploy-time diagnostic).
  */
class BalancedPqSpec extends SparkSpec {

  private val (numSub, subDim) = (16, 4)
  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  private lazy val perm = Similarity.balancedPerm(corpus, numSub, subDim)

  private def dimVars: IndexedSeq[Double] = {
    val rows = corpus.select(posexplode(col("vec")).as(Seq("d", "val")))
      .groupBy("d")
      .agg((sum(col("val") * col("val")) / count(lit(1)) -
        (sum(col("val")) / count(lit(1))) *
        (sum(col("val")) / count(lit(1)))).as("vr"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    IndexedSeq.tabulate(numSub * subDim)(rows)
  }

  test("the permutation is a bijection over the dimension range") {
    assert(perm.sorted == (0 until numSub * subDim),
      s"not a permutation: $perm")
  }

  test("subspace energy spread under the balanced deal is never worse " +
      "than identity grouping") {
    val v = dimVars
    def spread(assign: Int => Int): Double = {
      val e = (0 until numSub * subDim).groupBy(assign)
        .values.map(_.map(v).sum).toSeq
      e.max / e.min
    }
    val identity = spread(_ / subDim)
    val balanced = spread(j => perm.indexOf(j) / subDim)
    info(f"subspace energy max/min: identity=$identity%.4f " +
      f"balanced=$balanced%.4f")
    assert(balanced <= identity + 1e-9,
      "the balancing deal made subspace energies MORE skewed")
  }

  test("L2 distances are preserved by the permutation") {
    val a = corpus.filter(col("id") < 6).collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[Double](2)).toMap
    for (i <- a.keys; j <- a.keys if i < j) {
      def l2(x: Seq[Double], y: Seq[Double]) =
        x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
      val raw = l2(a(i), a(j))
      val bal = l2(perm.map(a(i)), perm.map(a(j)))
      assert(math.abs(raw - bal) < 1e-9,
        s"permutation changed L2($i,$j): $raw vs $bal")
    }
  }
}
