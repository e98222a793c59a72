package graft.queries

import graft.SparkSpec

/** Gate-agreement audit (E302): contingency mass conservation, κ
  * bounds, and the κ formula recomputed from the emitted cells.
  */
class GateAgreementSpec extends SparkSpec {

  private lazy val r = TextQueries
    .queries("docs_gate_agreement")(spark, sfDir).collect()(0)

  test("cells conserve mass and kappa sits in [-1, 1]") {
    val n = r.getAs[Long]("n")
    val cells = Seq("n_both_keep", "n_gopher_only", "n_lr_only",
      "n_both_drop").map(r.getAs[Long])
    assert(cells.sum === n, s"cells ${cells.sum} != n $n")
    assert(n > 0, "empty val split — vacuous")
    val k = r.getAs[Double]("kappa")
    assert(k >= -1.0 && k <= 1.0, s"kappa $k out of range")
  }

  test("kappa recomputes from the emitted cells") {
    val n = r.getAs[Long]("n").toDouble
    val a = r.getAs[Long]("n_both_keep").toDouble
    val b = r.getAs[Long]("n_gopher_only").toDouble
    val c = r.getAs[Long]("n_lr_only").toDouble
    val d = r.getAs[Long]("n_both_drop").toDouble
    val po = (a + d) / n
    val pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    val expect = if (pe == 1.0) 0.0 else (po - pe) / (1.0 - pe)
    assert(math.abs(r.getAs[Double]("kappa") - expect) < 1e-6,
      s"kappa ${r.getAs[Double]("kappa")} != recomputed $expect")
    assert(math.abs(r.getAs[Double]("po") - po) < 1e-6)
    assert(math.abs(r.getAs[Double]("pe") - pe) < 1e-6)
  }
}
