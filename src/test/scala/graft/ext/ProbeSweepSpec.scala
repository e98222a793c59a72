package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Probe-recall sweep (E254). Two structural pins that hold for ANY
  * corpus: recall is monotone non-decreasing in the probe width (a
  * candidate that displaces a true top-k hit from the local ranking
  * must itself outrank it globally, so hits never drop), and at
  * p = number-of-cells the probed search IS the brute force, so
  * recall reads exactly 1.0.
  */
class ProbeSweepSpec extends SparkSpec {
  import spark.implicits._

  // three cells on orthogonal axes; query 0 sits in cell 0
  private val corpus = Seq(
    (0L, 0L, Seq(1.0, 0.0, 0.0)), (1L, 0L, Seq(0.9, 0.1, 0.0)),
    (2L, 1L, Seq(0.0, 1.0, 0.0)), (3L, 1L, Seq(0.1, 0.9, 0.0)),
    (4L, 2L, Seq(0.0, 0.0, 1.0)), (5L, 2L, Seq(0.1, 0.0, 0.9)))
    .toDF("id", "part", "vec")

  test("recall is monotone in probe width and hits 1.0 at full coverage") {
    val out = Similarity.probeRecallSweep(corpus, 1, 2, 3)
      .orderBy("probe")
      .select("probe", "recall_at_k").as[(Int, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1, 2, 3))
    assert(out.sliding(2).forall { case Seq(a, b) => b._2 >= a._2 })
    assert(out.last._2 == 1.0) // p = all cells ≡ brute force
  }

  test("probe 1 sees only the query's own cell") {
    // global top-2 of query 0 = ids 1 (cos .994) and 3 (cos .110);
    // id 3 lives in cell 1, invisible at p = 1 → recall 1/2.
    val r1 = Similarity.probeRecallSweep(corpus, 1, 2, 1)
      .select("n_hits").as[Long].head()
    assert(r1 == 1L)
  }
}
