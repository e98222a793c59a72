package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Adaptive multi-probe (E252) on a skewed two-cell corpus: cluster A
  * (ids 0-3, axis 0) and cluster B (ids 4-5, axis 1). N = 6, so the
  * 3/10 target is ceil(18/10) = 2 candidates: a query landing in A
  * stops after ONE cell (cum − np = 0 < 2; adding B would start at
  * 4 ≥ 2), so only A's members are reachable. Widening the target to
  * 9/10 (ceil 54/10 = 6) pulls B in and the same k = 5 search returns
  * five rows instead of three — the probe set is population-driven,
  * not a fixed count.
  */
class AdaptiveProbeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, 0L, Seq(1.0, 0.0)), (1L, 0L, Seq(1.0, 0.0)),
    (2L, 0L, Seq(1.0, 0.0)), (3L, 0L, Seq(1.0, 0.0)),
    (4L, 1L, Seq(0.0, 1.0)), (5L, 1L, Seq(0.0, 1.0)))
    .toDF("id", "part", "vec")

  test("tight target probes one cell; candidates stay inside it") {
    val out = Similarity.adaptiveProbeTopK(corpus, 1, 5, 3L, 10L)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L)) // own cell only, self excluded
  }

  test("wider target pulls the second cell in") {
    val out = Similarity.adaptiveProbeTopK(corpus, 1, 5, 9L, 10L)
      .orderBy("rank")
      .select("neighbor_id", "cos").as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(out.take(3).forall(_._2 == 1.0) && out.drop(3).forall(_._2 == 0.0))
  }
}
