package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Residual IVF-PQ (E243). Values are oracle-checked end-to-end by
  * `emb_topk_ivfpq_residual` / `emb_residual_recall`; this spec pins
  * the STRUCTURAL contract on a fixture where it is decidable by
  * hand: neighbors come only from probed cells, self never appears,
  * and on well-separated clusters the search finds the true in-cell
  * neighbor (residuals of a tight cluster are small, so even a
  * 1-codeword-per-value codebook ranks the cell correctly).
  */
class ResidualPqSpec extends SparkSpec {
  import spark.implicits._

  // Two tight clusters on orthogonal axes; 8-dim vectors, ids 0-5.
  // Query ids < 1 → just id 0. part = cluster label.
  private def vec(axis: Int, eps: Double): Seq[Double] =
    Seq.tabulate(8)(i => (if (i == axis) 1.0 else 0.0) +
      (if (i == (axis + 1) % 8) eps else 0.0))

  private val corpus = Seq(
    (0L, 0L, vec(0, 0.00)), (1L, 0L, vec(0, 0.02)), (2L, 0L, vec(0, 0.04)),
    (3L, 1L, vec(4, 0.00)), (4L, 1L, vec(4, 0.02)), (5L, 1L, vec(4, 0.04)))
    .toDF("id", "part", "vec")

  test("neighbors come from probed cells only, never self, true NN found") {
    val out = Similarity.pqResidualIvfTopK(corpus, 4, 2, 1, 2, 1)
      .orderBy("rank")
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq
    assert(out.nonEmpty && out.forall(_._1 == 0L))
    assert(out.forall(_._3 != 0L)) // self excluded
    // probe=1 from query (1,eps0,...): own cluster 0 → ids 1,2 only
    assert(out.map(_._3).toSet.subsetOf(Set(1L, 2L)))
    assert(out.map(_._3) == Seq(1L, 2L)) // id 1 (eps .02) closer than id 2
  }

  test("residuals are small within tight clusters: ADC distances stay near 0") {
    val out = Similarity.pqResidualIvfTopK(corpus, 4, 2, 1, 2, 1)
      .select("adc").as[Double].collect()
    assert(out.forall(d => d >= 0.0 && d < 0.01)) // cluster spread ~0.04²
  }
}
