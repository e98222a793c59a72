package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Simplified silhouette (E242). Perfectly separated orthogonal
  * clusters score exactly 1.0: each point has csa = 1 (own centroid)
  * and csb = 0 (the orthogonal one), so s = (1 − 0)/(1 − 0) = 1.
  */
class SilhouetteSpec extends SparkSpec {
  import spark.implicits._

  test("orthogonal clusters score exactly 1.0") {
    val vecs = Seq(
      (0L, 0L, Seq(1.0, 0.0)), (1L, 0L, Seq(1.0, 0.0)),
      (2L, 1L, Seq(0.0, 1.0)), (3L, 1L, Seq(0.0, 1.0)))
      .toDF("id", "part", "vec")
    val out = Similarity.simplifiedSilhouette(vecs)
      .orderBy("assigned")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq((0L, 2L, 1.0, 1.0, 1.0), (1L, 2L, 1.0, 1.0, 1.0)))
  }

  test("mixed point degrades its cluster's average, scores stay in [0, 1]") {
    val vecs = Seq(
      (0L, 0L, Seq(1.0, 0.0)), (1L, 0L, Seq(1.0, 0.0)),
      (2L, 0L, Seq(0.6, 0.8)), // sits between the two centroids
      (3L, 1L, Seq(0.0, 1.0)), (4L, 1L, Seq(0.0, 1.0)))
      .toDF("id", "part", "vec")
    val rows = Similarity.simplifiedSilhouette(vecs)
      .select("assigned", "n", "avg_sil", "min_sil", "max_sil")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // All five points land somewhere; per-point scores bounded.
    assert(rows.values.map(_._2).sum == 5L)
    rows.values.foreach { case (_, _, avg, mn, mx) =>
      assert(mn >= 0.0 && mx <= 1.0 && mn <= avg && avg <= mx)
    }
    // Cluster 0's average is dragged below the clean-case 1.0 by the
    // boundary point (whichever cell it lands in, some cell's min < 1).
    assert(rows.values.exists(_._4 < 1.0))
  }
}
