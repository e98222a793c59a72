package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-level (coarse → fine) assignment probe (E211): the g = ⌈√(2k)⌉
  * law, exactness on separable geometry, candidate-work accounting, and
  * the empty-group guard that keeps every point assigned.
  */
class TwoLevelAssignSpec extends SparkSpec {
  import spark.implicits._

  test("coarseGroupCount is the clamped ⌈√(2k)⌉ law") {
    assert(Similarity.coarseGroupCount(1L) == 1L)
    assert(Similarity.coarseGroupCount(2L) == 2L)   // ceil(sqrt(4)) = 2
    assert(Similarity.coarseGroupCount(3L) == 3L)   // ceil(sqrt(6)) = 3, clamp k
    assert(Similarity.coarseGroupCount(8L) == 4L)   // ceil(sqrt(16)) = 4
    assert(Similarity.coarseGroupCount(50L) == 10L) // ceil(sqrt(100)) = 10
    assert(Similarity.coarseGroupCount(200L) == 20L)
    // the law's point: g + 2k/g ≈ 2√(2k) ≪ k once k is real
    assert(Similarity.coarseGroupCount(10000L) == 142L)
  }

  /** Four well-separated fine cells on coordinate axes in 4-d: the
    * coarse tier cannot mis-route points that sit ON a fine centroid's
    * axis, so two-level must equal exact everywhere.
    */
  test("separable geometry: two-level assignment equals the exact argmax") {
    val fine = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 0.0, 1.0))).toDF("cpart", "cvec")
    val pts = Seq(
      (10L, Seq(0.9, 0.1, 0.0, 0.0)),
      (11L, Seq(0.1, 0.9, 0.05, 0.0)),
      (12L, Seq(0.0, 0.1, 0.9, 0.0)),
      (13L, Seq(0.0, 0.0, 0.2, 0.9)),
      (14L, Seq(0.7, 0.0, 0.0, 0.6))).toDF("id", "vec")
    val exact = Similarity.nearestCell(pts, fine)
      .select(col("id"), col("cell")).as[(Long, Long)].collect().toMap
    val two = Similarity.twoLevelAssign(pts, fine, probe = 2)
      .select(col("id"), col("cell")).as[(Long, Long)].collect().toMap
    assert(two.keySet == exact.keySet, "no point may be dropped")
    assert(two == exact)
  }

  test("candidate work: n_fine_cand never exceeds the probed groups' " +
      "total membership, and every point is assigned exactly once") {
    // 12 fine cells spread over 3 axes-ish directions
    val fine = (0 until 12).map { i =>
      val base = Array.fill(6)(0.0)
      base(i % 3) = 1.0
      base(3 + (i % 3)) = 0.1 * (i / 3 + 1)
      (i.toLong, base.toSeq)
    }.toDF("cpart", "cvec")
    val pts = (0 until 40).map { i =>
      val base = Array.fill(6)(0.0)
      base(i % 3) = 1.0
      base((i % 6)) += 0.3
      (100L + i, base.toSeq)
    }.toDF("id", "vec")
    val two = Similarity.twoLevelAssign(pts, fine, probe = 2)
    assert(two.count() == 40)
    assert(two.select(countDistinct(col("id"))).as[Long].head() == 40)
    val k = 12L
    val maxCand = two.agg(max(col("n_fine_cand"))).as[Long].head()
    assert(maxCand <= k, "probed fine candidates are a subset of all cells")
  }

  test("crossover dispatch (E213): below the crossover the adaptive " +
      "tier is the exact round-10 path; at or past it, row-identical " +
      "to the forced two-level variant (tested at a seam crossover — " +
      "the measured production value 8192 is unreachable at fixture " +
      "scale by design)") {
    val emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        expr("transform(embedding, x -> cast(x as double))").as("vec"))
      .localCheckpoint(false)
    // k = ceil(500/10) = 50. At the production crossover (8192) the
    // exact kernel must be chosen: assignment equals the default-path
    // output, which the unchanged round-10 DuckDB hashes already pin.
    val prodDefault = Similarity.adaptiveClusters(emb, 10, 1)
      .orderBy("id").collect().toSeq
    // Same k through a seam crossover of 40: dispatch MUST route every
    // stage through twoLevelAssign — row-identical to the forced
    // variant E213's oracle hash-checks.
    val dispatched = Similarity.adaptiveClusters(emb, 10, 1, crossoverK = 40)
      .orderBy("id").collect().toSeq
    val forced = Similarity.adaptiveClustersTwoLevel(emb, 10, 1)
      .orderBy("id").collect().toSeq
    assert(dispatched == forced,
      "k >= crossover did not route through twoLevelAssign")
    // and the two kernels genuinely differ on this geometry — the
    // dispatch test is not vacuous
    assert(prodDefault != forced,
      "exact and two-level coincide everywhere; dispatch test vacuous")
  }

  test("oversized coreset k returns all points instead of throwing " +
      "(ADVICE r10)") {
    val pts = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(0.7, 0.7))).toDF("id", "vec")
    val out = Similarity.farthestPointCoreset(pts, k = 10).collect()
    assert(out.length == 3, s"expected all 3 points, got ${out.length}")
    assert(out.map(_.getAs[Long]("id")).toSet == Set(1L, 2L, 3L))
    assert(out.map(_.getAs[Int]("center_rank")).sorted.toSeq == Seq(1, 2, 3))
  }

  test("empty coarse groups are dropped before probing: a probe slot " +
      "is never spent on a memberless group and no point is lost") {
    // Two tight direction bundles far apart: with g = ceil(sqrt(2*5)) = 4
    // stride-seeded groups over 5 near-duplicate-direction centroids,
    // reassignment collapses membership onto few groups — the rest go
    // empty and must vanish from the probe set.
    val fine = Seq(
      (0L, Seq(1.0, 0.0, 0.01)),
      (1L, Seq(1.0, 0.0, 0.02)),
      (2L, Seq(1.0, 0.0, 0.03)),
      (3L, Seq(0.0, 1.0, 0.01)),
      (4L, Seq(0.0, 1.0, 0.02))).toDF("cpart", "cvec")
    val (fineG, coarse) = Similarity.coarsenCentroids(fine)
    val realized = coarse.select(col("gpart")).as[Long].collect().toSet
    val membered = fineG.select(col("gpart")).as[Long].collect().toSet
    assert(realized == membered, "probe set must equal the non-empty groups")
    val pts = Seq(
      (10L, Seq(0.9, 0.1, 0.0)),
      (11L, Seq(0.1, 0.95, 0.0))).toDF("id", "vec")
    val two = Similarity.twoLevelAssign(pts, fine, probe = 2)
    assert(two.count() == 2)
  }
}
