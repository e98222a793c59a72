package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Farthest-point (k-center maximin) diversity coreset (E212):
  * hand-computed selections on separable geometry, the duplicate
  * guard, and the monotone-maximin invariant.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  test("greedy maximin picks the axes before any near-duplicate") {
    // Three orthogonal directions plus a near-duplicate of the seed's:
    // the coreset must cover all three axes before returning to the
    // duplicate, whatever its id.
    val df = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.99, 0.01, 0.0)), // near-dup of 0 — picked LAST
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(0.0, 0.0, 1.0))).toDF("id", "vec")
    val sel = Similarity.farthestPointCoreset(df, 4)
      .orderBy("center_rank")
      .select(col("id")).as[Long].collect().toSeq
    assert(sel.head == 0L, "seed = smallest id")
    assert(sel.take(3).toSet == Set(0L, 2L, 3L),
      "the three orthogonal directions cover first")
    assert(sel(3) == 1L, "the near-duplicate is deferred to the end")
  }

  test("ties break toward the smaller id and duplicates cannot " +
      "re-select: k distinct centers always come back") {
    val dup = Seq(1.0, 2.0, 3.0)
    val df = Seq((5L, dup), (6L, dup), (7L, dup), (8L, dup))
      .toDF("id", "vec")
    val sel = Similarity.farthestPointCoreset(df, 3)
    val ids = sel.select(col("id")).as[Long].collect().toSeq
    assert(ids.distinct.size == 3, "selected ids must be distinct")
    assert(ids.sorted == Seq(5L, 6L, 7L),
      "all-identical vectors degrade to id order (every best is 1.0)")
  }

  test("maximin_cos is NULL for the seed and non-decreasing after: " +
      "each added center is less novel than the one before") {
    val df = (0 until 30).map { i =>
      val a = i * 0.21
      (i.toLong, Seq(math.cos(a), math.sin(a), 0.1 * (i % 3)))
    }.toDF("id", "vec")
    val rows = Similarity.farthestPointCoreset(df, 6)
      .orderBy("center_rank")
      .select(col("center_rank"), col("maximin_cos"))
      .as[(Int, Option[Double])].collect().toSeq
    assert(rows.head._2.isEmpty, "seed has no prior set to measure against")
    val ms = rows.tail.map(_._2.get)
    assert(ms.zip(ms.tail).forall { case (a, b) => b >= a },
      s"maximin sequence must be non-decreasing, got $ms")
  }
}
