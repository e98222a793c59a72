package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  test("uniform ring: every vertex keeps the uniform rank exactly") {
    // i → i+1 mod n: in-degree = out-degree = 1 everywhere, so each
    // round maps 1/n ↦ (1−d)/n + d·(1/n) = 1/n — a fixpoint from r0
    val n = 8L
    val ids = (0L until n).toDF("id")
    val edges = ids.select(col("id").as("src"),
      pmod(col("id") + 1, lit(n)).as("dst"))
    val ranks = LinkGraph.pageRank(ids, edges, n, iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(ranks.size == n)
    ranks.values.foreach(r => assert(math.abs(r - 1.0 / n) < 1e-12))
  }

  test("star + return edges: the hub out-ranks the leaves, mass sums to 1") {
    // leaves 1..4 → hub 0, hub → each leaf (no dangling). The hub
    // receives four full contributions, each leaf a quarter of one.
    val n = 5L
    val ids = (0L until n).toDF("id")
    val edges = ((1L to 4L).map(i => (i, 0L)) ++ (1L to 4L).map(i => (0L, i)))
      .toDF("src", "dst")
    val ranks = LinkGraph.pageRank(ids, edges, n, iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9,
      s"rank mass not conserved: ${ranks.values.sum}")
    (1L to 4L).foreach { leaf =>
      assert(ranks(0L) > ranks(leaf) * 2,
        s"hub ${ranks(0L)} not dominant over leaf ${ranks(leaf)}")
    }
    // symmetric leaves must tie exactly (identical computation graph)
    assert((1L to 4L).map(ranks).distinct.size == 1)
  }

  test("one hand-computed round matches the recurrence") {
    // 0→1, 0→2, 1→2, 2→0 (outdeg 2,1,1). After one round from 1/3:
    //   r(0) = .05 + .85·(1/3)           = 0.3333…
    //   r(1) = .05 + .85·(1/6)           = 0.1916…
    //   r(2) = .05 + .85·(1/6 + 1/3)     = 0.475
    val ids = (0L until 3L).toDF("id")
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val r = LinkGraph.pageRank(ids, edges, 3L, iters = 1)
      .as[(Long, Double)].collect().toMap
    val third = 1.0 / 3
    assert(math.abs(r(0L) - (0.05 + 0.85 * third)) < 1e-12)
    assert(math.abs(r(1L) - (0.05 + 0.85 * third / 2)) < 1e-12)
    assert(math.abs(r(2L) - (0.05 + 0.85 * (third / 2 + third))) < 1e-12)
  }

  test("syntheticEdges: no self-loops, no duplicates, no dangling vertex") {
    val n = 97L // prime, exercises all the affine maps' wraparound
    val ids = (0L until n).toDF("id")
    val edges = LinkGraph.syntheticEdges(ids, n).as[(Long, Long)].collect()
    assert(edges.forall { case (s, d) => s != d })
    assert(edges.length == edges.distinct.length)
    assert(edges.forall { case (s, d) => s >= 0 && s < n && d >= 0 && d < n })
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length)
    assert(outdeg.size == n, "a vertex dangles (no out-edges)")
    assert(outdeg.values.forall(d => d >= 1 && d <= 4))
  }
}
