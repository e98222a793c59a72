package graft.ext

import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("disjoint pairs label independently") {
    assert(components(Seq((1L, 2L), (5L, 6L))) ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("chained pairs merge into one component (the over-delete case)") {
    // A~B, B~C, no A~C edge: pairwise dedup would drop B and C against
    // different representatives; components must unify all three
    assert(components(Seq((2L, 3L), (1L, 2L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long chain converges past one round (propagation, not one hop)") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.values.toSet == Set(0L), s"non-converged labels: $got")
  }

  test("cycle and duplicate/reversed edges are harmless") {
    assert(components(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 2L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star graph: center higher than leaves still takes the min") {
    assert(components(Seq((10L, 1L), (10L, 2L), (10L, 3L))) ==
      Map(10L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  private def starComponents(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponentsStar(edges.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("star contraction matches propagation on every canonical shape") {
    val shapes = Seq(
      Seq((1L, 2L), (5L, 6L)),                           // disjoint
      Seq((2L, 3L), (1L, 2L)),                           // chain
      (0L until 9L).map(i => (i, i + 1)),                // long chain
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L)),       // cycle + dup
      Seq((10L, 1L), (10L, 2L), (10L, 3L)),              // star, high hub
      Seq((7L, 7L), (1L, 2L)))                           // self-loop vertex
    for (edges <- shapes)
      assert(starComponents(edges) == components(edges),
        s"divergence on $edges")
  }

  test("star contraction matches propagation on a pseudo-random graph") {
    // deterministic LCG edges over 60 vertices — multiple components,
    // cycles, hubs; no engine RNG
    var x = 12345L
    def next(): Long = { x = (x * 1103515245L + 12345L) % 2147483648L; x }
    val edges = Seq.fill(80)((next() % 60, next() % 60))
      .filter { case (a, b) => a != b }
    assert(starComponents(edges) == components(edges))
  }

  test("star contraction beats the diameter bound of propagation") {
    // a 30-chain needs ~30 propagation rounds but O(log 30) star
    // rounds: maxIter = 8 must suffice for star, and must NOT for
    // propagation
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Clusters.connectedComponentsStar(chain, maxIter = 8)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(0L))
    intercept[IllegalArgumentException] {
      Clusters.connectedComponents(chain, maxIter = 8).count()
    }
  }

  test("refuses to return truncated labels when maxIter is too small") {
    // a 6-hop chain cannot converge in 2 rounds — must throw, not
    // silently return a split component
    val chain = (0L until 7L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ex = intercept[IllegalArgumentException] {
      Clusters.connectedComponents(chain, maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
