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
