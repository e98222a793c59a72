package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Similarity

/** Triangle census over the mutual kNN graph (E296): wedge/triangle
  * consistency, clustering bounds, and an independent recount via
  * common-neighbor intersection.
  */
class TriangleSpec extends SparkSpec {

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  private lazy val census = SimilarityQueries
    .queries("emb_graph_triangles")(spark, sfDir).localCheckpoint(false)

  test("3*triangles <= wedges and clustering in [0, 1]; fixture is " +
      "non-vacuous") {
    val bad = census.filter(col("n_triangles") * 3 > col("n_wedges") ||
      col("clustering") < 0.0 || col("clustering") > 1.0)
    assert(bad.isEmpty, "census violated closed-wedge bounds")
    val tot = census.agg(sum("n_triangles")).collect()(0).getLong(0)
    assert(tot > 0, "no triangles on the fixture — vacuous census")
  }

  test("independent recount: 3*triangles equals the sum over edges " +
      "of common mutual neighbors") {
    val g = Similarity.knnGraph(corpus, 4).filter(col("mutual"))
      .select(col("src_id").as("a"), col("dst_id").as("b"))
      .localCheckpoint(false)
    val und = g.filter(col("a") < col("b"))
    // |N(a) ∩ N(b)| per undirected edge, via the directed mutual set
    val common = und.alias("e")
      .join(g.alias("na"), col("e.a") === col("na.a"))
      .join(g.alias("nb"),
        col("e.b") === col("nb.a") && col("na.b") === col("nb.b"))
      .agg(count(lit(1)).as("paths"))
      .collect()(0).getLong(0)
    val tot = census.agg(sum("n_triangles")).collect()(0).getLong(0)
    assert(common === 3 * tot,
      s"common-neighbor recount $common != 3 * $tot triangles")
  }
}
