package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Similarity

/** Hubness audit (E297): the in-degree distribution conserves edge
  * and node mass, includes the zero spine, and the fixture exhibits
  * in-degree spread (the signal the audit exists to expose).
  */
class GraphHubnessSpec extends SparkSpec {

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  private lazy val dist = SimilarityQueries
    .queries("emb_graph_hubness")(spark, sfDir).localCheckpoint(false)

  test("node mass and edge mass are conserved per bucket") {
    val nodes = corpus.groupBy("part").agg(count(lit(1)).as("nn"))
    val edges = Similarity.knnGraph(corpus, 4)
      .join(corpus.select(col("id").as("src_id"), col("part")), "src_id")
      .groupBy("part").agg(count(lit(1)).as("ne"))
    val got = dist.groupBy("part")
      .agg(sum("n_nodes").as("gn"),
        sum(col("in_deg") * col("n_nodes")).as("ge"))
    val bad = got.join(nodes, "part").join(edges, "part")
      .filter(col("gn") =!= col("nn") || col("ge") =!= col("ne"))
    assert(bad.isEmpty, "distribution lost nodes or edges")
  }

  test("zero spine present or justified, and in-degree spreads") {
    val degs = dist.select(col("in_deg")).distinct().count()
    assert(degs > 1, "all nodes share one in-degree — vacuous audit")
    val maxDeg = dist.agg(max("in_deg")).collect()(0).getLong(0)
    assert(maxDeg > 4, // above the out-degree cap = genuine hub signal
      s"max in-degree $maxDeg never exceeded the out-degree cap")
  }
}
