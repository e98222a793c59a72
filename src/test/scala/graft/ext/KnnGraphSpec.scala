package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** kNN-graph invariants (E267): bounded out-degree with contiguous
  * ranks, bucket containment, and a mutual flag closed under edge
  * reversal.
  */
class KnnGraphSpec extends SparkSpec {

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  private lazy val g = Similarity.knnGraph(corpus, 4).localCheckpoint(false)

  test("out-degree is at most k with contiguous ranks from 1") {
    val bad = g.groupBy("src_id")
      .agg(count(lit(1)).as("d"), max("rank").as("mx"), min("rank").as("mn"))
      .filter(col("d") > 4 || col("mx") =!= col("d") || col("mn") =!= 1)
    assert(bad.isEmpty, "degree/rank contract violated")
  }

  test("edges never cross coarse buckets") {
    val parts = corpus.select(col("id"), col("part"))
    val cross = g
      .join(parts.select(col("id").as("src_id"), col("part").as("pa")), "src_id")
      .join(parts.select(col("id").as("dst_id"), col("part").as("pb")), "dst_id")
      .filter(col("pa") =!= col("pb"))
    assert(cross.isEmpty, "an edge crossed buckets")
  }

  test("the mutual edge set is closed under reversal") {
    val m = g.filter(col("mutual"))
      .select(col("src_id").as("a"), col("dst_id").as("b"))
    val missing = m.join(
      m.select(col("a").as("b2"), col("b").as("a2")),
      col("a") === col("a2") && col("b") === col("b2"), "left_anti")
    assert(missing.isEmpty, "mutual edge without its reverse")
    assert(m.count() > 0, "fixture produced no mutual edges — vacuous")
  }
}
