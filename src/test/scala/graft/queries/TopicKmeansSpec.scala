package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** E246 hashed-TF topic features. The md5 bucket values aren't
  * hand-computable, so the spec pins the construction invariants
  * instead: the dense vector has exactly [[CurationQueries.TopicDims]]
  * entries, its component sum equals the document's token count
  * (counts are conserved through the hashing trick), identical texts
  * get identical vectors, and the k-means pass assigns every doc to
  * one of [[CurationQueries.TopicK]] cells.
  */
class TopicKmeansSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox"),
    (1L, "the quick brown fox"),      // identical text → identical vec
    (2L, "a b c d e f g h i j"),
    (3L, "single"))
    .toDF("doc_id", "text")

  test("hashed-TF vectors conserve token counts and are deterministic") {
    val v = CurationQueries.hashedTfVecs(docs)
      .select(col("id"), col("vec"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(v.values.forall(_.length == CurationQueries.TopicDims))
    assert(v(0L).sum == 4.0 && v(2L).sum == 10.0 && v(3L).sum == 1.0)
    assert(v(0L) == v(1L))
    assert(v.values.forall(_.forall(_ >= 0.0)))
  }

  test("k-means over the features lands every doc in a valid topic") {
    val out = graft.ext.Similarity.kmeansIterated(
      CurationQueries.hashedTfVecs(docs), CurationQueries.TopicIters)
    val rows = out.select(col("id"), col("assigned")).as[(Long, Long)]
      .collect().toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    assert(rows.values.forall(c => c >= 0 && c < CurationQueries.TopicK))
    assert(rows(0L) == rows(1L)) // identical vectors, identical topic
  }
}
