package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MMR diversified top-k (E241). The fixture is built so plain
  * relevance and MMR visibly disagree: with query q = (1,0,0),
  *
  *   A  = id 1, (0.8,  0.6, 0)  rel = 0.8, sim(A, A2) = 0.998460
  *   B  = id 2, (0.8, -0.6, 0)  rel = 0.8, sim(B, A2) = 0.332820
  *   A2 = id 3, (0.9,  0.6, 0)  rel = 0.832050
  *
  * Pure relevance ranks A2, A, B (the A/B rel tie breaks toward the
  * smaller id). MMR at λ = 0.7 picks A2 first, then round 2 scores
  * A at 0.7·0.8 − 0.3·0.998460 = 0.260462 vs B at
  * 0.7·0.8 − 0.3·0.332820 = 0.460154 — the near-duplicate of the
  * already-selected A2 sinks below the diverse result.
  */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, Seq(0.8, 0.6, 0.0)),
    (2L, Seq(0.8, -0.6, 0.0)),
    (3L, Seq(0.9, 0.6, 0.0))).toDF("id", "vec")
  private val queries = Seq((100L, Seq(1.0, 0.0, 0.0))).toDF("qid", "qvec")

  test("MMR demotes the near-duplicate that plain relevance ranks second") {
    val plain = Similarity.topK(corpus, queries, 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(plain == Seq(3L, 1L, 2L)) // relevance order: A2, A, B

    val mmr = Similarity.mmrTopK(corpus, queries, 3, 3, 0.7, 0.3)
      .orderBy("rank")
      .select("neighbor_id", "mmr", "cos")
      .as[(Long, Double, Double)].collect().toSeq
    assert(mmr.map(_._1) == Seq(3L, 2L, 1L)) // MMR order: A2, B, A
    // Hand-computed scores (rel and pair sims enter rounded to 6).
    assert(math.abs(mmr(0)._2 - 0.7 * 0.83205) < 1e-9)          // λ·rel
    assert(math.abs(mmr(1)._2 - (0.7 * 0.8 - 0.3 * 0.33282)) < 1e-6)
    assert(math.abs(mmr(2)._2 - (0.7 * 0.8 - 0.3 * 0.99846)) < 1e-6)
    assert(mmr.map(_._3) == Seq(0.83205, 0.8, 0.8)) // cos = plain relevance
  }

  test("rank 1 is always the pure-relevance argmax and k rows come back") {
    val out = Similarity.mmrTopK(corpus, queries, 3, 2, 0.7, 0.3)
    assert(out.count() == 2)
    val first = out.filter(col("rank") === 1)
      .select("neighbor_id").as[Long].head()
    assert(first == 3L)
  }

  test("k > nCand is rejected") {
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(corpus, queries, 2, 3, 0.7, 0.3)
    }
  }

  test("selection is invariant to input partitioning") {
    val base = Similarity.mmrTopK(corpus, queries, 3, 3, 0.7, 0.3)
      .orderBy("rank").collect().toSeq
    val shuffled = Similarity.mmrTopK(corpus.repartition(7), queries, 3, 3,
      0.7, 0.3).orderBy("rank").collect().toSeq
    assert(base == shuffled)
  }
}
