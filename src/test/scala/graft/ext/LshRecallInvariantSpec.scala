package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.queries.DedupQueries

/** Guards the invariant the LSH correctness gate rests on (ADVICE r02):
  * `docs_dedup_near` / `docs_ngram_jaccard` compare 8-band × 4-row
  * MinHash-LSH output against an *exact* all-pairs Jaccard oracle at
  * threshold 0.5 — but LSH at J = 0.5 misses a pair with probability
  * (1 − 0.5⁴)⁸ ≈ 0.60. The gate is deterministic only because the
  * fixture has a similarity gap: every pair at or above the report
  * threshold is far above it (J ≥ 0.9, miss ≤ 3e-7) and everything
  * else is far below (background < 0.25, candidate noise). This suite
  * asserts that gap on the exact fixture+shingling the gate uses, so a
  * future fixture or threshold change that would make the gate flaky
  * fails HERE, with an explanation, instead of intermittently in CI.
  *
  * All-pairs runs driver-side over collected shingle sets — test-only
  * scale (500 docs); the distributed path stays LSH.
  */
class LshRecallInvariantSpec extends SparkSpec {

  /** The gate runs at sf0.01 (driver t2), so check THAT fixture. */
  private val gateSf = "/root/testdata/sf0.01"

  private def shingleSets(rows: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
    rows.groupBy(col("id")).agg(collect_set(col("x")).as("sh"))
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getSeq[String](1).toSet)
      .toMap

  private def assertGap(sets: Map[Long, Set[String]], what: String): Unit = {
    val ids = sets.keys.toArray.sorted
    var high = 0
    for {
      i <- ids.indices
      j <- (i + 1) until ids.length
    } {
      val a = sets(ids(i)); val b = sets(ids(j))
      val inter = (a & b).size.toDouble
      val jac = inter / (a.size + b.size - inter)
      assert(jac < 0.3 || jac >= 0.9,
        s"$what: pair (${ids(i)}, ${ids(j)}) has J=$jac inside the LSH " +
          "recall gap [0.3, 0.9) — 8x4 banding no longer guarantees the " +
          "oracle comparison; re-plant the fixture or raise the bands")
      if (jac >= 0.9) high += 1
    }
    assert(high > 0, s"$what: fixture plants no near-dup pairs at all")
  }

  test("word-3-gram fixture similarity gap holds at the gate SF") {
    val docs = Tables.documents(spark, gateSf)
    assertGap(shingleSets(
      Dedup.wordShingleRows(docs, col("doc_id"), col("text"), DedupQueries.WordN)),
      "word-3gram")
  }

  test("char-6-gram fixture similarity gap holds at the gate SF") {
    val docs = Tables.documents(spark, gateSf)
    assertGap(shingleSets(
      Dedup.charShingleRows(docs, col("doc_id"), col("text"), DedupQueries.CharN)),
      "char-6gram")
  }
}
