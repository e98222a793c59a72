package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark join spark window fill fill fill fill"), // 2×spark 1×join 1×window
    (2L, "spark fill fill fill fill fill fill fill"),    // 1×spark
    (3L, "fill fill fill fill fill fill fill fill"),     // no query terms
    (4L, "join join join join fill fill fill fill")      // 4×join
  ).toDF("doc_id", "text")

  test("bm25: only matching docs scored; more matched terms score higher") {
    val out = Retrieval.bm25(docs, "doc_id", "text",
      Seq("spark", "join", "window"), 1.2, 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 4L)) // doc 3 matches nothing
    // doc 1 matches all three terms at equal length — it must beat the
    // single-term docs.
    assert(out(1L) > out(2L) && out(1L) > out(4L))
    assert(out.values.forall(_ > 0.0)) // Lucene idf is never negative
  }

  test("bm25: tf saturation — 4x a term is worth less than 4x its score") {
    val out = Retrieval.bm25(docs, "doc_id", "text", Seq("join"), 1.2, 0.75)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 4L))
    assert(out(4L) > out(1L))          // tf 4 beats tf 1...
    assert(out(4L) < 4.0 * out(1L))    // ...but sublinearly (k1 saturation)
  }

  test("rrf2: fixed-order reciprocal sum; absent ranks contribute zero") {
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val out = Retrieval.rrf2(a, b, 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(10L) - 1.0 / 61) < 1e-15)             // only in a
    assert(math.abs(out(20L) - (1.0 / 62 + 1.0 / 61)) < 1e-15) // both
    assert(math.abs(out(30L) - 1.0 / 62) < 1e-15)             // only in b
    // Shared doc outranks either single-list doc at these ranks.
    assert(out(20L) > out(10L) && out(20L) > out(30L))
  }
}
