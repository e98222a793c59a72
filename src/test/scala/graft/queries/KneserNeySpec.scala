package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** E237 Kneser-Ney estimator laws the flat oracle hash can't express:
  * the per-history normalization identity and the continuation-count
  * correction ("San Francisco effect").
  */
class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  private val D = 0.75

  /** Hand-rolled KN tables from a token corpus of (doc, words). */
  private def knTables(docs: Seq[Seq[String]]) = {
    val bigrams = docs.flatMap(ws => ws.zip(ws.tail))
    val bgc = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bgc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1f = bgc.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1b = bgc.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val bt = bgc.size.toLong
    (bgc, c1, n1f, n1b, bt)
  }

  private def p(w1: String, w2: String,
      t: (Map[(String, String), Long], Map[String, Long],
          Map[String, Long], Map[String, Long], Long)): Double = {
    val (bgc, c1, n1f, n1b, bt) = t
    math.max(bgc.getOrElse((w1, w2), 0L) - D, 0.0) / c1(w1) +
      D * n1f(w1) / c1(w1) * (n1b.getOrElse(w2, 0L).toDouble / bt)
  }

  test("per-history probabilities sum to 1 over the continuation " +
      "vocabulary (the KN normalization identity)") {
    val docs = Seq(
      "a b a c a b b c d".split(" ").toSeq,
      "c a d b a a c".split(" ").toSeq)
    val t = knTables(docs)
    val vocab = t._4.keySet // words observed as a bigram continuation
    t._2.keys.foreach { w1 =>
      val total = vocab.toSeq.map(w2 => p(w1, w2, t)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"history '$w1' sums to $total")
    }
  }

  test("continuation counts beat raw frequency: a frequent but " +
      "single-context continuation scores below a rarer multi-context " +
      "one after an unseen history") {
    // 'f' occurs 4 times but ONLY after 'sf' (one context);
    // 'x' occurs 3 times after 3 different contexts.
    val docs = Seq(
      "sf f sf f sf f sf f".split(" ").toSeq,
      "p x q x r x".split(" ").toSeq,
      "p z q z r z sf z".split(" ").toSeq)
    val t = knTables(docs)
    // unseen bigram for both: history 'q' never precedes f or x
    val pf = p("q", "f", t)
    val px = p("q", "x", t)
    assert(px > pf,
      s"multi-context x ($px) should outscore single-context f ($pf)")
  }

  test("the registered query agrees with a from-scratch KN recompute " +
      "on a sample of fixture docs") {
    val rows = TextQueries.queries("docs_bigram_kn")(spark, sfDir)
      .filter(col("doc_id") < 5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val all = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect()
    val corpus = all.map(_._2.split(" ").toSeq).toSeq
    val t = knTables(corpus)
    all.filter(_._1 < 5).foreach { case (id, text) =>
      val ws = text.split(" ").toSeq
      val lps = ws.zip(ws.tail).map { case (a, b) => math.log(p(a, b, t)) }
      val (n, avg) = rows(id)
      assert(n == lps.size, s"doc $id bigram count")
      val expect = BigDecimal(lps.sum / lps.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(avg - expect) < 2e-6, s"doc $id: $avg vs $expect")
    }
  }
}
