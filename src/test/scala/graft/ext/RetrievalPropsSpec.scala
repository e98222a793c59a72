package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.TestSpark

/** Property-based invariants for the retrieval + span-dedup tier:
  * BM25 is partitioning-invariant (the fixed-order term sum really is
  * deterministic under shuffles), scores stay positive and saturate,
  * and duplicated-span detection finds planted shared runs exactly —
  * and nothing else — when background vocabularies are disjoint.
  */
object RetrievalPropsSpec extends Properties("Retrieval") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private val word = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "spark", "join")
  private val genDoc: Gen[String] =
    Gen.chooseNum(5, 25).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  property("bm25 scores are identical under arbitrary repartitioning") =
    Prop.forAllNoShrink(Gen.listOfN(10, genDoc), Gen.chooseNum(1, 7)) {
      (docs, nPart) =>
        import spark.implicits._
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        def run(d: org.apache.spark.sql.DataFrame) =
          Retrieval.bm25(d, "doc_id", "text", Seq("spark", "join"), 1.2, 0.75)
            .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        // bit-identical, not approximately equal: the term sum has a
        // fixed evaluation order, so shuffling the input cannot move a
        // single ulp
        run(df) == run(df.repartition(nPart, col("doc_id")))
    }

  property("bm25 scores are positive and bounded by the saturation limit") =
    Prop.forAllNoShrink(Gen.listOfN(10, genDoc)) { docs =>
      import spark.implicits._
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val n = docs.length
      // per-term ceiling: idf_max * (k1 + 1), idf_max = ln(1 + (N+0.5)/0.5)
      val cap = 2 * math.log(1.0 + (n + 0.5) / 0.5) * 2.2
      val scores = Retrieval.bm25(df, "doc_id", "text",
        Seq("spark", "join"), 1.2, 0.75).collect().map(_.getDouble(1))
      scores.forall(s => s > 0.0 && s < cap)
    }

  property("planted shared run is recovered as exactly one span per doc") =
    Prop.forAllNoShrink(
      Gen.chooseNum(4, 12),  // shared-run length (n = 3 grams)
      Gen.chooseNum(0, 6),   // doc-1 prefix length
      Gen.chooseNum(0, 6)) { (runLen, off1, off2) =>
      import spark.implicits._
      // Disjoint vocabularies: shared run s*, doc-1 filler a*, doc-2
      // filler b* — so the ONLY cross-document grams are the run's.
      val shared = (0 until runLen).map(i => s"s$i")
      val d1 = ((0 until off1).map(i => s"a$i") ++ shared ++ Seq("a98", "a99"))
        .mkString(" ")
      val d2 = ((0 until off2).map(i => s"b$i") ++ shared ++ Seq("b98", "b99"))
        .mkString(" ")
      val df = Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
      val spans = SpanDedup.duplicatedSpans(df, "doc_id", "text", 3, 2)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .toSet
      spans == Set(
        (1L, off1, off1 + runLen - 1, runLen),
        (2L, off2, off2 + runLen - 1, runLen))
    }

  property("bm25 equals an independent in-memory reference implementation") =
    Prop.forAllNoShrink(Gen.listOfN(10, genDoc)) { docs =>
      import spark.implicits._
      val terms = Seq("spark", "join")
      val (k1, b) = (1.2, 0.75)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Retrieval.bm25(df, "doc_id", "text", terms, k1, b)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // plain-Scala reference: same formula, evaluated per doc with no
      // Spark machinery; double ops in the same order, so equality is
      // exact
      val toks = docs.map(_.split(" ").toSeq)
      val n = toks.size
      val avgdl = toks.map(_.size).sum.toDouble / n
      val dfOf = terms.map(t => t -> toks.count(_.contains(t))).toMap
      val expected = toks.zipWithIndex.flatMap { case (ws, i) =>
        val score = terms.map { t =>
          val tf = ws.count(_ == t)
          if (tf == 0) 0.0
          else {
            val d = dfOf(t)
            val idf = math.log(1.0 + (n - d + 0.5) / (d + 0.5))
            idf * ((tf.toDouble * (k1 + 1.0)) /
              (tf.toDouble + k1 * (1.0 - b + b * ws.size.toDouble / avgdl)))
          }
        }.reduceLeft(_ + _)
        if (terms.exists(ws.contains)) Some(i.toLong -> score) else None
      }.toMap
      got.keySet == expected.keySet &&
        got.forall { case (id, s) => math.abs(s - expected(id)) < 1e-12 }
    }

  property("duplicatedSpans equals a brute-force reference on random corpora") =
    Prop.forAllNoShrink(Gen.listOfN(6, genDoc), Gen.chooseNum(2, 4)) {
      (docs, n) =>
        import spark.implicits._
        val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = SpanDedup.duplicatedSpans(df, "doc_id", "text", n, 2)
          .collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
          .toSet
        // brute force: per doc the positions whose n-gram occurs in
        // ANOTHER doc, merged greedily while gaps stay <= n
        val grams = docs.zipWithIndex.map { case (t, i) =>
          val ws = t.split(" ")
          i.toLong -> (0 to ws.length - n).map(p =>
            p -> ws.slice(p, p + n).mkString(" ")).toVector
        }.toMap
        val docsOfGram = grams.toSeq
          .flatMap { case (id, gs) => gs.map { case (_, g) => (g, id) } }
          .groupMap(_._1)(_._2).view.mapValues(_.distinct.size).toMap
        val expected = grams.flatMap { case (id, gs) =>
          val hits = gs.collect { case (p, g) if docsOfGram(g) >= 2 => p }
          hits.foldLeft(Vector.empty[(Int, Int)]) {
            case (acc :+ ((s, e)), p) if p - e <= n => acc :+ (s -> p)
            case (acc, p) => acc :+ (p -> p)
          }.map { case (s, e) => (id, s, e + n - 1, e + n - s) }
        }.toSet
        got == expected
    }

  property("rrf fusion is monotone in rank: improving a rank never " +
      "lowers the fused score") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 50), Gen.chooseNum(1, 50)) {
      (rA, rB) =>
        import spark.implicits._
        val a1 = Seq((1L, rA)).toDF("id", "rank")
        val a2 = Seq((1L, rA + 1)).toDF("id", "rank")
        val b = Seq((1L, rB)).toDF("id", "rank")
        def fused(a: org.apache.spark.sql.DataFrame) =
          Retrieval.rrf2(a, b, 60).collect().head.getDouble(1)
        fused(a1) > fused(a2)
    }
}
