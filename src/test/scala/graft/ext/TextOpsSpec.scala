package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("stopword ratio and mean token length on a crafted sentence") {
    val df = Seq("the cat sat on the mat").toDF("text")
    val toks = TextOps.tokens(col("text"))
    assert(one[Double](df.select(TextOps.stopwordRatio(toks))) == 2.0 / 6.0)
    assert(one[Double](df.select(TextOps.meanTokenLen(toks))) == 17.0 / 6.0)
  }

  test("langId picks the language whose markers dominate; first wins ties") {
    val df = Seq(
      ("d1", "der hund und die katze ist hier"),
      ("d2", "el perro y la casa que es"),
      ("d3", "no markers at all xyz")).toDF("id", "text")
    val out = df.select(col("id"), TextOps.langId(col("text")).as("l"))
      .as[(String, String)].collect().toMap
    assert(out("d1") == "de")
    assert(out("d2") == "es")
    assert(out("d3") == "en") // all scores 0 -> first declared language
  }

  test("fingerprint is invariant to case, punctuation, and whitespace runs") {
    val df = Seq(
      ("a", "Hello,   World! 42"),
      ("b", "hello world 42"),
      ("c", "HELLO...world   42"),
      ("d", "different text")).toDF("id", "text")
    val fps = df.select(col("id"), TextOps.fingerprint(col("text")).as("fp"))
      .as[(String, String)].collect().toMap
    assert(fps("a") == fps("b") && fps("b") == fps("c"))
    assert(fps("a") != fps("d"))
    assert(fps("a").length == 16)
  }

  test("BPE-ish tokenizer splits letter runs, digit runs, and symbols") {
    val df = Seq("abc123 def-gh 4x").toDF("text")
    val toks = df.select(TextOps.bpeTokens(col("text"))).as[Seq[String]].collect().head
    assert(toks == Seq("abc", "123", "def", "-", "gh", "4", "x"))
  }

  test("foldText canonicalizes accents, typography, NBSP, case, and " +
      "whitespace; clean text is a fixed point (E238)") {
    val cases = Seq(
      "CAFÉ naïve façade" -> "cafe naive facade",
      "“quoted” it’s – a — b" -> "\"quoted\" it's - a - b",
      "done end" -> "done end",
      "  spaced   out\t x " -> "spaced out x",
      "already clean text" -> "already clean text")
    val out = cases.map(_._1).toDF("t")
      .select(TextOps.foldText(col("t"))).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want, s"'$got' != '$want'")
    }
    // the fold map itself stays 1:1 — a drifted edit fails here, not
    // silently misaligning translate
    assert(TextOps.FoldFrom.length == TextOps.FoldTo.length)
  }

  test("quality score is bounded and rewards the target stopword rate") {
    val good = ("w " * 49 + "the").trim                   // 50 tokens, 2% stopwords
    val ideal = (Seq.fill(45)("w") ++ Seq.fill(5)("the")).mkString(" ") // 10%
    val df = Seq(("g", good), ("i", ideal), ("tiny", "x")).toDF("id", "text")
    val q = df.select(col("id"), TextOps.qualityScore(col("text")).as("q"))
      .as[(String, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q("i") == 1.0)      // full length score, exact 10% stopwords
    assert(q("tiny") < 0.05)   // single token
    assert(q("g") < q("i"))
  }

  test("contentTags routes code, list, and prose by hand-computed fractions") {
    val code = "def f(x):\n    return x * 2;\nplain words\n}"   // 3/4 code
    val lst = "intro line\n- one\n- two\n* three"               // 3/4 bullets
    val prose = "just a sentence\nand another one"              // 0/2
    val mixed = "a line ending in a brace {\nplain\nplain\nplain" // 1/4 < 0.3
    val df = Seq(("c", code), ("l", lst), ("p", prose), ("m", mixed))
      .toDF("id", "text")
    val out = TextOps.contentTags(df, col("text"))
      .select(col("id"), col("n_lines"), col("code_frac"),
        col("bullet_frac"), col("tag"))
      .as[(String, Long, Double, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("c") == ("c", 4L, 0.75, 0.0, "code"))
    assert(out("l") == ("l", 4L, 0.0, 0.75, "list"))
    assert(out("p") == ("p", 2L, 0.0, 0.0, "prose"))
    assert(out("m") == ("m", 4L, 0.25, 0.0, "prose")) // below the 0.3 gate
  }
}
