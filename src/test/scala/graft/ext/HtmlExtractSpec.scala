package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed extractions for the raw-web tier (E233): tag strip,
  * link-density boilerplate drop, entity decode order, and the clean-
  * text byte-identity passthrough the verdict asked to pin.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String): (String, Long, Long) =
    Seq(html).toDF("h")
      .select(HtmlExtract.extract(col("h")).as("x"))
      .select(col("x.text_clean"), col("x.n_kept"), col("x.n_dropped"))
      .as[(String, Long, Long)].head()

  test("hand-computed six-line page: title and content kept, nav and " +
      "footer dropped by link density, closers dropped as empty") {
    val html = Seq(
      "<html><head><title>Doc 9</title></head><body>",
      "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>",
      "<p>real content words here</p>",
      "<div><a href=\"/tos\">Terms of Service</a> <a href=\"/p\">Privacy Policy</a> | 2024</div>",
      "</body></html>").mkString("\n")
    val (clean, kept, dropped) = run(html)
    assert(clean == "Doc 9\nreal content words here")
    assert(kept == 2L && dropped == 3L)
    // the footer's arithmetic, by hand: anchors "Terms of Service" (16)
    // + "Privacy Policy" (14) = 30; visible "Terms of Service Privacy
    // Policy | 2024" = 37; 60 > 37 → dropped
  }

  test("borderline link density: exactly half anchor text is KEPT " +
      "(the rule is 2·anchor <= visible, not <)") {
    // anchor "abcd" (4), visible "abcd wxyz" (9): 8 <= 9 → kept
    val (c1, k1, _) = run("<a href=\"x\">abcd</a> wxyz")
    assert(k1 == 1L && c1 == "abcd wxyz")
    // anchor "abcde" (5), visible "abcde wxy" (9): 10 > 9 → dropped
    val (c2, k2, _) = run("<a href=\"x\">abcde</a> wxy")
    assert(k2 == 0L && c2 == "")
  }

  test("entity decode: named + numeric + nbsp, with &amp; LAST so " +
      "&amp;lt; yields the literal &lt;") {
    val (clean, _, _) =
      run("A &amp; B &lt;i&gt; &quot;q&quot; it&#39;s&nbsp;ok &amp;lt;")
    assert(clean == "A & B <i> \"q\" it's ok &lt;")
  }

  test("tags spanning attributes and whitespace collapse to single " +
      "spaces; leading/trailing space trimmed") {
    val (clean, kept, dropped) =
      run("<p class=\"x\"  data-y=\"1\">alpha</p>   <span>beta</span>")
    assert(clean == "alpha beta" && kept == 1L && dropped == 0L)
  }

  test("script/style payloads and comment bodies are stripped, never " +
      "surfacing as visible text (VERDICT r12 #5)") {
    val html = Seq(
      "<p>before</p>",
      "<script type=\"text/javascript\">",
      "var leak = 'SCRIPTLEAK';",
      "track(leak);",
      "</script>",
      "<style>.x { color: STYLELEAK }</style>",
      "<!-- COMMENTLEAK hidden note -->",
      "<p>after</p>").mkString("\n")
    val (clean, kept, dropped) = run(html)
    assert(clean == "before\nafter")
    assert(!clean.contains("SCRIPTLEAK") && !clean.contains("STYLELEAK")
      && !clean.contains("COMMENTLEAK"))
    // the 4 physical script lines collapse to ONE all-space line
    // (dotall strip runs pre-split), then style + comment lines empty:
    // 5 post-strip lines, 2 kept, 3 dropped
    assert(kept == 2L && dropped == 3L)
  }

  test("a zero-kept document yields an EMPTY lines array (no phantom " +
      "'' line for downstream line tiers; ADVICE r12)") {
    import org.apache.spark.sql.functions.col
    val rows = Seq("<a href=\"/x\">Only Nav</a>", "")
      .toDF("h")
      .select(HtmlExtract.extract(col("h")).as("x"))
      .select(col("x.text_clean"), col("x.lines"), col("x.n_kept"))
      .as[(String, Seq[String], Long)].collect()
    rows.foreach { case (clean, lines, kept) =>
      assert(clean == "" && lines.isEmpty && kept == 0L)
    }
  }

  test("clean single-spaced text passes through byte-identical") {
    val texts = Seq(
      "the quick brown fox",
      "one",
      "words with 123 numbers and punct: a,b.c")
    texts.foreach { t =>
      val (clean, kept, dropped) = run(t)
      assert(clean == t, s"not byte-identical for '$t'")
      assert(kept == 1L && dropped == 0L)
    }
  }

  test("fixture corpus: every unplanted doc is byte-identical, every " +
      "planted doc recovers its text as the middle kept line") {
    val out = graft.queries.CurationQueries
      .queries("docs_html_extract")(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir), "doc_id")
      .select(col("doc_id"), col("text_clean"), col("n_kept"),
        col("n_dropped"), col("text"))
      .collect()
    assert(out.length == 500)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 0) {
        // 9 post-strip lines (script block collapsed to one): title,
        // content, entities kept; nav, script, style, comment, footer,
        // closers dropped
        assert(r.getLong(2) == 3L && r.getLong(3) == 6L, s"doc $id counts")
        val lines = r.getString(1).split("\n", -1)
        assert(lines(1) == r.getString(4), s"doc $id content line")
        assert(lines(2) == "Fish & chips <tag> say \"hi\" it's fine")
        assert(!r.getString(1).contains("LEAK"), s"doc $id block leak")
      } else {
        assert(r.getString(1) == r.getString(4), s"doc $id passthrough")
        assert(r.getLong(2) == 1L && r.getLong(3) == 0L)
      }
    }
  }
}
