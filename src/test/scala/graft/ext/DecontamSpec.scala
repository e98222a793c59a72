package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Benchmark decontamination on planted inputs: hit counts are exact
  * distinct-n-gram overlaps, eval docs never score themselves, and
  * clean documents are absent from the output.
  */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps high"),      // eval (id % 2 == 0 here)
    (2L, "totally different benchmark prompt text"), // eval
    (1L, "the quick brown fox jumps low"),       // shares 2 of eval 0's 3-grams
    (3L, "totally different benchmark prompt text"), // verbatim copy of eval 2
    (5L, "nothing in common with anything else"),    // clean
    (7L, "the quick brown fox jumps high indeed"))   // superset of eval 0
    .toDF("doc_id", "text")

  private def run(n: Int) =
    Decontam.hits(docs, "doc_id", "text", n, col("doc_id") % 2 === 0)
      .as[(Long, Long)].collect().toMap

  test("3-gram hits count distinct shared shingles exactly") {
    val hits = run(3)
    // doc 1: "the quick brown", "quick brown fox", "brown fox jumps"
    // shared; "fox jumps low" not. doc 3: all 3 of eval 2's 3-grams.
    // doc 7 contains every 3-gram of eval 0 (4 of its 5 are shared).
    assert(hits == Map(1L -> 3L, 3L -> 3L, 7L -> 4L))
  }

  test("clean docs and eval docs never appear in the output") {
    val ids = run(3).keySet
    assert(!ids.contains(5L) && !ids.contains(0L) && !ids.contains(2L))
  }

  test("larger n is stricter: hit counts shrink to surviving windows") {
    // doc 1 keeps one shared window ("the quick brown fox jumps"),
    // doc 3 (5 words, verbatim) keeps its single whole-window gram,
    // doc 7 shares both of eval 0's 5-gram windows.
    assert(run(5) == Map(1L -> 1L, 3L -> 1L, 7L -> 2L))
  }
}
