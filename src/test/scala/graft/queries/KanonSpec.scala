package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** k-anonymity audit + suppression (E249) on a hand-built corpus:
  * one QI group of 6 (safe at k = 5) and one of 2 (at risk). The
  * suppression rewrites ONLY the risky group's source to '*'.
  * Single-round generalization is deliberate — two distinct sub-k
  * groups that don't merge after suppression stay sub-k; re-running
  * the audit is how that is caught (documented limitation).
  */
class KanonSpec extends SparkSpec {
  import spark.implicits._

  // n_chars all in bucket 0 (< 200), so the QI reduces to (lang, source).
  private val docs = (
    (0 until 6).map(i => (i.toLong, "t", "en", "web", 50L)) ++
    Seq((6L, "t", "en", "books", 50L), (7L, "t", "en", "books", 50L)))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("audit flags exactly the sub-k group") {
    val out = CurationQueries.kanonAudit(docs)
      .select("source", "n", "at_risk")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out("web") == ((6L, false)))
    assert(out("books") == ((2L, true)))
  }

  test("suppression generalizes only the risky group's source") {
    val out = CurationQueries.kanonSuppress(docs)
      .select("doc_id", "source_anon")
      .as[(Long, String)].collect().toMap
    assert((0L until 6L).forall(out(_) == "web"))
    assert(out(6L) == "*" && out(7L) == "*")
  }

  test("fixpoint: merged-but-still-sub-k rows are SUPPRESSED — the " +
      "case the single round missed (VERDICT r12 #4)") {
    // (en, web, b0) n=2 + (en, books, b0) n=2 merge in round 1 to
    // (en, '*', 0) n=4 < 5; bucket generalization cannot help (no
    // other bucket); round 3 must drop all four. The safe group of 6
    // passes through untouched.
    val d = (
      (0 until 6).map(i => (i.toLong, "en", "blogs", 50L)) ++
      Seq((6L, "en", "web", 50L), (7L, "en", "web", 50L),
        (8L, "en", "books", 50L), (9L, "en", "books", 50L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    // single round (E249) leaves a sub-k '*' group behind:
    val single = CurationQueries.kanonSuppress(d)
      .groupBy("lang", "source_anon", "size_bucket").count()
      .filter(col("count") < CurationQueries.KanonK)
    assert(single.count() == 1, "premise: one round leaves a sub-k group")
    // the ladder does not:
    val out = CurationQueries.kanonFixpoint(d)
      .select("doc_id", "source_anon").as[(Long, String)].collect().toMap
    assert(out.keySet == (0L until 6L).toSet, "merged sub-k rows suppressed")
    assert(out.values.forall(_ == "blogs"))
  }

  test("fixpoint: bucket generalization SAVES rows that source " +
      "generalization alone leaves sub-k") {
    // (en, web, b0) n=3 + (en, web, b1) n=3: round 1 marks both '*',
    // still 3 < 5 per bucket; round 2 merges buckets to -1 -> n=6 >= 5
    // -> all six rows survive with (en, '*', -1).
    val d = (
      (0 until 3).map(i => (i.toLong, "en", "web", 50L)) ++
      (3 until 6).map(i => (i.toLong, "en", "web", 250L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = CurationQueries.kanonFixpoint(d)
      .select("doc_id", "source_anon", "size_bucket")
      .as[(Long, String, Long)].collect()
    assert(out.length == 6)
    assert(out.forall { case (_, s, b) => s == "*" && b == -1L })
  }

  test("verify row machine-checks the guarantee: k_satisfied true, " +
      "accounting exact") {
    val d = (
      (0 until 6).map(i => (i.toLong, "en", "blogs", 50L)) ++
      Seq((6L, "en", "web", 50L), (7L, "en", "web", 50L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val r = CurationQueries.kanonVerifyStats(d).head()
    assert(r.getAs[Long]("n_input") == 8L)
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_suppressed") == 2L)
    assert(r.getAs[Long]("min_group_n") >= CurationQueries.KanonK)
    assert(r.getAs[Boolean]("k_satisfied"))
  }
}
