package graft.queries

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
}
