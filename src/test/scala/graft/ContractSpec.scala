package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract meta-invariants: the things a one-character typo
  * could silently break without any query failing.
  */
class ContractSpec extends AnyFunSuite {

  test("every registered query has an oracle and every oracle a query") {
    // A query without an oracle silently downgrades to the driver's
    // weaker rows-only check; an oracle without a query is dead SQL
    // that suggests a renamed/dropped query. All current operators are
    // oracle-checkable, so the sets must match exactly — a future
    // intentionally-oracle-less query should be added to an explicit
    // allowlist here, not slip through.
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("query names never collide across family maps") {
    // SparkEntry merges the family maps with ++, which silently keeps
    // the LAST duplicate — a collision would shadow one operator's
    // query with another's.
    val families = Seq(
      "cdc" -> graft.queries.CdcQueries.queries,
      "dedup" -> graft.queries.DedupQueries.queries,
      "similarity" -> graft.queries.SimilarityQueries.queries,
      "text" -> graft.queries.TextQueries.queries,
      "multimodal" -> graft.queries.MultimodalQueries.queries,
      "window" -> graft.queries.WindowQueries.queries,
      "relational" -> graft.queries.RelationalQueries.queries,
      "advanced" -> graft.queries.AdvancedQueries.queries,
      "curation" -> graft.queries.CurationQueries.queries,
      "analytics" -> graft.queries.AnalyticsQueries.queries,
      "source" -> graft.queries.SourceQueries.queries,
      "retrieval" -> graft.queries.RetrievalQueries.queries)
    val all = families.flatMap { case (fam, m) => m.keys.map(_ -> fam) }
    val dups = all.groupMap(_._1)(_._2).filter(_._2.size > 1)
    assert(dups.isEmpty, s"colliding query names: $dups")
    assert(all.size == SparkEntry.queries.size)
  }

  test("oracle SQL is single-statement and names its tables from the fixture set") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // ';' INSIDE a SQL string literal is data (the E233 oracle carries
    // HTML entities like '&amp;'), not a statement separator — strip
    // quoted literals (with '' escapes) before checking.
    def outsideLiterals(sql: String): String = {
      val sb = new StringBuilder
      var i = 0
      var inLit = false
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (c == '\'') inLit = !inLit // '' escape = two toggles, stays out
        else if (!inLit) sb += c
        i += 1
      }
      sb.toString
    }
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!outsideLiterals(sql).contains(";"),
        s"$name: bare ';' would break the driver's single-statement run")
      assert(tables.exists(t => sql.contains(t)),
        s"$name: oracle references no fixture table")
    }
  }
}
