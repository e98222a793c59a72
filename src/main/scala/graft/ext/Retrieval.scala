package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse/lexical retrieval scoring — the BM25 + rank-fusion tier that
  * completes the index family (E47 inverted index, E39 TF-IDF) with the
  * scoring functions an LLM-data search/curation stack actually ranks
  * with. The reference engine (a CDC router) has no retrieval surface;
  * this is part of the "operations a large-scale training-data pipeline
  * needs" mandate.
  *
  * Scale design: BM25 never materializes a per-(doc, vocabulary) matrix
  * and never joins on the document key. ONE map-side-combinable token
  * aggregation yields per-doc length plus a conditional tf per query
  * term; a second 1-row aggregation over it yields N/avgdl/df; scoring
  * is a pure projection behind the broadcast of that single stats row.
  * Per-document scores are summed over a FIXED term order (left-to-
  * right over the term list), so the resulting doubles are bit-identical
  * across engines and across partitionings — a nondeterministic float
  * fold would make the ranking itself flaky.
  */
object Retrieval {

  /** Okapi BM25 (Lucene idf variant: ln(1 + (N - df + 0.5)/(df + 0.5)),
    * which never goes negative) for a fixed bag of query terms over a
    * (id, text) corpus. Returns (doc_id, score) for documents matching
    * at least one term; score is the raw double (caller rounds for
    * display AFTER ranking, so ordering never sits on rounded values).
    *
    * One-pass shape: a SINGLE token aggregation produces per-doc length
    * AND one conditional tf count per query term (|terms| is a
    * query-sized constant, so the column fan is bounded), a second
    * 1-row aggregation over it yields N/avgdl/df, and scoring is a pure
    * projection behind a broadcast stats attach — no doc-keyed join, no
    * second pass over the token explode.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double, b: Double): DataFrame = {
    require(terms.nonEmpty && terms.distinct == terms, "terms: non-empty, distinct")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("w"))
    // Per-doc length + per-term tf in ONE map-side-combinable agg. The
    // tokenization matches the oracle's (split never yields an empty
    // array, so every document counts toward n_docs).
    val tfCols = terms.indices.map(i =>
      count(when(col("w") === terms(i), lit(1))).as(s"tf_$i"))
    val perDoc = toks.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    // Corpus stats: one bounded row — doc count, token total, and one
    // document frequency per term.
    val dfCols = terms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, lit(1L)).otherwise(lit(0L))).as(s"df_$i"))
    val stats = perDoc.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("tot") +: dfCols): _*)
    // Per-term contribution, summed in FIXED order (left-to-right over
    // the term list) — deterministic doubles, no shuffle-order float
    // fold; expression order is mirrored token-for-token by the DuckDB
    // oracle. An unmatched term contributes exactly 0.0.
    def contrib(i: Int): Column = {
      val tf = col(s"tf_$i")
      val dfc = col(s"df_$i")
      val idf = log(lit(1.0) + (col("n_docs") - dfc + lit(0.5)) / (dfc + lit(0.5)))
      val c = idf * ((tf.cast("double") * lit(k1 + 1.0)) /
        (tf.cast("double") +
          lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl").cast("double") /
              (col("tot").cast("double") / col("n_docs").cast("double")))))
      when(tf > 0, c).otherwise(lit(0.0))
    }
    val score = terms.indices.map(contrib).reduceLeft(_ + _)
    perDoc
      .crossJoin(broadcast(stats)) // 1-row corpus stats attach
      .filter(terms.indices.map(i => col(s"tf_$i") > 0).reduce(_ || _))
      .select(col("doc_id"), score.as("score"))
  }

  /** Reciprocal Rank Fusion (Cormack et al. 2009) of two rankings:
    * rrf = 1/(c + rank_a) + 1/(c + rank_b), absent ranks contribute 0.
    * Inputs are (id, rank) with integer ranks; the fusion is a single
    * full-outer equi-join — rankings of n docs fuse with one n-row
    * shuffle regardless of corpus size, because rank lists are already
    * the top slice. The two reciprocal terms are added in fixed order.
    */
  def rrf2(a: DataFrame, b: DataFrame, c: Int): DataFrame =
    a.select(col("id"), col("rank").as("rank_a"))
      .join(b.select(col("id"), col("rank").as("rank_b")), Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(lit(1.0) / (lit(c) + col("rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c) + col("rank_b")), lit(0.0))).as("rrf"),
        col("rank_a"), col("rank_b"))
}
