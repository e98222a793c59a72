package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity

/** Driver-contract queries + DuckDB oracles for similarity search
  * (SURVEY.md §7.4). Oracle arithmetic mirrors the Spark HOF kernel
  * term by term: double cast → pairwise products → left fold → sqrt —
  * so both engines produce bit-identical doubles (check.py's 9-decimal
  * rounding is headroom, not a crutch).
  */
object SimilarityQueries {

  private val NumQueries = 10 // vec_id < 10 are the query set
  private val K = 5           // brute-force top-k
  private val KIvf = 3        // per-cell top-k
  private val NearDupThreshold = 0.4

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(
      col("vec_id").as("id"), col("label").as("part"),
      Similarity.toDouble(col("embedding")).as("vec"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-5 for 10 query vectors against the whole
    // corpus: broadcast queries, map-side scoring, bounded-heap UDAF.
    "emb_topk" -> ((s, dir) => {
      val c = corpus(s, dir)
      val q = c.filter(col("id") < NumQueries)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      Similarity.topK(c, q, K)
    }),

    // IVF-style top-3: every vector queries only its own coarse cell
    // (label = the fixture's stand-in for a k-means cell id).
    "emb_topk_ivf" -> ((s, dir) => {
      val c = corpus(s, dir)
      val q = c.select(col("id").as("qid"), col("part"), col("vec").as("qvec"))
      Similarity.topKWithinPartition(c, q, KIvf)
    }),

    // Cluster-bucketed cosine near-duplicate pairs at ≥ 0.4.
    "emb_neardup" -> ((s, dir) =>
      Similarity.nearDupPairs(corpus(s, dir), NearDupThreshold)),

    // IVF "training": per-cell centroids in long (cell, dim, value)
    // form — the aggregation shuffles plain doubles, never arrays.
    "emb_centroids" -> ((s, dir) =>
      Similarity.centroids(corpus(s, dir))),

    // k-means assignment step: nearest centroid per vector (broadcast
    // centroids, codegen cosine, max_by argmax).
    "emb_kmeans_assign" -> ((s, dir) => {
      val c = corpus(s, dir)
      Similarity.assignToNearest(c, Similarity.centroids(c))
    }))

  // -------------------------------------------------------------------
  // DuckDB oracles
  // -------------------------------------------------------------------

  /** Left-fold dot product, same order as Similarity.dot. */
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i]), (p, q) -> p + q)"

  private def cosSql(a: String, b: String): String =
    s"""(CASE WHEN (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) = 0 THEN 0.0
       |ELSE ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END)""".stripMargin

  private val embCte =
    "WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

  val oracles: Map[String, String] = Map(
    "emb_topk" ->
      s"""$embCte,
         |q AS (SELECT * FROM e WHERE vec_id < $NumQueries),
         |s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |             ${cosSql("q.v", "e.v")} AS score
         |      FROM q JOIN e ON e.vec_id <> q.vec_id),
         |r AS (SELECT query_id, neighbor_id, score,
         |             row_number() OVER (PARTITION BY query_id
         |                                ORDER BY score DESC, neighbor_id) AS rank
         |      FROM s)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
         |       round(score, 6) AS cos
         |FROM r WHERE rank <= $K""".stripMargin,

    "emb_topk_ivf" ->
      s"""$embCte,
         |s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |             ${cosSql("q.v", "e.v")} AS score
         |      FROM e q JOIN e ON e.label = q.label AND e.vec_id <> q.vec_id),
         |r AS (SELECT query_id, neighbor_id, score,
         |             row_number() OVER (PARTITION BY query_id
         |                                ORDER BY score DESC, neighbor_id) AS rank
         |      FROM s)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id,
         |       round(score, 6) AS cos
         |FROM r WHERE rank <= $KIvf""".stripMargin,

    "emb_neardup" ->
      s"""$embCte
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |       round(${cosSql("a.v", "b.v")}, 6) AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(${cosSql("a.v", "b.v")}, 6) >= $NearDupThreshold""".stripMargin,

    // dim is 0-based on the Spark side (posexplode), hence i - 1
    "emb_centroids" ->
      s"""$embCte,
         |x AS (SELECT label, CAST(i - 1 AS INTEGER) AS dim, v[CAST(i AS INTEGER)] AS val
         |      FROM e, unnest(generate_series(1, len(v))) AS t(i))
         |SELECT label AS part, dim, round(sum(val) / count(*), 6) AS c
         |FROM x GROUP BY label, dim""".stripMargin,

    "emb_kmeans_assign" ->
      s"""$embCte,
         |x AS (SELECT label, CAST(i - 1 AS INTEGER) AS dim, v[CAST(i AS INTEGER)] AS val
         |      FROM e, unnest(generate_series(1, len(v))) AS t(i)),
         |cent AS (SELECT label AS cpart, dim, round(sum(val) / count(*), 6) AS c
         |         FROM x GROUP BY label, dim),
         |cvecs AS (SELECT cpart, list(c ORDER BY dim) AS cvec FROM cent GROUP BY cpart),
         |s AS (SELECT e.vec_id AS id, e.label AS part, cv.cpart,
         |             ${cosSql("e.v", "cv.cvec")} AS score
         |      FROM e CROSS JOIN cvecs cv),
         |r AS (SELECT id, part, cpart, score,
         |             row_number() OVER (PARTITION BY id ORDER BY score DESC, cpart) AS rn
         |      FROM s)
         |SELECT id, part, cpart AS assigned, round(score, 6) AS cos
         |FROM r WHERE rn = 1""".stripMargin)
}
