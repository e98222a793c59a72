package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a document link graph — the crawl-quality centrality
  * signal (Page et al. 1999; Common Crawl ranks hosts the same way) that
  * a training-data pipeline uses to weight or cut crawl sources.
  * (Extension; the reference has no graph operators at all,
  * SURVEY.md §2.2. Completes the DataFrame graph family beside the
  * connected-components pair in [[Clusters]].)
  *
  * Power iteration on DataFrames:
  *   r₀(v) = 1/n
  *   rₜ₊₁(v) = (1−d)/n + d · Σ_{u→v} rₜ(u)/outdeg(u)
  *
  * A FIXED iteration count (not a convergence epsilon) keeps the result
  * bit-stable across engines — the oracle unrolls the same rounds — and
  * is the production norm anyway (rank ORDER stabilizes in a handful of
  * rounds; web-scale deployments run a fixed 10–50).
  *
  * 100 TB notes:
  *  - per round: ONE shuffle for the contribution aggregate
  *    (groupBy dst, partial-aggregatable — each map task pre-sums its
  *    local contributions per target) + one join back to the vertex
  *    set. The edge⋈rank join co-shuffles on src; on a real cluster
  *    pre-partition both by src once and every round reuses the
  *    exchange.
  *  - state per round is (id, rank) — 16 bytes/vertex, corpus-fraction
  *    small next to the edge list; the edge list itself never mutates.
  *  - each round `localCheckpoint`s the ranks: iterative plans
  *    otherwise accumulate lineage geometrically (the same trap the
  *    connected-components loop documents in [[Clusters]]).
  *  - callers must ensure NO DANGLING vertices (outdeg ≥ 1), e.g. by
  *    construction as in [[syntheticEdges]]; dangling nodes leak rank
  *    mass each round (the standard fix — redistribute the dangling
  *    sum — costs one extra scalar aggregate per round and is omitted
  *    while no caller needs it).
  */
object LinkGraph {

  /** Deterministic synthetic link graph over dense ids 0..n−1: each
    * vertex links to `(7i+1) mod n`, `(13i+5) mod n`, `(31i+11) mod n`
    * and `(i+1) mod n`, self-loops dropped, duplicates collapsed. The
    * fixture corpus has no real hyperlinks, so the graph is derived
    * from ids the same way [[graft.queries.AdvancedQueries]]'s
    * referral tree is (E154) — deterministic, engine-reproducible, and
    * expander-shaped (the `(i+1)` ring guarantees outdeg ≥ 1 ⇒ no
    * dangling mass; the three affine maps give in-degree variance so
    * ranks actually spread).
    *
    * @param ids one long column of dense vertex ids
    * @param n   vertex count (ids are 0..n−1)
    * @return (src, dst) edge list, outdeg ∈ [1, 4]
    */
  def syntheticEdges(ids: DataFrame, n: Long): DataFrame = {
    val id = ids.columns.head
    val targets = array(
      pmod(col(id) * 7 + 1, lit(n)),
      pmod(col(id) * 13 + 5, lit(n)),
      pmod(col(id) * 31 + 11, lit(n)),
      pmod(col(id) + 1, lit(n)))
    ids.select(col(id).as("src"), explode(targets).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
  }

  /** Fixed-iteration PageRank.
    *
    * @param vertices one long id column (every vertex, dangling-free
    *                 w.r.t. `edges`)
    * @param edges    (src, dst) directed edges
    * @param n        vertex count (driver scalar; callers already hold
    *                 it — O(1), not a row collect)
    * @param iters    power-iteration rounds
    * @param damping  follow probability d (teleport = 1−d)
    * @return (id, rank) — ranks sum to 1 when no vertex dangles
    */
  def pageRank(vertices: DataFrame, edges: DataFrame, n: Long,
               iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val idCol = vertices.columns.head
    val verts = vertices.select(col(idCol).as("id"))
    // materialize edge+outdeg ONCE: the loop would otherwise re-derive
    // the degree aggregate (and whatever produced the edges) every
    // round — the repeated-subplan trap the CC loop documents
    val contribEdges = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    val teleport = (1.0 - damping) / n
    var ranks = verts.select(col("id"), lit(1.0 / n).as("rank"))
      .localCheckpoint()
    var iter = 0
    while (iter < iters) {
      val contribs = contribEdges
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      // left join keeps zero-in-degree vertices at the teleport floor
      ranks = verts.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + lit(damping) * coalesce(col("c"), lit(0.0)))
            .as("rank"))
        .localCheckpoint()
      iter += 1
    }
    ranks
  }
}
