package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the cluster-resolution step
  * of near-duplicate removal. Pair-level dedup ("drop the higher id of
  * every pair") over-deletes when duplicates chain (A~B, B~C but not
  * A~C): the correct operation groups docs into components and keeps
  * ONE representative per component. (Extension; the reference has no
  * graph or iterative operators at all, SURVEY.md §2.2.)
  *
  * Algorithm: distributed min-label propagation to a fixpoint. Each
  * round every vertex takes the min of its own label and its
  * neighbors' labels — one shuffle (groupBy dst) + one join per round,
  * converging in O(component diameter) rounds. Near-dup components are
  * shallow by construction (dups of the same source doc), so rounds
  * stay single-digit in practice; `maxIter` bounds pathological chains.
  *
  * 100 TB notes:
  *  - the edge set is LSH output — corpus-fraction-small — and labels
  *    are 2 longs/vertex; both fit comfortably in the shuffle tier even
  *    when the corpus doesn't.
  *  - each round `localCheckpoint`s the labels: iterative plans
  *    otherwise accumulate lineage (each round re-derives all previous
  *    rounds — the same non-shared-subplan trap as VERDICT r02 #2, but
  *    compounding geometrically).
  *  - at trillion-edge scale the published upgrade is alternating
  *    large-star/small-star rounds (Kiveris et al., "Connected
  *    Components in MapReduce"), which converges in O(log n) rounds
  *    independent of diameter — implemented as
  *    [[connectedComponentsStar]] with the identical contract and
  *    pinned label-equal to this method by ClustersSpec.
  */
object Clusters {

  /** Components of the undirected graph given by two long id columns.
    *
    * @return (id, cluster) for every vertex appearing in an edge, where
    *         cluster is the minimum vertex id of its component.
    */
  def connectedComponents(edges: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIter: Int = 20): DataFrame = {
    // Materialize the edge list ONCE before fanning out: the two
    // direction branches below (and every propagation round) would
    // otherwise each re-evaluate whatever pipeline produced the edges —
    // here typically the full LSH near-dup pass. Eager localCheckpoint
    // trades lineage for that guarantee; the edge set is tiny. The
    // trade's cost: checkpoint blocks have no lineage, so losing an
    // executor that holds them FAILS the query loudly (it does not
    // silently recompute) — retry at the application level, or at
    // 100 TB with flaky fleets use a reliable checkpoint dir on
    // fault-tolerant storage instead.
    val e = edges.select(col(idA).as("src"), col(idB).as("dst"))
      .localCheckpoint()
    val adj = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var labels = adj.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = adj.join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("label").as("nbr_label"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint() // EAGER, deliberately (r16 measured): a lazy
        // checkpoint materialized through the isEmpty convergence probe
        // reads FEWER partitions (isEmpty is an incremental take(1)),
        // so the checkpoint never fully materializes in one job and the
        // next round re-runs the remainder — measured 0.4 s SLOWER per
        // query (emb_knn_components 3.9 -> 4.4 s) than paying the full
        // eager materialization up front.
      // fixpoint test: one action over two checkpointed label sets —
      // O(vertices in pairs), not O(corpus)
      converged = updated.join(labels.withColumnRenamed("label", "prev"), "id")
        .filter(col("label") =!= col("prev")).isEmpty
      labels = updated
      iter += 1
    }
    adj.unpersist()
    // a truncated propagation is WRONG (components still split), not
    // merely slow — fail loudly instead of returning plausible labels.
    // maxIter bounds the component diameter: raise it for pathological
    // chains, or switch to large-star/small-star (O(log n) rounds).
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds — " +
        "component diameter exceeds maxIter")
    labels
  }

  /** [[connectedComponents]] via alternating large-star/small-star
    * contractions (Kiveris et al. 2014) — the trillion-edge upgrade
    * path: round count is O(log n) regardless of component DIAMETER,
    * where label propagation pays one round per hop. Same contract:
    * (id, cluster = min component id) for every vertex in an edge.
    *
    * Per round both operations need only each vertex's MIN neighbor —
    * a partial-aggregatable `groupBy(min)` plus one join; no neighbor
    * lists are ever collected, so hub vertices (the adversarial case
    * for naive contraction) cost O(degree) streamed rows, not O(degree)
    * memory.
    *
    *  - large-star: every neighbor v > u re-links to m(u) = min(Γ(u) ∪
    *    {u}); processed symmetrically, every edge survives through its
    *    smaller endpoint's star.
    *  - small-star: every neighbor v ≤ u (plus u itself) links to
    *    m⁻(u) = min of that set.
    *
    * Fixpoint = edge set unchanged (one full-outer-join action per
    * round over the star-contracted set — ≤ one row per non-root
    * vertex). At the fixpoint edges are exactly (vertex, root).
    *
    * Trade vs [[connectedComponents]]: star contraction pays ~2× the
    * per-round constants (two aggregate+join phases per round), buying
    * round-count independence from component diameter. On shallow
    * near-dup graphs propagation is the cheaper production path; this
    * is the escape hatch for deep/chained components at corpus scale.
    */
  def connectedComponentsStar(edges: DataFrame, idA: String = "id_a",
                              idB: String = "id_b",
                              maxIter: Int = 25): DataFrame = {
    var e = edges
      .select(col(idA).as("u"), col(idB).as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("v"),
        greatest(col("u"), col("v")).as("u")) // (v < u) orientation
      .distinct()
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // symmetrize with one explode instead of a self-union (narrower
      // plan, and Union's constraint rewrite mishandles branches that
      // share a subtree)
      def sym(d: DataFrame): DataFrame = d
        .select(explode(array(
          struct(col("u").as("a"), col("v").as("b")),
          struct(col("v").as("a"), col("u").as("b")))).as("p"))
        .select(col("p.a").as("u"), col("p.b").as("v"))
      val symE = sym(e)
      // large-star over the symmetric adjacency: m(u) folds the min
      // neighbor with u itself; only larger neighbors re-link.
      val mins = symE.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = symE.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star over the large-star output: smaller neighbors (and
      // u itself) all link to the min of that closed set. Every ls row
      // already has u > v (u is the re-linked larger endpoint, v a
      // component min), so ls IS the per-larger-endpoint smaller-
      // neighbor list — symmetrize-and-refilter would round-trip to
      // the same set. The (u, m) self-link is emitted once per
      // neighbor row; the trailing distinct collapses them.
      val smaller = ls
      val minsS = smaller.groupBy(col("u")).agg(min(col("v")).as("m"))
      val ss = smaller.join(minsS, "u")
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("p"))
        .select(col("p.a").as("u"), col("p.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(false) // lazy: the convergence action below
                                // materializes it — one job per round,
                                // not three
      // set equality of two distinct sets in ONE action: a full-outer
      // join surfaces both directions of the symmetric difference
      // under one plan (no Union of subplans that share subtrees)
      converged = ss.withColumn("l", lit(1))
        .join(e.withColumn("r", lit(1)), Seq("u", "v"), "full_outer")
        .filter(col("l").isNull || col("r").isNull)
        .isEmpty
      e = ss
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge within $maxIter rounds")
    // fixpoint edges are (vertex, root). Every input vertex also
    // contributes (id, id) so roots and self-loop-only vertices keep
    // their own label (matching connectedComponents); the final min
    // collapses the two sources.
    val verts = edges.select(col(idA).as("id"))
      .union(edges.select(col(idB).as("id"))).distinct()
    e.groupBy(col("u").as("id")).agg(min(col("v")).as("label"))
      .union(verts.select(col("id"), col("id").as("label")))
      .groupBy("id").agg(min("label").as("label"))
  }
}
