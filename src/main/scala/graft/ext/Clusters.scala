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
  *    independent of diameter; the operator contract here (edges in,
  *    (id, cluster=min id) out) is identical, so it slots in without
  *    touching callers.
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
        .localCheckpoint()
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
}
