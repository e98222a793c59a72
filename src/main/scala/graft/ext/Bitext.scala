package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (E265) — the parallel-corpus alignment
  * stage of multilingual training-data pipelines (the CCMatrix/LASER
  * design, Artetxe & Schwenk 2019): for each source-side embedding x,
  * the best target candidate y is scored not by raw cosine but by the
  * MARGIN
  *
  *   margin(x, y) = cos(x, y) / ((avgK(x, B) + avgK(y, A)) / 2)
  *
  * where avgK are the mean cosines of the k nearest neighbors in the
  * OTHER side. Raw cosine mis-mines hubs — target sentences that sit
  * close to everything score high against every source; dividing by
  * the neighborhood means cancels the hubness and keeps only pairs
  * that are close TO EACH OTHER specifically (BitextSpec plants a hub
  * and proves margin demotes it while raw cosine does not).
  *
  * Scale design: mining runs in bounded SOURCE BATCHES (the production
  * shape — CCMatrix mines billions of pairs batch-by-batch), so the
  * scored bipartite table is |batch| × |B| with the batch broadcast,
  * streaming the big side. Cosine is symmetric, so ONE scored table
  * serves both directions: the backward neighborhoods are computed
  * only for the ~|batch| winning targets (semi-join prune), never for
  * all of B. The candidate generator is pluggable —
  * [[marginMineScored]] takes any (xid, yid, cs) table, so the exact
  * tier here swaps for IVF/LSH candidates (E7/E70) at 100 TB without
  * touching the margin arithmetic.
  */
object Bitext {

  /** Mine forward pairs from a bounded source batch `a (id, vec)`
    * against target side `b (id, vec)` with exact cosine scoring.
    */
  def marginMine(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val scored = b.select(col("id").as("yid"), col("vec").as("yv"))
      .join(broadcast(a.select(col("id").as("xid"), col("vec").as("xv"))))
      .select(col("xid"), col("yid"),
        Similarity.cosine(col("xv"), col("yv")).as("cs"))
    marginMineScored(scored, k)
  }

  /** Margin arithmetic over a pre-scored candidate table
    * `scored (xid, yid, cs)` — plug in exact or ANN candidates. One
    * output row per xid: its best target, raw cosine, margin, and
    * whether the pair is MUTUAL (x is also y's best source — the
    * strict CCMatrix acceptance test).
    *
    * Neighborhood sums fold in rank order (the heap returns items
    * sorted), so the oracle's `list_reduce(list(cs ORDER BY rn))`
    * replays them bit-for-bit.
    */
  def marginMineScored(scored: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "need at least one neighbor for the margin mean")
    val sc = scored.localCheckpoint(false) // consumed by both directions
    val fw = sc.groupBy(col("xid"))
      .agg(Similarity.topkUdaf(k)(col("cs"), col("yid")).as("t"))
      .select(col("xid"),
        col("t.items").getItem(0).getField("id").as("yid"),
        col("t.items").getItem(0).getField("score").as("cs"),
        (rankOrderSum(col("t.items")) / k).as("ka"))
      .localCheckpoint(false) // consumed by the ys prune and the join
    val ys = fw.select(col("yid")).distinct()
    val bw = sc.join(ys, "yid")
      .groupBy(col("yid"))
      .agg(Similarity.topkUdaf(k)(col("cs"), col("xid")).as("t"))
      .select(col("yid").as("byid"),
        col("t.items").getItem(0).getField("id").as("bx"),
        (rankOrderSum(col("t.items")) / k).as("kb"))
    fw.join(bw, col("yid") === col("byid"))
      .select(col("xid").as("x_id"), col("yid").as("y_id"),
        round(col("cs"), 6).as("cos"),
        round(col("cs") / ((col("ka") + col("kb")) / 2.0), 6).as("margin"),
        (col("bx") === col("xid")).as("mutual"))
  }

  /** Sum of heap-item scores in rank order — the deterministic fold
    * the oracle replays. k is tiny, so the interpreted HOF never sees
    * more than k elements per row.
    */
  private def rankOrderSum(items: Column): Column =
    aggregate(items, lit(0.0), (acc, it) => acc + it.getField("score"))
}
