package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene pass that
  * flags corpus documents sharing word n-grams with a held-out
  * evaluation set (absent from the reference; standard practice for
  * LLM pretraining pipelines, e.g. the 13-gram overlap filters
  * described in the GPT-3 and PaLM papers).
  *
  * Scale shape: the eval set is tiny by definition (benchmarks are
  * KBs against a 100 TB corpus), so its distinct n-grams BROADCAST;
  * the corpus side streams its n-gram rows map-side through the
  * broadcast hash join and only MATCHED rows ever shuffle (for the
  * per-document distinct-hit count) — the full corpus n-gram set is
  * never shuffled, deduplicated, or materialized.
  *
  * The fixture query uses n = 3 so the synthetic corpus (background
  * word-3-gram Jaccard < 0.1, but nonzero) produces a non-trivial hit
  * distribution; production pipelines use 8–13-grams, which is just
  * the `n` parameter.
  */
object Decontam {

  /** Per-document count of distinct word n-grams shared with the eval
    * subset. Output: (doc_id, n_hits) for contaminated documents only
    * — a document with zero overlapping n-grams does not appear.
    *
    * @param evalPred marks the held-out rows (they are excluded from
    *                 the scored corpus side)
    */
  def hits(docs: DataFrame, idCol: String, textCol: String, n: Int,
           evalPred: Column): DataFrame = {
    val evalGrams = Dedup
      .wordShingleRows(docs.filter(evalPred), col(idCol), col(textCol), n)
      .select(col("x")).distinct()
    val corpusGrams = Dedup
      .wordShingleRows(docs.filter(!evalPred), col(idCol), col(textCol), n)
    corpusGrams.join(broadcast(evalGrams), "x")
      .groupBy(col("id").as("doc_id"))
      .agg(countDistinct(col("x")).as("n_hits"))
  }
}
