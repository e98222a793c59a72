package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** E205 leakage-safe train/val/test split: the constructive guarantee
  * (no near-dup pair straddles a split), the audit's non-vacuity (the
  * naive per-doc split DOES leak on this corpus — otherwise the audit
  * proves nothing), and migration-minimality for the non-duplicated
  * bulk (singletons keep their docs_split_assign split).
  */
class LeakageSplitSpec extends SparkSpec {

  private lazy val assign =
    CurationQueries.queries("docs_split_leakage_safe")(spark, sfDir)
      .localCheckpoint()
  private lazy val audit =
    CurationQueries.queries("docs_split_leakage_audit")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap

  test("no near-dup pair straddles the cluster-keyed split") {
    val pairs = graft.ext.Dedup.nearDupPairsNative(
      graft.Tables.documents(spark, sfDir), "doc_id", "text",
      DedupQueries.WordN, word = true, DedupQueries.JaccardThreshold)
    assert(pairs.count() > 0) // the claim is empty without planted dups
    val straddle = pairs
      .join(assign.select(col("doc_id").as("id_a"), col("cluster").as("cl_a"),
        col("split").as("sp_a")), "id_a")
      .join(assign.select(col("doc_id").as("id_b"), col("cluster").as("cl_b"),
        col("split").as("sp_b")), "id_b")
      .filter(col("sp_a") =!= col("sp_b") || col("cl_a") =!= col("cl_b"))
    assert(straddle.count() == 0)
  }

  test("audit: by_cluster is leak-free, by_doc measurably is not") {
    val (totCl, crossCl, freeCl) = audit("by_cluster")
    val (totDoc, crossDoc, freeDoc) = audit("by_doc")
    assert(totCl == totDoc && totCl > 0)
    assert(crossCl == 0 && freeCl)
    // Non-vacuity: if the naive split happened to be safe here, the
    // audit would be comparing zero to zero.
    assert(crossDoc > 0 && !freeDoc)
  }

  test("singletons keep their per-doc split (upgrade migrates only " +
      "duplicate clusters)") {
    val naive = CurationQueries.queries("docs_split_assign")(spark, sfDir)
      .withColumnRenamed("split", "naive_split")
    val migrated = assign
      .filter(col("cluster") === col("doc_id")) // self-labeled
      .join(naive, "doc_id")
      .filter(col("split") =!= col("naive_split"))
    assert(migrated.count() == 0)
  }

  test("split fractions stay near 10/10/80 under cluster keying") {
    val byS = assign.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = byS.values.sum.toDouble
    assert(byS("train") / n > 0.6)
    assert(byS.getOrElse("test", 0L) + byS.getOrElse("val", 0L) > 0)
  }
}
