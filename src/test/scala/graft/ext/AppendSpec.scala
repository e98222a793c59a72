package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Incremental index append (E262, the FAISS `add` semantics): new
  * vectors are assigned + PQ-encoded under the artifact's FROZEN
  * centroids and codebooks — no retraining — and the staleness that
  * freezing buys is a MEASURED recall delta, not an assumption.
  */
class AppendSpec extends SparkSpec {

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  private val (numSub, subDim) = (16, 4)
  // the E262 gate row's split: id % 7 == 3 arrives after the build
  private val (appendMod, appendRem) = (7, 3)

  private def base = corpus.filter(col("id") % appendMod =!= appendRem)
  private def batch = corpus.filter(col("id") % appendMod === appendRem)
    .select(col("id"), col("vec"))

  private def queries = corpus.filter(col("id") < 10)
    .select(col("id").as("qid"), col("vec").as("qv"))

  /** Mean recall@k of `got (query_id, neighbor_id)` against exact-L2
    * top-k truth over the full corpus.
    */
  private def recallAtK(got: DataFrame, k: Int): Double = {
    val c = corpus.select(col("id"), col("vec"))
    val l2 = aggregate(
      zip_with(col("qv"), col("vec"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val exact = queries.join(c, col("id") =!= col("qid"))
      .select(col("qid"), col("id"), l2.as("d"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("d"), col("id"))))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"))
    val nq = queries.count().toDouble
    got.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"))
      .count().toDouble / (nq * k)
  }

  test("append: manifest re-counts, ids are the disjoint union, and " +
      "search equals the frozen in-memory twin row-for-row") {
    val dir = Files.createTempDirectory("annidx_app").toString
    AnnIndex.build(base, numSub, subDim, dir)
    AnnIndex.append(batch, dir)
    val idx = AnnIndex.load(spark, dir)
    assert(idx.codes.count() == corpus.count(),
      "appended index must cover base + batch")
    assert(idx.codes.select(col("id"))
      .exceptAll(corpus.select(col("id"))).isEmpty &&
      corpus.select(col("id"))
        .exceptAll(idx.codes.select(col("id"))).isEmpty,
      "code ids must be exactly the corpus ids")
    // in-memory twin: train on base, frozen-encode the batch, search
    val (cvecs, cw, codesBase) =
      Similarity.residualIndexBuild(base, numSub, subDim)
    val codesAll = codesBase.unionByName(
      Similarity.residualEncodeFrozen(batch, cvecs, cw, numSub, subDim))
    val inMem = Similarity.residualIndexSearch(cvecs, cw, codesAll,
      queries, numSub, subDim, 5, Similarity.fixedProbePicker(2))
    val persisted = AnnIndex.searchTopK(spark, dir, queries, 5, 2)
    assert(persisted.exceptAll(inMem).isEmpty,
      "persisted-append rows missing from the in-memory twin")
    assert(inMem.exceptAll(persisted).isEmpty,
      "in-memory twin rows missing from persisted-append")
  }

  test("staleness is measured: appended-index recall vs full rebuild") {
    val k = 5
    val dirA = Files.createTempDirectory("annidx_stale_a").toString
    AnnIndex.build(base, numSub, subDim, dirA)
    AnnIndex.append(batch, dirA)
    val dirR = Files.createTempDirectory("annidx_stale_r").toString
    AnnIndex.build(corpus, numSub, subDim, dirR)
    val appended = recallAtK(
      AnnIndex.searchTopK(spark, dirA, queries, k, 2), k)
    val rebuilt = recallAtK(
      AnnIndex.searchTopK(spark, dirR, queries, k, 2), k)
    info(f"recall@$k appended=$appended%.3f rebuilt=$rebuilt%.3f " +
      f"(staleness ${rebuilt - appended}%.3f)")
    assert(appended > 0.0 && appended <= 1.0)
    assert(rebuilt > 0.0 && rebuilt <= 1.0)
    // the frozen-quantizer price on this fixture is bounded — a large
    // gap would mean the append path mis-encodes, not just drifts
    assert(appended >= rebuilt - 0.3,
      f"appended recall $appended%.3f implausibly far below " +
        f"rebuilt $rebuilt%.3f — frozen encode is broken, not stale")
  }

  test("append refuses ids already in the index (add, not upsert)") {
    val dir = Files.createTempDirectory("annidx_dup").toString
    AnnIndex.build(base, numSub, subDim, dir)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.append(base.select(col("id"), col("vec")).limit(3), dir)
    }
    assert(e.getMessage.contains("append is add"))
  }

  test("append refuses a batch whose vector width disagrees with the " +
      "manifest geometry") {
    val dir = Files.createTempDirectory("annidx_dim").toString
    AnnIndex.build(base, numSub, subDim, dir)
    val narrow = batch.select(col("id"),
      slice(col("vec"), 1, numSub * subDim - 8).as("vec"))
    val e = intercept[IllegalArgumentException] {
      AnnIndex.append(narrow, dir)
    }
    assert(e.getMessage.contains("dim"))
  }

  test("a crashed append (codes written, manifest not) fails the loader") {
    val dir = Files.createTempDirectory("annidx_crash").toString
    AnnIndex.build(base, numSub, subDim, dir)
    val idx = AnnIndex.load(spark, dir)
    // simulate the crash window: codes appended (the v3 writer's
    // cell-partitioned layout), manifest untouched
    Similarity.residualEncodeFrozen(batch, idx.centroids, idx.codebooks,
        numSub, subDim)
      .write.mode("append").partitionBy("cell").parquet(s"$dir/codes.parquet")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.load(spark, dir)
    }
    assert(e.getMessage.contains("codes"))
  }
}
