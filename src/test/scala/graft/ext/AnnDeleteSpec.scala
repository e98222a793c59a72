package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Tombstone delete + compaction over the persisted index (E263):
  * deletes are O(batch) appends to a tombstone table the search
  * anti-joins; compaction physically reclaims the rows. The two read
  * paths — soft (tombstone filter) and hard (compacted) — must be
  * search-identical: two strategies, one truth.
  */
class AnnDeleteSpec extends SparkSpec {

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  private val (numSub, subDim) = (16, 4)
  private val (delMod, delRem) = (7, 3)

  private def delIds = corpus
    .filter(col("id") % delMod === delRem).select(col("id"))

  private def queries = corpus.filter(col("id") < 10)
    .select(col("id").as("qid"), col("vec").as("qv"))

  test("deleted ids never surface as neighbors, and the tombstone " +
      "search equals the compacted search row-for-row") {
    val dir = Files.createTempDirectory("anndel").toString
    AnnIndex.build(corpus, numSub, subDim, dir)
    AnnIndex.delete(delIds, dir)
    val soft = AnnIndex.searchTopK(spark, dir, queries, 5, 2)
      .localCheckpoint(false)
    assert(soft.filter(col("neighbor_id") % delMod === delRem).isEmpty,
      "a tombstoned id surfaced as a neighbor")
    assert(soft.count() > 0, "soft-delete search returned nothing")
    AnnIndex.compact(dir)
    val idx = AnnIndex.load(spark, dir)
    assert(idx.tombstones.isEmpty, "compact must clear the tombstones")
    assert(idx.codes.filter(col("id") % delMod === delRem).isEmpty,
      "compact must physically drop tombstoned code rows")
    val hard = AnnIndex.searchTopK(spark, dir, queries, 5, 2)
    assert(hard.exceptAll(soft).isEmpty && soft.exceptAll(hard).isEmpty,
      "compacted search must be row-identical to the tombstone search")
  }

  test("delete is strict: unknown ids and double deletes both refuse") {
    val dir = Files.createTempDirectory("anndel_s").toString
    AnnIndex.build(corpus, numSub, subDim, dir)
    import spark.implicits._
    val maxId = corpus.agg(max(col("id")).cast("long")).head().getLong(0)
    val unknown = Seq(maxId + 1000).toDF("id")
      .select(col("id").cast(corpus.schema("id").dataType))
    val e1 = intercept[IllegalArgumentException] {
      AnnIndex.delete(unknown, dir)
    }
    assert(e1.getMessage.contains("not in the index"))
    AnnIndex.delete(delIds.limit(2), dir)
    val e2 = intercept[IllegalArgumentException] {
      AnnIndex.delete(delIds.limit(2), dir)
    }
    assert(e2.getMessage.contains("double delete"))
  }

  test("add-after-delete is a compact-then-append: a tombstoned id " +
      "still owns code rows, so append refuses until compaction") {
    val dir = Files.createTempDirectory("anndel_a").toString
    AnnIndex.build(corpus, numSub, subDim, dir)
    val victim = delIds.limit(1).localCheckpoint(false)
    val victimVecs = corpus.join(victim, "id")
      .select(col("id"), col("vec")).localCheckpoint(false)
    AnnIndex.delete(victim, dir)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.append(victimVecs, dir)
    }
    assert(e.getMessage.contains("append is add"))
    AnnIndex.compact(dir)
    AnnIndex.append(victimVecs, dir) // re-add now legal
    val idx = AnnIndex.load(spark, dir)
    assert(idx.codes.join(victim, "id").count() == 1,
      "the re-added id must be back in the code table")
  }

  test("a crashed delete (tombstones written, manifest not) fails " +
      "the loader") {
    val dir = Files.createTempDirectory("anndel_c").toString
    AnnIndex.build(corpus, numSub, subDim, dir)
    delIds.limit(3)
      .write.mode("append").parquet(s"$dir/tombstones.parquet")
    val e = intercept[IllegalArgumentException] {
      AnnIndex.load(spark, dir)
    }
    assert(e.getMessage.contains("tombstones"))
  }
}
