package graft.ext

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Graph-index tombstone delete + compact (E310): deleted ids neither
  * seed, relay, nor return; soft and compacted read paths are
  * row-identical; strict refusals; add-after-delete refuses until
  * compaction.
  */
class GraphDeleteSpec extends SparkSpec {

  private val Dim = 64
  private val GK = 4
  private val NQ = 10

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec")).localCheckpoint(false)

  private def tempDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graphdel_$tag").toString
    sys.addShutdownHook {
      val p = Paths.get(d)
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
    d
  }

  private def freshDeleted(tag: String): String = {
    val dir = tempDir(tag)
    GraphIndex.build(corpus, Dim, GK, dir)
    GraphIndex.delete(corpus.filter(col("id") % 7 === 3)
      .select(col("id")), dir)
    dir
  }

  test("deleted ids never return and a tombstoned low id leaves the " +
      "query set") {
    val res = GraphIndex.searchTopK(spark, freshDeleted("soft"), NQ, 3,
      3, 5).localCheckpoint(false)
    assert(res.filter(col("neighbor_id") % 7 === 3).isEmpty,
      "a tombstoned id surfaced")
    assert(res.select("query_id").distinct().count() === NQ - 1,
      "the tombstoned query id still served")
  }

  test("soft and compacted read paths are row-identical, and compact " +
      "clears the tombstones") {
    val dir = freshDeleted("cmp")
    val soft = GraphIndex.searchTopK(spark, dir, NQ, 3, 3, 5)
      .collect().map(_.toSeq).toSet
    GraphIndex.compact(dir)
    val idx = GraphIndex.load(spark, dir)
    assert(idx.tombstones.isEmpty, "compact left tombstones behind")
    assert(idx.vectors.filter(col("id") % 7 === 3).isEmpty,
      "compact left tombstoned vectors physical")
    val compacted = GraphIndex.searchTopK(spark, dir, NQ, 3, 3, 5)
      .collect().map(_.toSeq).toSet
    assert(compacted === soft, "compaction changed search output")
  }

  test("strict refusals: unknown id, double delete, add-after-delete") {
    val dir = freshDeleted("ref")
    import spark.implicits._
    val unknown = intercept[IllegalArgumentException] {
      GraphIndex.delete(Seq(999999L).toDF("id"), dir)
    }
    assert(unknown.getMessage.contains("strict"), unknown.getMessage)
    val double = intercept[IllegalArgumentException] {
      GraphIndex.delete(corpus.filter(col("id") % 7 === 3)
        .select(col("id")).limit(1), dir)
    }
    assert(double.getMessage.contains("double delete"), double.getMessage)
    val readd = intercept[IllegalArgumentException] {
      GraphIndex.append(corpus.filter(col("id") % 7 === 3).limit(2), dir)
    }
    assert(readd.getMessage.contains("not upsert"),
      s"add-after-delete must refuse until compaction: ${readd.getMessage}")
  }
}
