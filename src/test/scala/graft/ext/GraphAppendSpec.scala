package graft.ext

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Graph-index append (E299): refusal guards, manifest coherence
  * after append, appended nodes reachable through the seed tier, and
  * MEASURED append-vs-rebuild recall (staleness priced, not assumed).
  */
class GraphAppendSpec extends SparkSpec {

  private val Dim = 64
  private val GK = 4
  private val NQ = 10
  private val Seeds = 3
  private val Hops = 3
  private val K = 5

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec")).localCheckpoint(false)

  private def tempDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graphapp_$tag").toString
    sys.addShutdownHook {
      val p = Paths.get(d)
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
    d
  }

  private lazy val appendedDir: String = {
    val dir = tempDir("main")
    GraphIndex.build(corpus.filter(col("id") % 7 =!= 3), Dim, GK, dir)
    GraphIndex.append(corpus.filter(col("id") % 7 === 3), dir)
    dir
  }

  test("append refuses duplicate ids and wrong-width batches") {
    val dir = tempDir("guards")
    GraphIndex.build(corpus.filter(col("id") % 7 =!= 3), Dim, GK, dir)
    val dup = intercept[IllegalArgumentException] {
      GraphIndex.append(corpus.filter(col("id") % 7 =!= 3).limit(3), dir)
    }
    assert(dup.getMessage.contains("not upsert"), dup.getMessage)
    val skinny = corpus.filter(col("id") % 7 === 3)
      .select(col("id"), col("part"), slice(col("vec"), 1, 8).as("vec"))
    val dim = intercept[IllegalArgumentException] {
      GraphIndex.append(skinny, dir)
    }
    assert(dim.getMessage.contains("dim"), dim.getMessage)
  }

  test("manifest coheres after append: full population loads, every " +
      "node has a signature, new nodes carry out-edges") {
    val idx = GraphIndex.load(spark, appendedDir)
    val n = corpus.count()
    assert(idx.vectors.count() === n)
    assert(idx.sigs.count() === n)
    val newNodes = corpus.filter(col("id") % 7 === 3)
      .select(col("id").as("src"))
    val missing = newNodes.join(idx.edges.select("src").distinct(),
      Seq("src"), "left_anti")
    assert(missing.isEmpty, "an appended node has no out-edges")
  }

  test("appended nodes are reachable: at least one appears in the " +
      "post-append search results") {
    val hits = GraphIndex.searchTopK(spark, appendedDir, NQ, Seeds,
        Hops, K)
      .filter(col("neighbor_id") % 7 === 3)
    assert(hits.count() > 0,
      "no appended node surfaced in any search — reachability vacuous")
  }

  test("staleness is measured: appended recall vs full rebuild, both " +
      "against the exact top-k") {
    val c = corpus
    val q = c.filter(col("id") < NQ)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = Similarity.topK(c, q, K)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(false)
    def recall(res: org.apache.spark.sql.DataFrame): Double =
      res.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
        .toDouble / (NQ * K)
    val rebuiltDir = tempDir("rebuild")
    GraphIndex.build(c, Dim, GK, rebuiltDir)
    val rAppend = recall(GraphIndex.searchTopK(spark, appendedDir, NQ,
      Seeds, Hops, K))
    val rRebuild = recall(GraphIndex.searchTopK(spark, rebuiltDir, NQ,
      Seeds, Hops, K))
    info(f"recall@$K appended $rAppend%.3f vs rebuilt $rRebuild%.3f " +
      f"(staleness price ${rRebuild - rAppend}%.3f)")
    assert(rAppend > 0.0, "appended index found nothing true")
  }
}
