package tmpprobe

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def corpus = graft.Tables.embeddings(spark, sfDir).select(
      col("vec_id").as("id"), col("label").as("part"),
      Similarity.toDouble(col("embedding")).as("vec"))

    val full = graft.SparkEntry.queries("emb_topk_ivfpq")
    time("warmup full emb_topk_ivfpq")(noop(full(spark, sfDir)))

    // stage decomposition, all warm
    time("codebooks trained (16x4, 2 iters)")(
      noop(Similarity.pqCodebooksTrained(corpus, 16, 4, 2)))
    time("codebooks trained AGAIN")(
      noop(Similarity.pqCodebooksTrained(corpus, 16, 4, 2)))
    time("centroidVectors(centroids)")(
      noop(Similarity.centroidVectors(Similarity.centroids(corpus))))
    time("pqEncode full corpus (incl train)")(
      noop(Similarity.pqEncode(corpus, 16, 4)))
    time("timed full emb_topk_ivfpq")(noop(full(spark, sfDir)))
    time("timed full emb_topk_ivfpq x2")(noop(full(spark, sfDir)))

    val fullR = graft.SparkEntry.queries("emb_topk_ivfpq_residual")
    time("warmup emb_topk_ivfpq_residual")(noop(fullR(spark, sfDir)))
    time("timed emb_topk_ivfpq_residual")(noop(fullR(spark, sfDir)))

    spark.stop()
  }
}
