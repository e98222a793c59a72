package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PCA moment sketch algebra (E269): any sharding merges to the
  * monolithic fit, and the sketch survives a parquet round trip.
  */
class PcaMergeSpec extends SparkSpec {

  private val dim = 64
  private def vecs = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"),
    Similarity.toDouble(col("embedding")).as("vec"))

  test("shard-merged fit equals the monolithic fit under different " +
      "shardings") {
    val mono = Pca.fit(vecs, dim)
    for (mod <- Seq(2, 3, 7)) {
      val merged = Pca.fitFromShardMoments(
        Pca.shardMoments(vecs, col("id") % mod, dim), dim)
      assert(merged == mono, s"sharding by $mod diverged from monolithic")
    }
  }

  test("the moment sketch is a persistable artifact: write, read back, " +
      "merge, fit") {
    val dir = Files.createTempDirectory("pca_moments").toString
    Pca.shardMoments(vecs, col("id") % 3, dim)
      .write.mode("overwrite").parquet(dir)
    val fromDisk = Pca.fitFromShardMoments(spark.read.parquet(dir), dim)
    assert(fromDisk == Pca.fit(vecs, dim),
      "persisted-moment fit diverged from monolithic")
  }

  test("a geometry-mismatched moment row fails loudly") {
    val bad = Pca.shardMoments(vecs, col("id") % 2, dim)
      .withColumn("sums", slice(col("sums"), 1, dim - 1))
    val e = intercept[IllegalArgumentException] {
      Pca.fitFromShardMoments(bad, dim)
    }
    assert(e.getMessage.contains("geometry"))
  }
}
