package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mergeable-histogram quantiles (E309): sharding invariance of the
  * merged cells (bin-wise addition is exact), and estimate/exact
  * bracketing within one bin width.
  */
class QuantileMergeSpec extends SparkSpec {

  private val W = 2500000L
  private val NB = 20

  private def hist(mod: Int) = {
    val cents = floor(col("o_totalprice") * 100).cast("long")
    val bin = least(floor(cents / W), lit((NB - 1).toLong)).cast("long")
    graft.Tables.orders(spark, sfDir)
      .select((col("o_orderkey") % mod).as("shard"), bin.as("bin"))
      .groupBy("shard", "bin").agg(count(lit(1)).as("n"))
      .groupBy("bin").agg(sum(col("n")).as("n"))
  }

  test("shard histograms merge to the monolithic histogram under " +
      "mod-2/3/7 shardings") {
    val mono = hist(1)
    for (mod <- Seq(2, 3, 7)) {
      val m = hist(mod)
      assert(m.exceptAll(mono).isEmpty && mono.exceptAll(m).isEmpty,
        s"mod $mod merge diverged from the monolithic histogram")
    }
  }

  test("estimates bracket the exact quantiles within one bin width") {
    val r = AdvancedQueries.queries("rel_quantile_merge")(spark, sfDir)
      .localCheckpoint(false)
    assert(r.count() === 4)
    assert(r.filter(!col("within_bin")).isEmpty,
      "an exact quantile escaped its estimated bin")
    val unclamped = r.filter(col("bin") < NB - 1)
    val bad = unclamped.filter(col("exact_cents") > col("est_cents") ||
      col("est_cents") - col("exact_cents") >= W)
    assert(bad.isEmpty, "an estimate strayed beyond one bin width")
  }
}
