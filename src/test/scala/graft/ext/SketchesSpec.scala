package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate lands within 3x the theoretical error of exact counts") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val est = li.groupBy("l_returnflag")
      .agg(Sketches.hllDistinct(xxhash64(col("l_orderkey"))).as("est"))
      .as[(String, Long)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .as[(String, Long)].collect().toMap
    val tol = 3 * 1.04 / math.sqrt(1 << Sketches.DefaultP) // ~7%
    exact.foreach { case (k, n) =>
      val rel = math.abs(est(k).toDouble - n) / n
      assert(rel <= tol, s"group $k: est=${est(k)} exact=$n rel=$rel")
    }
  }

  test("HLL merges are order-insensitive and idempotent") {
    val agg = new Sketches.HllAggregator(8)
    val h1 = (1L to 500L).map(x => x * 0x9E3779B97F4A7C15L)
    val b1 = h1.take(250).foldLeft(agg.zero)(agg.reduce)
    val b2 = h1.drop(250).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(b1, b2))
    val sequential = agg.finish(h1.foldLeft(agg.zero)(agg.reduce))
    assert(merged == sequential)
    // merging a sketch with itself changes nothing
    val b3 = h1.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(b3, b3)) == sequential)
  }

  test("small cardinalities use linear counting and are near-exact") {
    val agg = new Sketches.HllAggregator(11)
    val est = agg.finish(
      (1L to 40L).map(x => x * 0x9E3779B97F4A7C15L).foldLeft(agg.zero)(agg.reduce))
    assert(math.abs(est - 40L) <= 2)
  }
}
