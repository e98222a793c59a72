package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class GlobalIndexSpec extends SparkSpec {

  test("global row numbers equal the windowed formulation") {
    val df = Tables.documents(spark, sfDir).select("doc_id")
    val got = GlobalIndex.globalRowNumbers(df, "doc_id", 8)
    val expect = df.withColumn("row_num",
      row_number().over(Window.orderBy("doc_id")).cast("long"))
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("numbering is contiguous from 1 and survives a skewed input layout") {
    val df = Tables.documents(spark, sfDir).select("doc_id").coalesce(1)
    val got = GlobalIndex.globalRowNumbers(df, "doc_id", 5)
    val n = got.count()
    val stats = got.agg(min("row_num"), max("row_num"),
      countDistinct("row_num")).head()
    assert(stats.getLong(0) == 1L && stats.getLong(1) == n &&
      stats.getLong(2) == n)
  }

  test("the windowed formulation really does collapse to one partition " +
    "(the cliff this operator exists to avoid)") {
    val df = Tables.documents(spark, sfDir).select("doc_id")
    val windowed = df.withColumn("rn",
      row_number().over(Window.orderBy("doc_id")))
    // executedPlan: the SinglePartition exchange is inserted by
    // EnsureRequirements, after sparkPlan.
    val plan = windowed.queryExecution.executedPlan.toString
    assert(plan.contains("SinglePartition"), s"expected the cliff:\n$plan")
    val ours = GlobalIndex.globalRowNumbers(df, "doc_id", 8)
    assert(ours.rdd.getNumPartitions > 1)
  }
}
