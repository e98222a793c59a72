package graft.queries

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The partitioned-write → pruned-scan round trip must actually prune:
  * a lang=en predicate over a lang-partitioned layout has to reach the
  * scan as a PartitionFilter (directory pruning), not a post-scan
  * Filter — the difference between reading 1/5 of the corpus and all
  * of it.
  */
class PartitionedScanSpec extends SparkSpec {

  test("lang predicate becomes a partition filter on the pruned scan") {
    val out = java.nio.file.Files.createTempDirectory("graft_prune_test").toString
    Tables.documents(spark, sfDir)
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val back = spark.read.parquet(out).filter(col("lang") === "en")

    val scans = back.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scan in plan")
    val pf = scans.head.partitionFilters.mkString(";")
    assert(pf.contains("lang"), s"lang not in partition filters: $pf")

    // pruning is real: selected partitions carry only the en directory
    val dirs = scans.head.relation.location.listFiles(
      scans.head.partitionFilters, Nil).flatMap(_.files.map(_.getPath.toString))
    assert(dirs.nonEmpty && dirs.forall(_.contains("lang=en")),
      s"scan lists non-en files: ${dirs.take(3)}")

    // and the data round-trips
    val expected = Tables.documents(spark, sfDir)
      .filter(col("lang") === "en").count()
    assert(back.count() == expected)
  }

  test("E222: a dim-side family filter prunes the partitioned fact " +
      "scan at RUNTIME (DynamicPruningExpression in partitionFilters)") {
    val df = AnalyticsQueries.queries("docs_dpp_join")(spark, sfDir)
    // the DPP subquery is planted by the optimizer, so it is visible
    // on sparkPlan's scan; the query has exchanges, so executedPlan is
    // an opaque AdaptiveSparkPlanExec a collect() cannot traverse
    // (PlanAuditSpec convention)
    val scans = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec if s.relation.partitionSchema.nonEmpty => s
    }
    assert(scans.nonEmpty, "no partitioned file scan in plan")
    // at sparkPlan stage the pruning filter is the unplanned
    // DynamicPruningSubquery; AQE later plans it into a
    // DynamicPruningExpression — match the shared DynamicPruning trait
    val hasDpp = scans.exists(_.partitionFilters.exists(f =>
      f.find(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.DynamicPruning])
        .isDefined))
    assert(hasDpp,
      "no DynamicPruning filter reached the fact scan's partition " +
        s"filters: ${scans.map(_.partitionFilters.mkString(";"))}")
    // semantics: exactly the romance langs present in the fixture
    val rows = df.collect()
    assert(rows.map(_.getAs[String]("lang")).toSet == Set("fr", "es"))
    assert(rows.forall(_.getAs[String]("family") == "romance"))
    val expected = Tables.documents(spark, sfDir)
      .filter(col("lang").isin("fr", "es")).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == expected)
  }
}
