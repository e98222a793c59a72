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
}
