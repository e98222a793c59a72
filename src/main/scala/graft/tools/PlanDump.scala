package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for named registered queries to files —
  * the plan evidence the optimization rounds commit under `plans/`
  * (judge contract: plan-shape claims in OPTIMIZATION_r*.md are checked
  * against these artifacts, since the judge cannot run Spark).
  *
  * Usage: PlanDump <query> [query...]
  *   SPARK_GRAFT_SF_DIR      fixture dir (default /root/testdata/sf0.1)
  *   SPARK_GRAFT_PLAN_DIR    output dir   (default plans/r16)
  *   SPARK_GRAFT_PLAN_SUFFIX file suffix  (default "after")
  *
  * Queries whose CONSTRUCTION runs driver-side rounds (iterative fits,
  * k-means, BPE merges) execute those rounds while building the frame —
  * that is inherent to dumping their final plan.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r16")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "after")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    args.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
      println(s"[plandump] $n -> $outDir/${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
