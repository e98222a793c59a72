package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM (suites must
  * not stop it — ScalaTest interleaves suites in one JVM and the last
  * one to run would break the rest).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Escalate task-memory leaks from a log warning to a thrown
      // error: custom operators that acquire execution memory
      // (TopKPerKey's accounted partial) must provably release it, and
      // without this flag a leaked reservation ships green.
      .config("spark.unsafe.exceptionOnMemoryLeak", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  /** sf0.001 fixture dir (500 docs / 1000 events). */
  val sfDir = "/root/testdata/sf0.001"
}
