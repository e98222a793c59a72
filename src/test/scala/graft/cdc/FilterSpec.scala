package graft.cdc

import graft.SparkSpec

/** R3 blocklist semantics (reference `kafka.rs:65-68`): only `op == "d"`
  * is dropped; unknown op strings must pass (Debezium also emits "r",
  * and future codes must flow).
  */
class FilterSpec extends SparkSpec {
  import spark.implicits._

  private def parsedDf(ops: Seq[String]) =
    ops.zipWithIndex
      .map { case (op, i) => (s"k$i", op) }
      .toDF("key", "op")

  test("drops d, keeps c/u/r and unknown ops") {
    val out = Filter.dropDeletes(parsedDf(Seq("c", "u", "d", "r", "x", "")))
      .select("op").as[String].collect().toSeq
    assert(out == Seq("c", "u", "r", "x", ""))
  }

  test("null op (malformed permissive row) does not survive the filter") {
    val df = Seq(("k1", Some("c")), ("k2", None))
      .toDF("key", "op")
    assert(Filter.dropDeletes(df).count() == 1)
  }
}
