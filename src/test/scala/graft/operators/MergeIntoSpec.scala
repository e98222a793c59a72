package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** MERGE INTO semantics (E278) on a planted frame: update, delete,
  * insert, keep, idempotent delete-of-absent, and the ambiguous-source
  * refusal.
  */
class MergeIntoSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

  test("update / delete / insert / keep / delete-of-absent no-op") {
    val source = Seq(
      (2L, "B", false),  // matched → update
      (3L, "x", true),   // matched + flag → delete
      (4L, "d", false),  // unmatched → insert
      (9L, "z", true))   // unmatched delete → idempotent no-op
      .toDF("k", "v", "del")
    val out = MergeInto(target, source, "k", "del")
      .as[(Long, String)].collect().sorted.toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (4L, "d")),
      s"merge semantics wrong: $out")
  }

  test("a source key matching multiple source rows refuses loudly") {
    val dup = Seq((2L, "B", false), (2L, "C", false)).toDF("k", "v", "del")
    val e = intercept[IllegalArgumentException] {
      MergeInto(target, dup, "k", "del")
    }
    assert(e.getMessage.contains("unique source key"))
  }

  test("an all-delete source empties exactly the matched keys") {
    val source = Seq((1L, "", true), (2L, "", true), (3L, "", true))
      .toDF("k", "v", "del")
    val out = MergeInto(target, source, "k", "del")
    assert(out.isEmpty)
  }
}
