package graft.operators

import java.sql.Timestamp
import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("attaches the latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, "u1", ts(10)), (2L, "u1", ts(30)), (3L, "u2", ts(5)), (4L, "u2", ts(20)))
      .toDF("event_id", "user_id", "tstamp")
    val right = Seq(
      ("u1", ts(5), 100L), ("u1", ts(10), 200L), ("u1", ts(25), 300L),
      ("u2", ts(20), 900L))
      .toDF("user_id", "tstamp", "v")
    val out = AsofJoin.asofJoin(left, right, "user_id", "tstamp", Seq("v"))
      .select("event_id", "asof_v").as[(Long, Option[Long])].collect().toMap
    assert(out(1L).contains(200L)) // tie at 10:10 matches (>= semantics)
    assert(out(2L).contains(300L)) // latest before 10:30
    assert(out(3L).isEmpty)        // nothing at-or-before 10:05 -> left outer null
    assert(out(4L).contains(900L)) // exact-time match in the other key
  }

  test("keys never leak across partitions") {
    val left = Seq((1L, "a", ts(30))).toDF("event_id", "user_id", "tstamp")
    val right = Seq(("b", ts(10), 7L)).toDF("user_id", "tstamp", "v")
    val out = AsofJoin.asofJoin(left, right, "user_id", "tstamp", Seq("v"))
      .select("asof_v").as[Option[Long]].collect()
    assert(out.toSeq == Seq(None))
  }
}
