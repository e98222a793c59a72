package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Margin-based bitext mining (E265): the margin must demote hub
  * targets that raw cosine mis-mines, the mutual flag must encode
  * best-of-both-directions, and the candidate table must be pluggable.
  */
class BitextSpec extends SparkSpec {
  import spark.implicits._

  // Planted geometry in 4-d:
  //  - y10 is an EXCLUSIVE match for x0 (nearly parallel, far from
  //    the other sources)
  //  - y11 is a HUB: moderately close to EVERY source (the average
  //    direction), so raw cosine likes it from everywhere, but its
  //    neighborhood mean is high, which the margin divides away
  //  - y12..y15 are background noise directions
  private val aSide = Seq(
    (0L, Seq(1.0, 0.02, 0.0, 0.0)),
    (2L, Seq(0.0, 1.0, 0.15, 0.0)),
    (4L, Seq(0.0, 0.15, 1.0, 0.0)),
    (6L, Seq(0.4, 0.5, 0.6, 0.1))).toDF("id", "vec") // mines the hub
  private val hub = Seq(0.45, 0.55, 0.55, 0.1)
  private val bSide = (Seq(
    (10L, Seq(1.0, 0.03, 0.0, 0.0)), // exclusive partner of x0
    (11L, hub)) ++
    Seq((12L, Seq(0.0, 0.9, 0.4, 0.0)), (13L, Seq(0.0, 0.4, 0.9, 0.0)),
      (14L, Seq(0.0, 0.0, 0.0, 1.0)), (15L, Seq(0.5, 0.5, 0.0, 0.0))))
    .toDF("id", "vec")

  test("margin demotes the hub: the exclusive pair out-margins every " +
      "hub pairing even where raw cosine is comparable") {
    val mined = Bitext.marginMine(aSide, bSide, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    val byX = mined.map(t => t._1 -> t).toMap
    assert(byX(0L)._2 == 10L, s"x0 must mine its exclusive partner: $mined")
    val exclusiveMargin = byX(0L)._4
    val hubMargins = mined.filter(_._2 == 11L).map(_._4)
    assert(hubMargins.forall(_ < exclusiveMargin),
      s"hub pairings must margin below the exclusive pair: " +
        s"exclusive=$exclusiveMargin hubs=$hubMargins")
    // raw cosine does NOT separate them this cleanly: at least one hub
    // pairing's cosine is within 0.15 of the exclusive pair's
    val exclusiveCos = byX(0L)._3
    val hubCos = mined.filter(_._2 == 11L).map(_._3)
    assert(hubCos.nonEmpty && hubCos.exists(c => exclusiveCos - c < 0.15),
      s"fixture degenerated: hub cosines $hubCos vs exclusive " +
        s"$exclusiveCos no longer comparable — margin test is vacuous")
  }

  test("mutual means best in BOTH directions") {
    val mined = Bitext.marginMine(aSide, bSide, 3)
    val m = mined.select("x_id", "y_id", "mutual")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // x0 <-> y10 is exclusive both ways
    assert(m.contains((0L, 10L, true)))
    // verify the flag against a direct recomputation: for each mined
    // pair, y's best source by cosine
    val back = bSide.select(col("id").as("yid"), col("vec").as("yv"))
      .join(aSide.select(col("id").as("xid"), col("vec").as("xv")))
      .select(col("yid"), col("xid"),
        Similarity.cosine(col("xv"), col("yv")).as("cs"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("yid")).orderBy(col("cs").desc, col("xid"))))
      .filter(col("rn") === 1)
      .select(col("yid"), col("xid").as("bestx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    m.foreach { case (x, y, mut) =>
      assert(mut == (back(y) == x),
        s"mutual flag wrong for ($x, $y): flag=$mut best-back=${back(y)}")
    }
  }

  test("the candidate table is pluggable: restricting candidates " +
      "changes mining, not the arithmetic") {
    // exact candidates minus the hub: x-es that mined the hub re-mine
    // their next-best target, everything else unchanged
    val scored = bSide.filter(col("id") =!= 11L)
      .select(col("id").as("yid"), col("vec").as("yv"))
      .join(aSide.select(col("id").as("xid"), col("vec").as("xv")))
      .select(col("xid"), col("yid"),
        Similarity.cosine(col("xv"), col("yv")).as("cs"))
    val mined = Bitext.marginMineScored(scored, 3)
    assert(mined.filter(col("y_id") === 11L).isEmpty,
      "a filtered-out candidate surfaced in the mining output")
    assert(mined.count() == aSide.count(),
      "every source must still mine a pair from the remaining candidates")
  }
}
