package graft.queries

import graft.SparkSpec

/** E266 planner invariants: at a fixed signature budget, more bands
  * (shorter AND-rows) can only raise the candidate probability, so
  * expected recall must be monotone in band count; the chosen row is
  * unique, meets the target, and is the cheapest that does.
  */
class LshPlanSpec extends SparkSpec {

  test("expected recall is monotone in bands and chosen is the " +
      "cheapest banding meeting the target") {
    val rows = DedupQueries.queries("docs_lsh_plan")(spark, sfDir)
      .collect().map { r =>
        (r.getAs[Int]("bands"), r.getAs[Double]("expected_recall"),
          r.getAs[Double]("p_at_threshold"),
          r.getAs[Boolean]("meets_target"), r.getAs[Boolean]("chosen"))
      }.sortBy(-_._1)
    assert(rows.length == 6)
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi._2 >= lo._2,
        s"expected recall must not rise as bands fall: $hi vs $lo")
      assert(hi._3 >= lo._3,
        s"S-curve at threshold must not rise as bands fall: $hi vs $lo")
    }
    val chosen = rows.filter(_._5)
    assert(chosen.length <= 1, s"chosen must be unique: $chosen")
    chosen.foreach { c =>
      assert(c._4, "chosen must meet the target")
      val cheaper = rows.filter(r => r._4 && r._1 < c._1)
      assert(cheaper.isEmpty,
        s"a cheaper banding also meets the target: $cheaper")
    }
    assert(rows.exists(_._4) == chosen.nonEmpty,
      "if any row meets the target, one must be chosen")
  }
}
