package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CEP sequence-match semantics (E288): skip-till-next-match
  * earliest-stage selection, strict (ts, event_id) chain ordering,
  * the 3-day completion window, the no-error negation, and one match
  * per view anchor.
  */
class PatternMatchSpec extends SparkSpec {

  private val WindowUs = 259200000000L

  private lazy val m = AnalyticsQueries
    .queries("events_pattern_match")(spark, sfDir)
    .localCheckpoint(false)

  private lazy val ev = graft.Tables.events(spark, sfDir)
    .select(col("event_id"), col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("tus"))
    .localCheckpoint(false)

  test("fixture produces matches and one match per view anchor") {
    assert(m.count() > 0, "no matches — vacuous fixture")
    val dup = m.groupBy("view_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(dup.isEmpty, "a view anchored more than one match")
  }

  test("chain is strictly ordered and completes within the window") {
    val t = m
      .join(ev.select(col("event_id").as("click_id"),
        col("tus").as("ctus")), "click_id")
    val bad = t.filter(
      !(col("start_us") < col("ctus") ||
        (col("start_us") === col("ctus") && col("view_id") < col("click_id"))) ||
      !(col("ctus") < col("end_us") ||
        (col("ctus") === col("end_us") && col("click_id") < col("purchase_id"))) ||
      col("end_us") - col("start_us") > WindowUs)
    assert(bad.isEmpty, "a match violated ordering or the time window")
  }

  test("the matched click is the EARLIEST click after the view " +
      "(skip-till-next-match)") {
    val t = m.join(ev.select(col("event_id").as("click_id"),
      col("tus").as("ctus")), "click_id")
    val earlier = t.join(
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("oid"),
          col("tus").as("otus")),
      Seq("user_id"))
      .filter(
        // strictly after the view in (tus, id) order...
        (col("otus") > col("start_us") ||
          (col("otus") === col("start_us") && col("oid") > col("view_id"))) &&
        // ...and strictly before the matched click
        (col("otus") < col("ctus") ||
          (col("otus") === col("ctus") && col("oid") < col("click_id"))))
    assert(earlier.isEmpty, "a closer click was skipped")
  }

  test("no error event occurs between view and purchase") {
    val err = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("eid"),
        col("tus").as("etus"))
    val vetoed = m.join(err, Seq("user_id"))
      .filter(
        (col("etus") > col("start_us") ||
          (col("etus") === col("start_us") && col("eid") > col("view_id"))) &&
        (col("etus") < col("end_us") ||
          (col("etus") === col("end_us") && col("eid") < col("purchase_id"))))
    assert(vetoed.isEmpty, "a match survived an in-between error")
  }

  test("every dropped raw chain failed the window or the negation") {
    // Re-derive raw chains (no window/negation) and check the two
    // filters explain exactly the complement of the emitted set.
    import org.apache.spark.sql.expressions.Window
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("tus"), col("event_id"))
    val fwd = Window.partitionBy("user_id").orderBy(col("rn"))
      .rowsBetween(1, Window.unboundedFollowing)
    def nextOf(t: String) =
      min(when(col("event_type") === t, col("rn"))).over(fwd)
    val n = ev.withColumn("rn", row_number().over(byTime))
      .withColumn("nc", nextOf("click"))
      .withColumn("np", nextOf("purchase"))
      .withColumn("ne", nextOf("error"))
      .localCheckpoint(false)
    val raw = n.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("tus").as("start_us"), col("nc"), col("ne"))
      .join(n.select(col("user_id").as("cu"), col("rn").as("crn"),
        col("np")), col("user_id") === col("cu") && col("nc") === col("crn"))
      .join(n.select(col("user_id").as("pu"), col("rn").as("prn"),
        col("tus").as("end_us")),
        col("user_id") === col("pu") && col("np") === col("prn"))
    val rawOk = raw.filter(
      col("end_us") - col("start_us") <= WindowUs &&
        (col("ne").isNull || col("ne") > col("prn")))
    assert(rawOk.count() === m.count(),
      "filtered raw chains disagree with the emitted match count")
    val missing = rawOk.select(col("view_id"))
      .join(m.select(col("view_id")), Seq("view_id"), "left_anti")
    assert(missing.isEmpty, "a qualifying raw chain was not emitted")
  }
}
