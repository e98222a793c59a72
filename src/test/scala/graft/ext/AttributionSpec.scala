package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Markov removal-effect attribution (E293): episode segmentation,
  * hand-checked absorption on a known chain, removal monotonicity,
  * and shares summing to 1.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  test("episode segmentation emits the right transitions on a " +
      "hand stream") {
    // user 1: v p c p  -> two converting episodes
    // user 2: v c      -> one abandoned episode
    val ev = Seq(
      (1L, 1L, "view", 1000L), (1L, 2L, "purchase", 2000L),
      (1L, 3L, "click", 3000L), (1L, 4L, "purchase", 4000L),
      (2L, 5L, "view", 1000L), (2L, 6L, "click", 2000L))
      .toDF("user_id", "event_id", "event_type", "tus")
    val got = Attribution.episodeTransitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      ("START", "view", 2L), ("START", "click", 1L),
      ("view", "purchase", 1L), ("click", "purchase", 1L),
      ("view", "click", 1L), ("click", "NULL", 1L)), got.toString)
  }

  test("absorption on a known chain: deterministic path converts, " +
      "removal kills it") {
    // START -> view -> purchase with certainty
    val trans = Seq(("START", "view", 10L), ("view", "purchase", 10L))
    assert(Attribution.absorption(trans, None, 5) === 1.0)
    assert(Attribution.absorption(trans, Some("view"), 5) === 0.0)
    // 50/50 branch: START -> view -> purchase | NULL
    val half = Seq(("START", "view", 2L),
      ("view", "purchase", 1L), ("view", "NULL", 1L))
    assert(Attribution.absorption(half, None, 5) === 0.5)
  }

  test("on the fixture: removal never raises conversion, shares sum " +
      "to 1, and every share is positive") {
    val df = AnalyticsQueriesAccess.markov(spark, sfDir)
      .localCheckpoint(false)
    val bad = df.filter(col("p_removed") > col("p_base"))
    assert(bad.isEmpty, "removal raised conversion")
    val shareSum = df.agg(sum("attribution")).collect()(0).getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-5, s"shares sum to $shareSum")
    assert(df.filter(col("attribution") <= 0).isEmpty,
      "a channel earned nonpositive credit on this fixture")
    assert(df.count() === 4)
  }
}

/** Test-side access to the registered query (the queries map is the
  * public surface).
  */
object AnalyticsQueriesAccess {
  def markov(s: org.apache.spark.sql.SparkSession, dir: String) =
    graft.queries.AnalyticsQueries.queries("events_attr_markov")(s, dir)
}
