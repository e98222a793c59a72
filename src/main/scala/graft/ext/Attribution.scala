package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov-chain attribution by removal effect (E293) — the
  * data-driven alternative to rule-based multi-touch splits (E230's
  * linear attribution): model each user's event stream as a
  * first-order Markov chain over event types with absorbing CONV
  * (purchase) and NULL (episode end) states, and credit channel c by
  * how much the START→CONV absorption probability DROPS when every
  * path through c is cut (Anderl et al. 2016's removal effect).
  *
  * Episodes: a user's stream splits at each purchase (the purchase
  * closes its episode; the next event opens a new one), so one user
  * contributes every journey they completed or abandoned. Transitions
  * are START→first, consecutive pairs within an episode, and
  * last→NULL for abandoned episodes; purchase is absorbing (no
  * outgoing rows).
  *
  * Scale shape: the corpus-sized work is ONE windowed pass per user
  * (episode numbering via a growing cumulative frame + lead) and a
  * transition groupBy — the collected matrix is |types|² rows
  * (states, not data; the documented O(1)-driver-state discipline),
  * and the absorption iterations are driver arithmetic over it.
  *
  * Determinism: absorption runs a FIXED `iters` fixed-point rounds
  * (the published value is "conversion probability within `iters`
  * steps" — the contract both engines replay exactly, converged or
  * not), per-source sums fold in target order, and the attribution
  * denominator folds channels alphabetically — the oracle replays
  * each round as a MATERIALIZED CTE with the identical fold order.
  */
object Attribution {

  /** Episode transition counts (f, t, n) over `events
    * (user_id, event_id, event_type, tus)`.
    */
  def episodeTransitions(events: DataFrame): DataFrame = {
    val byTime = Window.partitionBy("user_id")
      .orderBy(col("tus"), col("event_id"))
    // growing frame: purchases among STRICTLY earlier events
    val pre = byTime.rowsBetween(Window.unboundedPreceding, -1)
    val seq = events
      .select(col("user_id"), col("event_id"), col("event_type"), col("tus"))
      .withColumn("rn", row_number().over(byTime))
      .withColumn("ep", coalesce(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(pre), lit(0L)))
    val epw = Window.partitionBy("user_id", "ep").orderBy("rn")
    val step = seq
      .withColumn("nt", lead(col("event_type"), 1).over(epw))
      .withColumn("ern", row_number().over(epw))
      .localCheckpoint(false) // three transition sources, one pass
    val within = step.filter(col("nt").isNotNull)
      .select(col("event_type").as("f"), col("nt").as("t"))
    val starts = step.filter(col("ern") === 1)
      .select(lit("START").as("f"), col("event_type").as("t"))
    val ends = step.filter(col("nt").isNull && col("event_type") =!= "purchase")
      .select(col("event_type").as("f"), lit("NULL").as("t"))
    within.unionByName(starts).unionByName(ends)
      .groupBy("f", "t").agg(count(lit(1)).as("n"))
  }

  /** K-step START→purchase absorption probability over the collected
    * transition counts, with every path through `removed` cut (its
    * value pinned 0). Driver arithmetic; per-source folds run in
    * target order so the oracle's `list_reduce(list(... ORDER BY t))`
    * replays them term for term.
    */
  def absorption(trans: Seq[(String, String, Long)],
      removed: Option[String], iters: Int): Double = {
    val probs: Seq[(String, Seq[(String, Double)])] =
      trans.groupBy(_._1).toSeq.map { case (s, ts) =>
        val tot = ts.map(_._3).sum.toDouble
        s -> ts.sortBy(_._2).map { case (_, t, n) => (t, n / tot) }
      }
    var p = Map.empty[String, Double]
    def pOf(t: String): Double = t match {
      case "purchase" => 1.0
      case "NULL" => 0.0
      case s if removed.contains(s) => 0.0
      case s => p.getOrElse(s, 0.0)
    }
    for (_ <- 1 to iters)
      p = probs.map { case (s, ts) =>
        s -> ts.foldLeft(0.0) { case (a, (t, pr)) => a + pr * pOf(t) }
      }.toMap
    p.getOrElse("START", 0.0)
  }

  /** One row per channel: base and removed conversion probability,
    * removal effect, normalized attribution share.
    */
  def markovAttribution(events: DataFrame, channels: Seq[String],
      iters: Int): DataFrame = {
    val spark = events.sparkSession
    val trans = episodeTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val base = absorption(trans, None, iters)
    require(base > 0.0,
      "no START->purchase mass: attribution undefined on this stream")
    val chans = channels.sorted
    val rows = chans.map { ch =>
      val pr = absorption(trans, Some(ch), iters)
      (ch, base, pr, (base - pr) / base)
    }
    val totRe = rows.foldLeft(0.0)(_ + _._4)
    // Fail-loud, not NaN: if every removal effect is 0 (all
    // conversions run START->purchase directly, touching no channel),
    // attribution shares would be 0/0 — the oracle would hit the same
    // indeterminate form, so this is a loud-failure guard on both
    // engines' shared premise, not an engine split.
    require(totRe > 0.0,
      "every channel's removal effect is 0 (no conversion path " +
        "touches a channel): attribution shares are undefined")
    import spark.implicits._
    rows.map { case (ch, b, pr, re) => (ch, b, pr, re, re / totRe) }
      .toDF("channel", "pb", "pr", "re", "attr")
      .select(col("channel"), round(col("pb"), 6).as("p_base"),
        round(col("pr"), 6).as("p_removed"),
        round(col("re"), 6).as("removal_effect"),
        round(col("attr"), 6).as("attribution"))
  }
}
