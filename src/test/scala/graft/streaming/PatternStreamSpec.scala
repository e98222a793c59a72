package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming CEP processor (E290): row-identical to the batch
  * `events_pattern_match` gate row over fixture events, and planted
  * cases for the error kill, the window prune, the
  * all-anchors-share-one-click arming, and out-of-order drops.
  */
class PatternStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val WindowUs = 259200000000L

  private def withRocks[A](body: => A): A = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
  }

  private def run(feed: Seq[(Long, Long, String, Long)], name: String)
      : Set[(Long, Long, Long, Long, Long, Long)] = withRocks {
    val stream = MemoryStream[(Long, Long, String, Long)]
    val out = StreamingPipeline.patternMatches(spark, stream.toDS(), WindowUs)
    val q = out.writeStream.format("memory")
      .queryName(name).outputMode("update").start()
    try {
      val (a, b) = feed.splitAt(feed.length / 2)
      if (a.nonEmpty) { stream.addData(a.toIndexedSeq); q.processAllAvailable() }
      stream.addData(b.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  test("stream matches the batch CEP row exactly on fixture events") {
    val batch = graft.queries.AnalyticsQueries
      .queries("events_pattern_match")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // contract feed: global (tus, event_id) order preserves each
    // user's order through any chunk split
    val feed = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"))
      .as[(Long, Long, String, Long)].collect()
      .sortBy(e => (e._4, e._2)).toSeq
    val streamed = run(feed, "cepfix")
    assert(batch.nonEmpty, "no batch matches — vacuous fixture")
    assert(streamed === batch,
      s"stream/batch diverged: only-stream=${streamed -- batch}, " +
        s"only-batch=${batch -- streamed}")
  }

  test("one click arms every open anchor; an error kills all partials") {
    // user 1: v(1) v(2) c(3) p(4) -> two matches sharing click+purchase
    // user 2: v(1) c(2) e(3) p(4) -> error between click and purchase kills
    val feed = Seq[(Long, Long, String, Long)](
      (1L, 10L, "view", 1000L), (1L, 11L, "view", 2000L),
      (1L, 12L, "click", 3000L), (1L, 13L, "purchase", 4000L),
      (2L, 20L, "view", 1000L), (2L, 21L, "click", 2000L),
      (2L, 22L, "error", 3000L), (2L, 23L, "purchase", 4000L))
    val got = run(feed, "cepkill")
    assert(got === Set(
      (1L, 10L, 12L, 13L, 1000L, 4000L),
      (1L, 11L, 12L, 13L, 2000L, 4000L)), s"got $got")
  }

  test("anchors past the window are pruned and late rows are dropped") {
    val t0 = 1000L
    val feed = Seq[(Long, Long, String, Long)](
      (3L, 30L, "view", t0),
      (3L, 31L, "click", t0 + 10L),
      // purchase beyond the window: no emit, partial pruned
      (3L, 32L, "purchase", t0 + WindowUs + 1L),
      // out-of-order straggler (earlier than last processed): dropped,
      // so it must NOT seed a new anchor...
      (3L, 33L, "view", t0 + 5L))
    val got = run(feed, "cepprune")
    assert(got.isEmpty, s"got $got")
    // ...which the follow-up click+purchase would otherwise complete
    val feed2 = feed ++ Seq[(Long, Long, String, Long)](
      (3L, 34L, "click", t0 + WindowUs + 2L),
      (3L, 35L, "purchase", t0 + WindowUs + 3L))
    val got2 = run(feed2, "cepprune2")
    assert(got2.isEmpty, s"straggler view leaked into a match: $got2")
  }
}
