package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Forecast

/** Streaming Holt forecaster (E308): row-identical to the batch
  * fold's one-step predictions over the fixture's zero-filled daily
  * series, and the processor's own zero gap-fill matches the batch
  * fold over a sparse feed.
  */
class HoltStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val (a, oa, bb, ob) = (0.5, 0.5, 0.3, 0.7)
  private val DayMs = 86400000L

  private def withRocks[A](body: => A): A = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
  }

  private def run(feed: Seq[(String, Long, Double)], name: String)
      : Set[(String, Long, Double)] = withRocks {
    val stream = MemoryStream[(String, Long, Double)]
    val out = StreamingPipeline.holtForecasts(spark, stream.toDS(),
      a, oa, bb, ob)
    val q = out.writeStream.format("memory")
      .queryName(name).outputMode("update").start()
    try {
      val (x, y) = feed.splitAt(feed.length / 2)
      if (x.nonEmpty) { stream.addData(x.toIndexedSeq); q.processAllAvailable() }
      stream.addData(y.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).as[(String, Long, Double)].collect().toSet
  }

  /** Batch truth: the fold's one-step predictions l + b read
    * pre-update (reconstructing them as y − residual loses an ulp —
    * y − (y − p) ≠ p in IEEE arithmetic; the residual path is also
    * cross-checked below to that tolerance).
    */
  private def batchPreds(key: String, days: IndexedSeq[Long],
      y: IndexedSeq[Double]): Set[(String, Long, Double)] = {
    var l = y(0); var b = y(1) - y(0)
    val out = Set.newBuilder[(String, Long, Double)]
    val (_, _, res) = Forecast.holtFitResiduals(y, a, oa, bb, ob)
    for (t <- 1 until y.length) {
      out += ((key, days(t), l + b))
      assert(math.abs((y(t) - (l + b)) - res(t - 1)) < 1e-12,
        "residual path diverged from the prediction fold")
      val lPrev = l
      l = a * y(t) + oa * (l + b)
      b = bb * (l - lPrev) + ob * b
    }
    out.result()
  }

  test("stream forecasts equal the batch fold's one-step predictions " +
      "on the fixture's zero-filled daily series") {
    val cnt = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts").cast("timestamp")).as("d"))
      .agg(count(lit(1)).cast("double").as("n"))
      .collect()
    val bounds = graft.Tables.events(spark, sfDir)
      .agg(min(date_trunc("day", col("ts").cast("timestamp"))),
        max(date_trunc("day", col("ts").cast("timestamp")))).head()
    val days = (bounds.getTimestamp(0).getTime to
      bounds.getTimestamp(1).getTime by DayMs).toIndexedSeq
    val byKey = cnt.map(r => (r.getString(0),
      r.getTimestamp(1).getTime) -> r.getDouble(2)).toMap
    val types = cnt.map(_.getString(0)).distinct.sorted
    val feed = types.flatMap(t => days.map(d =>
      (t, d, byKey.getOrElse((t, d), 0.0)))).sortBy(e => (e._2, e._1))
    val streamed = run(feed, "holtfix")
    val want = types.flatMap { t =>
      batchPreds(t, days, days.map(d => byKey.getOrElse((t, d), 0.0)))
    }.toSet
    assert(streamed === want,
      s"only-stream=${(streamed -- want).take(3)}, " +
        s"only-batch=${(want -- streamed).take(3)}")
  }

  test("the processor's zero gap-fill matches the batch fold over a " +
      "sparse feed") {
    val days = (0L to 5L).map(_ * DayMs)
    val y = IndexedSeq(2.0, 3.0, 0.0, 0.0, 0.0, 4.0)
    val sparse = Seq(("k", days(0), 2.0), ("k", days(1), 3.0),
      ("k", days(5), 4.0))
    val streamed = run(sparse, "holtgap")
    assert(streamed === batchPreds("k", days, y),
      s"gap-fill diverged: $streamed")
  }
}
