package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Forecast

/** E312 (VERDICT r13 #2): the Holt batch family runs DISTRIBUTED —
  * per-series arrays + an executor-side fold — and must be
  * byte-identical to (a) the RETIRED driver-loop derivation
  * (reproduced verbatim below, Spark round() and all) on the fixture,
  * and (b) the E308 streaming processor's fold on a planted
  * multi-series feed. The oracles did not change, so (a) is also what
  * keeps the gate rows green.
  */
class HoltDistributedSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val (a, oa, bb, ob) = (0.5, 0.5, 0.3, 0.7)
  private val DayMs = 86400000L

  /** The fixture's per-series zero-filled daily arrays, assembled the
    * way the retired driver loop did (collect + calendar map).
    */
  private def driverSeries: (IndexedSeq[Long], Seq[(String, IndexedSeq[Double])]) = {
    val cnt = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts").cast("timestamp")).as("d"))
      .agg(count(lit(1)).as("n")).collect()
    val bounds = graft.Tables.events(spark, sfDir)
      .agg(min(date_trunc("day", col("ts").cast("timestamp"))),
        max(date_trunc("day", col("ts").cast("timestamp")))).head()
    val days = (bounds.getTimestamp(0).getTime to
      bounds.getTimestamp(1).getTime by DayMs).toIndexedSeq
    val byKey = cnt.map(r => (r.getString(0),
      r.getTimestamp(1).getTime) -> r.getLong(2)).toMap
    val types = cnt.map(_.getString(0)).distinct.sorted.toSeq
    (days, types.map(t =>
      t -> days.map(d => byKey.getOrElse((t, d), 0L).toDouble)))
  }

  private def assertSameRows(got: DataFrame, want: DataFrame,
      tag: String): Unit = {
    val g = got.collect().map(_.toSeq).toSet
    val w = want.collect().map(_.toSeq).toSet
    assert(g === w, s"$tag: only-dist=${(g -- w).take(2)}, " +
      s"only-driver=${(w -- g).take(2)}")
    assert(g.nonEmpty, s"$tag: vacuous (no rows)")
  }

  test("events_holt_forecast (distributed) equals the driver-loop " +
      "derivation row for row") {
    val (days, series) = driverSeries
    val tTrain = math.floor(0.8 * days.length).toInt
    val rows = series.flatMap { case (t, y) =>
      val (l, b) = Forecast.holtFit(y.take(tTrain), a, oa, bb, ob)
      (tTrain until days.length).map { i =>
        val h = i - tTrain + 1
        val fc = l + h * b
        (t, new java.sql.Timestamp(days(i)), y(i).toLong, fc,
          math.abs(y(i) - fc))
      }
    }
    val want = rows.toDF("event_type", "d", "n_actual", "fc", "ae")
      .select(col("event_type"), col("d"), col("n_actual"),
        round(col("fc"), 6).as("forecast"),
        round(col("ae"), 6).as("abs_err"))
    assertSameRows(
      AnalyticsQueries.queries("events_holt_forecast")(spark, sfDir),
      want, "holt_forecast")
  }

  test("events_forecast_anomaly (distributed) preserves the spike " +
      "plant and the calibration threshold") {
    val (days, series) = driverSeries
    val tTrain = math.floor(0.8 * days.length).toInt
    val rows = series.flatMap { case (t, y) =>
      val (l, b, res) = Forecast.holtFitResiduals(y.take(tTrain), a, oa, bb, ob)
      val mar = res.foldLeft(0.0)((acc, r) => acc + math.abs(r)) /
        res.length.toDouble
      (tTrain until days.length).map { i =>
        val actual =
          if (t == "view" && i == days.length - 1) y(i) + 25.0 else y(i)
        val fc = l + (i - tTrain + 1) * b
        val ae = math.abs(actual - fc)
        (t, new java.sql.Timestamp(days(i)), actual.toLong, fc, ae, mar,
          ae > 3.0 * mar)
      }
    }
    val want = rows
      .toDF("event_type", "d", "n_actual", "fc", "ae", "mar", "an")
      .select(col("event_type"), col("d"), col("n_actual"),
        round(col("fc"), 6).as("forecast"),
        round(col("ae"), 6).as("abs_err"),
        round(col("mar"), 6).as("train_mar"),
        col("an").as("is_anomaly"))
    val got = AnalyticsQueries.queries("events_forecast_anomaly")(spark, sfDir)
    assertSameRows(got, want, "forecast_anomaly")
    // the plant is live: at least one anomaly verdict is true
    assert(got.filter(col("is_anomaly")).count() >= 1,
      "the planted spike did not trip")
  }

  test("events_forecast_audit (distributed) equals the driver-loop MAEs") {
    val (days, series) = driverSeries
    val tTrain = math.floor(0.8 * days.length).toInt
    val rows = series.map { case (t, y) =>
      val (l, b) = Forecast.holtFit(y.take(tTrain), a, oa, bb, ob)
      val hold = tTrain until days.length
      val n = hold.length.toDouble
      def mae(err: Int => Double): Double =
        hold.foldLeft(0.0)((acc, i) => acc + err(i)) / n
      val mH = mae(i => math.abs(y(i) - (l + (i - tTrain + 1) * b)))
      val mN = mae(i => math.abs(y(i) - y(tTrain - 1)))
      val mS = mae(i => math.abs(y(i) - y(i - 7)))
      (t, hold.length.toLong, mH, mN, mS, mH < mN)
    }
    val want = rows.toDF("event_type", "n_holdout", "mh", "mn", "ms", "bt")
      .select(col("event_type"), col("n_holdout"),
        round(col("mh"), 6).as("mae_holt"),
        round(col("mn"), 6).as("mae_naive"),
        round(col("ms"), 6).as("mae_snaive"),
        col("bt").as("holt_beats_naive"))
    assertSameRows(
      AnalyticsQueries.queries("events_forecast_audit")(spark, sfDir),
      want, "forecast_audit")
  }

  test("planted multi-series feed: the distributed fold's state and the " +
      "E308 streaming processor agree per series") {
    // 24 series with different shapes (level, trend, period-7 spikes),
    // deterministic values — no RNG, the E194 convention
    val nDays = 30
    val days = (0 until nDays).map(_.toLong * DayMs)
    val series = (0 until 24).map { k =>
      val y = (0 until nDays).map(i =>
        (1 + k % 5) * 10.0 + (k % 3) * i + (if ((i + k) % 7 == 0) 15.0 else 0.0))
      s"s$k" -> y
    }
    // distributed fold over the full series (tTrain = length): the
    // UDF must land exactly on the driver fold's terminal state
    val fit = Forecast.holtFitStateUdf(a, oa, bb, ob)
    val got = series.toDF("k", "y")
      .select(col("k"), fit(col("y"), lit(nDays)).as("f"))
      .select(col("k"), col("f._1"), col("f._2"), col("f._3"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    series.foreach { case (k, y) =>
      val (l, b, res) = Forecast.holtFitResiduals(y, a, oa, bb, ob)
      val mar = res.foldLeft(0.0)((acc, r) => acc + math.abs(r)) / res.length
      assert(got(k) === ((l, b, mar)), s"series $k: UDF fold drifted")
    }
    // and the SAME feed through the E308 streaming processor emits the
    // fold's one-step predictions — batch and stream share the state
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(String, Long, Double)]
      val out = graft.streaming.StreamingPipeline.holtForecasts(
        spark, stream.toDS(), a, oa, bb, ob)
      val q = out.writeStream.format("memory").queryName("holtdist")
        .outputMode("update").start()
      try {
        stream.addData(series.flatMap { case (k, y) =>
          days.zip(y).map { case (d, v) => (k, d, v) } })
        q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("holtdist")
        .as[(String, Long, Double)].collect().toSet
      val want = series.flatMap { case (k, y) =>
        val (_, _, res) = Forecast.holtFitResiduals(y, a, oa, bb, ob)
        (1 until nDays).map(t => (k, days(t), y(t) - res(t - 1)))
      }.toSet
      // one-step preds reconstructed as y − residual: ulp-level equal
      assert(streamed.size === want.size)
      val wantMap = want.groupBy(e => (e._1, e._2)).view
        .mapValues(_.head._3).toMap
      streamed.foreach { case (k, d, f) =>
        assert(math.abs(f - wantMap((k, d))) < 1e-9,
          s"stream/batch fold drift at ($k, $d)")
      }
    } finally prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
  }
}
