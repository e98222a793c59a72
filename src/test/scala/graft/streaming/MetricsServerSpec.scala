package graft.streaming

import java.net.{HttpURLConnection, URI}
import scala.io.Source

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec

/** R9 end-to-end: a live streaming query's counters must be scrapeable
  * over HTTP exactly like the reference exposes them
  * (`reference/src/main.rs:31-55`).
  */
class MetricsServerSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def get(port: Int, path: String): (Int, String, String) = {
    val conn = URI.create(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
      (conn.getResponseCode, conn.getContentType, body)
    } finally conn.disconnect()
  }

  test("/version and /metrics serve a live query's counters") {
    val listener = new StreamingPipeline.CounterListener
    spark.streams.addListener(listener)
    val server = new MetricsServer(listener, port = 0).start() // ephemeral port
    val stream = MemoryStream[(String, String, String)]
    val q = StreamingPipeline.routeObserved(stream.toDF().toDF("topic", "key", "value"))
      .writeStream.format("memory").queryName("metrics_http")
      .outputMode(OutputMode.Append).start()
    try {
      val ok = """{"op":"c","source":{"db":"db_0","table":"table_1"}}"""
      stream.addData(("flink-1", "k1", ok), ("flink-1", "k2", "{bad"))
      q.processAllAvailable()
      // listener events arrive async after progress; poll until folded in
      val deadline = System.nanoTime() + 10e9.toLong
      while (listener.totals.getOrElse("cdc_consumed.events_total", 0L) < 2L &&
        System.nanoTime() < deadline) Thread.sleep(50)

      val (vCode, vType, vBody) = get(server.boundPort, "/version")
      assert(vCode == 200 && vType.startsWith("text/plain"))
      assert(vBody == "1.0.0") // main.rs:40-42

      val (mCode, mType, mBody) = get(server.boundPort, "/metrics")
      assert(mCode == 200 && mType == MetricsServer.OpenMetricsContentType)
      assert(mBody.contains("# TYPE cdc_consumed_events counter"))
      assert(mBody.contains("cdc_consumed_events_total 2"))
      assert(mBody.contains("cdc_consumed_parse_errors_total 1"))
      assert(mBody.contains("cdc_forwarded_forwarded_total 1"))
      assert(mBody.endsWith("# EOF\n"))
    } finally {
      q.stop()
      server.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("render is deterministic and empty registries still terminate") {
    assert(MetricsServer.render(Map.empty) == "# EOF\n")
    val a = MetricsServer.render(Map("b.y_total" -> 2L, "a.x" -> 1L))
    assert(a ==
      "# TYPE a_x counter\na_x_total 1\n# TYPE b_y counter\nb_y_total 2\n# EOF\n")
  }

  test("non-exact paths 404, non-GET 405, HEAD gets headers only") {
    val listener = new StreamingPipeline.CounterListener
    val server = new MetricsServer(listener, port = 0).start()
    try {
      def status(path: String, method: String): Int = {
        val conn = URI.create(s"http://127.0.0.1:${server.boundPort}$path").toURL
          .openConnection().asInstanceOf[HttpURLConnection]
        conn.setRequestMethod(method)
        try conn.getResponseCode finally conn.disconnect()
      }
      assert(status("/metricsgarbage", "GET") == 404)
      assert(status("/metrics/sub", "GET") == 404)
      assert(status("/metrics", "POST") == 405)
      assert(status("/metrics", "HEAD") == 200)
      assert(status("/version", "HEAD") == 200)
      assert(status("/metrics", "GET") == 200)
    } finally server.stop()
  }
}
