package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference's observability surface (`reference/src/main.rs:31-55`):
  * `GET /version` → the service version string, `GET /metrics` → the
  * counter registry in OpenMetrics text format, which is what its
  * `prometheus_client::encoding::text::encode` emits.
  *
  * Zero new dependencies — the JDK's `com.sun.net.httpserver` is enough
  * for a scrape endpoint. The registry is a [[StreamingPipeline.CounterListener]]:
  * metrics accumulate inside the forwarding pass (`observe()` columns,
  * no extra scan), the listener folds them into monotonic totals per
  * micro-batch, and this server renders a point-in-time snapshot per
  * scrape. At scale the server runs on the driver only — scrape load is
  * O(counters), independent of data volume.
  *
  * Key sanitization: listener keys are `<observation>.<column>` (e.g.
  * `cdc_consumed.events_total`); Prometheus metric names cannot contain
  * dots, so they become underscores, and a counter sample must carry the
  * `_total` suffix with the TYPE line naming the base family — mirroring
  * how the reference registers `flink_cdc_event_count` and the encoder
  * appends `_total` (`reference/src/mq/mod.rs:91-100`).
  */
class MetricsServer(listener: StreamingPipeline.CounterListener,
                    port: Int = 9266,
                    version: String = MetricsServer.Version) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/version", (ex: HttpExchange) =>
    respond(ex, "/version", "text/plain; charset=utf-8", version))
  server.createContext("/metrics", (ex: HttpExchange) =>
    respond(ex, "/metrics", MetricsServer.OpenMetricsContentType,
      MetricsServer.render(listener.totals)))
  server.setExecutor(null) // serve scrapes on the accept thread

  def start(): MetricsServer = { server.start(); this }

  /** The actual bound port (differs from `port` when constructed with 0,
    * the ephemeral-port form tests use).
    */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)

  /** JDK context matching is prefix-based, so the handler re-checks the
    * exact path (404 otherwise: /metricsfoo must not serve metrics).
    * Non-GET → 405 with no body; HEAD → headers only (writing a body
    * into a HEAD exchange raises per request and floods logs under
    * load-balancer probes).
    */
  private def respond(ex: HttpExchange, path: String, contentType: String,
                      body: String): Unit = {
    try {
      val method = ex.getRequestMethod
      if (ex.getRequestURI.getPath != path) {
        ex.sendResponseHeaders(404, -1)
      } else if (method == "HEAD") {
        ex.getResponseHeaders.set("Content-Type", contentType)
        ex.sendResponseHeaders(200, -1)
      } else if (method != "GET") {
        ex.sendResponseHeaders(405, -1)
      } else {
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", contentType)
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
      }
    } finally ex.close()
  }
}

object MetricsServer {
  val Version = "1.0.0" // reference/src/main.rs:40-42

  val OpenMetricsContentType =
    "application/openmetrics-text; version=1.0.0; charset=utf-8"

  /** Counter totals → OpenMetrics text: one `# TYPE <family> counter`
    * line plus a `<family>_total <n>` sample per counter, `# EOF`
    * terminated. Deterministic (name-sorted) so scrapes diff cleanly.
    */
  def render(totals: Map[String, Long]): String = {
    val sb = new StringBuilder
    totals.toSeq
      .map { case (k, v) => (family(k), v) }
      .sortBy(_._1)
      .foreach { case (fam, v) =>
        sb ++= s"# TYPE $fam counter\n"
        sb ++= s"${fam}_total $v\n"
      }
    sb ++= "# EOF\n"
    sb.toString
  }

  /** `cdc_consumed.events_total` → family `cdc_consumed_events` (the
    * encoder re-appends `_total` on the sample line).
    */
  private def family(key: String): String = {
    val name = key.replaceAll("[^a-zA-Z0-9_:]", "_")
    if (name.endsWith("_total")) name.dropRight("_total".length) else name
  }
}
