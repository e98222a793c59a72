package graft

import org.apache.spark.sql.SparkSession

import graft.cdc.Config
import graft.streaming.{KafkaIO, MetricsServer, StreamingPipeline}

/** Production service entrypoint — the library's equivalent of the
  * reference's `main` (`reference/src/main.rs:19-38`): load the YAML
  * config, subscribe the bound topics, run parse→filter→route with
  * observed counters, forward to per-rule target topics.
  *
  * Usage: `StreamMain <config.yaml> <checkpointDir>`
  *
  * Locally this exits with a clear message (no Kafka connector jar in
  * this environment, SURVEY.md §7.6.6); on a cluster with
  * `spark-sql-kafka` on the classpath the same binary runs the
  * streaming service, with the counter registry scrapeable at
  * `/metrics` and the version at `/version` on port 9266
  * ([[graft.streaming.MetricsServer]], `main.rs:31-55` parity).
  */
object StreamMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: StreamMain <config.yaml> <checkpointDir>")
    val conf = Config.fromFile(args(0))

    if (!KafkaIO.kafkaAvailable) {
      System.err.println(
        "StreamMain: spark-sql-kafka connector not on the classpath; " +
          "config parsed and validated (" + conf.rules.length + " rules), exiting. " +
          "Run on a cluster with the Kafka connector to start the service.")
      return
    }

    val spark = SparkSession.builder()
      .appName("graft-cdc-router")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val listener = new StreamingPipeline.CounterListener
    spark.streams.addListener(listener)
    // /version + /metrics on the reference's port (main.rs:36)
    val metrics = new MetricsServer(listener).start()

    // everything after the server starts runs under its try/finally:
    // a sink-construction failure must still stop the server, or its
    // non-daemon dispatcher thread pins the JVM (and port 9266) forever
    try {
      // key/value stay BINARY end to end — Parse decodes a casted copy,
      // the sink forwards the original bytes (R5 byte passthrough)
      val source = KafkaIO.source(spark, conf.kafka)
        .select("topic", "key", "value")
      val routed = StreamingPipeline.routeObserved(source, conf.rules)
      KafkaIO.sink(routed, conf.kafka, args(1)).start().awaitTermination()
    } finally metrics.stop()
  }
}
