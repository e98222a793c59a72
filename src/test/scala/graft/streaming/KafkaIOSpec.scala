package graft.streaming

import graft.SparkSpec
import graft.cdc.Config.KafkaConf

/** Contract test for the Kafka adapters (reference R1 + R5). The sandbox
  * ships no `spark-sql-kafka` connector jar, so a live round trip is
  * impossible here — what CAN be pinned is the exact option assembly the
  * adapters would hand the connector, byte-for-byte against the reference's
  * client configs (`reference/src/mq/kafka.rs:30-46`). On a real cluster
  * these same maps construct the consumer/producer, so this is the full
  * locally-testable surface of the two permanently-"partial" rows.
  */
class KafkaIOSpec extends SparkSpec {

  private val conf = KafkaConf(
    bootstrapServers = "broker-1:9092,broker-2:9092",
    group = "flink-kafka-filter-transform",
    bindings = Seq("flink-cdc-a", "flink-cdc-b"))

  test("consumer options match the reference client config byte-for-byte") {
    assert(KafkaIO.sourceOptions(conf) == Map(
      "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092", // kafka.rs:31
      "kafka.group.id" -> "flink-kafka-filter-transform",         // kafka.rs:32
      "kafka.session.timeout.ms" -> "6000",                       // kafka.rs:34
      "subscribe" -> "flink-cdc-a,flink-cdc-b",                   // kafka.rs:37-39
      "startingOffsets" -> "earliest"))                           // kafka.rs:33
  }

  test("producer options match the reference client config byte-for-byte") {
    val opts = KafkaIO.sinkOptions(conf)
    assert(opts("kafka.bootstrap.servers") == "broker-1:9092,broker-2:9092")
    assert(opts("kafka.batch.size") == "10485760")                // kafka.rs:44
    // rdkafka's message.timeout.ms=5000 (kafka.rs:43) is the total
    // delivery budget; the Java producer enforces
    // delivery.timeout.ms >= linger.ms + request.timeout.ms at
    // construction, so the budget must bound both knobs.
    assert(opts("kafka.delivery.timeout.ms") == "5000")
    assert(opts("kafka.request.timeout.ms").toInt <= 5000)
    assert(opts.keySet == Set("kafka.bootstrap.servers", "kafka.batch.size",
      "kafka.request.timeout.ms", "kafka.delivery.timeout.ms"))
  }

  test("single-topic binding subscribes without a trailing comma") {
    val one = KafkaIO.sourceOptions(conf.copy(bindings = Seq("only-topic")))
    assert(one("subscribe") == "only-topic")
  }

  test("kafkaAvailable reflects the classpath, and source() fails only at load()") {
    // The adapters must be constructible without the connector jar —
    // failure may surface only at load()/start(), never at option
    // assembly (otherwise a driver that wires the pipeline but runs
    // MemoryStream tests could not even link).
    if (!KafkaIO.kafkaAvailable) {
      intercept[Exception] { KafkaIO.source(spark, conf) }
    } else {
      KafkaIO.source(spark, conf) // connector present: must build cleanly
    }
  }
}
