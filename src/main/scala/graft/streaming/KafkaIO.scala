package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.cdc.Config.KafkaConf

/** Kafka source/sink adapters (reference R1 + R5,
  * `reference/src/mq/kafka.rs:30-46,80-102`), expressed as Structured
  * Streaming options.
  *
  * This container ships no `spark-sql-kafka` connector jar, so these
  * adapters are compile-checked, option-complete, and *gated*:
  * [[kafkaAvailable]] reports whether the `kafka` source is loadable,
  * and the test suite exercises the pipeline through `MemoryStream`
  * instead (SURVEY.md §5.2). On a real cluster the same code runs
  * unchanged.
  *
  * Option mapping from the reference:
  *  - `auto.offset.reset=earliest` (`kafka.rs:33`) → `startingOffsets=earliest`
  *  - consumer group (`kafka.rs:31`) → `kafka.group.id`
  *  - `session.timeout.ms=6000` (`kafka.rs:34`) → `kafka.session.timeout.ms`
  *  - multi-topic subscribe (`kafka.rs:37-39`) → comma-joined `subscribe`
  *    (Spark's Kafka source UNION ALLs topics exactly like rdkafka)
  *  - producer `batch.size=10485760` / `message.timeout.ms=5000`
  *    (`kafka.rs:43-44`) → `kafka.batch.size` / `kafka.delivery.timeout.ms`
  *  - per-row dynamic target topic (`kafka.rs:80`) → a `topic` column
  *    consumed by the Kafka sink; key/value bytes forwarded untouched.
  *
  * Delivery semantics: the reference is effectively at-most-once (auto
  * commit + unawaited produce, SURVEY.md §2.1); Spark's checkpointed
  * Kafka sink is at-least-once — a deliberate, documented upgrade.
  */
object KafkaIO {

  /** True when the Kafka source provider is on the classpath. */
  def kafkaAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** The consumer-side option set, one entry per reference consumer
    * config knob (`kafka.rs:30-39`). A pure map so the contract is
    * assertable (KafkaIOSpec pins it byte-for-byte) even though the
    * sandbox cannot construct a live Kafka relation; [[source]] applies
    * it verbatim.
    */
  def sourceOptions(conf: KafkaConf): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> conf.bootstrapServers,          // kafka.rs:31
    "kafka.group.id" -> conf.group,                              // kafka.rs:32
    "kafka.session.timeout.ms" -> "6000",                        // kafka.rs:34
    "subscribe" -> conf.bindings.mkString(","),                  // kafka.rs:37-39
    "startingOffsets" -> "earliest")                             // kafka.rs:33

  /** The producer-side option set (`kafka.rs:42-46`), pure for the same
    * reason. rdkafka's single `message.timeout.ms=5000` bounds total
    * delivery time; Kafka's Java producer expresses that as
    * `delivery.timeout.ms` but REQUIRES delivery.timeout.ms >=
    * linger.ms + request.timeout.ms at construction, so the 5000 ms
    * budget maps to BOTH knobs here or the producer throws
    * ConfigException before the first record.
    */
  def sinkOptions(conf: KafkaConf): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> conf.bootstrapServers,          // kafka.rs:42
    "kafka.batch.size" -> "10485760",                            // kafka.rs:44
    "kafka.request.timeout.ms" -> "4000",
    "kafka.delivery.timeout.ms" -> "5000")                       // kafka.rs:43

  /** Streaming source over the configured topic bindings. Yields the
    * standard Kafka schema; [[graft.cdc.Parse.parse]] consumes
    * (topic, key, value) after a cast to string value.
    */
  def source(spark: SparkSession, conf: KafkaConf): DataFrame =
    spark.readStream
      .format("kafka")
      .options(sourceOptions(conf))
      .load()

  /** Kafka sink writer for a routed stream carrying (target_topic, key,
    * value): renames target_topic → topic so the sink's per-row dynamic
    * topic dispatch mirrors `FutureRecord::to(target)` (`kafka.rs:80`).
    */
  def sink(routed: DataFrame, conf: KafkaConf,
           checkpointDir: String): DataStreamWriter[Row] =
    routed
      .withColumnRenamed("target_topic", "topic")
      .writeStream
      .format("kafka")
      .options(sinkOptions(conf))
      .option("checkpointLocation", checkpointDir)
}
