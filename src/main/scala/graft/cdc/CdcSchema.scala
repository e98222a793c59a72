package graft.cdc

import org.apache.spark.sql.types._

/** The Debezium-CDC envelope projection the reference engine decodes.
  *
  * The reference (`reference/src/mq/kafka.rs:119-143`) deserializes exactly
  * two fields of the envelope — `op` and `source{db,table}` — and ignores
  * everything else (`before`/`after` row images pass through as opaque
  * bytes). We mirror that as a *partial* `StructType` handed to `from_json`:
  * giving Spark only the 3-field schema is the Spark-native form of the
  * reference's hand-written projection-only decode — the JSON parser skips
  * undeclared fields, so arbitrarily large row images are never materialized.
  * At 100 TB this matters: parsing the full envelope would dominate CPU.
  */
object CdcSchema {

  /** Partial decode schema: only what the pipeline inspects. */
  val CDC_SCHEMA: StructType = StructType(Seq(
    StructField("op", StringType),
    StructField("source", StructType(Seq(
      StructField("db", StringType),
      StructField("table", StringType))))))

  /** Typed view of the decoded projection (for the Dataset facade). */
  final case class CdcSource(db: String, table: String)
  final case class CdcEnvelope(op: String, source: CdcSource)

  /** A raw record as it arrives from the transport: the Kafka message
    * contract `(topic, key, value)` with the value still undecoded.
    * (Kafka's BINARY key/value are carried as STRING here because the
    * fixture envelopes are JSON text; the pipeline never assumes more.)
    */
  final case class RawRecord(topic: String, key: String, value: String)

  /** A routed record as it leaves the pipeline: resolved target topic,
    * original key + value bytes (byte passthrough, R5).
    */
  final case class RoutedRecord(target_topic: String, key: String, value: String)
}
