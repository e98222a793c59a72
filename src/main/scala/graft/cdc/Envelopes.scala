package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CDC-envelope synthesis from `events.parquet`.
  *
  * The reference consumes Debezium envelopes from Kafka; locally there is no
  * broker, so envelopes are derived — not random — from the fixture `events`
  * table with pure column arithmetic (FIXTURES.md §3). The DuckDB oracle
  * rebuilds the *same* strings with the same expressions, closing the
  * comparison loop: Spark and the oracle compute their inputs from one
  * shared parquet source of truth.
  *
  * The JSON value is assembled by string concatenation (not `to_json`) so
  * both engines produce byte-identical text — float formatting differs
  * across engines, hence the integer `value_cents` field.
  */
object Envelopes {

  /** op := signup→c, purchase→u, error→d, else u (covers README.md:13 ops).
    * Public: the latest-state compaction query labels events with the
    * same mapping, and the two must never drift.
    */
  def opExpr(eventType: Column): Column =
    when(eventType === "signup", "c")
      .when(eventType === "purchase", "u")
      .when(eventType === "error", "d")
      .otherwise("u")

  /** `(topic, key, value)` raw records synthesized from `events`.
    *
    * @param numPartitions spread the source rows before synthesis —
    *   a real Kafka source arrives one partition per topic-partition,
    *   but the fixture parquet is a single row group (one task); the
    *   parallel-throughput bench entry passes the core count here so
    *   synthesis + parse + route all scale, which is what a broker-fed
    *   deployment sees. 0 = leave the scan's own partitioning.
    */
  def fromEvents(spark: SparkSession, sfDir: String,
                 numPartitions: Int = 0): DataFrame = {
    val raw = graft.Tables.events(spark, sfDir)
    val ev = if (numPartitions > 0) raw.repartition(numPartitions) else raw
    ev.select(
      concat(lit("flink-"), ((col("event_id") % 2) + 1).cast("string")).as("topic"),
      col("event_id").cast("string").as("key"),
      concat(
        lit("{\"before\":null,\"after\":{\"id\":"), col("event_id").cast("string"),
        lit(",\"value_cents\":"), floor(col("value") * 100).cast("string"),
        lit("},\"op\":\""), opExpr(col("event_type")),
        lit("\",\"source\":{\"db\":\"db_"), (col("user_id") % 3).cast("string"),
        lit("\",\"table\":\"table_"), (col("event_id") % 10).cast("string"),
        lit("\"}}")).as("value"))
  }

  /** The same synthesis as a DuckDB CTE body (shared by every CDC oracle). */
  val duckdbCte: String =
    """SELECT 'flink-' || CAST(event_id % 2 + 1 AS VARCHAR) AS topic,
      |       CAST(event_id AS VARCHAR) AS key,
      |       '{"before":null,"after":{"id":' || CAST(event_id AS VARCHAR) ||
      |       ',"value_cents":' || CAST(CAST(floor(value * 100) AS BIGINT) AS VARCHAR) ||
      |       '},"op":"' ||
      |       (CASE event_type WHEN 'signup' THEN 'c' WHEN 'purchase' THEN 'u'
      |                        WHEN 'error' THEN 'd' ELSE 'u' END) ||
      |       '","source":{"db":"db_' || CAST(user_id % 3 AS VARCHAR) ||
      |       '","table":"table_' || CAST(event_id % 10 AS VARCHAR) ||
      |       '"}}' AS value
      |FROM events""".stripMargin
}
