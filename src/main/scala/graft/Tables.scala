package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet fixture tables
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md §4).
  *
  * All readers go through `spark.read.parquet` so Catalyst handles column
  * pruning and predicate pushdown into the scan — on a real cluster these
  * would be partitioned/bucketed table reads; the API is identical.
  *
  * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's reader
  * rejects by default; [[events]] reads it as epoch-nanos LONG via an
  * explicit schema (works in any session, no legacy flag needed) and
  * converts to a microsecond `TimestampType` with integer division —
  * truncation identical to DuckDB's `CAST(ts AS TIMESTAMP)`, keeping the
  * oracle comparison exact. Double-based division would lose precision at
  * 1.7e18 nanos (53-bit mantissa), hence `div`.
  */
object Tables {

  private val EVENTS_SCHEMA = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
  def region(spark: SparkSession, sfDir: String): DataFrame    = spark.read.parquet(s"$sfDir/region.parquet")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = spark.read.parquet(s"$sfDir/nation.parquet")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = spark.read.parquet(s"$sfDir/customer.parquet")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = spark.read.parquet(s"$sfDir/supplier.parquet")
  def part(spark: SparkSession, sfDir: String): DataFrame      = spark.read.parquet(s"$sfDir/part.parquet")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = spark.read.parquet(s"$sfDir/orders.parquet")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = spark.read.parquet(s"$sfDir/lineitem.parquet")
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.schema(EVENTS_SCHEMA).parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, sfDir: String): DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = spark.read.parquet(s"$sfDir/embeddings.parquet")
}
