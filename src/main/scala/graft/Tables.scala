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
  * `events.ts` has been written by the generator both as parquet
  * TIMESTAMP(MICROS) (current fixtures) and TIMESTAMP(NANOS) (older ones).
  * [[events]] detects which encoding is on disk instead of hardcoding one:
  * plain `spark.read.parquet` succeeds and infers `TimestampType` for
  * MICROS; for NANOS (which Spark's vectorized reader rejects, and which
  * schema-merge surfaces as a non-timestamp `ts`) it falls back to reading
  * epoch-nanos as LONG via an explicit schema and converting with integer
  * division (`ts div 1000` — double division would lose precision at
  * 1.7e18 nanos, 53-bit mantissa). Either way the result column is a
  * microsecond `TimestampType` matching DuckDB's `CAST(ts AS TIMESTAMP)`.
  *
  * [[assertEventsTsSane]] is a fixture-contract tripwire: a silent decode
  * mismatch (e.g. micros misread as nanos) shifts every timestamp ~1000×,
  * which this turns into one loud error instead of hundreds of subtly wrong
  * query results. Verify's preamble calls it before running any query.
  */
object Tables {

  private val EVENTS_NANOS_SCHEMA = StructType(Seq(
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
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    // The generator writes naive (not UTC-adjusted) micros, which Spark
    // infers as TIMESTAMP_NTZ; sessions here run in UTC, so reading the
    // column as the session-zoned TimestampType is value-identical. Doing
    // it via an explicit read schema (not a cast on top of the NTZ read)
    // keeps ts a plain scan column, so time predicates still push down to
    // the parquet reader — a cast wrapper would turn every event-time
    // range filter into a full scan at 100 TB.
    val native = scala.util.Try(spark.read.parquet(path).schema)
      .filter(sch => sch.fieldNames.contains("ts") && (
        sch("ts").dataType == TimestampType ||
          sch("ts").dataType == TimestampNTZType))
      .map { sch =>
        val pushable = StructType(sch.map(f =>
          if (f.name == "ts") f.copy(dataType = TimestampType) else f))
        spark.read.schema(pushable).parquet(path)
      }
    native.getOrElse {
      spark.read.schema(EVENTS_NANOS_SCHEMA).parquet(path)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }

  /** Fixture-contract tripwire: decoded `events.ts` must land in the
    * century the generator writes (2000–2100). A wrong unit (nanos read as
    * micros or vice versa) lands ~1970 or ~year 52000 and fails loudly here.
    */
  def assertEventsTsSane(spark: SparkSession, sfDir: String): Unit = {
    val Array(row) = events(spark, sfDir)
      .agg(min(year(col("ts"))).as("lo"), max(year(col("ts"))).as("hi"))
      .collect()
    val (lo, hi) = (row.getInt(0), row.getInt(1))
    require(lo >= 2000 && hi <= 2100,
      s"events.ts decode sanity failed for $sfDir: year range [$lo, $hi] " +
        "outside [2000, 2100] — parquet timestamp encoding does not match " +
        "the loader's decode path (see Tables.events)")
  }

  /** Full fixture-contract tripwire, run from Verify's preamble before any
    * query: every silent assumption the query corpus makes about the
    * driver-generated fixtures, asserted as a handful of cheap aggregates.
    * The round-6 regression (17 queries red from a regenerated `events.ts`
    * encoding, zero code change) is the failure class this converts into
    * one loud, named error. Checked beyond the events decode:
    *  - session timezone is UTC (the events decode + oracle timestamp
    *    compares assume it; an hours-level shift stays inside the year
    *    brackets, so it gets its own assertion);
    *  - `orders.o_orderdate` years in [1990, 2010] (date-bracket queries
    *    like Q4/Q6/Q14 silently go empty if the generator shifts eras);
    *  - `lineitem.l_shipdate` years in [1990, 2010] and `part.p_size` in
    *    the generator's small-int range (same silent-empty hazard for
    *    ship-date and size-bracket queries);
    *  - `documents.doc_id` unique, `text` non-null (dedup/fingerprint
    *    oracles key on both);
    *  - `documents` physical row order ≡ doc_id order — `_metadata
    *    .row_index == doc_id - min(doc_id)` — the E159 provenance
    *    oracle's load-bearing assumption (a regenerated fixture written
    *    shuffled, or split into multiple files, must fail HERE, not as a
    *    subtle provenance hash drift);
    *  - `embeddings.embedding` one constant dimension (every similarity
    *    kernel assumes aligned vectors).
    */
  def assertFixtureContract(spark: SparkSession, sfDir: String): Unit = {
    // The events ts decode (and every DuckDB-oracle timestamp compare) is
    // value-identical only under a UTC session; a non-UTC zone shifts all
    // timestamps by hours — inside the century bracket below, so it must
    // be asserted directly, not left as a builder-config convention.
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"session timeZone is '$tz', not UTC — Tables.events reads the " +
        "fixture's naive parquet micros as session-zoned TimestampType, " +
        "which is only correct under UTC (set it in the SparkSession builder)")

    assertEventsTsSane(spark, sfDir)

    val Array(li) = lineitem(spark, sfDir)
      .agg(min(year(col("l_shipdate"))).as("lo"),
        max(year(col("l_shipdate"))).as("hi")).collect()
    require(li.getInt(0) >= 1990 && li.getInt(1) <= 2010,
      s"lineitem.l_shipdate sanity failed for $sfDir: year range " +
        s"[${li.getInt(0)}, ${li.getInt(1)}] outside [1990, 2010] — " +
        "date-bracket queries (Q6/Q14/Q20 shapes) would silently empty")

    val Array(ps) = part(spark, sfDir)
      .agg(min(col("p_size")).as("lo"), max(col("p_size")).as("hi")).collect()
    require(ps.getInt(0) >= 0 && ps.getInt(0) <= 10 &&
        ps.getInt(1) >= 20 && ps.getInt(1) <= 200,
      s"part.p_size sanity failed for $sfDir: range " +
        s"[${ps.getInt(0)}, ${ps.getInt(1)}] outside the generator's " +
        "small-int contract (size-bracket queries like Q19/Q2 assume " +
        "sizes populate [1, ~50])")

    val Array(o) = orders(spark, sfDir)
      .agg(min(year(col("o_orderdate"))).as("lo"),
        max(year(col("o_orderdate"))).as("hi")).collect()
    require(o.getInt(0) >= 1990 && o.getInt(1) <= 2010,
      s"orders.o_orderdate sanity failed for $sfDir: year range " +
        s"[${o.getInt(0)}, ${o.getInt(1)}] outside [1990, 2010]")

    val docsBase = documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("_metadata.row_index").as("ri"))
    val Array(d) = docsBase
      .agg(count(lit(1)).as("n"),
        countDistinct(col("doc_id")).as("nd"),
        sum(when(col("text").isNull, 1).otherwise(0)).as("null_text"),
        min(col("doc_id")).as("lo"))
      .collect()
    require(d.getLong(0) > 0 && d.getLong(0) == d.getLong(1),
      s"documents.doc_id sanity failed for $sfDir: ${d.getLong(0)} rows, " +
        s"${d.getLong(1)} distinct ids")
    require(d.getLong(2) == 0,
      s"documents.text sanity failed for $sfDir: ${d.getLong(2)} null texts")
    val drift = docsBase
      .agg(max(abs(col("ri") - (col("doc_id") - lit(d.getLong(3))))))
      .head.getLong(0)
    require(drift == 0,
      s"documents physical-order sanity failed for $sfDir: row_index " +
        s"drifts from doc_id order by up to $drift — the E159 " +
        "provenance contract (row_index ≡ doc_id rank) no longer holds")

    val Array(e) = embeddings(spark, sfDir)
      .agg(countDistinct(size(col("embedding"))).as("dims"),
        count(lit(1)).as("n")).collect()
    require(e.getLong(1) > 0 && e.getLong(0) == 1,
      s"embeddings dimension sanity failed for $sfDir: ${e.getLong(0)} " +
        "distinct vector lengths (similarity kernels assume one)")
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = spark.read.parquet(s"$sfDir/documents.parquet")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = spark.read.parquet(s"$sfDir/embeddings.parquet")
}
