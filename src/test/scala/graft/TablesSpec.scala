package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture-loader contract: `Tables.events` must decode `ts` correctly for
  * BOTH encodings the generator has used (TIMESTAMP(MICROS) today, epoch
  * nanos before), and the [[Tables.assertEventsTsSane]] tripwire must turn a
  * decode/fixture mismatch into one loud error (the round-6 regression was
  * 17 silently-wrong queries from exactly such a mismatch).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("events reads the current timestamp[us] fixtures as native TimestampType") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType == TimestampType)
    val Array(row) =
      df.agg(min(year($"ts")).as("lo"), max(year($"ts")).as("hi")).collect()
    assert(row.getInt(0) >= 2000 && row.getInt(1) <= 2100,
      s"decoded year range ${row.getInt(0)}..${row.getInt(1)} not in this century")
  }

  test("events falls back to the epoch-nanos decode when ts is not a parquet timestamp") {
    val dir = Files.createTempDirectory("graft-nanos-fixture").toFile
    val ts = Timestamp.valueOf("2024-03-01 12:00:00")
    val nanos = ts.getTime * 1000000L
    Seq((1L, nanos, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir.toString)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select($"ts").as[Timestamp].head() == ts)
    Tables.assertEventsTsSane(spark, dir.toString)
  }

  test("assertEventsTsSane trips on an epoch-compressed decode") {
    val dir = Files.createTempDirectory("graft-bad-fixture").toFile
    // Micros magnitude stored as if it were nanos: decodes to ~1970, the
    // exact failure shape of the round-6 regression.
    Seq((1L, 1700000000000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.assertEventsTsSane(spark, dir.toString)
    }
    assert(e.getMessage.contains("decode sanity failed"))
  }

  test("tripwire passes on all three driver fixture scales") {
    for (sf <- Seq("sf0.001", "sf0.01"))
      Tables.assertEventsTsSane(spark, s"/root/testdata/$sf")
  }
}
