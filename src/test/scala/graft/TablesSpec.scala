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

  test("full fixture contract passes on the driver fixtures") {
    Tables.assertFixtureContract(spark, "/root/testdata/sf0.001")
  }

  /** A minimal valid fixture dir the contract accepts; each corruption
    * test mutates one table and expects the matching named failure. */
  private def miniFixture(): String = {
    val dir = Files.createTempDirectory("graft-contract").toString
    Seq((1L, Timestamp.valueOf("2024-02-01 10:00:00"), 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq((10L, Timestamp.valueOf("1996-04-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((100L, Timestamp.valueOf("1996-06-01 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 5), (2L, 50))
      .toDF("p_partkey", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((0L, "alpha"), (1L, "beta"), (2L, "gamma"))
      .toDF("doc_id", "text")
      .coalesce(1).sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((0L, Array(0.1f, 0.2f)), (1L, Array(0.3f, 0.4f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("contract trips on each planted fixture violation, by name") {
    Tables.assertFixtureContract(spark, miniFixture()) // baseline valid

    val shifted = miniFixture()
    Seq((10L, Timestamp.valueOf("2024-04-01 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$shifted/orders.parquet")
    val e1 = intercept[IllegalArgumentException] {
      Tables.assertFixtureContract(spark, shifted)
    }
    assert(e1.getMessage.contains("o_orderdate sanity"))

    val shipShifted = miniFixture()
    Seq((100L, Timestamp.valueOf("2024-06-01 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$shipShifted/lineitem.parquet")
    val eShip = intercept[IllegalArgumentException] {
      Tables.assertFixtureContract(spark, shipShifted)
    }
    assert(eShip.getMessage.contains("l_shipdate sanity"))

    val bigSizes = miniFixture()
    Seq((1L, 1000), (2L, 5000))
      .toDF("p_partkey", "p_size")
      .write.mode("overwrite").parquet(s"$bigSizes/part.parquet")
    val eSize = intercept[IllegalArgumentException] {
      Tables.assertFixtureContract(spark, bigSizes)
    }
    assert(eSize.getMessage.contains("p_size sanity"))

    val shuffled = miniFixture()
    Seq((2L, "gamma"), (0L, "alpha"), (1L, "beta"))
      .toDF("doc_id", "text")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$shuffled/documents.parquet")
    val e2 = intercept[IllegalArgumentException] {
      Tables.assertFixtureContract(spark, shuffled)
    }
    assert(e2.getMessage.contains("physical-order sanity"))

    val dupIds = miniFixture()
    Seq((0L, "alpha"), (0L, "beta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dupIds/documents.parquet")
    val e3 = intercept[IllegalArgumentException] {
      Tables.assertFixtureContract(spark, dupIds)
    }
    assert(e3.getMessage.contains("doc_id sanity"))

    val raggedDims = miniFixture()
    Seq((0L, Array(0.1f, 0.2f)), (1L, Array(0.3f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$raggedDims/embeddings.parquet")
    val e4 = intercept[IllegalArgumentException] {
      Tables.assertFixtureContract(spark, raggedDims)
    }
    assert(e4.getMessage.contains("dimension sanity"))
  }
}
