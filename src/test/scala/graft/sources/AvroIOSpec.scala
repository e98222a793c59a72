package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Avro source/sink (E264): exact round trips, self-described schema,
  * sync-marker splittability (the scale property — one big container
  * file must fan out into multiple input splits), and loud failure on
  * an empty source.
  */
class AvroIOSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sfDir)

  test("documents round-trip exactly, with the schema re-derived from " +
      "the writer schema") {
    val dir = Files.createTempDirectory("avro_rt").toString
    AvroIO.write(docs, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema == docs.schema,
      s"schema drifted: ${back.schema} vs ${docs.schema}")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
      "rows did not round-trip exactly")
  }

  test("a single container file splits on sync markers: forced small " +
      "split size fans out without losing or duplicating rows") {
    val dir = Files.createTempDirectory("avro_split").toString
    AvroIO.write(docs.coalesce(1), dir)
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val old = Option(conf.get(key))
    try {
      conf.set(key, (16 * 1024).toString)
      val back = AvroIO.read(spark, dir)
      assert(back.rdd.getNumPartitions > 1,
        s"expected >1 split from a forced 16 KiB split size, got " +
          s"${back.rdd.getNumPartitions}")
      assert(back.count() == docs.count(),
        "sync-split read lost or duplicated rows")
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
        "sync-split read changed row content")
    } finally {
      old.fold(conf.unset(key))(v => conf.set(key, v))
    }
  }

  test("full type surface round-trips: int/long/double/float/boolean/" +
      "binary/string/array, including nulls") {
    val schema = StructType(Seq(
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("b", BooleanType), StructField("bin", BinaryType),
      StructField("s", StringType),
      StructField("arr", ArrayType(LongType, containsNull = false))))
    val rows = Seq(
      Row(1, 2L, 3.5, 4.5f, true, Array[Byte](1, 2, 3), "héllo",
        Seq(1L, 2L, 3L)),
      Row(null, null, null, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = Files.createTempDirectory("avro_types").toString
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema == schema)
    // binary columns defeat exceptAll's value equality (arrays compare
    // by reference pre-Spark-deduction); compare on a digest instead
    def canon(x: org.apache.spark.sql.DataFrame) = x
      .withColumn("bin", md5(coalesce(col("bin"), lit(Array[Byte]()))))
    assert(canon(back).exceptAll(canon(df)).isEmpty &&
      canon(df).exceptAll(canon(back)).isEmpty,
      "typed rows did not round-trip")
  }

  test("timestamps round-trip as timestamp-micros logical type with " +
      "the type re-derived from the writer schema") {
    val orders = graft.Tables.orders(spark, sfDir)
    val dir = Files.createTempDirectory("avro_ts").toString
    AvroIO.write(orders, dir)
    val back = AvroIO.read(spark, dir)
    assert(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.TimestampType,
        org.apache.spark.sql.types.TimestampNTZType)
        .contains(back.schema("o_orderdate").dataType),
      s"timestamp column decayed to ${back.schema("o_orderdate").dataType}")
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty,
      "orders rows (incl. timestamps) did not round-trip exactly")
  }

  test("an empty source directory fails loudly, not as an empty scan") {
    val dir = Files.createTempDirectory("avro_empty").toString
    intercept[IllegalArgumentException] {
      AvroIO.read(spark, dir)
    }
  }

  test("unsupported Spark types refuse at write time with a named error") {
    val df = docs.select(struct(col("doc_id")).as("nested"))
    val e = intercept[IllegalArgumentException] {
      AvroIO.write(df, Files.createTempDirectory("avro_bad").toString)
    }
    assert(e.getMessage.contains("does not map"))
  }
}
