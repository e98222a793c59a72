package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming schema-drift watchdog (E303): emits exactly the batch
  * audit's first-sighting rows on the fixture, and re-announces
  * nothing on replayed or repeated key sets.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def withRocks[A](body: => A): A = {
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
  }

  test("stream emits exactly the batch audit's first sightings") {
    withRocks {
      val batch = graft.queries.CdcQueries
        .queries("cdc_schema_drift")(spark, sfDir)
        .select(concat_ws("|", col("db"), col("tbl")).as("k"),
          col("first_id"), col("keyset"))
        .as[(String, Long, String)].collect().toSet
      // contract feed: (table key, record id, keyset) in id order
      val feed = graft.queries.CdcQueries.schemaDriftParsed(spark, sfDir)
        .select(concat_ws("|", col("db"), col("tbl")).as("k"),
          col("kid"), col("keyset"))
        .as[(String, Long, String)].collect().sortBy(_._2).toSeq
      val stream = MemoryStream[(String, Long, String)]
      val out = StreamingPipeline.schemaDrift(spark, stream.toDS())
      val q = out.writeStream.format("memory")
        .queryName("driftw").outputMode("update").start()
      try {
        val (a, b) = feed.splitAt(feed.length / 2)
        stream.addData(a.toIndexedSeq); q.processAllAvailable()
        stream.addData(b.toIndexedSeq); q.processAllAvailable()
        // wholesale replay of the first chunk: nothing new may emit
        stream.addData(a.toIndexedSeq); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.table("driftw")
        .as[(String, Long, String)].collect().toSet
      assert(streamed === batch,
        s"only-stream=${streamed -- batch}, only-batch=${batch -- streamed}")
    }
  }
}
