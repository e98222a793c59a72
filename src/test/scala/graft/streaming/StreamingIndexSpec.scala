package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.{AnnIndex, Similarity}

/** Streaming ANN-index maintenance (E272): foreachBatch appends each
  * micro-batch under the index-is-its-own-ledger idempotence rule —
  * replays skip, fresh batches append, partial overlap refuses.
  */
class StreamingIndexSpec extends SparkSpec {
  import spark.implicits._
  private implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  test("micro-batches append once; a replayed batch is skipped; " +
      "partial overlap refuses") {
    val dir = Files.createTempDirectory("annidx_stream").toString
    // base index on ids % 7 != 3; the held-out slice streams in
    AnnIndex.build(corpus.filter(col("id") % 7 =!= 3), 16, 4, dir)
    val baseN = AnnIndex.load(spark, dir).codes.count()

    val incoming = corpus.filter(col("id") % 7 === 3)
      .select(col("id"), col("vec")).as[(Long, Seq[Double])]
      .collect().toSeq
    val (b1, b2) = incoming.splitAt(incoming.size / 2)

    val stream = MemoryStream[(Long, Seq[Double])]
    val q = stream.toDF().toDF("id", "vec").writeStream
      .foreachBatch(StreamingPipeline.indexAppendSink(dir))
      .start()
    try {
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()
    } finally q.stop()

    val idx = AnnIndex.load(spark, dir)
    assert(idx.codes.count() == baseN + incoming.size,
      "streamed batches must all be indexed exactly once")

    // replay batch 1 wholesale (at-least-once redelivery): skipped
    val replay = b1.toDF("id", "vec")
    StreamingPipeline.indexAppendSink(dir)(replay, 0L)
    assert(AnnIndex.load(spark, dir).codes.count() == baseN + incoming.size,
      "a replayed batch must not change the index")

    // partial overlap (half replayed, half unseen id): refuses loudly
    val unseenId = corpus.agg(max(col("id")).cast("long"))
      .head().getLong(0) + 1000
    val torn = (b1.take(1) :+ ((unseenId, b1.head._2))).toDF("id", "vec")
    val e = intercept[IllegalArgumentException] {
      StreamingPipeline.indexAppendSink(dir)(torn, 1L)
    }
    assert(e.getMessage.contains("torn"))
  }
}
