package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Binary quantization + Hamming search (E247/E248). Hand-computed
  * 4-dim packs (halves of 2 bits): only strictly-positive components
  * set their bit; Hamming distance counts sign disagreements.
  */
class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._

  test("sign bits pack into the documented two-half layout") {
    val df = Seq(
      (0L, Seq(1.0, -1.0, 0.0, 1.0)),  // h0 = 1 (dim0), h1 = 2 (dim3)
      (1L, Seq(-2.0, 3.0, 4.0, -5.0)), // h0 = 2 (dim1), h1 = 1 (dim2)
      (2L, Seq(0.0, 0.0, 0.0, 0.0)))   // zeros: no bits (0 is not > 0)
      .toDF("id", "vec")
    val out = Similarity.binarySigs(df, 4)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L, 2L), (1L, 2L, 1L), (2L, 0L, 0L)))
  }

  test("Hamming top-k ranks by sign disagreements with id tie-break") {
    // query 0 = (+,+,+,+); id 1 flips one sign, id 2 flips two,
    // id 3 flips all four.
    val df = Seq(
      (0L, Seq(1.0, 1.0, 1.0, 1.0)),
      (1L, Seq(1.0, 1.0, 1.0, -1.0)),
      (2L, Seq(-1.0, 1.0, 1.0, -1.0)),
      (3L, Seq(-1.0, -1.0, -1.0, -1.0)))
      .toDF("id", "vec")
    val out = Similarity.binaryHammingTopK(df, 4, 1, 3)
      .orderBy("rank")
      .select("neighbor_id", "hamming").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L), (2L, 2L), (3L, 4L)))
  }

  test("odd or oversized dims are rejected") {
    val df = Seq((0L, Seq(1.0))).toDF("id", "vec")
    intercept[IllegalArgumentException] { Similarity.binarySigs(df, 3) }
    intercept[IllegalArgumentException] { Similarity.binarySigs(df, 66) }
  }
}
