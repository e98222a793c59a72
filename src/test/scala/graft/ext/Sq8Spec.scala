package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** int8 scalar quantization (E294/E295): hand-checked code values,
  * integer bounds, zero-norm safety, and partition invariance of the
  * search.
  */
class Sq8Spec extends SparkSpec {
  import spark.implicits._

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  test("hand vectors quantize as defined: floor(x/||v||*127 + 0.5)") {
    val df = Seq(
      (1L, Seq(3.0, 4.0)),
      (2L, Seq(0.0, 0.0)),
      (3L, Seq(-1.0, 0.0))).toDF("id", "vec")
    val got = Similarity.sq8Codes(df).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) === Seq(76.0, 102.0)) // floor(76.2+.5), floor(101.6+.5)
    assert(got(2L) === Seq(0.0, 0.0), "zero norm must map to zeros")
    assert(got(3L) === Seq(-127.0, 0.0))
  }

  test("fixture codes are integers within [-127, 127]") {
    val bad = Similarity.sq8Codes(corpus)
      .select(explode(col("q8")).as("q"))
      .filter(col("q") =!= floor(col("q")) ||
        col("q") > 127.0 || col("q") < -127.0)
    assert(bad.isEmpty, "a code escaped the int8 range or integrality")
  }

  test("search is partition-invariant and rank-ordered on exact " +
      "integer scores") {
    val a = Similarity.sq8TopK(corpus, 10, 5)
    val b = Similarity.sq8TopK(corpus.repartition(7), 10, 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "result changed under a different partitioning")
    val inv = a.alias("x").join(a.alias("y"),
      col("x.query_id") === col("y.query_id") &&
        col("x.rank") < col("y.rank") && col("x.dot_q") < col("y.dot_q"))
    assert(inv.isEmpty, "dot_q increased with rank")
  }
}
