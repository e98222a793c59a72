package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Luhn checksum (E281) against PUBLIC textbook vectors — independent
  * of the gate row's shared formula, so a sign error in the doubling
  * parity cannot pass both.
  */
class LuhnSpec extends SparkSpec {
  import spark.implicits._

  private def validity(nums: Seq[String]): Map[String, Boolean] =
    nums.toDF("d")
      .select(col("d"), Curation.luhnValid(col("d")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

  test("textbook vectors validate and their perturbations refuse") {
    val v = validity(Seq(
      "4111111111111111", // the canonical Visa test number
      "79927398713",      // the Wikipedia worked example
      "4539578763621486", // a standard generator vector
      "4111111111111112", // last digit off by one
      "79927398710",      // wrong check digit
      "1234567812345678"))
    assert(v("4111111111111111") && v("79927398713") &&
      v("4539578763621486"), s"valid vectors rejected: $v")
    assert(!v("4111111111111112") && !v("79927398710") &&
      !v("1234567812345678"), s"invalid vectors accepted: $v")
  }

  test("the computed check digit always completes a valid number") {
    val out = Seq("402400714565346", "51937802836140", "123456781234567")
      .toDF("pre")
      .select(concat(col("pre"),
        Curation.luhnCheckDigit(col("pre")).cast("string")).as("full"))
      .select(Curation.luhnValid(col("full")))
      .collect().map(_.getBoolean(0))
    assert(out.forall(identity), "check digit did not complete validity")
  }
}
