package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_product is callable from SQL after runtime registration") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .as[Double].collect().head
    assert(out == 32.0)
  }

  test("dot_product rejects wrong arity with a clear message") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT dot_product(array(1.0d))").collect()
    }
    assert(ex.getMessage.contains("2 arguments"))
  }

  test("dot_product type-checks its inputs") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT dot_product('a', 'b')").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("array<double>"))
  }

  test("simhash60 and minhash_bands are callable from SQL") {
    GraftFunctions.register(spark)
    val sh = spark.sql("SELECT simhash60('the quick brown fox') AS s")
      .as[Long].collect().head
    val shCol = Seq("the quick brown fox").toDF("t")
      .select(SimHash60(org.apache.spark.sql.functions.col("t")))
      .as[Long].collect().head
    assert(sh == shCol && sh >= 0 && sh < (1L << 60))

    val bands = spark.sql(
      "SELECT minhash_bands('the quick brown fox jumps', 3, true) AS b")
      .as[Seq[String]].collect().head
    assert(bands.length == graft.ext.Dedup.NumBands)
  }

  test("minhash_bands requires literal parameters") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql(
        "SELECT minhash_bands('x', n, true) FROM (SELECT 3 AS n)").collect()
    }
    assert(ex.getMessage.contains("literal"))
  }
}
