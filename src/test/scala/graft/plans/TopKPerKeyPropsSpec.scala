package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark

/** Property-based invariant for the custom top-k operator: on arbitrary
  * (key, value, tiebreak) data — duplicate keys, duplicate values,
  * skewed key distributions, any k — the operator's output multiset
  * equals the row_number window formulation's, exactly. The tiebreak
  * column keeps the ordering total so both formulations are
  * deterministic and comparable.
  */
object TopKPerKeyPropsSpec extends Properties("TopKPerKey") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private val genRows: Gen[List[(Int, Int)]] = for {
    n <- Gen.chooseNum(0, 60)
    rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(0, 9)))
  } yield rows

  property("output multiset equals the window formulation for any data and k") =
    Prop.forAllNoShrink(genRows, Gen.chooseNum(1, 5)) { (rows, k) =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((key, v), i) => (key, v, i) }
        .toDF("k", "v", "tie")
        .repartition(4)
      val got = TopKPerKey(df, Seq("k"), Seq("v" -> false, "tie" -> true), k)
        .as[(Int, Int, Int)].collect().toSeq.sorted
      // Expected computed LOCALLY (plain Scala): the windowed DataFrame
      // comparator would itself be rewritten to the operator by
      // RewriteRowNumberTopK (installed session-wide at first use), and
      // an operator-vs-itself comparison proves nothing.
      val expect = rows.zipWithIndex
        .map { case ((key, v), i) => (key, v, i) }
        .groupBy(_._1).values.flatMap(g =>
          g.sortBy { case (_, v, tie) => (-v, tie) }.take(k))
        .toSeq.sorted
      got == expect
    }
}
