package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra-Gries shard-merge algebra (E289): the merged sketch respects
  * capacity, the superset/undercount/never-overcount guarantees hold
  * under every sharding, a capacity ≥ cardinality sketch degenerates
  * to exact counts, and a planted heavy hitter survives adversarial
  * sharding.
  */
class MgMergeSpec extends SparkSpec {
  import Sketches._

  private val Cap = 4

  private def docs = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("lang"))

  private def mergedUnder(mod: Int, cap: Int): DataFrame = {
    val shards = docs
      .groupBy(pmod(col("doc_id"), lit(mod.toLong)).as("shard"))
      .agg(mgCounts(col("lang"), cap).as("entries"))
    mgMergeEntries(
      shards.select(explode(col("entries")).as("e"))
        .select(col("e.item").as("item"), col("e.cnt").as("cnt")), cap)
  }

  private lazy val exact =
    docs.groupBy(col("lang").as("item")).agg(count(lit(1)).as("tru"))
      .localCheckpoint(false)

  test("merged sketch holds at most capacity items; lossiness is " +
      "structural on the 5-language fixture") {
    val m = mergedUnder(3, Cap)
    assert(m.count() <= Cap, "merged sketch exceeded capacity")
    assert(exact.count() > Cap,
      "fixture cardinality must exceed capacity or the test is vacuous")
  }

  test("guarantees hold under mod-2/3/7 shardings: heavy items survive, " +
      "no overcount, undercount within n/(cap+1)") {
    val n = docs.count()
    for (mod <- Seq(2, 3, 7)) {
      val m = mergedUnder(mod, Cap)
      val j = exact.join(m, Seq("item"), "left").localCheckpoint(false)
      val heavyMissing = j.filter(col("tru") * (Cap + 1) > n &&
        col("cnt").isNull)
      assert(heavyMissing.isEmpty, s"mod $mod: a heavy hitter vanished")
      val over = j.filter(col("cnt").isNotNull && col("cnt") > col("tru"))
      assert(over.isEmpty, s"mod $mod: the sketch overcounted")
      val under = j.filter(col("cnt").isNotNull &&
        (col("tru") - col("cnt")) * (Cap + 1) > n)
      assert(under.isEmpty, s"mod $mod: undercount exceeded n/(cap+1)")
    }
  }

  test("capacity >= cardinality degenerates to exact counts under any " +
      "sharding (no decrement ever fires, merge sums exactly)") {
    for (mod <- Seq(1, 3)) {
      val m = mergedUnder(mod, 8) // 8 >= 5 fixture languages
      val diff = exact.join(m, Seq("item"), "full")
        .filter(col("tru").isNull || col("cnt").isNull ||
          col("tru") =!= col("cnt"))
      assert(diff.isEmpty, s"mod $mod: cap >= cardinality was not exact")
    }
  }

  test("planted heavy hitter survives an adversarial sharding") {
    import spark.implicits._
    // 12 of 20 rows are 'a' (> n/(cap+1) = 20/3 with cap 2); the rest
    // spread over 4 distractors that churn the 2-slot sketch.
    val rows = (0 until 12).map(i => (i.toLong, "a")) ++
      Seq((12L, "b"), (13L, "c"), (14L, "d"), (15L, "e"),
        (16L, "b"), (17L, "c"), (18L, "d"), (19L, "e"))
    val df = rows.toDF("doc_id", "item")
    for (mod <- Seq(2, 5)) {
      val shards = df
        .groupBy(pmod(col("doc_id"), lit(mod.toLong)).as("shard"))
        .agg(mgCounts(col("item"), 2).as("entries"))
      val m = mgMergeEntries(
        shards.select(explode(col("entries")).as("e"))
          .select(col("e.item").as("item"), col("e.cnt").as("cnt")), 2)
      assert(m.filter(col("item") === "a").count() === 1,
        s"mod $mod: the planted heavy hitter fell out")
      val est = m.filter(col("item") === "a")
        .collect()(0).getAs[Long]("cnt")
      assert(est <= 12 && (12 - est) * 3 <= 20,
        s"mod $mod: estimate $est outside the MG bounds")
    }
  }
}
