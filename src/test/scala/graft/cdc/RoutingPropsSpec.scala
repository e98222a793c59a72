package graft.cdc

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import graft.TestSpark
import graft.cdc.Routing.TransformRule

/** Property-based invariants (SURVEY.md §5.2), run by ScalaCheck's
  * native sbt runner: the routed output is a subset of the input,
  * contains no deletes, and every row's target is exactly what a direct
  * re-implementation of the reference's `search_topic`
  * (`transform.rs:52-65`) computes.
  */
object RoutingPropsSpec extends Properties("Routing") {
  private lazy val spark = TestSpark.spark

  // Each trial runs Spark jobs; 15 well-generated trials beat 100 slow ones.
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(15)

  private val rules = Routing.DefaultRules
  private val compiled = rules.map(r => (r, r.tableRegex.r))

  /** Direct Scala port of the reference's first-match lookup. */
  private def searchTopic(topic: String, db: String, table: String): Option[String] =
    compiled.collectFirst {
      case (r, rx) if r.sourceTopic == topic && r.db == db &&
        rx.findFirstIn(table).isDefined => r.targetTopic
    }

  private val genRow: Gen[(String, String, String, String)] = for {
    topic <- Gen.oneOf("flink-1", "flink-2", "flink-3")
    db <- Gen.oneOf("db_0", "db_1", "db_2", "db_9")
    tbl <- Gen.oneOf(
      Gen.oneOf("table_0", "table_3", "table_5", "table_77", "other",
        "gsms_msg_ticket_sms_12", "gsms_msg_ticket_sms_"),
      Gen.alphaNumStr.map("table_" + _),
      // adversarial regex metacharacters in table names
      Gen.oneOf("table_[0-4]", "table_.*", "ta(ble", "t|able", "table_\\d"))
    op <- Gen.oneOf("c", "u", "d", "r", "x")
  } yield (topic, db, tbl, op)

  property("route = reference search_topic; no deletes; no dup records") =
    Prop.forAllNoShrink(Gen.listOfN(60, genRow)) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((t, d, tb, op), i) => (t, s"k$i", s"v$i", op, d, tb) }
        .toDF("topic", "key", "value", "op", "db", "tbl")
      val routed = Filter.dropDeletes(df)
        .withColumn("target_topic",
          Routing.targetExpr(rules, col("topic"), col("db"), col("tbl")))
        .filter(col("target_topic").isNotNull)
        .select("key", "value", "target_topic")
        .as[(String, String, String)].collect()

      val expected = rows.zipWithIndex.flatMap { case ((t, d, tb, op), i) =>
        if (op == "d") None
        else searchTopic(t, d, tb).map(target => (s"k$i", s"v$i", target))
      }.toSet

      routed.toSet == expected && routed.length == expected.size
    }

  property("targetViaJoin = targetExpr") =
    Prop.forAllNoShrink(Gen.listOfN(40, genRow)) { rows =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((t, d, tb, op), i) => (t, s"k${i % 7}", s"v$i", op, d, tb) } // shared keys
        .toDF("topic", "key", "value", "op", "db", "tbl")
      val viaExpr = df
        .withColumn("target_topic",
          Routing.targetExpr(rules, col("topic"), col("db"), col("tbl")))
        .filter(col("target_topic").isNotNull)
        .select("value", "target_topic").as[(String, String)].collect().toSet
      val viaJoin = Routing.targetViaJoin(spark, df, rules)
        .select("value", "target_topic").as[(String, String)].collect().toSet
      viaJoin == viaExpr
    }
}
