package graft.cdc

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** E315: the Confluent-Avro CDC lane. The real Avro encode→decode
  * round trip must agree field-for-field with the JSON lane over the
  * same fixture truth, and every malformed-preamble branch must yield
  * null envelope fields (unroutable, not a crash).
  */
class ConfluentAvroSpec extends SparkSpec {
  import spark.implicits._

  test("Avro round trip agrees with the JSON lane field-for-field") {
    val avro = ConfluentAvro.decode(ConfluentAvro.fromEvents(spark, sfDir))
      .select("topic", "key", "op", "db", "tbl")
    val json = Parse.parse(Envelopes.fromEvents(spark, sfDir))
      .select("topic", "key", "op", "db", "tbl")
    assert(avro.count() === json.count())
    assert(avro.except(json).isEmpty && json.except(avro).isEmpty,
      "the two wire formats decoded to different envelopes")
  }

  test("decoded ids and cents match the source events exactly") {
    val dec = ConfluentAvro.decode(ConfluentAvro.fromEvents(spark, sfDir))
      .select(col("id"), col("value_cents"))
    val want = graft.Tables.events(spark, sfDir)
      .select(col("event_id").as("id"),
        floor(col("value") * 100).cast("long").as("value_cents"))
    assert(dec.except(want).isEmpty && want.except(dec).isEmpty)
  }

  test("every malformed-preamble branch yields null fields, not a crash") {
    val good = ConfluentAvro.fromEvents(spark, sfDir)
      .head().getAs[Array[Byte]]("value")
    val wrongMagic = good.clone(); wrongMagic(0) = 1
    val unknownId = good.clone(); unknownId(4) = 99 // id 7 → id ...99
    val truncated = good.take(7) // frame ok, body cut mid-record
    val trailing = good ++ Array[Byte](1, 2, 3) // bytes after the record
    val cases = Seq(
      ("wrong-magic", wrongMagic),
      ("unknown-id", unknownId),
      ("truncated", truncated),
      ("trailing", trailing),
      ("too-short", Array[Byte](0, 0, 0)),
      ("null", null: Array[Byte]))
    val out = cases.map { case (k, v) => ("t", k, v) }
      .toDF("topic", "key", "value")
    val dec = ConfluentAvro.decode(out).collect()
    assert(dec.length === cases.length)
    dec.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("op")) &&
        r.isNullAt(r.fieldIndex("db")) && r.isNullAt(r.fieldIndex("tbl")),
        s"malformed case '${r.getString(1)}' decoded to non-null fields")
    }
    // and the good frame still decodes (the guard is not over-strict)
    val ok = ConfluentAvro.decode(
      Seq(("t", "ok", good)).toDF("topic", "key", "value")).head()
    assert(!ok.isNullAt(ok.fieldIndex("op")))
  }

  test("malformed frames are unroutable: the route tail drops them " +
      "silently (R4 semantics), good frames route") {
    val good = ConfluentAvro.fromEvents(spark, sfDir).limit(20)
    val junk = Seq(("flink-1", "junk", Array[Byte](9, 9))).toDF(
      "topic", "key", "value")
    val routed = Pipeline.routeParsed(
      ConfluentAvro.decode(good.unionByName(junk)),
      keep = Seq("key", "op", "db", "tbl"))
    assert(routed.filter(col("key") === "junk").isEmpty,
      "a malformed frame survived routing")
  }
}
