package graft.cdc

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Debezium-over-Avro input lane (E315) — the SECOND wire format a
  * real CDC consumer meets: Kafka Connect's AvroConverter frames every
  * message in the Confluent wire format (public spec:
  * `magic byte 0x00 ‖ 4-byte big-endian schema id ‖ Avro binary body`)
  * instead of JSON text. The reference is JSON-only
  * (`kafka.rs:119-153`); this lane is an engine extension that reuses
  * the R2→R5 pipeline unchanged downstream — decode swaps in for
  * [[Parse.parse]], then the identical filter/route/forward tail runs
  * ([[Pipeline.routeParsed]]).
  *
  * No broker or Schema Registry exists in this container, so the
  * "registry" is an immutable id→schema map and the fixture encodes
  * the SAME deterministic envelopes [[Envelopes.fromEvents]] derives —
  * which is exactly what closes the gate loop: the DuckDB oracle
  * rebuilds the expected fields from `events.parquet` with pure SQL
  * (it holds no Avro codec), so `cdc_parse_avro` hashing green proves
  * the Spark side's REAL Avro encode→decode round trip recovered
  * every field (Avro binary encoding is deterministic by spec: schema-
  * ordered fields, zigzag varints — no map ordering or float
  * formatting to reconcile).
  *
  * Malformed-preamble contract (the R2 junk-row discipline): a null /
  * too-short value, wrong magic byte, UNKNOWN schema id, or a body
  * that fails Avro decoding yields NULL envelope fields — corrupt
  * records survive as unroutable rows (silently dropped by R4, like
  * JSON junk), never as a crashed stream. ConfluentAvroSpec pins each
  * branch.
  *
  * Scale shape: encode and decode are per-partition iterator maps
  * (decoder/writer instantiated once per partition, records streamed)
  * — narrow stages with the scan's parallelism, no shuffle, no
  * driver involvement.
  */
object ConfluentAvro {

  /** The one registered schema id (a real registry assigns these;
    * the wire format only needs the mapping to be shared).
    */
  val SchemaId = 7

  /** Debezium-shaped envelope schema: nullable before/after rows,
    * op, source{db, table}.
    */
  val EnvelopeSchemaJson: String =
    """{"type":"record","name":"Envelope","namespace":"graft.cdc","fields":[
      |  {"name":"before","type":["null",{"type":"record","name":"Row","fields":[
      |    {"name":"id","type":"long"},
      |    {"name":"value_cents","type":"long"}]}],"default":null},
      |  {"name":"after","type":["null","Row"],"default":null},
      |  {"name":"op","type":"string"},
      |  {"name":"source","type":{"type":"record","name":"Source","fields":[
      |    {"name":"db","type":"string"},
      |    {"name":"table","type":"string"}]}}
      |]}""".stripMargin

  /** The immutable stand-in for the Schema Registry's id→schema map. */
  val Registry: Map[Int, String] = Map(SchemaId -> EnvelopeSchemaJson)

  /** Frame one encoded Avro body in the Confluent wire format. */
  private def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + body.length)
    out(0) = 0 // magic
    out(1) = ((schemaId >> 24) & 0xff).toByte
    out(2) = ((schemaId >> 16) & 0xff).toByte
    out(3) = ((schemaId >> 8) & 0xff).toByte
    out(4) = (schemaId & 0xff).toByte
    System.arraycopy(body, 0, out, 5, body.length)
    out
  }

  /** `(topic, key, value: binary)` Confluent-framed Avro records,
    * carrying the SAME deterministic envelope content as
    * [[Envelopes.fromEvents]]'s JSON strings — one fixture truth, two
    * wire formats.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val src = graft.Tables.events(spark, sfDir).select(
      concat(lit("flink-"), ((col("event_id") % 2) + 1).cast("string"))
        .as("topic"),
      col("event_id").cast("string").as("key"),
      col("event_id").as("id"),
      floor(col("value") * 100).cast("long").as("value_cents"),
      Envelopes.opExpr(col("event_type")).as("op"),
      concat(lit("db_"), (col("user_id") % 3).cast("string")).as("db"),
      concat(lit("table_"), (col("event_id") % 10).cast("string")).as("tbl"))
      .as[(String, String, Long, Long, String, String, String)]
    src.mapPartitions { it =>
      val schema = new Schema.Parser().parse(EnvelopeSchemaJson)
      val rowSchema = schema.getField("after").schema().getTypes.get(1)
      val srcSchema = schema.getField("source").schema()
      val writer = new GenericDatumWriter[GenericRecord](schema)
      it.map { case (topic, key, id, cents, op, db, tbl) =>
        val after = new GenericData.Record(rowSchema)
        after.put("id", id)
        after.put("value_cents", cents)
        val source = new GenericData.Record(srcSchema)
        source.put("db", db)
        source.put("table", tbl)
        val rec = new GenericData.Record(schema)
        rec.put("before", null)
        rec.put("after", after)
        rec.put("op", op)
        rec.put("source", source)
        val bos = new java.io.ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(bos, null)
        writer.write(rec, enc)
        enc.flush()
        (topic, key, frame(SchemaId, bos.toByteArray))
      }
    }.toDF("topic", "key", "value")
  }

  /** Decode a Confluent-framed stream `(topic, key, value: binary)` →
    * `(topic, key, value, op, db, tbl, id, value_cents)` — the
    * [[Parse.parse]] analogue for the Avro wire. NULL envelope fields
    * on any malformed preamble or body (see object doc); the raw
    * bytes ride along untouched for the R5 passthrough.
    */
  def decode(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(col("topic"), col("key"), col("value"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        val readers = Registry.map { case (id, js) =>
          id -> new GenericDatumReader[GenericRecord](
            new Schema.Parser().parse(js))
        }
        it.map { case (topic, key, v) =>
          val dec: Option[GenericRecord] =
            if (v == null || v.length < 6 || v(0) != 0) None
            else {
              val id = ((v(1) & 0xff) << 24) | ((v(2) & 0xff) << 16) |
                ((v(3) & 0xff) << 8) | (v(4) & 0xff)
              readers.get(id).flatMap { rd =>
                try {
                  val d = DecoderFactory.get()
                    .binaryDecoder(v, 5, v.length - 5, null)
                  val rec = rd.read(null, d)
                  // a body shorter than the schema demands throws;
                  // TRAILING bytes mean the frame lies about its
                  // schema — refuse those too (strict, like R2)
                  if (d.isEnd) Some(rec) else None
                } catch { case scala.util.control.NonFatal(_) => None }
              }
            }
          def str(r: GenericRecord, f: String): String = {
            val x = r.get(f); if (x == null) null else x.toString
          }
          val op = dec.map(_.get("op").toString).orNull
          val srcRec = dec.map(_.get("source").asInstanceOf[GenericRecord])
          val afterRec = dec.flatMap(r =>
            Option(r.get("after")).map(_.asInstanceOf[GenericRecord]))
          (topic, key, v, op,
            srcRec.map(str(_, "db")).orNull,
            srcRec.map(str(_, "table")).orNull,
            afterRec.map(_.get("id").asInstanceOf[java.lang.Long]).orNull,
            afterRec.map(_.get("value_cents").asInstanceOf[java.lang.Long])
              .orNull)
        }
      }
      .toDF("topic", "key", "value", "op", "db", "tbl", "id", "value_cents")
  }
}
