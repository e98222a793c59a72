package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** File-format source coverage beyond parquet (SURVEY.md §2.2 "file
  * format scans" — the reference reads only Kafka and one YAML file):
  * CSV and JSON-lines round trips with explicit schemas, verified
  * against the parquet-derived oracle. Explicit schemas, never
  * inference — at 100 TB schema inference is an extra full pass over
  * the data before the first real one.
  */
object SourceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CSV scan: nation written as quoted CSV with header, read back
    // with the parquet schema, broadcast-joined to region. Quoting
    // round-trips comment text containing delimiters.
    "rel_nation_csv" -> ((s, dir) => {
      val nat = Tables.nation(s, dir)
      val out = Materialize.once(s"nation_csv:$dir", dir) { p =>
        nat.write.mode("overwrite").option("header", "true").csv(p)
      }
      s.read.schema(nat.schema).option("header", "true").csv(out)
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
    }),

    // JSON-lines scan: documents written as JSON (newlines and quotes
    // in text escape per spec), read back with explicit schema,
    // aggregated per language. Reading JSON with a 3-column schema
    // prunes parsing to those fields — same projection-only-decode
    // idea as the CDC envelope parse (R2).
    "docs_json_scan" -> ((s, dir) => {
      val out = Materialize.once(s"docs_json:$dir", dir) { p =>
        Tables.documents(s, dir).write.mode("overwrite").json(p)
      }
      s.read.schema("doc_id LONG, lang STRING, text STRING").json(out)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("total_chars"))
    }))

  val oracles: Map[String, String] = Map(
    "rel_nation_csv" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin,

    "docs_json_scan" ->
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(length(text)) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin)
}
