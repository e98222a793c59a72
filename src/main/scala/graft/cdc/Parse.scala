package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Projection-only JSON decode of the CDC envelope (reference R2,
  * `reference/src/mq/kafka.rs:53-55,119-143`).
  *
  * `from_json` with the partial [[CdcSchema.CDC_SCHEMA]] decodes exactly the
  * fields the pipeline inspects; the raw `value` column is carried through
  * untouched next to the parsed fields so the sink can forward the original
  * bytes bit-identically (reference R5, `kafka.rs:80-82`). Everything stays
  * inside whole-stage codegen — no UDFs.
  *
  * Malformed-input divergence (deliberate, SURVEY.md §7.6.5): the reference
  * panics on bad JSON (`kafka.rs:54-55` `.unwrap()`); a 100 TB batch job must
  * not die on one bad record, so the default here is permissive — `from_json`
  * yields nulls, which [[parseErrors]] surfaces as a counted metric — and
  * `strict = true` restores fail-fast semantics.
  */
object Parse {

  /** Decode `value` → (`op`, `db`, `tbl`) columns, keeping `topic`, `key`,
    * and the raw `value` intact. (`tbl` not `table`: avoids the SQL keyword
    * in oracle queries.)
    */
  def parse(raw: DataFrame, strict: Boolean = false): DataFrame = {
    val parsed = raw
      .withColumn("_cdc", from_json(col("value"), CdcSchema.CDC_SCHEMA))
      .select(
        col("topic"), col("key"), col("value"),
        col("_cdc.op").as("op"),
        col("_cdc.source.db").as("db"),
        col("_cdc.source.table").as("tbl"))
    if (strict) {
      // Fail-fast like the reference: raise on the first undecodable record.
      parsed.withColumn("op",
        when(col("op").isNull && col("db").isNull && col("tbl").isNull,
          raise_error(concat(lit("malformed CDC envelope: "), col("value"))))
          .otherwise(col("op")))
    } else parsed
  }

  /** Rows whose envelope failed to decode (all projected fields null). */
  def parseErrors(parsed: DataFrame): DataFrame =
    parsed.filter(col("op").isNull && col("db").isNull && col("tbl").isNull)
}
