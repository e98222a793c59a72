package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative MERGE INTO (E278) — the lakehouse upsert primitive
  * (Delta/Iceberg `MERGE`) re-expressed as ONE full-outer join, the
  * plan shape that scales: both sides shuffle on the key once, no
  * second pass per clause. Semantics (mirroring SQL MERGE):
  *
  *   WHEN MATCHED AND delete-flag  THEN DELETE
  *   WHEN MATCHED                  THEN UPDATE (source row wins)
  *   WHEN NOT MATCHED BY SOURCE    THEN keep the target row
  *   WHEN NOT MATCHED [BY TARGET]  THEN INSERT (unless flagged a
  *                                 delete — deleting an absent key is
  *                                 an idempotent no-op, not an error)
  *
  * The Delta engine's cardinality rule is enforced here too: a source
  * key matching multiple source rows makes the update ambiguous and
  * REFUSES loudly instead of picking one (the
  * "multiple source rows matched" error class).
  *
  * The gate row's oracle deliberately uses the OTHER formulation —
  * a three-branch kept/updated/inserted UNION — so the check compares
  * two independent derivations of MERGE, not one transcription.
  */
object MergeInto {

  /** `source` carries `target`'s columns plus a boolean `deleteCol`.
    * Output has exactly `target`'s schema.
    */
  def apply(target: DataFrame, source: DataFrame, key: String,
      deleteCol: String): DataFrame = {
    val dup = source.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    require(dup == 0,
      s"$dup source keys match multiple source rows — MERGE requires " +
        "a unique source key (the update would be ambiguous)")
    val joined = target.alias("t")
      .join(source.alias("s"), col(s"t.$key") === col(s"s.$key"),
        "full_outer")
    val sPresent = col(s"s.$key").isNotNull
    joined.filter(!(sPresent && col(s"s.$deleteCol")))
      .select(target.columns.toIndexedSeq.map(c =>
        when(sPresent, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }
}
