package graft.cdc

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CDC schema-drift audit (E298): planted drift is detected with the
  * exact key sets, version counts, and mod-13 first-seen ids.
  */
class DriftSpec extends SparkSpec {

  private lazy val drift = graft.queries.CdcQueries
    .queries("cdc_schema_drift")(spark, sfDir).localCheckpoint(false)

  test("the two planted schema versions appear with exact key sets, " +
      "and drift reaches most tables") {
    val keysets = drift.select("keyset").distinct()
      .collect().map(_.getString(0)).toSet
    assert(keysets === Set("id,value_cents", "id,promo_cents,value_cents"),
      keysets.toString)
    // the mod-13 plant is not guaranteed to hit every (db, tbl) cell,
    // but must hit most of the 30 — and never more than twice
    val over = drift.filter(col("n_versions") > 2)
    assert(over.isEmpty, "a table shows more than the two planted versions")
    val drifted = drift.filter(col("n_versions") === 2)
      .select("db", "tbl").distinct().count()
    assert(drifted >= 20, s"drift reached only $drifted of 30 tables")
  }

  test("record mass is conserved and drifted rows sit on the plant") {
    val total = drift.agg(sum("n_records")).collect()(0).getLong(0)
    val n = Envelopes.fromEvents(spark, sfDir).count()
    assert(total === n, s"census covers $total of $n envelopes")
    val driftedFirst = drift.filter(col("keyset").contains("promo_cents"))
      .filter(col("first_id") % 13 =!= 0)
    assert(driftedFirst.isEmpty, "a drifted version's first id is off-plant")
  }
}
