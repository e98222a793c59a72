package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Curation

/** One-pass Poisson bootstrap (E292): weight law sanity, partition
  * invariance of the deterministic weights, real resampling variation
  * across replicates, and CI bracketing on the fixture.
  */
class BootstrapSpec extends SparkSpec {

  private lazy val docs = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("n_chars")).localCheckpoint(false)

  private def weights(df: org.apache.spark.sql.DataFrame) = {
    val reps = spark.range(0, 40).select(col("id").as("b"))
    df.crossJoin(broadcast(reps))
      .select(col("b"), col("doc_id"),
        Curation.bootstrapWeight(col("doc_id"), col("b"), "boot:").as("w"))
  }

  test("weights follow Poisson(1) closely: bounded, mean within 5% " +
      "of 1, zero-fraction within 5% of 1/e") {
    val w = weights(docs).localCheckpoint(false)
    val n = w.count().toDouble
    assert(w.filter(col("w") < 0 || col("w") > 9).isEmpty)
    val mean = w.agg(sum("w")).collect()(0).getLong(0) / n
    assert(math.abs(mean - 1.0) < 0.05, s"mean weight $mean")
    val zf = w.filter(col("w") === 0).count() / n
    assert(math.abs(zf - math.exp(-1)) < 0.05, s"zero fraction $zf")
  }

  test("weights are partition-invariant (same rows under " +
      "repartition(7))") {
    val a = weights(docs)
    val b = weights(docs.repartition(7))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "weights changed under a different partitioning")
  }

  test("replicates actually vary: n_eff differs from N and across b") {
    val reps = CurationQueries.queries("docs_bootstrap_reps")(spark, sfDir)
      .localCheckpoint(false)
    val n = docs.count()
    assert(reps.count() === 40L)
    assert(reps.filter(col("n_eff") =!= n).count() > 0,
      "every replicate matched N exactly — weights look degenerate")
    assert(reps.select(col("n_eff")).distinct().count() > 1,
      "all replicates identical — no resampling variation")
  }

  test("stratified CIs: every source gets a well-formed interval and " +
      "most bracket their stratum mean") {
    val r = CurationQueries.queries("docs_bootstrap_by_source")(spark, sfDir)
      .localCheckpoint(false)
    assert(r.count() === 20, "a source stratum went missing")
    val malformed = r.filter(col("ci_lo").isNull || col("ci_hi").isNull ||
      col("ci_lo") >= col("ci_hi"))
    assert(malformed.isEmpty, "a stratum produced a degenerate CI")
    val bracketing = r.filter(col("ci_lo") <= col("mean_chars") &&
      col("mean_chars") <= col("ci_hi")).count()
    assert(bracketing >= 15,
      s"only $bracketing/20 stratified CIs bracket their means")
  }

  test("the CI brackets the point estimate on the fixture") {
    val r = CurationQueries.queries("docs_bootstrap_ci")(spark, sfDir)
      .collect()(0)
    val (m, lo, hi) = (r.getAs[Double]("mean_chars"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < hi, s"degenerate CI [$lo, $hi]")
    assert(lo <= m && m <= hi, s"point $m outside CI [$lo, $hi]")
  }
}
