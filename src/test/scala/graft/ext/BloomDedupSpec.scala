package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every member key probes true") {
    val seen = (1 to 500).map(i => s"doc-$i").toDF("t")
    val bloom = BloomDedup.corpusBloom(seen, col("t"), 500L)
    val flagged = seen
      .select(BloomDedup.mightContain(bloom.select("bf").scalar(), col("t"))
        .as("f"))
      .agg(bool_and(col("f"))).as[Boolean].head()
    assert(flagged, "a Bloom filter must never miss a member")
  }

  test("definitely-new detection: disjoint keys mostly probe false") {
    val seen = (1 to 500).map(i => s"doc-$i").toDF("t")
    val probe = (1 to 500).map(i => s"other-$i").toDF("t")
    val bloom = BloomDedup.corpusBloom(seen, col("t"), 500L)
    val fp = probe
      .select(BloomDedup.mightContain(bloom.select("bf").scalar(), col("t"))
        .as("f"))
      .filter(col("f")).count()
    // 10 bits/item designs for ~1%; allow 5x headroom (deterministic
    // per seed, so this is a regression pin, not a flaky bound).
    assert(fp <= 25, s"false-positive sliver too large: $fp/500")
  }

  test("the bloom build is an aggregate and the probe plan carries no " +
    "join for the prefilter decision") {
    // The probe side must be scan → project(might_contain) — the whole
    // point is that "definitely new" costs no shuffle. The bloom
    // arrives via a scalar subquery, not a join.
    val docs = Tables.documents(spark, sfDir)
    val seen = docs.filter(col("doc_id") % 5 =!= 4)
    val bloom = BloomDedup.corpusBloom(seen, col("text"), 400L)
    val probed = docs.filter(col("doc_id") % 5 === 4)
      .select(col("doc_id"),
        BloomDedup.mightContain(bloom.select("bf").scalar(), col("text"))
          .as("flagged"))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      s"bloom is not fed through a scalar subquery:\n$plan")
    assert(!plan.split("Subquery")(0).contains("Exchange"),
      s"probe stage shuffles before the prefilter decision:\n$plan")
    assert(probed.count() > 0)
  }

  test("verdict row is internally consistent on the fixture corpus") {
    val row = BloomDedup.prefilterVerdict(Tables.documents(spark, sfDir),
      col("text"), col("doc_id") % 5 === 4)
      .as[(Long, Long, Boolean, Boolean)].head()
    val (nIncoming, nTrueDups, noFn, fpOk) = row
    assert(nIncoming > 0 && nTrueDups >= 0 && nTrueDups <= nIncoming)
    assert(noFn, "structural property violated: a true dup went unflagged")
    assert(fpOk, "false-positive rate exceeded the 5% bound")
  }
}
