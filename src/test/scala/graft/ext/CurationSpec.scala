package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 2000L).toDF("id")

  test("hashBucket is deterministic, in range, and roughly uniform") {
    val b1 = Curation.hashBucket(col("id"), "s:")
    val got = ids.select(b1.as("b")).as[Long].collect()
    val again = ids.select(b1.as("b")).as[Long].collect()
    assert(got.toSeq == again.toSeq)
    assert(got.forall(b => b >= 0 && b < Curation.HashBuckets))
    // 2000 draws over 65536 buckets: mean 32768 ± a few k
    val mean = got.sum.toDouble / got.length
    assert(mean > 28000 && mean < 38000, s"suspicious mean bucket $mean")
  }

  test("salts decorrelate draws over the same keys") {
    val joint = ids.select(
      (Curation.hashBucket(col("id"), "a:") < 16384).as("a"),
      (Curation.hashBucket(col("id"), "b:") < 16384).as("b"))
      .as[(Boolean, Boolean)].collect()
    val both = joint.count(p => p._1 && p._2)
    // independent 0.25 draws → ~6.25% joint; correlated would be ~25%
    assert(both > 60 && both < 200, s"joint hits $both not ~125")
  }

  test("sampleBernoulli keeps ~p of rows; p=0 none; p=1 all") {
    val n = Curation.sampleBernoulli(ids, col("id"), 0.25, "s1:").count()
    assert(n > 400 && n < 600, s"0.25 sample of 2000 kept $n")
    assert(Curation.sampleBernoulli(ids, col("id"), 0.0, "s1:").count() == 0)
    assert(Curation.sampleBernoulli(ids, col("id"), 1.0, "s1:").count() == 2000)
  }

  test("assignSplit partitions completely with stable proportions") {
    val byS = ids.select(Curation.assignSplit(col("id"), 0.1, 0.1, "sp:").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(byS.keySet == Set("test", "val", "train"))
    assert(byS.values.sum == 2000)
    assert(byS("test") > 120 && byS("test") < 280)
    assert(byS("val") > 120 && byS("val") < 280)
  }

  test("weightBudgetMix equalizes group token budgets approximately") {
    // group g0 has 10x the weight of g1: expect ~10% of g0 kept
    val rows = ((0L until 1000L).map(i => (i, "g0", 10L)) ++
      (1000L until 2000L).map(i => (i, "g1", 1L)))
      .toDF("id", "grp", "w")
    val kept = Curation.weightBudgetMix(rows, col("grp"), col("w"),
      col("id"), "m:")
    val byGrp = kept.groupBy("grp").agg(sum("w").as("kw"))
      .as[(String, Long)].collect().toMap
    assert(byGrp("g1") == 1000L) // min group keeps everything
    assert(byGrp("g0") > 400 && byGrp("g0") < 1600,
      s"g0 kept weight ${byGrp("g0")}, want ~1000")
  }

  test("sampleStratified applies per-group fractions deterministically") {
    val rows = ((0L until 1000L).map(i => (i, "en")) ++
      (1000L until 2000L).map(i => (i, "de"))).toDF("id", "grp")
    val kept = Curation.sampleStratified(rows, col("id"), col("grp"),
      Map("en" -> 0.1), 0.5, "st:")
    val byGrp = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("en") > 60 && byGrp("en") < 160, s"en kept ${byGrp("en")}")
    assert(byGrp("de") > 420 && byGrp("de") < 580, s"de kept ${byGrp("de")}")
    // deterministic: a second evaluation keeps the identical id set
    val a = kept.select("id").as[Long].collect().sorted.toSeq
    val b = Curation.sampleStratified(rows, col("id"), col("grp"),
      Map("en" -> 0.1), 0.5, "st:").select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("weightBudgetMix fails fast on zero-weight and NULL groups") {
    val zeroGrp = ((0L until 10L).map(i => (i, "g0", 1L)) ++
      (10L until 20L).map(i => (i, "g1", 0L))).toDF("id", "grp", "w")
    val ex = intercept[IllegalArgumentException] {
      Curation.weightBudgetMix(zeroGrp, col("grp"), col("w"), col("id"), "z:")
    }
    assert(ex.getMessage.contains("zero/NULL total weight"))

    val nullGrp = Seq((1L, "g0", 1L), (2L, null.asInstanceOf[String], 1L))
      .toDF("id", "grp", "w")
    val ex2 = intercept[IllegalArgumentException] {
      Curation.weightBudgetMix(nullGrp, col("grp"), col("w"), col("id"), "n:")
    }
    assert(ex2.getMessage.contains("NULL group key"))
  }

  test("redactPii scrubs planted emails, phones, and digit runs") {
    val df = Seq(
      "contact alice.smith+spam@example.co.uk today",
      "call +1 (555) 123-4567 or 555.123.4567",
      "account 123456789 balance",
      "clean text with no pii at all",
      "short 12345 stays").toDF("t")
    val out = df.select(Curation.redactPii(col("t")).as("t")).as[String].collect()
    assert(out(0) == "contact <EMAIL> today")
    assert(out(1) == "call <PHONE> or <PHONE>")
    assert(out(2) == "account <NUM> balance")
    assert(out(3) == "clean text with no pii at all")
    assert(out(4) == "short 12345 stays") // under the 6-digit floor
  }

  test("canonicalUrl strips only the scheme's own default port") {
    val df = Seq(
      "https://A.com:443/x",  // https default → stripped
      "https://A.com:80/x",   // https on 80 is a DIFFERENT origin → kept
      "http://A.com:80/x",    // http default → stripped
      "http://A.com:443/x",   // http on 443 → kept
      "ftp://A.com:80/x")     // unknown scheme → never stripped
      .toDF("u")
    val out = df.select(Curation.canonicalUrl(col("u")).as("c")).as[String].collect()
    assert(out(0) == "https://a.com/x")
    assert(out(1) == "https://a.com:80/x")
    assert(out(2) == "http://a.com/x")
    assert(out(3) == "http://a.com:443/x")
    assert(out(4) == "ftp://a.com:80/x")
  }

  test("urlDomain excludes a preserved non-default port from the site key") {
    // canonicalUrl keeps :8080 (a distinct origin), but the per-site
    // crawl-budget key must still group it with the portless origin —
    // and subdomains collapse to the registered-domain-ish suffix.
    val df = Seq(
      "https://a.com:8080/x",
      "https://a.com/x",
      "https://sub.a.com:8080/x",
      "https://a.com:8080",
      "https://a.com")
      .toDF("u")
    val out = df
      .select(Curation.urlDomain(Curation.canonicalUrl(col("u"))).as("d"))
      .as[String].collect()
    assert(out.forall(_ == "a.com"), out.mkString(", "))
  }

  test("canonicalUrl folds case, drops fragments and utm params, keeps others in order") {
    val df = Seq(
      "HTTPS://Example.COM/Deep/Path/?utm_source=a&keep=1&utm_medium=b&z=2#frag",
      "https://example.com",
      "https://example.com/?utm_source=only")
      .toDF("u")
    val out = df.select(Curation.canonicalUrl(col("u")).as("c")).as[String].collect()
    assert(out(0) == "https://example.com/Deep/Path?keep=1&z=2")
    assert(out(1) == "https://example.com/")
    assert(out(2) == "https://example.com/")
  }

  test("dsirWeights: target-like docs score positive, anti-target negative, " +
      "and weights are partitioning-invariant") {
    // Vocab split: 't' dominates the target domain, 'r' the rest; a
    // doc made of 't's must look MORE target-like than average
    // (positive log ratio), an 'r'-only doc less (negative).
    val docs = Seq(
      (1L, "t t t t", true),
      (2L, "t t r t", true),
      (3L, "r r r r", false),
      (4L, "r r t r", false)).toDF("doc_id", "text", "tgt")
    def run(d: org.apache.spark.sql.DataFrame) =
      Curation.dsirWeights(d, "doc_id", "text", col("tgt"))
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val w = run(docs)
    assert(w(1L) > 0.0 && w(3L) < 0.0)
    assert(w(1L) > w(2L) && w(2L) > w(4L) && w(4L) > w(3L)) // monotone in t-share
    assert(w == run(docs.repartition(5, col("doc_id")))) // bit-deterministic
  }
}
