package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Behavioral invariants for the round-11 audit tier: the containment
  * prefix-filter candidate profile (E215) and the SRP banding-recall
  * audit (E216). Value correctness is the DuckDB oracle's job; these
  * pin the cross-foots the flat hash can't express — that the profile
  * actually accounts for the production join's volume, and that the
  * recall audit's pieces agree with the tiers they audit.
  */
class ProfileAuditSpec extends SparkSpec {

  test("containment profile: prefix rows cross-foot with the per-doc " +
      "prefix rule, and df=1 keys contribute zero candidates") {
    val rows = DedupQueries.queries("docs_containment_profile")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    // df = 1 keys (no other doc shares the shingle) can never produce
    // a candidate — the profile must show that, not bury it
    rows.filter(_.getAs[Long]("df") == 1L).foreach { r =>
      assert(r.getAs[Long]("cand_rows") == 0L,
        "df=1 keys generated candidates")
    }
    // every key's per-df volume identity: cand_rows = Σ np·(df−1),
    // bounded by max_np·(df−1)·n_keys
    rows.foreach { r =>
      val (df, nk, pr, cr, mx) = (r.getAs[Long]("df"),
        r.getAs[Long]("n_keys"), r.getAs[Long]("prefix_rows"),
        r.getAs[Long]("cand_rows"), r.getAs[Long]("max_np"))
      assert(cr == pr * (df - 1), s"volume identity broken at df=$df")
      assert(mx <= pr && pr <= nk * mx)
    }
    // cross-foot: total prefix rows == Σ over docs of ⌊(1−t)·m⌋+1
    // (every prefix row lands in exactly one (x, df) group)
    val docs = Tables.documents(spark, sfDir)
    val expectedPrefixRows = docs
      .select(explode(graft.ext.Dedup.wordShingles(col("text"),
        DedupQueries.WordN)).as("x"), col("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("m"))
      .select(sum(floor((lit(1.0) - lit(DedupQueries.ContainmentThreshold))
        * col("m")) + 1))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("prefix_rows")).sum == expectedPrefixRows,
      "profile does not account for every prefix row")
  }

  test("srp recall audit: srp pairs are a subset of truth, recall is " +
      "their ratio, and band_bits is the adaptive width") {
    val r = SimilarityQueries.queries("emb_srp_recall")(spark, sfDir).head()
    val (nTrue, nSrp) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_srp"))
    assert(nTrue > 0, "vacuous audit: no true pairs at the threshold")
    assert(nSrp <= nTrue, "exact-verified SRP pairs must be a truth subset")
    assert(math.abs(r.getAs[Double]("recall") -
      nSrp.toDouble / nTrue.toDouble) < 1e-6)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(r.getAs[Int]("band_bits") == graft.ext.Srp.adaptiveBits(n))
    val exp = r.getAs[Double]("expected_recall")
    assert(exp > 0.0 && exp <= 1.0)
  }
}
