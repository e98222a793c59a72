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

  test("dim stats: a planted constant dimension is flagged dead; live " +
      "dims are not, and variance is never negative") {
    import spark.implicits._
    // plant: zero out dim 7 across a copy of the embeddings table
    val planted = Tables.embeddings(spark, sfDir)
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> " +
          "CASE WHEN i = 7 THEN CAST(0.25 AS FLOAT) ELSE x END)"))
    val dir = java.nio.file.Files.createTempDirectory("deaddim").toString
    planted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SimilarityQueries.queries("emb_dim_stats")(spark, dir)
      .collect().map(r => r.getAs[Int]("d") -> r).toMap
    assert(rows.size == 64)
    assert(rows(7).getAs[Boolean]("is_dead"), "constant dim not flagged")
    assert(rows(7).getAs[Double]("min_v") == 0.25 &&
      rows(7).getAs[Double]("max_v") == 0.25)
    val dead = rows.values.count(_.getAs[Boolean]("is_dead"))
    assert(dead == 1, s"expected exactly the planted dead dim, got $dead")
    rows.values.foreach { r =>
      assert(r.getAs[Double]("variance") >= -1e-9)
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
    }
  }

  test("vocab coverage: monotone non-decreasing in V, bounded by 1, " +
      "and n_terms caps at min(V, |vocab|)") {
    val rows = TextQueries.queries("docs_vocab_coverage")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("v"))
    assert(rows.length == TextQueries.VocabSizes.length)
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .select(countDistinct(col("w"))).head().getLong(0)
    rows.foreach { r =>
      val (v, nt) = (r.getAs[Int]("v").toLong, r.getAs[Long]("n_terms"))
      assert(nt == math.min(v, vocab), s"n_terms $nt at V=$v, vocab=$vocab")
      val cov = r.getAs[Double]("coverage")
      assert(cov > 0.0 && cov <= 1.0)
    }
    rows.map(_.getAs[Double]("coverage")).sliding(2).foreach {
      case Array(a, b) => assert(b >= a, "coverage decreased with V")
    }
  }

  test("pq adc top-k: dense ranks 1..K per query, self excluded, and " +
      "every adc cross-foots with a from-scratch table lookup") {
    import graft.ext.Similarity
    val c = SimilarityQueries.corpus(spark, sfDir).localCheckpoint(false)
    val rows = SimilarityQueries.queries("emb_pq_adc_topk")(spark, sfDir)
      .collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size == 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5),
        s"ranks not dense for query $q")
      assert(!rs.exists(_.getAs[Long]("neighbor_id") == q), "self in top-k")
    }
    // from-scratch cross-foot: rebuild the TRAINED codebooks + codes
    // (round-12 geometry: 16 subspaces × 4 dims, 32 trained codewords),
    // recompute the lookup sum for every reported (query, neighbor)
    val numSub = 16
    val subDim = 4
    val cw = Similarity.pqCodewordVecs(Similarity.pqCodebooksTrained(
        c, numSub, subDim, Similarity.PqTrainIters))
      .collect().map(r => (r.getAs[Int]("m"), r.getAs[Long]("cl")) ->
        r.getSeq[Double](r.fieldIndex("cvec"))).toMap
    val codes = Similarity.pqEncode(c, numSub, subDim).collect()
      .map(r => r.getAs[Long]("id") ->
        (0 until numSub).map(m => r.getAs[Long](s"c$m"))).toMap
    val qvecs = c.filter(col("id") < 10)
      .collect().map(r => r.getAs[Long]("id") ->
        r.getSeq[Double](r.fieldIndex("vec"))).toMap
    rows.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      val expect = (0 until numSub).map { m =>
        val qs = qvecs(q).slice(m * subDim, m * subDim + subDim)
        val cv = cw((m, codes(n)(m)))
        val raw = qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
        BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sum
      assert(math.abs(r.getAs[Double]("adc") - expect) < 1e-6,
        s"adc mismatch for ($q, $n)")
    }
  }

  test("matched pairs: controls are distinct, never from the treatment " +
      "source, and agree with their treatment doc on every stratum key") {
    val rows = CurationQueries.queries("docs_matched_pairs")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val controls = rows.map(_.getAs[Long]("control_id"))
    assert(controls.distinct.length == controls.length,
      "a control doc was matched twice")
    val meta = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("lang"),
        (col("n_chars") / 256).cast("long").as("lb"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (t, c) = (r.getAs[Long]("treat_id"), r.getAs[Long]("control_id"))
      assert(meta(t)._1 == "src0" && meta(c)._1 != "src0")
      assert(meta(t)._2 == meta(c)._2, s"lang mismatch in pair ($t, $c)")
      assert(meta(t)._3 == meta(c)._3, s"length-bucket mismatch ($t, $c)")
    }
  }

  test("token budget: allocation hits the 90% budget to within the " +
      "floor remainder, caps only above-level sources, and both " +
      "branches are exercised") {
    val rows = CurationQueries.queries("docs_token_budget")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = total * 9 / 10
    val allocated = rows.map(_.getAs[Long]("allocated")).sum
    val nCapped = rows.count(_.getAs[Boolean]("capped"))
    assert(allocated <= budget, s"over budget: $allocated > $budget")
    assert(budget - allocated < math.max(nCapped, 1),
      s"left ${budget - allocated} tokens on the table with $nCapped " +
        "capped sources — not a water level")
    val level = rows.head.getAs[Long]("water_level")
    rows.foreach { r =>
      val (n, a, capped) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("allocated"), r.getAs[Boolean]("capped"))
      assert(r.getAs[Long]("water_level") == level)
      if (capped) assert(n > level && a == level)
      else assert(n <= level && a == n)
    }
    assert(nCapped > 0 && nCapped < rows.length,
      s"degenerate fixture: $nCapped/${rows.length} capped — the " +
        "level must fall between source sizes")
  }

  test("ivf-pq: every returned neighbor lives in one of its query's " +
      "probed cells, and ranks are dense per query") {
    import graft.ext.Similarity
    val c = SimilarityQueries.corpus(spark, sfDir).localCheckpoint(false)
    val rows = SimilarityQueries.queries("emb_topk_ivfpq")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val cells = c.select(col("id"), col("part"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[Number](1).longValue()).toMap
    // recompute the probe list from scratch (same rule as the op)
    val cvecs = Similarity.centroidVectors(Similarity.centroids(c))
      .collect().map(r =>
        r.getAs[Number](r.fieldIndex("cpart")).longValue() ->
          r.getSeq[Double](r.fieldIndex("cvec")))
    val qvecs = c.filter(col("id") < 10).collect()
      .map(r => r.getAs[Long]("id") ->
        r.getSeq[Double](r.fieldIndex("vec"))).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)
      if (n == 0.0) 0.0 else d / n
    }
    val probed = qvecs.map { case (q, qv) =>
      q -> cvecs.map { case (p, cv) => (p, cos(qv, cv)) }
        .sortBy { case (p, s) => (-s, p) }.take(2).map(_._1).toSet
    }
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to rs.length), s"ranks not dense for query $q")
      rs.foreach { r =>
        val n = r.getAs[Long]("neighbor_id")
        assert(n != q, "self in top-k")
        assert(probed(q).contains(cells(n)),
          s"neighbor $n of query $q is outside the probed cells")
      }
    }
  }

  test("adc recall audit: rerank recall dominates point recall, both " +
      "bounded by k, and the ratios cross-foot") {
    val rows = SimilarityQueries.queries("emb_adc_recall")(spark, sfDir)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (h, ch) = (r.getAs[Long]("n_hits"), r.getAs[Long]("n_cand_hits"))
      assert(h <= ch, "top-k hits must be a subset of candidate hits")
      assert(ch <= 5, "cannot hit more than the k exact neighbors")
      assert(math.abs(r.getAs[Double]("recall_at_k") - h / 5.0) < 1e-9)
      assert(math.abs(r.getAs[Double]("recall_rerank") - ch / 5.0) < 1e-9)
    }
    // the rerank multiplier must BUY something corpus-wide — otherwise
    // the serving-shape column is dead weight
    assert(rows.map(_.getAs[Long]("n_cand_hits")).sum >
      rows.map(_.getAs[Long]("n_hits")).sum,
      "5x candidates recovered nothing over the point ranking")
  }

  test("snm edit-distance pass: a planted LEADING edit is found by the " +
      "sorted-endings pass and structurally missed by the prefix " +
      "block — the multi-pass claim, proven") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val original = docs.orderBy("doc_id").head()
    val text = original.getAs[String]("text")
    assume(text.length > 20)
    // copy with the FIRST 6 chars replaced: different 8-char prefix
    // block (E91 cannot pair them), identical ending (SNM sorts them
    // adjacent)
    val edited = "QQQQQQ" + text.substring(6)
    val planted = docs.unionByName(
      Seq((maxId + 1L, edited, original.getAs[String]("lang"),
        "planted", edited.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val dir = java.nio.file.Files.createTempDirectory("snm").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val origId = original.getAs[Long]("doc_id")
    val snm = DedupQueries.queries("docs_editdist_snm")(spark, dir)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(snm.contains((origId, maxId + 1L)),
      "sorted-endings pass missed the planted leading-edit pair")
    val blocked = DedupQueries.queries("docs_editdist_pairs")(spark, dir)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(!blocked.contains((origId, maxId + 1L)),
      "prefix block unexpectedly found the leading-edit pair — the " +
        "SNM pass would be redundant")
  }

  test("attribution: total credit equals the number of purchases with " +
      "at least one prior-24h click — conservation, the property that " +
      "makes attribution an accounting identity") {
    val rows = AnalyticsQueries.queries("events_attribution")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val totalCredit = rows.map(_.getAs[Double]("credit")).sum
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .collect()
    val clicks = ev.filter(_.getString(2) == "click")
      .map(r => r.getLong(1) -> r.getTimestamp(3).getTime)
    val attributed = ev.filter(_.getString(2) == "purchase").count { p =>
      val (u, t) = (p.getLong(1), p.getTimestamp(3).getTime)
      clicks.exists { case (cu, ct) =>
        cu == u && ct < t && ct >= t - 24L * 3600 * 1000 }
    }
    assert(math.abs(totalCredit - attributed) < 0.01,
      s"credit $totalCredit != $attributed attributed purchases")
    assert(attributed > 0, "vacuous: no purchase has a prior click")
  }

  test("mixture anneal: each epoch's weights sum to 1, the last epoch " +
      "is natural token shares, and dispersion shrinks monotonically " +
      "toward it") {
    val rows = CurationQueries.queries("docs_mixture_anneal")(spark, sfDir)
      .collect()
    val byEpoch = rows.groupBy(_.getAs[Int]("epoch"))
    assert(byEpoch.keySet == Set(0, 1, 2, 3))
    byEpoch.values.foreach { rs =>
      assert(math.abs(rs.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-4)
    }
    // the last epoch (alpha = 1) must BE the natural share
    val per = Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).as("n"))
      .groupBy("source").agg(sum(col("n")).as("nt")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("nt")).toMap
    val total = per.values.sum.toDouble
    byEpoch(3).foreach { r =>
      val natural = per(r.getAs[String]("source")) / total
      assert(math.abs(r.getAs[Double]("weight") - natural) < 1e-4,
        s"epoch 3 weight is not the natural share for ${r.getString(1)}")
    }
    // annealing flattens early epochs: max weight grows with alpha
    // when the natural distribution is non-uniform
    val maxByEpoch = (0 to 3).map(e =>
      byEpoch(e).map(_.getAs[Double]("weight")).max)
    maxByEpoch.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, "dominant-source weight shrank as alpha grew")
    }
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
