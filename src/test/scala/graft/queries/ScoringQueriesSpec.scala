package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ext.Similarity

/** Behavioral invariants for the round-8 scoring tier (multi-probe
  * ANN, semantic decontam, repetition fraction, Zipf slope) — value
  * correctness is the DuckDB oracle's job; these pin the semantics the
  * oracle comparison can't express (recall dominance, set containment,
  * derived-count consistency).
  */
class ScoringQueriesSpec extends SparkSpec {

  test("multi-probe searches at most 2 cells per query and its recall " +
      "dominates single-probe") {
    val mp = SimilarityQueries.queries("emb_topk_mprobe")(spark, sfDir)
      .select(col("query_id"), col("neighbor_id"))
    // join neighbors back to their cells: each query's candidates come
    // from <= MProbe distinct cells
    val cells = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("neighbor_id"), col("label"))
    val perQueryCells = mp.join(cells, "neighbor_id")
      .groupBy("query_id").agg(countDistinct(col("label")).as("nc"))
      .collect()
    assert(perQueryCells.nonEmpty && perQueryCells.forall(_.getLong(1) <= 2),
      s"a query drew candidates from more than 2 cells")

    // recall vs brute-force ground truth must be >= the single-probe
    // (own-cell) recall — that dominance is the POINT of multi-probe
    val c = Tables.embeddings(spark, sfDir).select(
      col("vec_id").as("id"), col("label").as("part"),
      Similarity.toDouble(col("embedding")).as("vec"))
    val qFlat = c.filter(col("id") < 10)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val qCell = c.filter(col("id") < 10)
      .select(col("id").as("qid"), col("part"), col("vec").as("qvec"))
    val exact = Similarity.topK(c, qFlat, 5)
      .select(col("query_id"), col("neighbor_id"))
    def hits(ann: org.apache.spark.sql.DataFrame): Long =
      exact.join(ann, Seq("query_id", "neighbor_id")).count()
    val singleHits = hits(Similarity.topKWithinPartition(c, qCell, 5)
      .select(col("query_id"), col("neighbor_id")))
    val multiHits = hits(mp)
    assert(multiHits >= singleHits,
      s"multi-probe recall $multiHits < single-probe $singleHits")
  }

  test("semantic decontam covers exactly the non-eval corpus and flags " +
      "match a recomputed max-cos") {
    val out = SimilarityQueries.queries("emb_semantic_decontam")(spark, sfDir)
    val rows = out.collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.length == n - 25) // eval set excluded, everything else present
    assert(rows.forall(r => r.getLong(0) >= 25))
    assert(rows.forall { r =>
      val mc = r.getDouble(1)
      mc >= -1.0 - 1e-9 && mc <= 1.0 + 1e-9
    })
    // flag consistency against the ROUNDED score it ships with: at the
    // 0.4 line the unrounded comparison can only disagree with the
    // 6-dp rounding inside +-5e-7
    assert(rows.forall { r =>
      val (mc, flag) = (r.getDouble(1), r.getBoolean(2))
      if (mc > 0.4 + 1e-6) flag
      else if (mc < 0.4 - 1e-6) !flag
      else true
    })
  }

  test("dup-gram fraction: n_grams == n_tokens - 2 and fraction in [0,1]") {
    val out = TextQueries.queries("docs_dupgram_frac")(spark, sfDir)
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
    val joined = out.join(toks, "doc_id").collect()
    assert(joined.nonEmpty)
    assert(joined.forall(r =>
      r.getAs[Long]("n_grams") == r.getAs[Int]("nt").toLong - 2))
    assert(joined.forall { r =>
      val f = r.getAs[Double]("dup_frac"); f >= 0.0 && f <= 1.0
    })
  }

  test("zipf slope: one row, negative slope, n_terms == vocabulary size") {
    val row = TextQueries.queries("docs_zipf_slope")(spark, sfDir)
      .collect().head
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().count()
    assert(row.getAs[Long]("n_terms") == vocab)
    assert(row.getAs[Double]("slope") < 0.0) // frequency falls with rank
  }

  test("matryoshka recall harness: full-width truncation reproduces " +
      "ground truth exactly; the 16-dim prefix keeps some signal") {
    val rows = RetrievalQueries.queries("emb_matryoshka_recall")(spark, sfDir)
      .collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rc = r.getAs[Double]("recall")
      assert(rc >= 0.0 && rc <= 1.0)
    }
    assert(rows.map(_.getAs[Int]("n_hit")).sum > 0,
      "16-dim prefix lost ALL signal — harness suspect")
    // identity case: rebuilding the 'truncated' ranking at the FULL
    // width must agree with ground truth on every query — this pins
    // the harness arithmetic (a bug in either ranking breaks it)
    val c = SimilarityQueries.corpus(spark, sfDir)
    val q = c.filter(col("id") < 10)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val a = Similarity.topK(c, q, 5).select(col("query_id"), col("neighbor_id"))
    val b = Similarity.topK(
      c.select(col("id"), col("part"), slice(col("vec"), 1, 64).as("vec")),
      q.select(col("qid"), slice(col("qvec"), 1, 64).as("qvec")), 5)
      .select(col("query_id"), col("neighbor_id"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "full-width slice changed the ranking")
  }

  test("threshold sweep: every tau reported (zeros explicit), counts " +
      "monotone non-increasing in tau, survivors cross-foot") {
    val rows = SimilarityQueries.queries("emb_threshold_sweep")(spark, sfDir)
      .collect().sortBy(_.getAs[Double]("threshold"))
    assert(rows.length == SimilarityQueries.SweepThresholds.length)
    val n = Tables.embeddings(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_survivors") == n - r.getAs[Long]("n_dropped"))
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_pairs"))
    }
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs"))
      assert(lo.getAs[Long]("n_dropped") >= hi.getAs[Long]("n_dropped"))
    }
    assert(rows.head.getAs[Long]("n_pairs") > 0,
      "loosest tau found no pairs — the sweep is vacuous on this fixture")
  }

  test("E204 cluster profile: cross-foots with the corpus and bounds the " +
      "sweep's candidate work; population headroom positive at this SF") {
    val prof = SimilarityQueries.queries("emb_cluster_profile")(spark, sfDir)
      .collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(prof.map(_.getAs[Long]("m")).sum == n, "bucket sizes must " +
      "partition the corpus")
    prof.foreach { r =>
      val m = r.getAs[Long]("m")
      assert(r.getAs[Long]("candidate_pairs") == m * (m - 1) / 2)
      assert(r.getAs[Long]("pop_headroom") > 0,
        s"cluster ${r.get(0)} at population $m has no headroom to " +
          s"MaxClusterPop — re-cluster with a larger k before the pair tier")
    }
    // the profile's pair total IS the sweep's candidate-join work bound:
    // every verified pair at the loosest tau came out of these buckets
    val totalPairs = prof.map(_.getAs[Long]("candidate_pairs")).sum
    val loosest = SimilarityQueries.queries("emb_threshold_sweep")(spark, sfDir)
      .collect().minBy(_.getAs[Double]("threshold")).getAs[Long]("n_pairs")
    assert(loosest <= totalPairs,
      s"sweep reported $loosest pairs but buckets only admit $totalPairs")
    assert(math.abs(prof.map(_.getAs[Double]("pair_share")).sum - 1.0) < 1e-9)
  }

  test("adaptive re-clustering holds E[m] at targetPop (round-9 verdict " +
      "task #2): cell count tracks ceil(N/targetPop) and no cell exceeds " +
      "a small multiple of the target population") {
    val n = Tables.embeddings(spark, sfDir).count()
    val k = graft.ext.Similarity.adaptiveK(n, SimilarityQueries.AdaptiveTargetPop)
    val prof = SimilarityQueries.queries("emb_cluster_profile")(spark, sfDir)
      .collect()
    // Lloyd rounds may empty a cell but never invent one; a collapse to
    // far fewer cells than k would mean the pair tier is back quadratic
    assert(prof.length <= k && prof.length >= (k + 1) / 2,
      s"expected ~$k cells for n=$n, got ${prof.length}")
    val maxPop = prof.map(_.getAs[Long]("m")).max
    assert(maxPop <= 3L * SimilarityQueries.AdaptiveTargetPop,
      s"a cell reached population $maxPop — the adaptive k failed to " +
        s"bound the pair tier (target ${SimilarityQueries.AdaptiveTargetPop})")
  }

  test("repetition budget: requested tokens uniform across sources, " +
      "epochs are exact integer ceilings, flag matches the epoch rule") {
    val rows = CurationQueries.queries("docs_repetition_budget")(spark, sfDir)
      .collect()
    val nSources = Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(rows.length == nSources)
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val expectedReq =
      totalTokens * CurationQueries.RepBudgetMult / nSources
    rows.foreach { r =>
      assert(r.getAs[Long]("requested_tokens") == expectedReq)
      val avail = r.getAs[Long]("n_tokens")
      val epochs = r.getAs[Long]("epochs_needed")
      assert(epochs == (expectedReq + avail - 1) / avail)
      assert(r.getAs[Boolean]("over_budget") ==
        (epochs > CurationQueries.RepMaxEpochs))
    }
    assert(rows.exists(_.getAs[Boolean]("over_budget")) &&
      rows.exists(!_.getAs[Boolean]("over_budget")),
      "fixture should split across the epoch rule or the flag is vacuous")
  }
}
