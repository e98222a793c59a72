package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** r15 (VERDICT r14 #1): the learned OPQ rotation COMPOSED into the
  * persisted IVF-PQ build/serve path — and the honest measurement of
  * what it buys there.
  *
  * Composition pins: a v5 artifact built with `opq = true` carries the
  * rotation (`rotation.parquet`), rotates queries at search with the
  * STORED matrix, encodes append batches in the rotated frame, and
  * keeps the delete/compact lifecycle intact. The served chain is
  * BIT-IDENTICAL to the in-memory rotated chain (same pure-function
  * rotation of the same corpus, same shared search half).
  *
  * Measured verdict (the instrument-first refutation the build
  * discipline demands): the r14 OpqSpec "+19% recall" (0.320 → 0.380)
  * was a 10-query × k=5 sample — 50 Bernoulli draws, binomial
  * σ ≈ 0.07. Re-measured at 50 queries this round, the flat-ADC lift
  * VANISHES (0.392 vs 0.392 at sf0.001; 0.432 raw vs 0.392 OPQ at
  * sf0.01), and on the residual IVF-PQ chain the rotation measures AT
  * OR BELOW raw for centered, uncentered, and residual-covariance
  * variants at both SFs. Consistent with E274's balanced-permutation
  * negative: these synthetic fixture embeddings carry no cross-
  * dimension correlation for a rotation to exploit once the coarse
  * stage absorbs the label structure. The composition ships (a real
  * corpus with correlated dims is where Ge 2013 wins); the default
  * stays `opq = false`, and the wide-sample audit below records the
  * verdict either way, every round.
  */
class OpqServeSpec extends SparkSpec {

  private val (numSub, subDim, dim) = (16, 4, 64)
  private val (nq, kIvf, mProbe) = (10, 3, 2)

  private def corpus = graft.Tables.embeddings(spark, sfDir).select(
    col("vec_id").as("id"), col("label").as("part"),
    Similarity.toDouble(col("embedding")).as("vec"))

  private def queries(c: DataFrame, n: Int) = c.filter(col("id") < n)
    .select(col("id").as("qid"), col("vec").as("qv"))

  test("a v5 opq artifact persists the rotation, serves queries " +
      "through it, and is BIT-IDENTICAL to the in-memory rotated chain") {
    val c = corpus.localCheckpoint(false)
    val out = Files.createTempDirectory("opqserve").toString
    AnnIndex.build(c, numSub, subDim, out, opq = true)
    // the stored rotation equals the pure-function recomputation
    val (means, r) = Opq.rotationFor(c, dim, numSub, subDim)
    val stored = spark.read.parquet(s"$out/rotation.parquet").collect()
      .map(rw => rw.getAs[Int]("j") -> rw.getAs[Seq[Double]]("rvec"))
      .toMap
    assert(stored.size === dim + 1)
    assert(stored(-1) === means.toSeq)
    for (j <- 0 until dim) assert(stored(j) === r(j).toSeq,
      s"rotation row $j drifted through the artifact")
    // served ≡ in-memory, every (query, rank, neighbor, adc)
    val served = AnnIndex.searchTopK(spark, out, queries(c, nq), kIvf,
      mProbe)
    val mem = Similarity.pqResidualIvfTopK(Opq.rotate(c, means, r),
      numSub, subDim, nq, kIvf, mProbe)
    val mism = served
      .select(col("query_id"), col("rank"), col("neighbor_id").as("n1"),
        col("adc").as("a1"))
      .join(mem.select(col("query_id"), col("rank"),
        col("neighbor_id").as("n2"), col("adc").as("a2")),
        Seq("query_id", "rank"), "full_outer")
      .filter(not(col("n1") === col("n2") && col("a1") === col("a2")))
      .count()
    assert(mism === 0L, s"$mism served rows diverge from in-memory")
    // adaptive serve also rotates through the same stored matrix
    val adaptive = AnnIndex.searchTopKAdaptive(spark, out,
      queries(c, nq), kIvf, 1L, 10L)
    assert(adaptive.groupBy(col("query_id")).count().count() === nq.toLong)
  }

  test("append to a rotated artifact encodes the batch in the stored " +
      "rotated frame; delete + compact keep the serve identical") {
    val c = corpus.localCheckpoint(false)
    val out = Files.createTempDirectory("opqlife").toString
    AnnIndex.build(c.filter(col("id") % 7 =!= 3), numSub, subDim, out,
      opq = true)
    AnnIndex.append(c.filter(col("id") % 7 === 3)
      .select(col("id"), col("vec")), out)
    val q = queries(c, nq)
    val afterAppend = AnnIndex.searchTopK(spark, out, q, kIvf, mProbe)
      .localCheckpoint(false)
    assert(afterAppend.count() === (nq * kIvf).toLong)
    // appended ids are servable: they appear somewhere in a widened
    // search (the batch is 1/7th of the corpus; a top-3 over 2 probed
    // cells without them would mean the append encoded garbage)
    val wide = AnnIndex.searchTopK(spark, out, q, 20, mProbe)
    assert(wide.filter(col("neighbor_id") % 7 === 3).count() > 0L,
      "no appended id ever surfaces — batch not searchable")
    // delete a slice: served results exclude it, before AND after the
    // physical compact (the soft/physical equality the raw tier pins)
    val victims = c.filter(col("id") % 11 === 5).select(col("id"))
    AnnIndex.delete(victims, out)
    val softServe = AnnIndex.searchTopK(spark, out, q, kIvf, mProbe)
      .localCheckpoint(false)
    assert(softServe.filter(col("neighbor_id") % 11 === 5).count() === 0L)
    AnnIndex.compact(out)
    val hardServe = AnnIndex.searchTopK(spark, out, q, kIvf, mProbe)
    val diff = softServe.select(col("query_id"), col("rank"),
        col("neighbor_id").as("n1"), col("adc").as("a1"))
      .join(hardServe.select(col("query_id"), col("rank"),
        col("neighbor_id").as("n2"), col("adc").as("a2")),
        Seq("query_id", "rank"), "full_outer")
      .filter(not(col("n1") === col("n2") && col("a1") === col("a2")))
      .count()
    assert(diff === 0L, "compaction changed a rotated serve result")
  }

  test("VERDICT (recorded either way): WIDE-SAMPLE recall of raw vs " +
      "opq-rotated PERSISTED serving — the refutation instrument") {
    val c = corpus.localCheckpoint(false)
    val wideNq = 50
    val rawDir = Files.createTempDirectory("opqraw").toString
    val opqDir = Files.createTempDirectory("opqrot").toString
    AnnIndex.build(c, numSub, subDim, rawDir)
    AnnIndex.build(c, numSub, subDim, opqDir, opq = true)
    val q = queries(c, wideNq)
    val l2 = aggregate(
      zip_with(col("qv"), col("vec"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val exact = q.join(c.select(col("id"), col("vec")),
        col("id") =!= col("qid"))
      .select(col("qid"), col("id"), l2.as("d"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("d"), col("id"))))
      .filter(col("rank") <= kIvf)
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"))
      .localCheckpoint(false)
    def recall(dir2: String): Double =
      AnnIndex.searchTopK(spark, dir2, q, kIvf, mProbe)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id")).count()
        .toDouble / (wideNq * kIvf)
    val rawR = recall(rawDir)
    val opqR = recall(opqDir)
    val sigma = math.sqrt(rawR * (1 - rawR) / (wideNq * kIvf))
    info(f"served recall@$kIvf (nq=$wideNq): raw=$rawR%.3f " +
      f"opq=$opqR%.3f (binomial σ≈$sigma%.3f)")
    // measure, don't presume: bounds + non-degeneracy; the comparative
    // verdict is recorded (info + SCALING.md) win or lose
    assert(rawR >= 0.0 && rawR <= 1.0 && opqR >= 0.0 && opqR <= 1.0)
    assert(opqR > 0.0, "rotated serving found nothing — degenerate")
  }
}
