package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signed random projections (SRP / random-hyperplane LSH, Charikar
  * 2002) over an embedding column — the bucketed scale path for cosine
  * near-duplicate detection, complementing [[Similarity.nearDupPairs]]
  * (which buckets by a pre-assigned cluster column).
  *
  * Bit i of the signature is `sign(v · r_i)` for a fixed Rademacher
  * hyperplane r_i ∈ {+1, −1}^dim; two vectors at angle θ agree on a
  * bit with probability 1 − θ/π, so banding the bits gives the classic
  * LSH recall curve over cosine similarity. The hyperplanes are a pure
  * function of (plane, dim) via md5, so the DuckDB oracle regenerates
  * the identical matrix and the signature is hash-checkable end to end.
  *
  * Scale notes: the dot products run through the codegen'd
  * [[graft.functions.DotProduct]] against literal arrays — scan-side,
  * no shuffle; candidate generation shuffles (band, key) rows only.
  * 16 planes / 4-bit bands suit the fixture's corpus; at 100 TB widen
  * to 64–128 planes and 8–16-bit bands so expected bucket size stays
  * bounded (band width ~ log2(corpus size)), and cap buckets like
  * [[Dedup.MaxBucketSize]] if the embedding space has dense hubs.
  */
object Srp {

  val NumPlanes = 16
  val BitsPerBand = 4
  val NumBands: Int = NumPlanes / BitsPerBand

  /** Rademacher component: +1 when the first hex nibble of
    * md5("<plane>_<dim>") is even — reproduced in the oracle as
    * `strpos('02468ace', substr(md5(i || '_' || j), 1, 1)) > 0`.
    */
  private def component(i: Int, j: Int): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"${i}_${j}".getBytes("UTF-8"))
    if ((((d(0) >> 4) & 0xf) & 1) == 0) 1.0 else -1.0
  }

  /** The NumPlanes × dim hyperplane matrix (driver-side constant —
    * O(planes·dim) doubles, broadcast into codegen as literals).
    */
  def planes(dim: Int): IndexedSeq[IndexedSeq[Double]] =
    IndexedSeq.tabulate(NumPlanes, dim)(component)

  /** 16-bit SRP signature of an `array<double>` column. */
  def sig(vec: Column, dim: Int): Column = {
    val r = planes(dim)
    (0 until NumPlanes).map { i =>
      when(Similarity.dot(vec, typedLit(r(i))) >= 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Band key b of a signature: bits [b·BitsPerBand, (b+1)·BitsPerBand). */
  def bandKey(sigCol: Column, b: Int): Column =
    shiftrightunsigned(sigCol, b * BitsPerBand)
      .bitwiseAND(lit((1L << BitsPerBand) - 1))

  /** SRP-bucketed cosine near-dup pairs: vectors sharing any band key
    * become candidates; candidates are verified with the exact cosine
    * (6-decimal-rounded, matching [[Similarity.nearDupPairs]]) — false
    * positives are impossible, recall follows the banding curve.
    * Input: (id, vec); output: (id_a, id_b, cos), id_a < id_b.
    *
    * Candidate generation follows [[Dedup.lshCandidates]]'s one-pass
    * bucket-group shape (not a band self-join): the signature is
    * computed ONCE, buckets carry sorted id lists capped at
    * [[Dedup.MaxBucketSize]] (a dense hub bucket degrades recall past
    * the cap instead of going quadratic — the oracle assumes the cap
    * never binds, which LSH bucket statistics give at sane band
    * widths), and in-bucket pairs come from a bucket-sparse HOF.
    */
  def nearDupPairs(vecs: DataFrame, dim: Int, threshold: Double): DataFrame = {
    val sigs = vecs.select(col("id"), sig(col("vec"), dim).as("sig"))
    val bands = sigs.select(col("id"),
      posexplode(array((0 until NumBands).map(b => bandKey(col("sig"), b)): _*))
        .as(Seq("band_idx", "band_key")))
    val buckets = bands.groupBy(col("band_idx"), col("band_key"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .withColumn("ids", slice(col("ids"), 1, Dedup.MaxBucketSize))
    val pairs = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        b => struct(a.as("id_a"), b.as("id_b")))))
    val cands = buckets.select(explode(pairs).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    cands
      .join(vecs.select(col("id").as("id_a"), col("vec").as("va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("vec").as("vb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosine(col("va"), col("vb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
