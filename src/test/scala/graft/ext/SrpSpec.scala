package graft.ext

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Signed-random-projection LSH: hyperplane determinism, the sign-bit
  * invariants the oracle relies on, and recall on planted
  * near-parallel pairs (which SRP must catch with probability 1 —
  * parallel vectors agree on every sign bit).
  */
class SrpSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 4

  test("hyperplane matrix is deterministic and ±1-valued") {
    val p1 = Srp.planes(dim)
    val p2 = Srp.planes(dim)
    assert(p1 == p2)
    assert(p1.flatten.forall(v => v == 1.0 || v == -1.0))
    assert(p1.length == Srp.NumPlanes && p1.head.length == dim)
  }

  test("positive-scaled vectors share the full signature; a negated " +
      "vector flips every bit") {
    val v = Seq(0.3, -1.2, 0.7, 2.1)
    val df = Seq(
      (0L, v),
      (1L, v.map(_ * 7.5)),       // same direction → same signs
      (2L, v.map(x => -x)))       // opposite direction → all bits flip
      .toDF("id", "vec")
    val sigs = df.select(col("id"), Srp.sig(col("vec"), dim).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(1L))
    assert((sigs(0L) ^ sigs(2L)) == (1L << Srp.NumPlanes) - 1)
  }

  test("nearDupPairs finds planted parallel pairs with cos 1.0 and " +
      "never fabricates a pair above threshold") {
    // 3 planted parallel pairs + orthogonal background axes
    val rows = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(2.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)), (3L, Seq(0.0, 3.0, 0.0, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0, 0.0)), (5L, Seq(0.0, 0.0, 0.5, 0.0)),
      (6L, Seq(0.0, 0.0, 0.0, 1.0)))
    val df = rows.toDF("id", "vec")
    val pairs = Srp.nearDupPairs(df, dim, 0.99)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs == Set((0L, 1L, 1.0), (2L, 3L, 1.0), (4L, 5L, 1.0)))
  }

  test("fixture signatures distribute across band buckets (no " +
      "degenerate all-in-one-bucket banding)") {
    val corpus = Tables.embeddings(spark, sfDir).select(
      col("vec_id").as("id"),
      Similarity.toDouble(col("embedding")).as("vec"))
    val bits = Srp.adaptiveBits(corpus.count())
    val keys = corpus
      .select(Srp.bandKey(Srp.sig(col("vec"), 64), 0, bits).as("k"))
      .distinct().as[Long].collect()
    assert(keys.length > 4,
      s"band 0 uses only ${keys.length} of ${1 << bits} keys")
  }

  test("adaptive band width: clamp floor at fixture scale, smallest " +
      "2^b*pop >= n above it, ceiling at the sign-bit-safe maximum — " +
      "so expected bucket population stays ~TargetBucketPop as the " +
      "corpus grows (the 85x second-decade blowup the witness caught)") {
    assert(Srp.adaptiveBits(1L) == Srp.MinBitsPerBand)
    assert(Srp.adaptiveBits(500L) == 4)   // fixture SFs: unchanged banding
    assert(Srp.adaptiveBits(512L * 32) == 9)
    assert(Srp.adaptiveBits(2000L) == 6)  // sf0.1
    assert(Srp.adaptiveBits(20000L) == 10) // 10x witness fixture
    assert(Srp.adaptiveBits(Long.MaxValue) == Srp.MaxBitsPerBand)
    assert(Srp.NumBands * Srp.MaxBitsPerBand <= 60) // no sign-bit shift
  }
}
