package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** BinaryChunks kernel semantics (rolling update vs direct window
  * sums, boundary rule, end-cap) plus the re-alignment property that
  * justifies content-defined chunking over fixed-size blocks.
  */
class BinaryChunksSpec extends SparkSpec {
  import spark.implicits._
  import BinaryChunksImpl.{Base, Mod, Window, BoundaryDiv, MinChunk, MaxChunk}

  /** Direct per-position window sums — no rolling update, so a
    * mirrored add/evict bug in the kernel cannot cancel out here. The
    * min-chunk suppression is replayed over the candidate list (accept
    * iff >= MinChunk past the PREVIOUS candidate, virtual candidate at
    * 0), and the MaxChunk forced grid is merged per accepted-end gap —
    * matching both the kernel and the oracle's lag/generate_series.
    */
  private def refEnds(bytes: Array[Byte]): Seq[Int] = {
    val n = bytes.length
    if (n == 0) return Seq.empty
    val powers = Iterator.iterate(1L)(p => p * Base % Mod).take(Window).toSeq
    val cands = (Window to n).filter { p => // 1-based end position
      val h = (0 until Window)
        .map(j => (bytes(p - 1 - j) & 0xff) * powers(j) % Mod)
        .sum % Mod
      h % BoundaryDiv == 0
    }
    val accepted = cands.foldLeft((Vector.empty[Int], 0)) {
      case ((out, prev), e) =>
        (if (e - prev >= MinChunk) out :+ e else out, e)
    }._1
    def grid(a: Int, b: Int): Seq[Int] =
      Iterator.iterate(a + MaxChunk)(_ + MaxChunk)
        .takeWhile(_ <= b - MinChunk).toSeq
    val ends = (accepted :+ n).foldLeft((Vector.empty[Int], 0)) {
      case ((out, prev), e) => ((out ++ grid(prev, e)) :+ e, e)
    }._1.distinct // n may coincide with the last accepted end
    ends
  }

  private def nativeEnds(payloads: Seq[Array[Byte]]): Map[Long, Seq[Int]] =
    payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
      .select(col("id"), BinaryChunks(col("content")).as("ends"))
      .as[(Long, Seq[Int])].collect().toMap

  test("chunk ends match the direct window-sum reference on edge cases " +
      "and across the fixture corpus") {
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      Array[Byte](1),
      Array.tabulate(Window - 1)(_.toByte), // shorter than one window
      Array.tabulate(Window)(_.toByte), // exactly one window
      Array.fill(500)(0.toByte), // constant: h == 0 everywhere past warmup
      Array.tabulate(1000)(i => (i * 131 % 256).toByte),
      Array[Byte](-1, -128, 127, 0, -1, -128, 127, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9)
    ) ++ Tables.documents(spark, sfDir)
      .select("text").as[String].collect().toSeq.map(_.getBytes("UTF-8"))
    val native = nativeEnds(cases)
    cases.zipWithIndex.foreach { case (b, i) =>
      assert(native(i.toLong) == refEnds(b),
        s"chunk ends differ on case $i (len ${b.length})")
    }
  }

  test("SQL registration agrees with the Column API and NULL yields NULL") {
    GraftFunctions.register(spark)
    val df = Seq((0L, Some(Array.tabulate(100)(i => (i * 7 % 256).toByte))),
      (1L, None)).toDF("id", "content")
    df.createOrReplaceTempView("bchunks_in")
    val viaSql = spark.sql(
      "SELECT id, binary_chunks(content) AS ends FROM bchunks_in")
      .as[(Long, Option[Seq[Int]])].collect().toMap
    val viaColumn = df.select(col("id"), BinaryChunks(col("content")).as("ends"))
      .as[(Long, Option[Seq[Int]])].collect().toMap
    assert(viaSql == viaColumn && viaSql(1L).isEmpty && viaSql(0L).nonEmpty)
  }

  test("ends are strictly increasing, positive, cap at the blob length, " +
      "respect the min-chunk bound, and never exceed the max-chunk " +
      "bound; a constant-byte run chunks at the MaxChunk grid instead " +
      "of one unbounded blob or O(n) one-byte chunks") {
    val payloads: Seq[Array[Byte]] = Seq(
      Array.fill(100)(0.toByte),
      Array.tabulate(700)(i => (i % 251).toByte),
      Array.fill(5000)('a'.toByte))
    val native = nativeEnds(payloads)
    native.foreach { case (i, ends) =>
      assert(ends.nonEmpty && ends.head > 0)
      assert(ends.zip(ends.tail).forall { case (a, b) => a < b })
      assert(ends.last == payloads(i.toInt).length)
      val gaps = (0 +: ends.init).zip(ends).map { case (s, e) => e - s }
      // every gap except the forced final tail is >= MinChunk
      assert(gaps.init.forall(_ >= MinChunk),
        s"sub-MinChunk interior gap in $ends")
      // no gap anywhere exceeds the forced-cut bound (ADVICE r09)
      assert(gaps.forall(_ <= MaxChunk + MinChunk - 1),
        s"chunk above MaxChunk+MinChunk-1 in $ends")
    }
    // all-zero / all-'a' bytes: every p >= Window is a raw candidate, so
    // consecutive candidates are 1 apart and the suppression window
    // rejects all of them — the adversarial run yields the MaxChunk
    // grid plus the end-cap (bounded chunks restoring dedup
    // granularity), not one 5000-byte blob and not a chunk at every
    // position (the pre-MinChunk blowup ADVICE r8 flagged)
    assert(native(0L) == Seq(100))
    assert(native(2L) == (MaxChunk to (5000 - MinChunk) by MaxChunk) :+ 5000)
  }

  test("prefix-shifted copies re-align: most chunk hashes are shared " +
      "with the original (the fixed-size-block counterfactual shares " +
      "none)") {
    val texts = Tables.documents(spark, sfDir)
      .select("text").as[String].collect().toSeq
    def chunkSet(bytes: Array[Byte]): Set[String] = {
      val ends = refEnds(bytes)
      ends.zip(0 +: ends.init).map { case (e, s) =>
        new String(bytes.slice(s, e), "ISO-8859-1")
      }.toSet
    }
    val (shared, total) = texts.map { t =>
      val orig = chunkSet(t.getBytes("UTF-8"))
      val shifted = chunkSet(("XYZ " + t).getBytes("UTF-8"))
      ((orig intersect shifted).size, orig.size)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(shared.toDouble / total > 0.5,
      s"only $shared/$total chunks survived a 4-byte prefix shift")
  }
}
