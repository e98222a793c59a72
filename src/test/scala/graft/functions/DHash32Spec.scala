package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ext.Dedup

/** DHash32 kernel semantics (grid boundaries, floor means, empty-cell
  * guard, bit order) pinned against an independent reference
  * implementation, plus the pigeonhole completeness of the 8-bit-chunk
  * banding the mm_phash_pairs query rides.
  */
class DHash32Spec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference: build the 32 cell slices explicitly by
    * interval membership (not by per-byte cell assignment), so a
    * boundary bug in the kernel cannot be mirrored here.
    */
  private def refDhash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val cells = (0 until 32).map { i =>
      val slice = bytes.zipWithIndex
        .filter { case (_, p) => p.toLong * 32 / n == i }
        .map { case (b, _) => (b & 0xff).toLong }
      if (slice.isEmpty) -1L else slice.sum / slice.length
    }
    (0 until 31).foldLeft(0L) { (fp, i) =>
      if (cells(i) > cells(i + 1)) fp | (1L << i) else fp
    }
  }

  private def nativeDhash(payloads: Seq[Array[Byte]]): Map[Long, Long] =
    payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("id", "content")
      .select(col("id"), DHash32(col("content")).as("dh"))
      .as[(Long, Long)].collect().toMap

  test("hash matches the interval-membership reference on edge cases") {
    val cases: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      Array[Byte](42), // 1 byte: 31 empty cells
      Array.tabulate(31)(i => i.toByte), // n < cells: some cells empty
      Array.tabulate(32)(i => i.toByte), // exactly one byte per cell
      Array.tabulate(33)(i => (255 - i).toByte), // first uneven split
      Array.fill(100)(7.toByte), // constant signal: all gradients 0
      Array.tabulate(1000)(i => (i % 251).toByte),
      Array.tabulate(517)(i => ((i * 131) % 256).toByte),
      Array[Byte](-1, -128, 127, 0, -1, -128, 127, 0)) // sign handling
    val native = nativeDhash(cases)
    cases.zipWithIndex.foreach { case (b, i) =>
      assert(native(i.toLong) == refDhash(b),
        s"dhash differs on case $i (len ${b.length})")
    }
  }

  test("hash matches the reference across the fixture corpus and only " +
      "uses bits 0..30") {
    val payloads = Tables.documents(spark, sfDir)
      .select("text").as[String].collect().toSeq
      .map(_.getBytes("UTF-8"))
    val native = nativeDhash(payloads)
    payloads.zipWithIndex.foreach { case (b, i) =>
      assert(native(i.toLong) == refDhash(b), s"corpus doc $i")
    }
    assert(native.values.forall(v => v >= 0 && v < (1L << 31)))
    // The corpus must exercise more than a degenerate hash space.
    assert(native.values.toSet.size > payloads.size / 4)
  }

  test("NULL content yields NULL; SQL registration agrees with the " +
      "Column API") {
    val df = Seq((0L, Some(Array[Byte](1, 2, 3))), (1L, None))
      .toDF("id", "content")
    val viaColumn = df.select(col("id"), DHash32(col("content")).as("dh"))
      .as[(Long, Option[Long])].collect().toMap
    assert(viaColumn(1L).isEmpty && viaColumn(0L).nonEmpty)
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("dhash_in")
    val viaSql = spark.sql("SELECT id, dhash32(content) AS dh FROM dhash_in")
      .as[(Long, Option[Long])].collect().toMap
    assert(viaSql == viaColumn)
  }

  test("8-bit-chunk banding is pigeonhole-complete vs exact all-pairs " +
      "Hamming on the fixture hashes") {
    val ph = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"),
        DHash32(encode(col("text"), "UTF-8")).as("dh"))
    val banded = Dedup.simhashPairs(ph, "id", "dh", maxHamming = 3, chunkBits = 8)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val hashes = ph.as[(Long, Long)].collect()
    val exact = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(ha ^ hb))).toSet
    assert(banded == exact)
    assert(exact.nonEmpty, "fixture dups should produce hamming-0 pairs")
  }
}
