package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ext.Multimodal

/** ISO-BMFF box-walk correctness against hand-assembled, spec-exact
  * bytes with known header fields — independent of the fixtureVideo
  * synthesis path (which the mm_video_meta oracle covers), so a bug
  * mirrored between synthesis and parse still fails here.
  */
class VideoMetaSpec extends SparkSpec {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(b: Array[Byte]): (String, Long, Long, Int) = {
    val r = VideoMetaImpl.parse(b)
    (r.getUTF8String(0).toString, r.getLong(1), r.getLong(2), r.getInt(3))
  }

  // ftyp: size 16, brand "isom", minor 0.
  private val ftypIsom = "00000010 66747970 69736F6D 00000000"
  // mvhd v0: size 108 = 8 hdr + 4 ver/flags + 4+4 times + 4 timescale
  // (1000) + 4 duration (7500 → 7500 ms) + 80 trailer zeros.
  private val mvhdV0 =
    "0000006C 6D766864 00000000 00000000 00000000 000003E8 00001D4C" + "00" * 80
  // mvhd v1: size 120, 64-bit times, timescale 600, duration 1500 (u64)
  // → 2500 ms.
  private val mvhdV1 =
    "00000078 6D766864 01000000" + "00" * 16 +
      "00000258 00000000 000005DC" + "00" * 80
  private val trak = "00000010 7472616B 0000000000000000"

  private def moov(children: String): String = {
    val payload = hex(children)
    f"${payload.length + 8}%08X" + "6D6F6F76" + children.replaceAll("\\s", "")
  }

  test("v0 movie header: timescale, ms duration, and track count") {
    val mp4 = hex(ftypIsom + moov(mvhdV0 + trak + trak))
    assert(parse(mp4) == ("isom", 1000L, 7500L, 2))
  }

  test("v1 movie header (64-bit times) parses through the wide layout") {
    val mp4 = hex(ftypIsom + moov(mvhdV1 + trak))
    assert(parse(mp4) == ("isom", 600L, 2500L, 1))
  }

  test("junk boxes before moov are skipped by declared size (no fixed offsets)") {
    val junk = "0000000B 66726565 414243" // odd-size free box
    val mp4 = hex(ftypIsom + junk + moov(mvhdV0))
    assert(parse(mp4) == ("isom", 1000L, 7500L, 0))
  }

  test("size == 1 reads the 64-bit largesize; size == 0 extends to EOF") {
    // A largesize'd free box (24 bytes: 16 header + 8 payload), then
    // moov, then a size-0 mdat that owns the rest of the file.
    val large = "00000001 66726565 0000000000000018" + "00" * 8
    val mdat0 = "00000000 6D646174" + "AB" * 32
    val mp4 = hex(ftypIsom + large + moov(mvhdV0 + trak) + mdat0)
    assert(parse(mp4) == ("isom", 1000L, 7500L, 1))
  }

  test("the mdat payload is never required: header-only bytes parse") {
    // No mdat at all — a metadata scan must not depend on media data.
    val mp4 = hex(ftypIsom + moov(mvhdV0))
    assert(parse(mp4) == ("isom", 1000L, 7500L, 0))
  }

  test("corrupt structures are total (unknown, zeros)") {
    assert(parse(Array.emptyByteArray)._1 == "unknown")
    assert(parse(hex("00000010 66747970 69736F6D"))._1 == "unknown") // truncated ftyp
    assert(parse(hex(ftypIsom))._1 == "unknown") // no moov
    assert(parse(hex(moov(mvhdV0)))._1 == "unknown") // no ftyp
    assert(parse(hex("52494646 00000000 57415645"))._1 == "unknown") // RIFF magic
    // declared box size larger than the file
    assert(parse(hex("000000FF 66747970 69736F6D 00000000"))._1 == "unknown")
    // box size below the 8-byte header minimum
    assert(parse(hex("00000004 66747970 69736F6D 00000000"))._1 == "unknown")
    // zero timescale must not divide
    val zeroTs =
      "0000006C 6D766864 00000000 00000000 00000000 00000000 00001D4C" + "00" * 80
    assert(parse(hex(ftypIsom + moov(zeroTs)))._1 == "unknown")
    // mvhd version 2 does not exist
    val v2 = "0000006C 6D766864 02000000" + "00" * 96
    assert(parse(hex(ftypIsom + moov(v2)))._1 == "unknown")
  }

  test("expression parses the synthesized MP4 fixtures in codegen and " +
    "matches column math") {
    val docs = Tables.documents(spark, sfDir)
    val got = Multimodal.fixtureVideo(docs)
      .select(col("id"), VideoMeta(col("content")).as("v"))
      .select(col("id"), col("v.brand"), col("v.timescale"),
        col("v.duration_ms"), col("v.n_tracks"))
    val expect = docs.select(col("doc_id").as("id"),
      when(col("doc_id") % 3 === 0, "isom")
        .when(col("doc_id") % 3 === 1, "mp41").otherwise("mp42").as("brand"),
      ((col("n_chars") % 3 + 1) * 600).cast("long").as("timescale"),
      expr("CAST((n_chars * 50 * 1000) DIV ((n_chars % 3 + 1) * 600) AS BIGINT)")
        .as("duration_ms"),
      (col("doc_id") % 2 + 1).cast("int").as("n_tracks"))
    assert(got.except(expect).isEmpty && expect.except(got).isEmpty)
  }

  test("video_meta is SQL-callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    val one = Multimodal.fixtureVideo(Tables.documents(spark, sfDir)).limit(5)
    one.createOrReplaceTempView("vm_fixture")
    val n = spark.sql(
      "SELECT video_meta(content).brand AS b FROM vm_fixture " +
      "WHERE video_meta(content).timescale > 0").count()
    assert(n == 5)
  }
}
