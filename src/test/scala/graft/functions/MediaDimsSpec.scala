package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ext.Multimodal

/** Header-parse correctness against hand-assembled, spec-exact container
  * bytes with known dimensions — independent of the fixtureMedia
  * synthesis path (which the mm_dims oracle covers), so a bug mirrored
  * between synthesis and parse still fails here.
  */
class MediaDimsSpec extends SparkSpec {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(b: Array[Byte]): (String, Int, Int) = {
    val r = MediaDimsImpl.dims(b)
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2))
  }

  test("PNG IHDR: 640x480, big-endian u32 at offsets 16/20") {
    val png = hex("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08060000001F15C489")
    assert(parse(png) == ("png", 640, 480))
  }

  test("JPEG: SOF found after skipping APP0, APP1 and DQT segments") {
    // SOI | APP0 len16 | APP1 len8 (Exif stub) | DQT len5 | SOF2 len17: h=240 w=320
    val jpeg = hex(
      "FFD8" +
      "FFE000104A46494600010100000100010000" +
      "FFE100084578696600" + "00" + // 6-byte payload after the length field
      "FFDB0005AABBCC" +
      "FFC2001108" + "00F0" + "0140" + "03012200021101031101")
    assert(parse(jpeg) == ("jpeg", 320, 240))
  }

  test("JPEG: entropy-coded data (SOS) before any SOF yields unknown") {
    val jpeg = hex("FFD8" + "FFDA0008AABBCCDDEEFF")
    assert(parse(jpeg) == ("unknown", 0, 0))
  }

  test("GIF89a logical screen descriptor: 800x600 little-endian") {
    val gif = hex("474946383961" + "2003" + "5802" + "F70000")
    assert(parse(gif) == ("gif", 800, 600))
    val gif87 = hex("474946383761" + "0100" + "0200" + "F70000")
    assert(parse(gif87) == ("gif", 1, 2))
  }

  test("total function: empty, truncated, and non-media bytes parse to unknown") {
    assert(parse(Array.emptyByteArray) == ("unknown", 0, 0))
    assert(parse(hex("89504E470D0A1A0A00000004")) == ("unknown", 0, 0)) // truncated PNG
    assert(parse(hex("FFD8FFE0")) == ("unknown", 0, 0)) // truncated JPEG
    assert(parse("just some text".getBytes("UTF-8")) == ("unknown", 0, 0))
  }

  test("codegen path over a DataFrame matches direct kernel eval") {
    val rows = Seq(
      1L -> hex("89504E470D0A1A0A0000000D49484452000000100000002008060000001F15C489"),
      2L -> hex("FFD8FFE000104A46494600010100000100010000FFC0001108001000200301220002110103110100"),
      3L -> hex("4749463839610500070021F90400"),
      4L -> "plain".getBytes("UTF-8"))
    val got = rows.toDF("id", "content")
      .select(col("id"), MediaDims(col("content")).as("d"))
      .select(col("id"), col("d.format"), col("d.width"), col("d.height"))
      .as[(Long, String, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("png", 16, 32)))
    assert(got(2L) == (("jpeg", 32, 16)))
    assert(got(3L) == (("gif", 5, 7)))
    assert(got(4L) == (("unknown", 0, 0)))
  }

  test("fixtureMedia round trip: parsed dims equal the synthesis formulas") {
    val docs = Tables.documents(spark, sfDir)
    val parsed = Multimodal.fixtureMedia(docs)
      .select(col("id"), MediaDims(col("content")).as("d"))
    val expected = docs.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpeg").otherwise("gif").as("format"),
      (col("n_chars") % 317 + 16).cast("int").as("width"),
      (col("n_chars") % 211 + 16).cast("int").as("height"))
    val mismatches = parsed
      .select(col("id"), col("d.format").as("format"),
        col("d.width").as("width"), col("d.height").as("height"))
      .exceptAll(expected)
    assert(mismatches.isEmpty, "parsed dims drifted from the synthesis formulas")
  }
}
