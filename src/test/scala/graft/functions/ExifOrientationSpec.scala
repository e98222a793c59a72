package graft.functions

import graft.SparkSpec

/** EXIF orientation kernel (E283) hand cases: both byte orders, the
  * decoy-entry walk, and every refusal path reads 0 (total function).
  */
class ExifOrientationSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  private val tiffLe6 =
    "49492A0008000000 0200 0F010200 04000000 67726674" +
      " 12010300 01000000 0600 0000 00000000"
  private val tiffBe3 =
    "4D4D002A00000008 0002 010F0002 00000004 67726674" +
      " 01120003 00000001 0003 0000 00000000"
  private def jpeg(tiff: String): Array[Byte] =
    hex("FFD8 FFE1002E 457869660000 " + tiff)

  private def o(b: Array[Byte]): Int =
    ExifOrientationImpl.orientation(b)

  test("little- and big-endian TIFF blocks both parse, past the decoy") {
    assert(o(jpeg(tiffLe6)) == 6)
    assert(o(jpeg(tiffBe3)) == 3)
  }

  test("exif_orientation is SQL-callable after registration") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(jpeg(tiffLe6), jpeg(tiffBe3)).toDF("content")
      .createOrReplaceTempView("exif_fixture")
    val got = spark.sql(
      "SELECT exif_orientation(content) AS o FROM exif_fixture")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(got == Seq(3, 6))
  }

  test("refusal paths all read 0: no APP1, truncated TIFF, missing " +
      "tag, out-of-range value, not a JPEG") {
    assert(o(hex("FFD8FFE000104A46494600010100000100010000AA")) == 0,
      "plain JFIF must read 0")
    assert(o(jpeg(tiffLe6).take(20)) == 0, "truncated TIFF must read 0")
    // IFD with only the decoy entry
    assert(o(hex("FFD8 FFE10022 457869660000" +
      " 49492A0008000000 0100 0F010200 04000000 67726674 00000000")) == 0)
    // orientation 9: out of the 1..8 range
    assert(o(jpeg(tiffLe6.replace("0600 0000 00000000",
      "0900 0000 00000000"))) == 0)
    assert(o(hex("89504E47")) == 0, "a PNG must read 0")
    assert(o(Array[Byte]()) == 0, "empty bytes must read 0")
  }
}
