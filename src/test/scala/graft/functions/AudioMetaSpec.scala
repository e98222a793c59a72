package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ext.Multimodal

/** RIFF/WAVE chunk-walk correctness against hand-assembled, spec-exact
  * bytes with known header fields — independent of the fixtureAudio
  * synthesis path (which the mm_audio_meta oracle covers), so a bug
  * mirrored between synthesis and parse still fails here.
  */
class AudioMetaSpec extends SparkSpec {
  import spark.implicits._

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def parse(b: Array[Byte]): (String, Int, Int, Int, Long) = {
    val r = AudioMetaImpl.parse(b)
    (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
  }

  // "fmt " payload: pcm(0100) mono(0100) 8000Hz(401F0000)
  // byteRate 16000 (803E0000) blockAlign 2 (0200) bits 16 (1000)
  private val fmtPcmMono8k16 =
    "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000"

  test("canonical PCM WAV: mono 8 kHz 16-bit, 32000 data bytes = 2000 ms") {
    val wav = hex(
      "52494646 00000000 57415645" + fmtPcmMono8k16 +
      "64617461 007D0000") ++ new Array[Byte](32000)
    assert(parse(wav) == ("pcm", 1, 8000, 16, 2000L))
  }

  test("chunk walk skips junk chunks before fmt, including odd-size word alignment") {
    // LIST(5 bytes, padded to 6) then an "ijnk" chunk, then fmt + data.
    val wav = hex(
      "52494646 00000000 57415645" +
      "4C495354 05000000 494E464F41 00" + // odd size 5 → 1 pad byte
      "696A6E6B 02000000 BEEF" +
      fmtPcmMono8k16 +
      "64617461 40000000") ++ new Array[Byte](64)
    assert(parse(wav) == ("pcm", 1, 8000, 16, 4L)) // 64 B / 16000 B/s = 4 ms
  }

  test("data size is clamped to the bytes actually present") {
    // Declared 1 s of audio but only half the payload shipped.
    val wav = hex(
      "52494646 00000000 57415645" + fmtPcmMono8k16 +
      "64617461 803E0000") ++ new Array[Byte](8000)
    assert(parse(wav) == ("pcm", 1, 8000, 16, 500L))
  }

  test("non-PCM format code is surfaced, not misread") {
    val wav = hex(
      "52494646 00000000 57415645" +
      "666D7420 10000000 0300 0200 80BB0000 00EE0200 0800 2000" + // IEEE float
      "64617461 00000000")
    assert(parse(wav) == ("wav-3", 2, 48000, 32, 0L))
  }

  test("a near-2^31 declared chunk size exits the walk instead of overflowing") {
    // 8 + 0x7FFFFFFF + align would wrap Int negative and crash the
    // scan; the Long-arithmetic advance must yield unknown instead.
    val wav = hex("52494646 00000000 57415645" + "4C495354 FFFFFF7F 0000")
    assert(parse(wav)._1 == "unknown")
    // and with fmt already parsed, the same corrupt tail still returns
    // a total row (no data chunk found → unknown, no exception)
    val wav2 = hex("52494646 00000000 57415645" + fmtPcmMono8k16 +
      "4C495354 FFFFFF7F 0000")
    assert(parse(wav2)._1 == "unknown")
  }

  test("out-of-range fmt fields route to unknown, not a plausible row") {
    // sample rate 0x90000000 (u32 past Int.MaxValue) would wrap
    // negative through .toInt; zero channels with a positive byteRate
    // would yield an impossible-but-plausible row. Both must take the
    // unparseable → Unknown route (ADVICE r04).
    val hugeRate = hex(
      "52494646 00000000 57415645" +
      "666D7420 10000000 0100 0100 00000090 803E0000 0200 1000" +
      "64617461 40000000") ++ new Array[Byte](64)
    assert(parse(hugeRate)._1 == "unknown")
    val zeroCh = hex(
      "52494646 00000000 57415645" +
      "666D7420 10000000 0100 0000 401F0000 803E0000 0200 1000" +
      "64617461 40000000") ++ new Array[Byte](64)
    assert(parse(zeroCh)._1 == "unknown")
    val zeroRate = hex(
      "52494646 00000000 57415645" +
      "666D7420 10000000 0100 0100 00000000 803E0000 0200 1000" +
      "64617461 40000000") ++ new Array[Byte](64)
    assert(parse(zeroRate)._1 == "unknown")
  }

  test("garbage, truncation, and missing chunks are total (unknown, zeros)") {
    assert(parse(Array.emptyByteArray)._1 == "unknown")
    assert(parse(hex("52494646 00000000 57415645"))._1 == "unknown") // no chunks
    assert(parse(hex("52494646 00000000 57415645 666D7420 10000000 0100"))._1
      == "unknown") // truncated fmt
    assert(parse(hex("4F676753 00020000"))._1 == "unknown") // OggS magic
    // fmt present but no data chunk
    assert(parse(hex("52494646 00000000 57415645" + fmtPcmMono8k16))._1 == "unknown")
  }

  test("expression parses the synthesized WAV fixtures in codegen and matches column math") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val out = Multimodal.fixtureAudio(docs)
      .select(col("id"), AudioMeta(col("content")).as("a"))
      .join(docs.withColumnRenamed("doc_id", "id"), "id")
      .select(col("a.codec"), col("a.channels"), col("a.sample_rate"),
        col("a.bits"), col("a.duration_ms"),
        (col("id") % 2 + 1).cast("int").as("exp_ch"),
        ((col("n_chars") % 3 + 1) * 8000).cast("int").as("exp_rate"),
        ((col("n_chars") % 2 + 1) * 8).cast("int").as("exp_bits"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(0) == "pcm")
      assert(r.getInt(1) == r.getInt(5), s"channels: $r")
      assert(r.getInt(2) == r.getInt(6), s"rate: $r")
      assert(r.getInt(3) == r.getInt(7), s"bits: $r")
      assert(r.getLong(4) >= 0)
    }
  }

  test("audio_meta is SQL-callable after registration") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT audio_meta(unhex('52494646000000005741564500')).codec AS c")
      .as[String].head()
    assert(row == "unknown")
  }
}
