package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** Totality fuzz for the native binary header parsers.
  *
  * At ingest scale these expressions run on every blob of an untrusted
  * corpus, so the contract is stronger than "parses valid media": for
  * ANY byte string — random garbage, a valid header truncated at any
  * point, a valid header with any single byte flipped, or garbage
  * dressed in a real magic prefix — the kernel must return a
  * well-formed row (never throw, never loop), and must be
  * deterministic. A crash here would kill a task and, repeated across
  * retries, the whole job; the unit specs pin valid-input behavior,
  * this spec pins the other 2^n inputs.
  */
object MediaParserFuzzSpec extends Properties("MediaParserFuzz") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(200)

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // Valid exemplars, one per container family (mirrors the unit specs).
  private val validPng = hex(
    "89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 08060000001F15C489")
  private val validJpeg = hex(
    "FFD8" + "FFE000104A46494600010100000100010000" +
      "FFDB0005AABBCC" + "FFC2001108" + "00F0" + "0140" + "03012200021101031101")
  private val validGif = hex("474946383961 2003 5802 F70000")
  private val validWav = hex(
    "52494646 2C000000 57415645" +
      "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
      "64617461 08000000 0011223344556677")
  private val validMp4 = hex(
    "00000010 66747970 69736F6D 00000000" + // ftyp isom
      "00000084 6D6F6F76" +                  // moov: mvhd v0 + 1 trak
      "0000006C 6D766864 00000000 00000000 00000000 000003E8 00001D4C" +
      "00" * 80 +
      "00000010 7472616B 0000000000000000")
  private val exemplars =
    Seq(validPng, validJpeg, validGif, validWav, validMp4)

  // Every kernel, checked for (a) no throw, (b) a row of the declared
  // arity — so a refactor that starts returning null or a short row on
  // some garbage path fails here, not in a production NPE downstream.
  private val kernels: Seq[(String, Array[Byte] => Int)] = Seq(
    ("media_dims", b => MediaDimsImpl.dims(b).numFields),
    ("audio_meta", b => AudioMetaImpl.parse(b).numFields),
    ("video_meta", b => VideoMetaImpl.parse(b).numFields))
  private val arity = Map("media_dims" -> 3, "audio_meta" -> 5, "video_meta" -> 4)

  private def total(b: Array[Byte]): Prop =
    Prop.all(kernels.map { case (name, k) =>
      val n =
        try k(b)
        catch {
          case e: Throwable =>
            println(s"$name threw ${e.getClass.getSimpleName} on ${b.length} bytes: " +
              b.take(64).map(x => f"${x & 0xff}%02x").mkString)
            -1
        }
      Prop(n == arity(name)) :| s"$name arity"
    }: _*)

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 600).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  property("arbitrary bytes: all kernels return a well-formed row") =
    Prop.forAllNoShrink(genBytes)(total)

  property("valid magic + garbage body: still total") = {
    val magics = Seq(
      validPng.take(8), validJpeg.take(2), validGif.take(6),
      validWav.take(12), validMp4.take(8))
    Prop.forAllNoShrink(Gen.oneOf(magics), genBytes) { (magic, tail) =>
      total(magic ++ tail)
    }
  }

  property("every truncation of every valid exemplar: still total") =
    // Deterministic sweep (not sampled): truncation off-by-ones are
    // exactly the boundary class the bounds checks exist for.
    Prop.all(exemplars.flatMap(v =>
      (0 to v.length).map(k => total(v.take(k)))): _*)

  property("single-byte mutations of valid exemplars: still total") =
    Prop.forAllNoShrink(
      Gen.oneOf(exemplars),
      Gen.chooseNum(0, 1000),
      Gen.chooseNum(Byte.MinValue, Byte.MaxValue)) { (v, posSeed, nb) =>
      val b = v.clone()
      b(posSeed % b.length) = nb
      total(b)
    }

  property("kernels are deterministic (same bytes, same row)") =
    Prop.forAllNoShrink(genBytes) { b =>
      Prop.all(
        Prop(MediaDimsImpl.dims(b).toString == MediaDimsImpl.dims(b).toString),
        Prop(AudioMetaImpl.parse(b).toString == AudioMetaImpl.parse(b).toString),
        Prop(VideoMetaImpl.parse(b).toString == VideoMetaImpl.parse(b).toString))
    }
}
