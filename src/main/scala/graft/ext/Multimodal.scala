package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (north-star extension, SURVEY.md §7.4).
  *
  * Media assets are modeled the way the reference treats CDC payloads
  * (`kafka.rs:80-82`): an opaque `binary` content column that is never
  * re-encoded, next to typed metadata the engine *can* reason about.
  * That keeps scans prunable — a metadata-only query never deserializes
  * content bytes — and lets content flow through shuffles untouched.
  *
  * Decode/feature-extract runs per partition over iterators (the JVM
  * analogue of an Arrow-batched `mapInPandas`): the Spark-side plumbing
  * (schema, encoders, partition-wise batching) is real. For IMAGES the
  * codec is real too — [[decodeLuma]] drives `javax.imageio` (the
  * JDK's own PNG/JPEG/GIF decoder) on executors: PNG gate-checked
  * pixel-EXACT through `mm_phash_real` (E313, lossless by spec), JPEG
  * gate-checked through `mm_decode_jpeg` (E323, r15) with exact
  * header geometry plus a measured per-image MAE band (lossy by
  * spec, so the bound is the contract). The REMAINING ungated codecs
  * are exactly the video/audio PAYLOAD tiers — no demuxer or PCM
  * codec ships in this container's JDK — which still ride
  * [[StubCodec]] / [[sampleBlocks]], clearly-marked deterministic
  * fakes next to REAL header parsers (MediaDims/AudioMeta/VideoMeta).
  * Swapping those in changes one function, not the plan.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque content bytes. */
  case class MmMeta(format: String, nBytes: Long, width: Int, height: Int)

  /** One multimodal record: id + opaque bytes + typed metadata. */
  case class MmRecord(id: Long, content: Array[Byte], meta: MmMeta)

  /** Extracted features: fixed-width vector + decode provenance. */
  case class MmFeatures(id: Long, format: String, feature: Array[Float], decoder: String)

  /** Magic-byte prefixes → sniffed container format. Applied to the
    * first 4 content bytes (lowercase hex), longest prefix wins.
    */
  val MagicPrefixes: Seq[(String, String)] = Seq(
    "89504e47" -> "png",
    "ffd8ff" -> "jpeg",
    "474946" -> "gif",
    "25504446" -> "pdf",
    "52494646" -> "riff")

  /** Build a multimodal table from the fixture `documents` table: the
    * UTF-8 text bytes stand in for media content (deterministic, so the
    * DuckDB oracle can reproduce every derived value), `source` for the
    * claimed format.
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        col("source").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("nBytes"),
        lit(0).as("width"), lit(0).as("height")).as("meta"))

  /** Deterministic media fixtures with REAL container headers: each doc
    * becomes a PNG / JPEG / GIF (by `doc_id % 3`) whose header encodes
    * pixel dimensions derived from `n_chars`, followed by the text bytes
    * as opaque payload. The headers are byte-exact per spec — PNG IHDR
    * (big-endian u32 dims), JPEG JFIF APP0 + SOF0 segments (big-endian
    * u16, found only by walking the segment list), GIF89a logical screen
    * descriptor (little-endian u16) — so a real parser must get offsets,
    * endianness, and segment traversal right to recover them. Byte
    * packing is done with hex-string slicing (`lpad(hex(..))`/`unhex`),
    * an independent formulation from the shift-based reads in
    * [[graft.functions.MediaDimsImpl]], so a mirrored endianness bug
    * cannot cancel out.
    */
  def fixtureMedia(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    val w = (col("n_chars") % 317 + 16).cast("int")
    val h = (col("n_chars") % 211 + 16).cast("int")
    def be4(c: Column) = unhex(lpad(hex(c), 8, "0"))
    def be2(c: Column) = unhex(lpad(hex(c), 4, "0"))
    def le2(c: Column) = {
      val hx = lpad(hex(c), 4, "0")
      unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    val payload = encode(col("text"), "UTF-8")
    val png = concat( // signature + IHDR(len=13): w, h, depth/color/trailer
      unhex(lit("89504E470D0A1A0A0000000D49484452")),
      be4(w), be4(h), unhex(lit("0806000000")), payload)
    val jpeg = concat( // SOI + APP0/JFIF(len=16) + SOF0(len=17): 8-bit, h, w, 3 components
      unhex(lit("FFD8FFE000104A46494600010100000100010000FFC0001108")),
      be2(h), be2(w), unhex(lit("03012200021101031101")), payload)
    val gif = concat( // GIF89a + logical screen descriptor (LE w, h)
      unhex(lit("474946383961")), le2(w), le2(h), unhex(lit("F70000")), payload)
    docs.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, jpeg)
        .otherwise(gif).as("content"))
  }

  /** Deterministic JPEG fixtures with REAL EXIF APP1 segments (E283):
    * every doc becomes SOI + APP1(Exif/TIFF) + payload, where the TIFF
    * block alternates byte order by doc parity (`II` little-endian for
    * even ids, `MM` big-endian for odd — a parser with a mirrored
    * endianness bug cannot pass both) and IFD0 carries a DECOY entry
    * (tag 0x010F Make) before the 0x0112 orientation tag, so entry
    * positions must be walked, not assumed. Orientation value =
    * doc_id % 8 + 1; every fifth doc is a plain JFIF JPEG with no APP1
    * at all (the absent path must read 0, not crash). Byte packing via
    * hex-string slicing — the independent formulation from the
    * shift-based reads in [[graft.functions.ExifOrientationImpl]].
    */
  def fixtureExifJpeg(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    def be2(c: Column) = unhex(lpad(hex(c), 4, "0"))
    def le2(c: Column) = {
      val hx = lpad(hex(c), 4, "0")
      unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    val v = (col("doc_id") % 8 + 1).cast("int")
    val payload = encode(col("text"), "UTF-8")
    // TIFF blocks (38 bytes): header + count=2 + Make decoy +
    // Orientation + next-IFD=0
    val tiffLe = concat(
      unhex(lit("49492A0008000000" + "0200" +
        "0F010200" + "04000000" + "67726674" +
        "12010300" + "01000000")),
      le2(v), unhex(lit("0000" + "00000000")))
    val tiffBe = concat(
      unhex(lit("4D4D002A00000008" + "0002" +
        "010F0002" + "00000004" + "67726674" +
        "01120003" + "00000001")),
      be2(v), unhex(lit("0000" + "00000000")))
    // APP1 length 0x2E = 2(len) + 6(Exif\0\0) + 38(TIFF)
    def withTiff(t: Column) = concat(
      unhex(lit("FFD8FFE1002E457869660000")), t, payload)
    val plain = concat( // JFIF APP0 only — no EXIF anywhere
      unhex(lit("FFD8FFE000104A46494600010100000100010000")), payload)
    docs.select(
      col("doc_id").as("id"),
      when(col("doc_id") % 5 === 0, plain)
        .when(col("doc_id") % 2 === 0, withTiff(tiffLe))
        .otherwise(withTiff(tiffBe)).as("content"))
  }

  /** Deterministic WAV fixtures with REAL RIFF structure: each doc
    * becomes a PCM WAVE file whose `fmt ` chunk fields derive from doc
    * columns — channels `1 + doc_id % 2`, sample rate
    * `8000 * (1 + n_chars % 3)`, bits `8 * (1 + n_chars % 2)` — with
    * the UTF-8 text bytes as the `data` payload. A junk `LIST` chunk
    * sits between `WAVE` and `fmt `, so a parser that assumes fixed
    * offsets (instead of walking chunks by declared size) reads
    * garbage. Byte packing is little-endian via hex-string slicing —
    * an independent formulation from the shift-based reads in
    * [[graft.functions.AudioMetaImpl]], so a mirrored endianness bug
    * cannot cancel out.
    */
  def fixtureAudio(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    def le2(c: Column) = {
      val hx = lpad(hex(c), 4, "0")
      unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    def le4(c: Column) = {
      val hx = lpad(hex(c), 8, "0")
      unhex(concat(substring(hx, 7, 2), substring(hx, 5, 2),
        substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    val channels = (col("doc_id") % 2 + 1).cast("int")
    val rate = ((col("n_chars") % 3 + 1) * 8000).cast("int")
    val bits = ((col("n_chars") % 2 + 1) * 8).cast("int")
    val blockAlign = (channels * bits / 8).cast("int")
    val byteRate = (rate * blockAlign).cast("int")
    val payload = encode(col("text"), "UTF-8")
    val dataSize = octet_length(payload)
    // riffSize = 4 ("WAVE") + LIST(8+6) + fmt(8+16) + data(8+size)
    val riffSize = (dataSize + 50).cast("int")
    val wav = concat(
      unhex(lit("52494646")), le4(riffSize), unhex(lit("57415645")), // RIFF..WAVE
      unhex(lit("4C495354")), le4(lit(6)), unhex(lit("494E464F7879")), // LIST junk
      unhex(lit("666D7420")), le4(lit(16)), // "fmt " + size
      le2(lit(1)), le2(channels), le4(rate), le4(byteRate),
      le2(blockAlign), le2(bits),
      unhex(lit("64617461")), le4(dataSize), payload) // "data" + size + bytes
    docs.select(col("doc_id").as("id"), wav.as("content"))
  }

  /** Deterministic MP4 fixtures with REAL ISO-BMFF box structure: each
    * doc becomes an `ftyp` + junk `free` box + `moov` (with an `mvhd`
    * movie header and 1-2 `trak` boxes) + `mdat` file whose fields
    * derive from doc columns — brand by `doc_id % 3`, timescale
    * `600 * (1 + n_chars % 3)`, duration `50 * n_chars` units, track
    * count `1 + doc_id % 2`. Every other doc gets a version-1 mvhd
    * (64-bit times), the rest version 0, so BOTH header layouts are
    * exercised by oracle-checked data; every fifth doc's trailing
    * `mdat` uses the spec's `size == 0` to-end-of-file escape. The
    * junk `free` box before `moov` breaks fixed-offset parsers. Byte
    * packing is big-endian via hex-string slicing — an independent
    * formulation from the shift-based reads in
    * [[graft.functions.VideoMetaImpl]], so a mirrored endianness bug
    * cannot cancel out.
    */
  def fixtureVideo(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Column
    def be4(c: Column) = unhex(lpad(hex(c), 8, "0"))
    def be8(c: Column) = unhex(lpad(hex(c), 16, "0"))
    val brand = when(col("doc_id") % 3 === 0, "isom")
      .when(col("doc_id") % 3 === 1, "mp41")
      .otherwise("mp42")
    val timescale = ((col("n_chars") % 3 + 1) * 600).cast("long")
    val duration = (col("n_chars") * 50).cast("long")
    val nTraks = (col("doc_id") % 2 + 1).cast("int")
    val ftyp = concat(be4(lit(16)), encode(lit("ftyp"), "UTF-8"),
      encode(brand, "UTF-8"), be4(lit(0)))
    val free = concat(be4(lit(11)), encode(lit("free"), "UTF-8"),
      encode(lit("xyz"), "UTF-8")) // odd size: no alignment in BMFF
    val zeros80 = unhex(lit("00" * 80))
    val mvhdV0 = concat(be4(lit(108)), encode(lit("mvhd"), "UTF-8"),
      be4(lit(0)), // version 0 + flags
      be4(lit(0)), be4(lit(0)), // creation, modification (u32)
      be4(timescale), be4(duration), zeros80)
    val mvhdV1 = concat(be4(lit(120)), encode(lit("mvhd"), "UTF-8"),
      unhex(lit("01000000")), // version 1 + flags
      be8(lit(0)), be8(lit(0)), // creation, modification (u64)
      be4(timescale), be8(duration), zeros80)
    val mvhd = when(col("doc_id") % 2 === 0, mvhdV0).otherwise(mvhdV1)
    val trak = concat(be4(lit(16)), encode(lit("trak"), "UTF-8"),
      unhex(lit("00" * 8)))
    val traks = when(nTraks === 1, trak).otherwise(concat(trak, trak))
    val mvhdSize = when(col("doc_id") % 2 === 0, lit(108)).otherwise(lit(120))
    val moovSize = lit(8) + mvhdSize + nTraks * 16
    val moov = concat(be4(moovSize), encode(lit("moov"), "UTF-8"), mvhd, traks)
    val payload = encode(col("text"), "UTF-8")
    val mdatSize = when(col("doc_id") % 5 === 0, lit(0)) // size-0: to EOF
      .otherwise(octet_length(payload) + 8)
    val mdat = concat(be4(mdatSize), encode(lit("mdat"), "UTF-8"), payload)
    docs.select(col("doc_id").as("id"),
      concat(ftyp, free, moov, mdat).as("content"))
  }

  /** Metadata/sniffing projection — never touches more than the first 4
    * content bytes plus the metadata struct (columnar pruning does the
    * rest). Output: (id, n_bytes, magic_hex, sniffed, claimed).
    */
  def metadata(mm: DataFrame): DataFrame = {
    val magic = lower(hex(substring(col("content"), 1, 4)))
    val sniffed = MagicPrefixes.foldRight(lit("unknown"): org.apache.spark.sql.Column) {
      case ((prefix, fmt), acc) =>
        when(magic.startsWith(prefix), lit(fmt)).otherwise(acc)
    }
    mm.select(
      col("id"),
      col("meta.nBytes").as("n_bytes"),
      magic.as("magic_hex"),
      sniffed.as("sniffed"),
      col("meta.format").as("claimed"))
  }

  /** STUB codec — deterministic fake standing in for a real image/audio
    * decoder (none available in this container). Produces an 8-dim
    * "feature" from content bytes: mean, variance proxy, and 6 coarse
    * byte-histogram buckets, all scaled to [0,1]. Deterministic ⇒
    * testable; replace with a real codec (JNI/ONNX) in production — the
    * call site and batch shape do not change.
    */
  object StubCodec {
    val Name = "stub-v1"
    def features(content: Array[Byte]): Array[Float] = {
      if (content.isEmpty) return Array.fill(8)(0f)
      val n = content.length
      var sum = 0L; var sumSq = 0L
      val hist = new Array[Long](6)
      var i = 0
      while (i < n) {
        val b = content(i) & 0xff
        sum += b; sumSq += b.toLong * b
        hist(b * 6 / 256) += 1
        i += 1
      }
      val mean = sum.toDouble / n
      val varr = sumSq.toDouble / n - mean * mean
      Array(
        (mean / 255.0).toFloat,
        (math.sqrt(math.max(varr, 0)) / 255.0).toFloat) ++
        hist.map(h => (h.toDouble / n).toFloat)
    }
  }

  /** Partition-wise decode: iterate each partition once, decode record
    * by record (a real codec would batch N records per call — the
    * iterator shape supports that without plan changes). No shuffle: a
    * narrow Dataset map stage whose parallelism is the scan's.
    */
  def decodeFeatures(spark: SparkSession, mm: DataFrame): Dataset[MmFeatures] = {
    import spark.implicits._
    mm.as[MmRecord].mapPartitions { it =>
      it.map(r => MmFeatures(r.id, r.meta.format, StubCodec.features(r.content), StubCodec.Name))
    }
  }

  /** Deterministic frame sampling over an opaque "video": pick every
    * k-th block of `blockSize` bytes (a stand-in for every k-th frame).
    * Pure byte arithmetic — the real thing swaps the slicer for a
    * demuxer; partitioning and output schema stay put.
    */
  def sampleBlocks(content: Array[Byte], blockSize: Int, everyK: Int): Seq[Array[Byte]] =
    content.grouped(blockSize).zipWithIndex
      .collect { case (block, i) if i % everyK == 0 => block }
      .toSeq

  // ------------------------------------------------------------------
  // REAL image decode tier (E313 PNG exact, E323 JPEG banded): the
  // one codec the JDK itself ships — javax.imageio — decodes ACTUAL
  // PNG/JPEG/GIF payloads on executors. This retires the byte-grid
  // stand-in for images: mm_phash_real perceptual-hashes decoded
  // PIXELS and mm_decode_jpeg bounds the lossy round trip. Still
  // genuinely ungated in this container: video/audio PAYLOAD decode
  // (no demuxer/PCM codec in the JDK) — those remain header-parse
  // (MediaDims/AudioMeta/VideoMeta) plus documented stand-ins
  // (StubCodec / sampleBlocks).
  // ------------------------------------------------------------------

  /** Per-pixel value of the planted grayscale fixture: row-major pixel
    * p of asset `id` is `(id·31 + p·7) mod 256`. Pure integer
    * arithmetic, so the DuckDB oracle regenerates the expected luma
    * stream WITHOUT a codec — the gate then proves the Spark side's
    * REAL decode recovered exactly these values through an actual
    * PNG encode→decode round trip (PNG is lossless by spec).
    */
  def plantedPixel(id: Long, p: Long): Int = ((id * 31L + p * 7L) % 256L).toInt

  /** Planted-image geometry, derived from `n_chars` like
    * [[fixtureMedia]]'s dims: small (9–21 × 8–14) so fixture encode
    * cost stays trivial at any SF while every asset still exercises
    * multi-row rasters.
    */
  def plantedDims(nChars: Long): (Int, Int) =
    ((nChars % 13 + 9).toInt, (nChars % 7 + 8).toInt)

  private def encodeImage(fmt: String, id: Long,
      nChars: Long): Array[Byte] = {
    val (w, h) = plantedDims(nChars)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        r.setSample(x, y, 0, plantedPixel(id, p.toLong))
        p += 1; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def encodePng(id: Long, nChars: Long): Array[Byte] =
    encodeImage("png", id, nChars)

  /** One REAL grayscale PNG per document — encoded by the JDK's own
    * ImageIO PNG writer on executors (a per-row UDF, but this IS the
    * decode tier: codec work is the payload, not plan overhead; the
    * scan stays narrow and shuffle-free). Deterministic pixels
    * ([[plantedPixel]]), so the oracle needs no codec.
    */
  def realPngMedia(docs: DataFrame): DataFrame = {
    val enc = udf((id: Long, nChars: Long) => encodePng(id, nChars))
    docs.select(col("doc_id").as("id"),
      enc(col("doc_id"), col("n_chars")).as("content"))
  }

  /** One REAL grayscale JPEG per document (E323, r15 — VERDICT r14
    * #4): same planted pixels as [[realPngMedia]], pushed through the
    * JDK's LOSSY JPEG writer. The gate (`mm_decode_jpeg`) checks the
    * E66 machine-checked-bound way: geometry columns come EXACT from
    * the real SOF header parse (MediaDims) and hash-match the
    * oracle's formula, while the decoded-luma fidelity is a per-image
    * MAE bound (bit-exact luma is impossible for a lossy codec — the
    * band is the spec'd one ImageDecodeSpec measures).
    */
  def realJpegMedia(docs: DataFrame): DataFrame = {
    val enc = udf((id: Long, nChars: Long) => encodeImage("jpg", id, nChars))
    docs.select(col("doc_id").as("id"),
      enc(col("doc_id"), col("n_chars")).as("content"))
  }

  /** Decode image bytes (PNG/JPEG/GIF — whatever ImageIO sniffs) to
    * the row-major LUMA byte stream — the "decoded-pixel luminance"
    * input the DHash32 scaladoc always named as the production swap
    * for its byte-grid stand-in. Single-band rasters read their
    * stored sample directly (bit-exact for grayscale PNG round
    * trips — converting through getRGB would apply the gray→sRGB
    * tone curve and break pixel exactness); multi-band images take
    * the ITU-R BT.601 integer luma (299·R + 587·G + 114·B) / 1000.
    * Undecodable or null bytes → null (DHash32 then yields null —
    * corrupt assets surface as missing hashes, not crashes).
    */
  /** Decoded luma as 0-255 ints (BINARY → ARRAY<INT> bridge): the
    * MAE gate explodes pixels through native expressions, and Spark
    * has no binary-element explode.
    */
  val lumaInts: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((b: Array[Byte]) => if (b == null) null else b.map(x => x & 0xff))

  val decodeLuma: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => {
      if (bytes == null) null
      else {
        // NonFatal, not just IOException: ImageIO plugins throw
        // RuntimeExceptions (IllegalArgumentException, CMMException,
        // IndexOutOfBoundsException) on malformed payloads, and the
        // contract is "corrupt assets surface as missing hashes, not
        // crashes" — same pattern as ConfluentAvro's malformed branch.
        val img = try {
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) null
        else {
          val w = img.getWidth
          val h = img.getHeight
          val out = new Array[Byte](w * h)
          val singleBand = img.getRaster.getNumBands == 1
          var p = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = if (singleBand) img.getRaster.getSample(x, y, 0)
              else {
                val rgb = img.getRGB(x, y)
                (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
              }
              out(p) = v.toByte
              p += 1; x += 1
            }
            y += 1
          }
          out
        }
      }
    })
}
