package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Video-container header parse of an opaque `binary` column:
  * `video_meta(content) → struct<brand, timescale, duration_ms,
  * n_tracks>`.
  *
  * Completes the multimodal header-parser family — [[MediaDims]]
  * (images), [[AudioMeta]] (RIFF/WAVE audio, little-endian) — with the
  * ISO Base Media File Format (MP4/MOV, BIG-endian): a top-level box
  * walk reads the `ftyp` major brand, then walks `moov`'s children for
  * the `mvhd` movie header (both version 0 with 32-bit times and
  * version 1 with 64-bit times) and counts `trak` boxes. The spec's
  * size escapes are honored — `size == 1` reads the 64-bit largesize
  * that media payloads >4 GiB require, `size == 0` extends the final
  * box to end-of-file — and boxes are skipped by declared size, so only
  * header bytes are ever touched: a metadata scan over 100 TB of video
  * reads a few hundred bytes per asset and never the `mdat` payload.
  * The clip duration follows as `duration * 1000 / timescale` in exact
  * long arithmetic. Anything unparseable (wrong magic, truncated box
  * list, zero timescale, a duration that would overflow the
  * millisecond conversion) yields `("unknown", 0, 0, 0)` — a total
  * function, so one corrupt asset never kills a scan.
  *
  * Codegen escalation rationale (same tier as [[MediaDims]]): the box
  * walk is an imperative per-row loop no built-in expression chain can
  * express; as a static-kernel `Expression` it runs inside the scan's
  * whole-stage-codegen projection — no UDF serialization, no
  * row-object churn.
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"video_meta requires a binary input, got ${t.sql}")
  }

  override def dataType: DataType = VideoMeta.Schema

  override def prettyName: String = "video_meta"

  override def nullSafeEval(bytes: Any): Any =
    VideoMetaImpl.parse(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VideoMetaImpl.parse($c);")

  override protected def withNewChildInternal(newChild: Expression): VideoMeta =
    copy(child = newChild)
}

object VideoMeta {
  val Schema: StructType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false)))

  /** Column-level entry point. */
  def apply(content: Column): Column =
    GraftBridge.column(VideoMeta(GraftBridge.expression(content)))
}

/** Static kernel (separate object for a clean static forwarder in
  * generated code). All offsets are 0-based byte positions; ISO BMFF is
  * big-endian throughout.
  */
object VideoMetaImpl {

  private val Unknown = row("unknown", 0L, 0L, 0)

  private def row(brand: String, timescale: Long, durMs: Long,
                  tracks: Int): InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(brand), timescale, durMs, tracks))

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def tag(b: Array[Byte], i: Int, a: Char, c: Char, d: Char, e: Char): Boolean =
    b(i) == a && b(i + 1) == c && b(i + 2) == d && b(i + 3) == e

  /** Box extent at `i` within [0, end): (payloadStart, boxEnd), or null
    * if the header is malformed/truncated. Handles the `size == 1`
    * largesize escape and the `size == 0` to-end-of-enclosure form.
    */
  private def boxExtent(b: Array[Byte], i: Int, end: Int): (Int, Int) = {
    if (i + 8 > end) return null
    val size32 = be32(b, i)
    if (size32 == 1L) {
      if (i + 16 > end) return null
      val large = be64(b, i + 8)
      // A largesize below its own header length, past the enclosure,
      // or so large the Int cast would wrap is malformed.
      if (large < 16L || large > (end - i).toLong) return null
      (i + 16, i + large.toInt)
    } else if (size32 == 0L) {
      (i + 8, end) // final box: extends to the end of the enclosure
    } else {
      if (size32 < 8L || size32 > (end - i).toLong) return null
      (i + 8, i + size32.toInt)
    }
  }

  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 8) return Unknown
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var tracks = 0
    var sawMoov = false
    var i = 0
    while (i + 8 <= n) {
      val ext = boxExtent(b, i, n)
      if (ext == null) return Unknown
      val (payload, boxEnd) = ext
      if (tag(b, i + 4, 'f', 't', 'y', 'p')) {
        if (payload + 4 > boxEnd) return Unknown
        brand = new String(b, payload, 4, java.nio.charset.StandardCharsets.US_ASCII)
      } else if (tag(b, i + 4, 'm', 'o', 'o', 'v')) {
        sawMoov = true
        // Child walk: mvhd (movie header) + trak count. Unknown
        // children (udta, meta, iods, …) are skipped by size.
        var j = payload
        while (j + 8 <= boxEnd) {
          val cext = boxExtent(b, j, boxEnd)
          if (cext == null) return Unknown
          val (cp, cEnd) = cext
          if (tag(b, j + 4, 'm', 'v', 'h', 'd')) {
            if (cp + 4 > cEnd) return Unknown
            val version = b(cp) & 0xff
            if (version == 0) {
              // ver/flags(4) creation(4) modification(4) timescale(4)
              // duration(4)
              if (cp + 20 > cEnd) return Unknown
              timescale = be32(b, cp + 12)
              duration = be32(b, cp + 16)
            } else if (version == 1) {
              // ver/flags(4) creation(8) modification(8) timescale(4)
              // duration(8)
              if (cp + 32 > cEnd) return Unknown
              timescale = be32(b, cp + 20)
              duration = be64(b, cp + 24)
            } else return Unknown
          } else if (tag(b, j + 4, 't', 'r', 'a', 'k')) {
            tracks += 1
          }
          j = cEnd
        }
      }
      i = boxEnd
    }
    // Both identifying structures must exist; the duration→ms
    // conversion must be exactly representable in long arithmetic.
    if (brand == null || !sawMoov || timescale <= 0L || duration < 0L ||
        duration > Long.MaxValue / 1000L) return Unknown
    row(brand, timescale, duration * 1000L / timescale, tracks)
  }
}
