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

/** Audio-container header parse of an opaque `binary` column:
  * `audio_meta(content) → struct<codec, channels, sample_rate, bits,
  * duration_ms>`.
  *
  * Extends the multimodal decode family ([[MediaDims]] covers images)
  * to audio: a RIFF/WAVE chunk walk reads the `fmt ` chunk's PCM
  * format fields (channels, sample rate, bits per sample) and the
  * `data` chunk's payload size, from which the clip duration follows as
  * `data_bytes * 1000 / byte_rate`. Chunks are skipped by their
  * declared little-endian size (word-aligned, per spec), so only header
  * bytes are ever touched — the same never-read-the-whole-blob
  * discipline as the image parser: a metadata scan over 100 TB of audio
  * reads a few dozen bytes per asset. Anything unparseable (wrong
  * magic, truncated chunk list, zero byte rate, out-of-range fmt
  * fields — a u32 sample rate past Int.MaxValue, zero channels or
  * bits) yields `("unknown", 0, 0, 0, 0)` — a total function, so one
  * corrupt asset never kills a scan.
  *
  * Codegen escalation rationale (same tier as [[MediaDims]]): the chunk
  * walk is an imperative per-row loop no built-in expression chain can
  * express; as a static-kernel `Expression` it runs inside the scan's
  * whole-stage-codegen projection — no UDF serialization, no row-object
  * churn.
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"audio_meta requires a binary input, got ${t.sql}")
  }

  override def dataType: DataType = AudioMeta.Schema

  override def prettyName: String = "audio_meta"

  override def nullSafeEval(bytes: Any): Any =
    AudioMetaImpl.parse(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AudioMetaImpl.parse($c);")

  override protected def withNewChildInternal(newChild: Expression): AudioMeta =
    copy(child = newChild)
}

object AudioMeta {
  val Schema: StructType = StructType(Seq(
    StructField("codec", StringType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Column-level entry point. */
  def apply(content: Column): Column =
    GraftBridge.column(AudioMeta(GraftBridge.expression(content)))
}

/** Static kernel (separate object for a clean static forwarder in
  * generated code). All offsets are 0-based byte positions; RIFF is
  * little-endian throughout.
  */
object AudioMetaImpl {

  private val Unknown = row("unknown", 0, 0, 0, 0L)

  private def row(codec: String, ch: Int, rate: Int, bits: Int,
                  durMs: Long): InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(codec), ch, rate, bits, durMs))

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], i: Int, a: Char, c: Char, d: Char, e: Char): Boolean =
    b(i) == a && b(i + 1) == c && b(i + 2) == d && b(i + 3) == e

  def parse(b: Array[Byte]): InternalRow = {
    val n = b.length
    // "RIFF" <size:le32> "WAVE", then a chunk list: <id:4> <size:le32>
    // <payload, word-aligned>.
    if (n < 12 || !tag(b, 0, 'R', 'I', 'F', 'F') ||
        !tag(b, 8, 'W', 'A', 'V', 'E')) return Unknown
    var fmtCode = -1
    var channels = 0
    var rate = 0
    var bits = 0
    var byteRate = 0L
    var dataBytes = -1L
    var i = 12
    while (i + 8 <= n && (fmtCode < 0 || dataBytes < 0)) {
      val size = le32(b, i + 4)
      if (tag(b, i, 'f', 'm', 't', ' ')) {
        // PCM fmt payload: format(2) channels(2) rate(4) byteRate(4)
        // blockAlign(2) bits(2).
        if (size < 16 || i + 8 + 16 > n) return Unknown
        fmtCode = le16(b, i + 8)
        channels = le16(b, i + 10)
        // rate is a u32 on disk: a crafted value past Int.MaxValue would
        // wrap negative through .toInt — out-of-range fields take the
        // documented unparseable → Unknown route instead of surfacing a
        // plausible-looking impossible row (ADVICE r04).
        val rate32 = le32(b, i + 12)
        if (rate32 <= 0L || rate32 > Int.MaxValue) return Unknown
        rate = rate32.toInt
        byteRate = le32(b, i + 16)
        bits = le16(b, i + 22)
        if (channels == 0 || bits == 0) return Unknown
      } else if (tag(b, i, 'd', 'a', 't', 'a')) {
        // The declared size stands even when the payload is the tail of
        // the file (streaming writers truncate); clamp to what exists.
        dataBytes = math.min(size, (n - i - 8).toLong)
      }
      // Word-aligned advance in LONG arithmetic: a corrupt declared
      // size near 2^31 must run the index off the end (loop exit), not
      // overflow Int into a negative index and crash the total-function
      // contract.
      val next = i.toLong + 8L + size + (size & 1L)
      i = if (next > n) n else next.toInt
    }
    if (fmtCode < 0 || dataBytes < 0 || byteRate <= 0) return Unknown
    val codec = if (fmtCode == 1) "pcm" else s"wav-$fmtCode"
    row(codec, channels, rate, bits, dataBytes * 1000L / byteRate)
  }
}
