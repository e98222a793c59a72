package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._

/** EXIF orientation from a JPEG's APP1 segment (E283):
  * `exif_orientation(content) → int` — 1..8 per the TIFF 0x0112 tag,
  * 0 when absent or unparseable (a total function, like the other
  * header parsers: a 100 TB scan never dies on one corrupt asset).
  *
  * This is the one piece of image metadata a resize/thumbnail pipeline
  * MUST read before touching pixels — phones store sensor-native
  * orientation here, and ignoring it ships sideways images. The walk
  * is real parsing, not a stub: JPEG segment list → APP1 with the
  * `Exif\0\0` marker → TIFF header honoring BOTH byte orders
  * (`II` little- and `MM` big-endian — the fixture plants both) → IFD0
  * entry scan for tag 0x0112 type SHORT, with a decoy entry before it
  * so a parser that assumes entry positions instead of walking tags
  * reads garbage. Header-region bytes only; the payload is never read.
  */
case class ExifOrientation(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"exif_orientation requires a binary input, got ${t.sql}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "exif_orientation"

  override def nullSafeEval(bytes: Any): Any =
    ExifOrientationImpl.orientation(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ExifOrientationImpl.orientation($c);")

  override protected def withNewChildInternal(newChild: Expression)
      : ExifOrientation = copy(child = newChild)
}

object ExifOrientation {
  /** Column-level entry point. */
  def apply(content: Column): Column =
    GraftBridge.column(ExifOrientation(GraftBridge.expression(content)))
}

/** Static kernel (separate object for a clean static forwarder in
  * generated code). All offsets 0-based.
  */
object ExifOrientationImpl {

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def be32(b: Array[Byte], i: Int): Long =
    ((be16(b, i).toLong << 16) | be16(b, i + 2)).toLong

  private def le32(b: Array[Byte], i: Int): Long =
    (le16(b, i).toLong | (le16(b, i + 2).toLong << 16)).toLong

  def orientation(b: Array[Byte]): Int = {
    val n = b.length
    if (n < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return 0
    // walk JPEG segments to APP1/Exif
    var i = 2
    while (i + 4 <= n && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return 0 // EOI / image data
      val segLen = be16(b, i + 2) // includes the 2 length bytes
      if (segLen < 2 || i + 2 + segLen > n) return 0
      if (marker == 0xe1 && segLen >= 8 + 6 &&
          b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
          b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
        return fromTiff(b, i + 10, i + 2 + segLen)
      }
      i += 2 + segLen
    }
    0
  }

  /** TIFF block between [t0, end): header, IFD0, tag 0x0112 scan. */
  private def fromTiff(b: Array[Byte], t0: Int, end: Int): Int = {
    if (t0 + 8 > end) return 0
    val little =
      if (b(t0) == 'I' && b(t0 + 1) == 'I') true
      else if (b(t0) == 'M' && b(t0 + 1) == 'M') false
      else return 0
    def u16(i: Int) = if (little) le16(b, i) else be16(b, i)
    def u32(i: Int) = if (little) le32(b, i) else be32(b, i)
    if (u16(t0 + 2) != 42) return 0
    val ifd0 = u32(t0 + 4)
    val p0 = t0 + ifd0.toInt
    if (ifd0 < 8 || p0 + 2 > end) return 0
    val count = u16(p0)
    var e = 0
    while (e < count) {
      val ep = p0 + 2 + e * 12
      if (ep + 12 > end) return 0
      if (u16(ep) == 0x0112 && u16(ep + 2) == 3 && u32(ep + 4) == 1L) {
        val v = u16(ep + 8) // SHORT value lives in the first 2 bytes
        return if (v >= 1 && v <= 8) v else 0
      }
      e += 1
    }
    0
  }
}
