package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native perceptual difference-hash (dHash) over an opaque binary
  * column: downsample the byte stream onto a fixed 32-cell grid (cell =
  * floor mean of its byte slice), then emit one gradient bit per
  * adjacent cell pair — bit i set iff cell(i) > cell(i+1) — packing 31
  * bits into a long. This is the image-dedup analogue of
  * [[SimHash60]]: where SimHash fingerprints token *sets*, dHash
  * fingerprints the *shape* of the signal, so two assets that differ
  * only by re-encoding noise or payload-tail edits land within a small
  * Hamming distance.
  *
  * Two tiers feed this kernel. Over RAW container bytes (`mm_phash`)
  * the grid reduction stands in for the grayscale downsample of a
  * real image dHash. Since E313 the IMAGE swap is real: `mm_phash_real`
  * decodes actual PNGs with `javax.imageio`
  * ([[graft.ext.Multimodal.decodeLuma]]) and feeds the decoded LUMA
  * stream through this same kernel — exactly the production shape the
  * stand-in always named. Both tiers are oracle-checked: the DuckDB
  * side recomputes the identical grid/gradient arithmetic from
  * `ord()` over fixture bytes (raw tier) or from the planted pixel
  * formula (decoded tier), so a wrong cell boundary, floor-division
  * step, or bit order breaks the hash match. Video/audio payloads
  * remain header-parse + documented stand-ins (no demuxer/PCM codec
  * in the JDK).
  *
  * Scale notes: one pass over the blob per row, inside whole-stage
  * codegen, scan-side — the payload never reaches a shuffle (pairs join
  * on the 8-byte hash only). Reading the full blob is inherent to
  * perceptual hashing (unlike the header-parse tier, which reads a
  * bounded prefix); the cost is the scan itself, embarrassingly
  * parallel.
  *
  * Cell/bit semantics (pinned by DHash32Spec and the mm_phash oracle):
  * byte p belongs to cell `p * 32 / n` (all 32 cells are non-empty
  * whenever n >= 32; an empty cell — only possible for shorter blobs —
  * scores -1 so comparisons stay total); cell value is
  * `floor(sum / count)` in exact integer arithmetic; empty input
  * hashes to 0; NULL input yields NULL.
  */
case class DHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dhash32 requires a binary input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "dhash32"

  override def nullSafeEval(bytes: Any): Any =
    DHashImpl.dhash(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DHashImpl.dhash($c);")

  override protected def withNewChildInternal(newChild: Expression): DHash32 =
    copy(child = newChild)
}

object DHash32 {
  /** Grid width; the hash carries Cells - 1 gradient bits. */
  val Cells = 32

  /** Column-level entry point. */
  def apply(content: Column): Column =
    GraftBridge.column(DHash32(GraftBridge.expression(content)))
}

/** Static kernel (separate object for a clean static forwarder in
  * generated code).
  */
object DHashImpl {

  import DHash32.Cells

  def dhash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val sums = new Array[Long](Cells)
    val counts = new Array[Long](Cells)
    var p = 0
    while (p < n) {
      val c = ((p.toLong * Cells) / n).toInt
      sums(c) += bytes(p) & 0xff
      counts(c) += 1
      p += 1
    }
    var fp = 0L
    var i = 0
    var prev = cellValue(sums, counts, 0)
    while (i < Cells - 1) {
      val next = cellValue(sums, counts, i + 1)
      if (prev > next) fp |= 1L << i
      prev = next
      i += 1
    }
    fp
  }

  private def cellValue(sums: Array[Long], counts: Array[Long], i: Int): Long =
    if (counts(i) == 0) -1L else sums(i) / counts(i)
}
