package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Content-defined chunk boundaries over an opaque binary column (the
  * FastCDC/rsync family): a Karp-Rabin rolling hash over a 16-byte
  * window marks a chunk end wherever `hash % 64 == 0`, so boundaries
  * depend only on LOCAL content — an insertion near the head of a blob
  * shifts every fixed-size block but re-aligns content-defined chunks
  * at the first boundary after the edit, which is the entire point:
  * chunk-level dedup keeps working across shifted near-copies, where
  * block-level dedup shares nothing. This is the storage/binary-level
  * member of the dedup family — below text shingles (MinHash), spans
  * (E164), and whole-content hashes (E1).
  *
  * Output: the 1-based END offsets of each chunk, strictly increasing,
  * last element = blob length (empty input → empty array; NULL →
  * NULL). Offsets rather than (start, len) structs keep the codegen
  * return a flat int array; callers derive starts from the previous
  * end. Average chunk = 64 bytes at the fixture scale (boundary
  * probability 1/64); production tunes `BoundaryDiv` up for multi-KB
  * chunks without touching the plan.
  *
  * Minimum-chunk bound (the FastCDC-family cutoff): a raw candidate
  * (`hash % 64 == 0`) is ACCEPTED only when it lies at least
  * [[BinaryChunksImpl.MinChunk]] bytes past the PREVIOUS candidate
  * (virtual candidate at offset 0). Degenerate content — e.g. a long
  * run of one byte, where every position past the window is a
  * candidate — therefore yields one boundary at the run head instead
  * of O(n) one-byte chunks. The suppression window looks at the
  * previous candidate, not the previous ACCEPTED boundary, which
  * keeps the rule local/stateless (any two accepted ends are still
  * provably >= MinChunk apart: a closer pair would put the earlier
  * end inside the later one's suppression window) and lets the DuckDB
  * oracle replay it with a single `lag` over candidates rather than a
  * sequential recursion. The forced final end at blob length may
  * still close a short tail chunk, as in every CDC chunker.
  *
  * Maximum-chunk bound (ADVICE r09 — the FastCDC forced cut): between
  * consecutive accepted content ends a < b (virtual ends at 0 and the
  * blob length), forced ends are inserted at a + k·[[BinaryChunksImpl
  * .MaxChunk]] for k >= 1 while they stay at least MinChunk short of
  * b. Content whose candidates never clear the suppression window —
  * the constant-byte run above, or candidate-free stretches — can
  * therefore never produce a chunk longer than MaxChunk + MinChunk − 1,
  * restoring chunk-level dedup granularity on exactly the repetitive
  * content CDC targets. Anchoring the forced grid to the previous
  * ACCEPTED end (not to absolute blob offsets) keeps the re-alignment
  * property: a prefix edit shifts the anchor and the forced cuts with
  * it, so shifted copies still share their forced chunks. The rule is
  * a pure function of the accepted-end sequence, which is itself
  * local, so the oracle replays it as one `generate_series` per
  * accepted-end gap — no sequential recursion.
  *
  * One O(n) pass per row inside whole-stage codegen, scan-side: the
  * blob itself never reaches a shuffle — downstream dedup joins carry
  * only (md5, len) per chunk. The DuckDB oracle recomputes the same
  * hash by direct per-position window sums over `ord()` bytes with the
  * identical base/modulus, so the kernel's rolling update (including
  * its modular-negative handling) is value-checked end to end.
  */
case class BinaryChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"binary_chunks requires a binary input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "binary_chunks"

  override def nullSafeEval(bytes: Any): Any =
    BinaryChunksImpl.chunkEnds(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BinaryChunksImpl.chunkEnds($c);")

  override protected def withNewChildInternal(newChild: Expression): BinaryChunks =
    copy(child = newChild)
}

object BinaryChunks {
  /** Column-level entry point. */
  def apply(content: Column): Column =
    GraftBridge.column(BinaryChunks(GraftBridge.expression(content)))
}

/** Static kernel (separate object for a clean static forwarder in
  * generated code). Hash orientation: at position p (1-based), the
  * newest byte weighs Base^0 and the oldest in the window Base^(W-1) —
  * h(p) = Σ_{j=0..W-1} byte(p-j)·Base^j mod Mod — which is what the
  * oracle's window-sum join reproduces term by term.
  */
object BinaryChunksImpl {

  val Base = 257L
  val Mod = 1000000007L
  val Window = 16
  val BoundaryDiv = 64L

  /** Minimum spacing between consecutive raw candidates for the later
    * one to be accepted (half the 64-byte expected chunk size, the
    * usual FastCDC min/avg ratio).
    */
  val MinChunk = 32

  /** Forced-cut spacing: a gap between accepted content ends never
    * grows past this without a forced end (4× the 64-byte expected
    * chunk, the usual FastCDC max/avg ratio) — so the worst chunk is
    * MaxChunk + MinChunk − 1 bytes, whatever the content.
    */
  val MaxChunk = 256

  /** Base^Window mod Mod, the rolling-update eviction weight. */
  val BaseToW: Long = {
    var r = 1L
    var i = 0
    while (i < Window) { r = (r * Base) % Mod; i += 1 }
    r
  }

  def chunkEnds(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Int])
    val acc = scala.collection.mutable.ArrayBuilder.make[Int]
    var h = 0L
    var p = 0 // 0-based scan; boundaries reported 1-based
    var prevCand = 0 // last raw candidate END (virtual candidate at 0)
    while (p < n) {
      h = (h * Base + (bytes(p) & 0xff)) % Mod
      if (p >= Window) {
        // evict byte (p - Window): its weight has grown to Base^Window
        h = (h - (BaseToW * (bytes(p - Window) & 0xff)) % Mod + Mod) % Mod
      }
      if (p >= Window - 1 && h % BoundaryDiv == 0) {
        val e = p + 1
        if (e - prevCand >= MinChunk) acc += e
        prevCand = e
      }
      p += 1
    }
    // Merge the MaxChunk forced grid into the accepted content ends:
    // per gap (prev accepted end -> next accepted end / blob end),
    // forced ends at prev + k*MaxChunk while >= MinChunk short of next.
    val content = acc.result()
    val ends = scala.collection.mutable.ArrayBuilder.make[Int]
    var prev = 0
    def forced(next: Int): Unit = {
      var g = prev + MaxChunk
      while (g <= next - MinChunk) { ends += g; g += MaxChunk }
    }
    var i = 0
    while (i < content.length) {
      forced(content(i))
      ends += content(i)
      prev = content(i)
      i += 1
    }
    forced(n)
    val arr = ends.result()
    if (arr.isEmpty || arr(arr.length - 1) != n)
      new GenericArrayData(arr :+ n)
    else new GenericArrayData(arr)
  }
}
