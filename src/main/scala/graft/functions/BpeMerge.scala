package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge step: replace every adjacent `(lhs, rhs)` symbol pair
  * in a symbol array with the concatenated symbol `lhs+rhs`, scanning
  * left to right over the INPUT symbols (a symbol produced by this
  * pass never re-matches within the same pass, and overlapping matches
  * resolve leftmost-greedy: `[a,a,a]` under merge `(a,a)` yields
  * `[aa,a]`). This is the per-rule application pass of byte-pair
  * encoding (Sennrich et al. 2016) — the training loop
  * (`graft.ext.Bpe`) calls it once per learned rule over the
  * vocabulary table.
  *
  * Why a native `Expression`: the merge is sequential within a row
  * (each acceptance consumes the following symbol), which higher-order
  * functions cannot express — `transform` sees one element at a time
  * and `aggregate`'s accumulator would be an array rebuilt per element
  * in interpreted mode. The kernel is a tight two-pointer loop that
  * whole-stage codegen inlines, so applying a rule to the vocabulary
  * is a pure narrow projection — no shuffle, no UDF.
  *
  * Leftmost-greedy equivalence note (relied on by the DuckDB oracle):
  * consecutive overlapping candidates only arise when `lhs == rhs`
  * (position p matching requires s(p)=lhs and s(p+1)=rhs; p+1 also
  * matching forces s(p+1)=lhs). Greedy therefore accepts every other
  * candidate within each run of consecutive candidates, counted from
  * the run head — which is what the oracle replays with one
  * `lag`/`row_number` pass instead of a sequential recursion.
  *
  * Null handling: null in any child → null (TernaryExpression
  * default). Symbol elements are assumed non-null (they come from
  * `substr`/previous merges).
  */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge requires (array<string>, string, string), got " +
          s"${a.sql}, ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_merge"

  override def nullSafeEval(sym: Any, lhs: Any, rhs: Any): Any =
    BpeMergeImpl.merge(sym.asInstanceOf[ArrayData],
      lhs.asInstanceOf[UTF8String], rhs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l, r) =>
      s"${ev.value} = graft.functions.BpeMergeImpl.merge($s, $l, $r);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BpeMerge =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeMerge {
  /** Column-level entry point. */
  def apply(sym: Column, lhs: Column, rhs: Column): Column =
    GraftBridge.column(BpeMerge(GraftBridge.expression(sym),
      GraftBridge.expression(lhs), GraftBridge.expression(rhs)))
}

/** Static kernel (separate object for a clean static forwarder in
  * generated code).
  */
object BpeMergeImpl {

  def merge(sym: ArrayData, lhs: UTF8String, rhs: UTF8String): ArrayData = {
    val n = sym.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && lhs.equals(sym.getUTF8String(i)) &&
          rhs.equals(sym.getUTF8String(i + 1))) {
        out += UTF8String.concat(lhs, rhs)
        i += 2
      } else {
        out += sym.getUTF8String(i)
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}
