package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All numSub PQ codes of one vector in a single codegen loop over a
  * driver-collected codebook (r17, VERDICT r16 #1 — the documented
  * escalation path when the expression-tree formulation hits the
  * codegen cliff: a `least()` tree over numSub × codewords (d, cl)
  * structs measured 8× SLOWER end-to-end than the broadcast-join
  * aggregate it replaced, because each action re-generates and
  * Janino-recompiles a multi-thousand-node projection; this loop
  * compiles in microseconds and runs branch-free per codeword).
  *
  * Semantics are pinned to the broadcast-join formulation it replaces
  * (`min(struct(l2sqUnrolled(sv, cvec), cl))` per (id, m)):
  *  - distances fold left-to-right over the subvector dims with a 0.0
  *    seed — `acc += diff * diff` in dim order is the identical IEEE
  *    sequence, so every distance double is bit-identical;
  *  - candidates iterate in ascending codeword id with a STRICT `<`,
  *    so the first minimum wins — exactly the struct-min (d, cl)
  *    lexicographic tie rule (equal distances fall to the smaller cl);
  *  - subvector m reads vec[m·subDim + k], the same elements the
  *    slice() formulation saw.
  *
  * The codebook is BOUNDED by construction (codewords × subspaces — a
  * design constant, never corpus-sized), so collecting it and shipping
  * it as a task-closure reference is the broadcast pattern with the
  * join and its hash aggregate removed. Null input → null
  * (UnaryExpression's default null intolerance); vector elements are
  * assumed non-null (embedding vectors), matching [[DotProduct]].
  */
case class PqEncodeCodes(child: Expression,
    cls: Seq[Seq[Long]], cbs: Seq[Seq[Seq[Double]]], subDim: Int)
    extends UnaryExpression {

  @transient private lazy val clsArr: Array[Array[Long]] =
    cls.map(_.toArray).toArray
  @transient private lazy val cbArr: Array[Array[Array[Double]]] =
    cbs.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode_codes requires array<double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "pq_encode_codes"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val numSub = cbArr.length
    val out = new Array[Long](numSub)
    var m = 0
    while (m < numSub) {
      val cb = cbArr(m)
      var bestJ = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var acc = 0.0
        var k = 0
        while (k < subDim) {
          val diff = x.getDouble(m * subDim + k) - c(k)
          acc += diff * diff
          k += 1
        }
        if (acc < bestD) { bestD = acc; bestJ = j }
        j += 1
      }
      out(m) = clsArr(m)(bestJ)
      m += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cb = ctx.addReferenceObj("pqCodebooks", cbArr, "double[][][]")
      val cl = ctx.addReferenceObj("pqCodewordIds", clsArr, "long[][]")
      val numSub = cbArr.length
      val out = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val bestD = ctx.freshName("bestD")
      val bestJ = ctx.freshName("bestJ")
      val cbm = ctx.freshName("cbm")
      val cj = ctx.freshName("cj")
      s"""
         |long[] $out = new long[$numSub];
         |for (int $m = 0; $m < $numSub; $m++) {
         |  double[][] $cbm = $cb[$m];
         |  int $bestJ = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $j = 0; $j < $cbm.length; $j++) {
         |    double[] $cj = $cbm[$j];
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $subDim; $k++) {
         |      double $diff = $v.getDouble($m * $subDim + $k) - $cj[$k];
         |      $acc += $diff * $diff;
         |    }
         |    if ($acc < $bestD) { $bestD = $acc; $bestJ = $j; }
         |  }
         |  $out[$m] = $cl[$m][$bestJ];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeCodes = copy(child = newChild)
}

object PqEncodeCodes {
  /** Column-level entry point: `cands(m)` lists subspace m's
    * (codeword id, components) in ASCENDING codeword id — the order
    * the strict-< loop's tie rule relies on.
    */
  def of(vec: Column,
      cands: IndexedSeq[IndexedSeq[(Long, IndexedSeq[Double])]],
      subDim: Int): Column =
    GraftBridge.column(PqEncodeCodes(GraftBridge.expression(vec),
      cands.map(_.map(_._1)), cands.map(_.map(_._2)), subDim))
}
