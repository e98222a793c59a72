package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Ordered first-match regex routing over a candidate array:
  * `first_match(table, candidates) → target_topic | NULL`, where
  * `candidates` is the per-(topic, db) array of `(rule_idx, regex,
  * target)` structs the broadcast join attaches
  * ([[graft.cdc.Routing.targetViaJoin]], reference semantics
  * `transform.rs:52-65` — lowest-index match wins, no match → NULL).
  *
  * This replaces the last hot-path Scala UDF (the round-5 "documented
  * exception to the no-UDF rule"): a UDF pays per-row serialization to
  * JVM objects (`Seq[Row]`) and splits whole-stage codegen at the
  * projection. As a native expression the fold runs on the unsafe array
  * directly — no row materialization — and `doGenCode` keeps the join
  * output stage in one codegen span. Rules-as-DATA regexes still can't
  * be compile-time literals (that is the point of the join formulation),
  * so compiled patterns come from the same bounded per-executor cache
  * the UDF used: one compile per distinct pattern per executor, exactly
  * the reference's compile-at-config-load discipline.
  */
case class FirstMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
          if s.length >= 3 && s(1).dataType == StringType &&
            s(2).dataType == StringType =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "first_match requires (string, array<struct<idx, regex: string, " +
          s"target: string>>), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def prettyName: String = "first_match"

  override def nullSafeEval(tbl: Any, cands: Any): Any =
    FirstMatchImpl.eval(tbl.asInstanceOf[UTF8String],
      cands.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, c) => s"""
       |${ev.value} = graft.functions.FirstMatchImpl.eval($t, $c);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstMatch =
    copy(left = newLeft, right = newRight)
}

object FirstMatch {
  def apply(table: Column, candidates: Column): Column =
    GraftBridge.column(FirstMatch(
      GraftBridge.expression(table), GraftBridge.expression(candidates)))
}

/** Static kernel. The pattern cache is bounded by the number of DISTINCT
  * rule regexes (config-sized, not data-sized) per executor JVM.
  */
object FirstMatchImpl {

  private val patterns =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  def eval(tbl: UTF8String, cands: ArrayData): UTF8String = {
    if (tbl == null || cands == null) return null
    val t = tbl.toString
    val n = cands.numElements()
    var i = 0
    while (i < n) {
      if (!cands.isNullAt(i)) {
        val c = cands.getStruct(i, 3)
        val p = if (c.isNullAt(1)) null else c.getUTF8String(1)
        if (p != null &&
            patterns.computeIfAbsent(p.toString,
              java.util.regex.Pattern.compile(_)).matcher(t).find()) {
          return if (c.isNullAt(2)) null else c.getUTF8String(2)
        }
      }
      i += 1
    }
    null
  }
}
