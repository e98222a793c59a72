package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftBridge

/** Whole-operator custom plan: per-key top-k with MAP-SIDE pruning —
  * rung (c) of the extension ladder (custom `LogicalPlan` + `SparkStrategy`
  * + `SparkPlan`), used where composing built-ins genuinely loses: the
  * window formulation (`row_number() OVER (PARTITION BY k ORDER BY o) <= n`)
  * must SHUFFLE AND SORT EVERY ROW before it can discard any, so at 100 TB
  * the exchange carries the full fact table. This operator plans as
  *
  *   TopKPerKeyExec(final)           — requires ClusteredDistribution(keys)
  *     +- Exchange hashpartitioning(keys)   (inserted by EnsureRequirements)
  *        +- TopKPerKeyExec(partial)  — bounded heap per key per input split
  *
  * so the exchange carries AT MOST k rows per key per map partition —
  * the aggregation-style partial/final contract applied to a selection
  * operator. Heaps hold UnsafeRow copies; comparison is the codegen'd
  * [[RowOrdering]] for the requested SortOrder, so semantics (including
  * null ordering) are exactly Spark's.
  *
  * "Top" = the first k rows per key under `ordering` (pass `.desc`
  * columns for largest-first). Output order within a key is undefined,
  * as for any Spark operator without an explicit sort.
  */
case class TopKPerKeyNode(keys: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, ordering, k, child) =>
      TopKPerKeyExec(keys, ordering, k, partial = false,
        TopKPerKeyExec(keys, ordering, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  /** The partial pass runs wherever the data already is; the final pass
    * needs all survivors of one key together — the partial/final
    * distribution contract of a hash aggregate.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  protected override def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val ordExprs = ordering
    val limit = k
    child.execute().mapPartitions { it =>
      // Per-task codegen: projections and the row comparator are not
      // thread-safe across tasks, so they are built inside the closure.
      val toUnsafe = UnsafeProjection.create(schema.map(a => a: Expression), schema)
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val cmp = RowOrdering.create(ordExprs, schema)
      // Max-heap under the sort order: head = worst survivor, evicted
      // when a better row arrives — O(n log k) per split, O(#keys · k)
      // memory, independent of split size.
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      it.foreach { r =>
        val row = toUnsafe(r)
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          mutable.PriorityQueue.empty[UnsafeRow](
            cmp.asInstanceOf[Ordering[UnsafeRow]]))
        if (heap.size < limit) heap += row.copy()
        else if (cmp.compare(row, heap.head) < 0) {
          heap.dequeue(); heap += row.copy()
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Optimizer rewrite — the `Rule[LogicalPlan]` rung: users write the
  * declarative pattern
  *
  *   df.withColumn("rk", row_number().over(W)).filter($"rk" <= k).drop("rk")
  *
  * and this rule swaps in [[TopKPerKeyNode]] whenever the rank column
  * itself is discarded, turning the full shuffle-and-sort window into
  * the bounded-heap partial/final pair. Guards (all required for
  * set-equivalence):
  *  - exactly one window expression, and it is `row_number()` — rank/
  *    dense_rank admit >k rows on ties, a different answer;
  *  - the filter is `rn <= k` / `rn < k` (k a positive int literal)
  *    and nothing else;
  *  - the projection above drops `rn` — if the rank value survives,
  *    the operator (which never materializes ranks) cannot replace it;
  *  - the window has a PARTITION BY — the unpartitioned form needs the
  *    global-numbering treatment ([[graft.operators.GlobalIndex]]),
  *    not a clustered exchange.
  */
object RewriteRowNumberTopK
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList, Filter(cond, w: Window))
        if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty =>
      (w.windowExpressions, cond) match {
        case (Seq(a @ Alias(WindowExpression(RowNumber(), _), _)), _) =>
          val rn = a.toAttribute
          val kOpt = cond match {
            case LessThanOrEqual(r: AttributeReference, Literal(k: Int, _))
                if r.exprId == rn.exprId && k > 0 => Some(k)
            case LessThan(r: AttributeReference, Literal(k: Int, _))
                if r.exprId == rn.exprId && k > 1 => Some(k - 1)
            case _ => None
          }
          val rnSurvives =
            projectList.exists(_.references.exists(_.exprId == rn.exprId))
          kOpt match {
            case Some(k) if !rnSurvives =>
              Project(projectList,
                TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, w.child))
            case _ => p
          }
        case _ => p
      }
  }
}

object TopKPerKey {

  /** Sort spec: column name + ascending? (false = largest first). */
  type Order = (String, Boolean)

  /** `TopKPerKey(df, Seq("cust"), Seq("price" -> false, "id" -> true), 3)`
    * — the top 3 rows per customer by price descending, ties by id.
    *
    * Columns are resolved HERE against the analyzed child (by
    * case-insensitive name): a custom logical node is outside the DSL
    * surface the analyzer's column-resolution rules rewrite, so handing
    * it unresolved expressions would sail through analysis unresolved
    * and fail (unserializably) at execution. Resolved
    * `AttributeReference`s also make the node trivially serializable.
    *
    * Registers the planner strategy on the session at first use
    * (idempotent), so no session-build wiring is required;
    * [[graft.functions.GraftExtensions]] also injects it for sessions
    * built with the extensions path.
    */
  /** Idempotent runtime registration of the planner strategy and the
    * window-rewrite rule on a live session (the extensions path in
    * [[graft.functions.GraftExtensions]] does the same at build time).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteRowNumberTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRowNumberTopK
    }
  }

  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Order],
            k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val sortOrders = orderCols.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(spark,
      TopKPerKeyNode(keyCols.map(attr), sortOrders, k, child))
  }
}
