package graft.plans

import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.memory.{MemoryConsumer, MemoryMode}
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
  *     |                               AND sort by (keys, ordering)
  *     +- Sort (keys, ordering)            (inserted by EnsureRequirements;
  *     |                                    Spark's SPILLABLE SortExec)
  *     +- Exchange hashpartitioning(keys)  (inserted by EnsureRequirements)
  *        +- TopKPerKeyExec(partial)  — bounded heap per key per input split
  *
  * so the exchange carries AT MOST k rows per key per map partition —
  * the aggregation-style partial/final contract applied to a selection
  * operator. Heaps hold UnsafeRow copies; comparison is the codegen'd
  * [[RowOrdering]] for the requested SortOrder, so semantics (including
  * null ordering) are exactly Spark's.
  *
  * == Memory safety at extreme key cardinality ==
  *
  * Both passes are hardened against the pathological shape — millions of
  * distinct keys landing in one task — where a naive per-key map OOMs
  * where the (slower) window formulation would have spilled:
  *
  *  - The PARTIAL pass accounts its heap map against task execution
  *    memory through a [[MemoryConsumer]] registered with the
  *    [[org.apache.spark.memory.TaskMemoryManager]] (the same budget
  *    `HashAggregateExec`'s map draws from). When an acquisition is
  *    denied it FLUSHES: emits every heap's current contents downstream,
  *    frees the reservation, and continues with an empty map. A partial
  *    pass may emit any superset-per-epoch of the true top-k without
  *    affecting the answer — the final pass re-prunes — so degradation
  *    is graceful: worst case the operator converges to pass-through,
  *    which is exactly the window formulation's exchange volume, and it
  *    can never exhaust task memory. (This is the streaming
  *    pre-aggregation flush strategy, applied to a selection.)
  *  - The FINAL pass holds NO map at all: it additionally requires its
  *    input sorted by (keys, ordering), which `EnsureRequirements`
  *    satisfies with Spark's own spillable, radix-sorting `SortExec`
  *    over the already-pruned exchange output, and then streams the
  *    first k rows of each key group in O(1) state. Any key cardinality
  *    spills to disk through Spark's sorter rather than OOMing.
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

  private def groupedOrdering: Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) ++ ordering

  /** The partial pass runs wherever the data already is; the final pass
    * needs all survivors of one key together — the partial/final
    * distribution contract of a hash aggregate.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  /** Final pass: sorted input (satisfied by Spark's spillable SortExec)
    * makes the scan constant-memory — see the class scaladoc.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil) else Seq(groupedOrdering)

  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else groupedOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val ordExprs = ordering
    val limit = k
    if (partial) {
      child.execute().mapPartitions { it =>
        // Per-task codegen: projections and the row comparator are not
        // thread-safe across tasks, so they are built inside the closure.
        val toUnsafe = UnsafeProjection.create(schema.map(a => a: Expression), schema)
        val keyProj = UnsafeProjection.create(keyExprs, schema)
        val cmp = RowOrdering.create(ordExprs, schema)
          .asInstanceOf[Ordering[UnsafeRow]]
        new PartialTopKIterator(it, toUnsafe, keyProj, cmp, limit)
      }
    } else {
      child.execute().mapPartitions { it =>
        val toUnsafe = UnsafeProjection.create(schema.map(a => a: Expression), schema)
        // Key-group adjacency is decided by the SAME ordering the sort
        // used, so group boundaries exactly match SortExec's semantics.
        val keyOrd = RowOrdering.create(
          keyExprs.map(SortOrder(_, Ascending)), schema)
        new Iterator[InternalRow] {
          private var current: UnsafeRow = null
          private var emitted = 0
          private var pending: UnsafeRow = null
          private def fetch(): UnsafeRow = {
            while (it.hasNext) {
              val row = toUnsafe(it.next())
              if (current == null || keyOrd.compare(row, current) != 0) {
                val c = row.copy(); current = c; emitted = 1; return c
              } else if (emitted < limit) {
                emitted += 1; return row.copy()
              }
              // else: beyond k within this group — skip.
            }
            null
          }
          override def hasNext: Boolean = {
            if (pending == null) pending = fetch()
            pending != null
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            val r = pending; pending = null; r
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** The partial pass's bounded-heap map with execution-memory accounting
  * and flush-on-pressure — see [[TopKPerKeyNode]]'s scaladoc for the
  * contract. Cost model: each retained row is its UnsafeRow bytes plus
  * [[TopKPerKey.RowOverhead]] (object header + heap slot); each distinct
  * key adds its key-row bytes plus [[TopKPerKey.EntryOverhead]] (hash
  * map entry + heap object). Reservations are made in
  * [[TopKPerKey.ReserveChunk]] steps so the TaskMemoryManager is not
  * consulted per row.
  */
private[plans] final class PartialTopKIterator(
    input: Iterator[InternalRow],
    toUnsafe: UnsafeProjection,
    keyProj: UnsafeProjection,
    cmp: Ordering[UnsafeRow],
    limit: Int) extends Iterator[InternalRow] {

  private val ctx = TaskContext.get()
  // `spill(size, trigger)` returns 0: this consumer cannot shrink
  // synchronously from another consumer's allocation path (its state
  // lives on the JVM heap); it sheds memory proactively by flushing
  // when its OWN acquisitions are denied.
  private val consumer: MemoryConsumer =
    if (ctx == null) null
    else new MemoryConsumer(
      GraftBridge.taskMemoryManager(ctx), MemoryMode.ON_HEAP) {
      override def spill(size: Long, trigger: MemoryConsumer): Long = 0L
    }
  if (ctx != null) {
    ctx.addTaskCompletionListener[Unit] { _ =>
      if (reserved > 0) { consumer.freeMemory(reserved); reserved = 0L }
    }
  }

  private var heaps =
    mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
  private var used = 0L
  private var reserved = 0L
  private var out: Iterator[InternalRow] = Iterator.empty

  override def hasNext: Boolean = out.hasNext || refill()

  override def next(): InternalRow = {
    if (!hasNext) throw new NoSuchElementException
    out.next()
  }

  /** Consume input until memory pressure or exhaustion, then drain the
    * map into `out`. Returns whether anything is available.
    */
  private def refill(): Boolean = {
    if (!input.hasNext) return false
    var flush = false
    while (input.hasNext && !flush) {
      val row = toUnsafe(input.next())
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < limit) {
            heap += row.copy()
            used += row.getSizeInBytes + TopKPerKey.RowOverhead
          } else if (cmp.compare(row, heap.head) < 0) {
            val evicted = heap.dequeue()
            heap += row.copy()
            used += row.getSizeInBytes - evicted.getSizeInBytes
          }
        case None =>
          val heap = mutable.PriorityQueue.empty[UnsafeRow](cmp)
          heap += row.copy()
          heaps.put(key.copy(), heap)
          used += row.getSizeInBytes + TopKPerKey.RowOverhead +
            key.getSizeInBytes + TopKPerKey.EntryOverhead
      }
      if (!hasCapacity) flush = true
    }
    if (flush) TopKPerKey.partialFlushes.incrementAndGet()
    // Hand the drained epoch off lazily (rows are already copies); new
    // input goes to a fresh map. Accounting is released now — ON_HEAP
    // consumers release at un-reference time, actual memory at GC.
    val drained = heaps
    heaps = mutable.HashMap.empty
    if (reserved > 0) { consumer.freeMemory(reserved); reserved = 0L }
    used = 0L
    out = drained.valuesIterator.flatMap(_.iterator)
    out.hasNext || refill()
  }

  /** True while the current `used` estimate fits the reservation,
    * growing the reservation through the TaskMemoryManager as needed.
    */
  private def hasCapacity: Boolean = TopKPerKey.testMaxPartialBytes match {
    case Some(cap) => used <= cap
    case None =>
      if (used <= reserved) true
      else if (consumer == null) used <= TopKPerKey.NoTaskContextCap
      else {
        val need = math.max(used - reserved, TopKPerKey.ReserveChunk)
        reserved += consumer.acquireMemory(need)
        used <= reserved
      }
  }
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

  /** Estimated bytes a retained row costs beyond its UnsafeRow payload
    * (object header + priority-queue array slot).
    */
  private[plans] val RowOverhead = 48L

  /** Estimated bytes a distinct key costs beyond its key-row payload
    * (hash-map entry, heap object header + backing array).
    */
  private[plans] val EntryOverhead = 96L

  /** Execution-memory reservation granularity for the partial pass. */
  private[plans] val ReserveChunk = 4L * 1024 * 1024

  /** Budget when no TaskContext exists (direct iterator unit tests). */
  private[plans] val NoTaskContextCap = 64L * 1024 * 1024

  /** Test hook: cap the partial pass's estimated bytes, bypassing the
    * TaskMemoryManager, to force flush epochs deterministically.
    */
  @volatile private[graft] var testMaxPartialBytes: Option[Long] = None

  /** Diagnostic: partial-pass flush epochs in this JVM (all tasks in
    * local mode; per-executor on a cluster — a visibility counter for
    * tests and tuning, not a metric the answer depends on).
    */
  private[graft] val partialFlushes = new AtomicLong(0L)

  /** `TopKPerKey(df, Seq("cust"), Seq("price" -> false, "id" -> true), 3)`
    * — the top 3 rows per customer by price descending, ties by id.
    *
    * Columns are resolved HERE against the analyzed child (by
    * case-insensitive name): a custom logical node is outside the DSL
    * surface the analyzer's column-resolution rules rewrite, so handing
    * it unresolved expressions would sail through analysis unresolved
    * and fail (unserializably) at execution. Resolved
    * `AttributeReference`s also make the node trivially serializable.
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
