package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * converters — the one hop a library needs to expose a custom Catalyst
  * `Expression` (e.g. [[graft.functions.DotProduct]]) as a `Column`
  * without forcing every caller to register it through
  * `SparkSessionExtensions` at session-build time. This sub-package of
  * `org.apache.spark.sql` exists solely for that access; nothing else
  * of Spark's internals is touched, and the converters themselves are
  * stable across the 4.x line (they back every `functions.*` builder).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Runtime function registration on a live session (the
    * `SparkSessionExtensions` path only applies at session build).
    */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** `TaskContext.taskMemoryManager()` is `private[spark]`; custom
    * physical operators (e.g. [[graft.plans.TopKPerKeyExec]]) need it to
    * account their build-side state against task execution memory the
    * way `HashAggregateExec`'s map does, instead of holding untracked
    * JVM heap.
    */
  def taskMemoryManager(ctx: org.apache.spark.TaskContext)
      : org.apache.spark.memory.TaskMemoryManager =
    ctx.taskMemoryManager()

  /** Wrap a pre-resolved [[org.apache.spark.sql.execution.datasources.FileIndex]]
    * as a parquet DataFrame — the hop a log-backed table (e.g.
    * [[graft.operators.TxTable]]'s manifest) needs to plan exactly the
    * files its manifest names, with partition values attached from the
    * manifest instead of re-discovered from directory structure.
    * `HadoopFsRelation`/`LogicalRelation` live under `execution.` and
    * are internal by convention; this is the same one-hop discipline
    * as [[ofRows]].
    */
  def parquetTable(spark: SparkSession,
      index: org.apache.spark.sql.execution.datasources.FileIndex,
      dataSchema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame = {
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty)(spark)
    ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(
        rel, isStreaming = false))
  }

  /** Wrap a (possibly custom) logical plan as a DataFrame —
    * `Dataset.ofRows` is `private[sql]`; this is the one hop a custom
    * `LogicalPlan` node (e.g. [[graft.plans.TopKPerKeyNode]]) needs to
    * enter the public Dataset API.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
