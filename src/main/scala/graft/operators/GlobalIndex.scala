package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Scalable global row numbering (north-star extension; the reference
  * has no ordering surface at all, SURVEY.md §2.2).
  *
  * The textbook formulation — `row_number() OVER (ORDER BY k)` with no
  * PARTITION BY — plans `Exchange SinglePartition`: every row funnels
  * through ONE task, which is the single worst scaling cliff a query
  * can hide at 100 TB. This operator produces the identical numbering
  * with no single-task stage:
  *
  *  1. `repartitionByRange(k)` — range exchange into ordered,
  *     non-overlapping key ranges (sampled bounds, the same machinery
  *     as a distributed sort),
  *  2. `sortWithinPartitions(k)` — each partition locally ordered, so
  *     partition concatenation IS the total order,
  *  3. `zipWithIndex` — contiguous global indices from one extra
  *     O(#partitions) count job (per-partition offsets broadcast to
  *     the zip stage; row data never moves again).
  *
  * The RDD hop is the textbook justified use: per-partition imperative
  * indexing that no Catalyst operator expresses without collapsing
  * parallelism. Cost: one range shuffle + one count job — both scale
  * with cores, never with a single task's memory.
  */
object GlobalIndex {

  /** Append `row_num` (1-based, dense, in `orderCol` order). `orderCol`
    * must be non-null and unique for a deterministic result (a
    * tie-broken struct column works for compound orders).
    */
  def globalRowNumbers(df: DataFrame, orderCol: String,
                       numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(numPartitions, col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = ranged.schema.add("row_num", LongType, nullable = false)
    val rdd = ranged.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rdd, schema)
  }
}
