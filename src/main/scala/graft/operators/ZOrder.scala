package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional file skipping —
  * the data-layout operator behind "cluster by (a, b)" in modern
  * lakehouse engines.
  *
  * A scan can only skip a file when the predicate column's [min, max]
  * footer range excludes it. Sorting the table by ONE column gives that
  * column tight per-file ranges but leaves every other column's range
  * spanning the whole domain — a filter on the second column prunes
  * nothing. Interleaving the bits of both columns (x in even bit
  * positions, y in odd) makes range-partitioning by the combined
  * z-value cluster BOTH dimensions at once: each file covers a small
  * tile of the (x, y) plane, so a box predicate on either (or both)
  * columns skips most files. At 100 TB this is the difference between
  * reading ~√F of F files and reading all of them, for the same query,
  * with zero runtime cost — the work happens once, at write time.
  *
  * The z-value is PURE Column arithmetic (shift/and/or — the standard
  * magic-number bit spread), so it stays inside whole-stage codegen and
  * is reproducible in any engine, which is exactly what the
  * rel_zorder_cluster oracle does in DuckDB SQL. ZOrderSpec computes
  * the per-file min/max overlap statistic — the same statistic a
  * parquet reader's footer pruning evaluates — for a z-ordered vs a
  * linearly-sorted layout of the same rows and pins the skipping win.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit lane (magic-number bit spreading, the branch-free standard
    * formulation).
    */
  def spread16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFFFL))
    val a = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val d = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    d.bitwiseOR(shiftleft(d, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of two 16-bit dimensions: x on even bits
    * (bit 0 = x's bit 0), y on odd bits. Total order over (x, y) tiles.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Rewrite `df` into `numFiles` files clustered by the z-value of
    * (x, y): range partition on z (sampled split points, balanced
    * files), sort within each partition so parquet row-group stats are
    * tight too. This is the write-side half; the read side is plain
    * parquet footer pruning — no special reader needed.
    */
  def clusterWrite(df: DataFrame, x: Column, y: Column, numFiles: Int,
                   path: String): Unit = {
    // Fail fast rather than silently replace-and-drop a user column
    // that happens to share the helper's name.
    require(!df.columns.contains("__z"),
      "clusterWrite: input already has a __z column; rename it first")
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
