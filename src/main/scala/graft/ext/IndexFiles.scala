package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem plumbing shared by the persisted-index writers
  * ([[AnnIndex]], [[GraphIndex]]) — all of it through the Hadoop
  * FileSystem API resolved from the path itself, so compaction works
  * on whatever filesystem build/append/delete already work on
  * (local, HDFS, object stores with a rename-capable committer), not
  * just `java.nio` local disk.
  */
object IndexFiles {

  /** Swap `dir/name.parquet` for a freshly-written
    * `dir/name.compacting.parquet` via RENAME-ASIDE: the live table
    * first moves to `name.old.parquet`, the fresh table then moves
    * into place, and only then is the aside deleted. Every crash
    * window is recoverable or fail-loud:
    *
    *  - before the first rename: live table untouched, fresh table
    *    orphaned (overwritten by the next compact);
    *  - between the renames: `name.parquet` missing → load refuses,
    *    and the FULL old table still exists at `name.old.parquet`
    *    (rename it back by hand — nothing was deleted);
    *  - after the second rename: the index serves the new table; a
    *    leftover aside is cleaned up on the next swap.
    *
    * Contrast with delete-then-move: its crash window destroys the
    * only copy.
    */
  def swapIn(spark: SparkSession, dir: String, name: String): Unit = {
    val live = new Path(dir, s"$name.parquet")
    val fresh = new Path(dir, s"$name.compacting.parquet")
    val aside = new Path(dir, s"$name.old.parquet")
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(aside)) fs.delete(aside, true) // prior-crash leftover
    require(fs.rename(live, aside),
      s"swap failed: could not move $live aside")
    require(fs.rename(fresh, live),
      s"swap failed: could not move $fresh into place " +
        s"(old table preserved at $aside)")
    fs.delete(aside, true)
  }
}
