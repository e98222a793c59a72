package graft.operators

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] fed straight from a [[TxTable]] manifest (r16,
  * VERDICT r15 #2): the snapshot's file list and each file's recorded
  * partition values become ONE relation — plan size is O(1) in the
  * number of partitions AND files, where the previous implementation
  * folded one `spark.read.parquet` per distinct partition tuple into a
  * `unionByName` chain (thousands of union legs on a thousands-of-
  * partitions table; driver planning cost grew linearly).
  *
  * Instrument-first note, recorded because the obvious fix FAILS: a
  * single `spark.read.option("basePath", dir).parquet(files…)` cannot
  * express this table — snapshot data files live under per-version
  * `data/v<N>-<uuid>/col=val/` dirs, so Spark's partition discovery
  * sees a DIFFERENT discovered base per version and throws
  * `CONFLICTING_DIRECTORY_STRUCTURES` (verified empirically on 4.1.2).
  * Feeding the already-known partition values through a FileIndex
  * skips discovery entirely, which is also the public Delta/Iceberg
  * design: the log, not the directory tree, is the source of truth.
  *
  * Partition typing is pinned to STRING by construction (the
  * commit-side contract) — there is no inference step left to retype
  * a value like "01" into an int.
  *
  * `listFiles` honours `partitionFilters` (the
  * `PartitioningAwareFileIndex.prunePartitions` binding discipline:
  * attributes resolve by name into ordinals of [[partitionSchema]]),
  * so catalyst-pushed partition predicates prune at the FILE level on
  * top of the manifest-level pruning [[TxTable.snapshotWhere]] already
  * did — and a partition filter Spark removes from the post-scan
  * Filter is actually enforced.
  */
private[graft] final class ManifestFileIndex(
    root: Path,
    groups: Seq[(Seq[String], Seq[FileStatus])],
    override val partitionSchema: StructType) extends FileIndex {

  private val dirs: Seq[PartitionDirectory] = groups.map {
    case (vals, sts) =>
      PartitionDirectory(
        InternalRow.fromSeq(vals.map(UTF8String.fromString)), sts.toArray)
  }

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partitionFilters.isEmpty || partitionSchema.isEmpty) dirs
    else {
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        })
      dirs.filter(d => bound.eval(d.values))
    }

  override def inputFiles: Array[String] =
    groups.flatMap(_._2.map(_.getPath.toString)).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long =
    groups.iterator.flatMap(_._2).map(_.getLen).sum
}
