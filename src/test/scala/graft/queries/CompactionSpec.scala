package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Physical half of the docs_compaction row (the correctness gate
  * hash-checks the logical half): the fragmented layout really has 64
  * files, the compacted one really has ≤ 4 — the file-count collapse
  * that keeps a 100 TB table's scan task count (and its NameNode /
  * object-store listing) bounded as small incremental batches land.
  */
class CompactionSpec extends SparkSpec {

  test("compaction collapses 64 small files to at most 4, content intact") {
    SourceQueries.queries("docs_compaction")(spark, sfDir).collect() // materialize
    val out = Materialize.once(s"compact:$sfDir", sfDir)(_ => fail("must exist"))
    def nFiles(v: Long): Long =
      graft.operators.TxTable.snapshotAt(spark, out, v)
        .select(input_file_name().as("f")).distinct().count()
    assert(nFiles(0) == 64, "fragmented layout lost its fragmentation")
    assert(nFiles(1) <= 4, "compaction did not reduce file count")
    val a = graft.operators.TxTable.snapshotAt(spark, out, 0)
    val b = graft.operators.TxTable.snapshotAt(spark, out, 1)
    assert(a.count() == b.count() && a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("schema evolution scan fills the missing column with NULLs only " +
    "for the old batch") {
    val df = SourceQueries.queries("docs_schema_evolution")(spark, sfDir)
    val n = Tables.documents(spark, sfDir).count()
    assert(df.count() == n)
    assert(df.filter(col("source").isNull).count() ==
      Tables.documents(spark, sfDir).filter(col("doc_id") % 2 === 0).count())
  }
}
