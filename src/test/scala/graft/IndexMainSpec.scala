package graft

/** `IndexMain --graph` flow (E304): build + read-back probe against a
  * temp dir, stats cross-foot with the fixture.
  */
class IndexMainSpec extends SparkSpec {

  test("--graph flow builds, reloads, and serves a probe search") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_gidx").toString
    val (nVecs, nEdges, served) =
      IndexMain.runGraph(spark, sfDir, out, graphK = 4)
    assert(nVecs === Tables.embeddings(spark, sfDir).count())
    assert(nEdges > 0 && nEdges <= nVecs * 4, s"edge count $nEdges")
    assert(served === 3, s"probe served $served rows, wanted k = 3")
  }
}
