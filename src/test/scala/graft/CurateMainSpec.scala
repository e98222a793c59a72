package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** End-to-end pin for [[CurateMain]]: the composed flow must produce a
  * readable sharded corpus whose manifest cross-foots with the shard
  * files, keep only gate-passing near-dup-free documents, and be
  * byte-deterministic in its shard assignment.
  */
class CurateMainSpec extends SparkSpec {

  test("curate flow writes consistent shards + manifest and the kept " +
      "set is gated and dedup'd") {
    val out = java.nio.file.Files.createTempDirectory("graft_curate").toString
    val s = CurateMain.run(spark, sfDir, out)
    assert(s.nInput == Tables.documents(spark, sfDir).count())
    assert(s.nGated > 0 && s.nGated < s.nInput, s"gates degenerate: $s")
    assert(s.nKept > 0 && s.nKept <= s.nGated)
    // occupied shards only (a tiny gated fixture can leave shard dirs
    // empty; at scale all NumShards occupy) — never more than declared
    assert(s.nShards > 0 && s.nShards <= CurateMain.NumShards)

    val shards = spark.read.parquet(s"$out/shards")
    assert(shards.count() == s.nKept)
    // every written row passes the gate (round-trip the gate over the
    // written payload)
    assert(CurateMain.gate(shards).count() == s.nKept,
      "a written row fails the gate it supposedly passed")
    // no verified near-dup pair survives among kept docs
    val resid = Dedup.nearDupPairsNative(shards, "doc_id", "text",
      n = 3, word = true, threshold = 0.5).count()
    assert(resid == 0, s"$resid near-dup pairs survive curation")

    // manifest cross-foots with the shard files
    val manifest = spark.read.parquet(s"$out/manifest")
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    val actual = shards.groupBy("shard")
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("ck")).collect()
    assert(actual.length == manifest.size)
    actual.foreach { r =>
      val m = manifest(r.getAs[Long]("shard"))
      assert(m.getAs[Long]("n_docs") == r.getAs[Long]("n") &&
        m.getAs[Long]("id_checksum") == r.getAs[Long]("ck"),
        s"manifest wrong for shard ${r.getAs[Long]("shard")}")
    }

    // determinism: a second run into a fresh dir yields the identical
    // (doc_id, shard, sort_key) assignment
    val out2 = java.nio.file.Files.createTempDirectory("graft_curate2").toString
    CurateMain.run(spark, sfDir, out2)
    val a = shards.select("doc_id", "shard", "sort_key")
    val b = spark.read.parquet(s"$out2/shards")
      .select("doc_id", "shard", "sort_key")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "re-run changed the shard assignment")

    // a different epoch salt is a different permutation
    val out3 = java.nio.file.Files.createTempDirectory("graft_curate3").toString
    CurateMain.run(spark, sfDir, out3, epochSalt = "epoch2:")
    val c = spark.read.parquet(s"$out3/shards")
      .select(col("doc_id"), col("sort_key").as("k2"))
    val same = a.join(c, "doc_id")
      .filter(col("sort_key") === col("k2")).count()
    assert(same < s.nKept / 10, s"epoch salt barely re-shuffles ($same equal)")
  }
}
