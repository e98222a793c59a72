package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted serving artifact for the graph-expansion ANN tier
  * (E291) — what [[AnnIndex]] (E260) is to residual IVF-PQ, this is
  * to the E286 graph walk: a real deployment builds the kNN graph
  * ONCE (the expensive bucketed pair stage) and serves every query
  * from the persisted tables, where the in-memory row rebuilds graph
  * and signatures per invocation.
  *
  * Artifact layout under one directory (all parquet — the index IS a
  * set of tables, readable by any engine):
  *
  *   vectors.parquet  (id, part, vec: double[])  — for the exact rerank
  *                                                 (HNSW-family indexes
  *                                                 store vectors too)
  *   sigs.parquet     (id, h0, h1)               — binary seed tier
  *   edges.parquet    (src, dst)                 — kNN out-edges
  *   manifest.parquet (1 row: format/geometry/counts)
  *
  * The manifest is written LAST with counts re-read from the written
  * files (the [[AnnIndex]] discipline): a crashed build never
  * presents a loadable index, and [[load]] re-asserts version,
  * geometry, and per-table counts so a truncated artifact fails
  * loudly. Parquet round-trips IEEE doubles bit-exactly and the
  * search half ([[Similarity.graphExpandCandidatesFrom]] +
  * [[Similarity.graphRerank]]) is shared verbatim with the in-memory
  * chain, so the round trip is hash-identical — GraphIndexSpec pins
  * it, and the `emb_graph_persisted` gate row hashes the read-back
  * search against the same oracle as `emb_graph_search`.
  *
  * Scale shape: serving touches the integer signature table (seed
  * scan), the (src, dst) edge table (`hops` hash joins), and fetches
  * raw vectors only for the visited set's rerank — per-query work
  * independent of corpus size (the graph family's defining property).
  */
object GraphIndex {

  /** v2 added the tombstone table (E310) — the version bump keeps a
    * v2 reader from serving a v1 index with deletes silently
    * un-applied (the AnnIndex FormatVersion discipline).
    */
  val FormatVersion = 2

  final case class Index(dim: Int, graphK: Int,
      vectors: DataFrame, sigs: DataFrame, edges: DataFrame,
      tombstones: DataFrame) {
    /** Soft-delete read paths: tombstoned ids neither seed, relay,
      * nor return — vectors and signatures anti-join the tombstones,
      * and an edge dies if EITHER endpoint is tombstoned (a deleted
      * node must not relay a walk).
      */
    def liveVectors: DataFrame =
      vectors.join(tombstones.select(col("id")), Seq("id"), "left_anti")
    def liveSigs: DataFrame =
      sigs.join(tombstones.select(col("id")), Seq("id"), "left_anti")
    def liveEdges: DataFrame =
      edges
        .join(tombstones.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(tombstones.select(col("id").as("dst")), Seq("dst"), "left_anti")
  }

  private def writeManifest(spark: SparkSession, dir: String,
      dim: Int, graphK: Int): Unit = {
    val nVecs = spark.read.parquet(s"$dir/vectors.parquet").count()
    val nSigs = spark.read.parquet(s"$dir/sigs.parquet").count()
    val nEdges = spark.read.parquet(s"$dir/edges.parquet").count()
    val nTomb = spark.read.parquet(s"$dir/tombstones.parquet").count()
    import spark.implicits._
    Seq((FormatVersion, dim, graphK, nVecs, nSigs, nEdges, nTomb))
      .toDF("format_version", "dim", "graph_k",
        "n_vectors", "n_sigs", "n_edges", "n_tombstones")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest.parquet")
  }

  /** Build and persist the graph index for `vecs (id, part, vec)`
    * under `outDir` (`part` buckets the kNN pair stage, the E267
    * convention).
    */
  def build(vecs: DataFrame, dim: Int, graphK: Int,
      outDir: String): Unit = {
    val spark = vecs.sparkSession
    val v = vecs.localCheckpoint(false) // three table writes, one scan
    v.write.mode("overwrite").parquet(s"$outDir/vectors.parquet")
    Similarity.binarySigs(v, dim)
      .write.mode("overwrite").parquet(s"$outDir/sigs.parquet")
    Similarity.knnGraph(v, graphK)
      .select(col("src_id").as("src"), col("dst_id").as("dst"))
      .write.mode("overwrite").parquet(s"$outDir/edges.parquet")
    // empty tombstone set with the VECTORS id type — delete() appends
    // to this file, and parquet append demands an identical schema
    spark.read.parquet(s"$outDir/vectors.parquet").select(col("id"))
      .limit(0)
      .write.mode("overwrite").parquet(s"$outDir/tombstones.parquet")
    writeManifest(spark, outDir, dim, graphK)
  }

  /** Soft-DELETE `ids (id)` (E310, the E263 design for the graph
    * tier): ids append to the tombstone table — O(batch) regardless
    * of index size — and every read path anti-joins it
    * ([[Index.liveVectors]]/[[Index.liveSigs]]/[[Index.liveEdges]]).
    * Strict: every id must exist and not already be tombstoned.
    * Manifest rewritten LAST. Note [[append]]'s interaction: a
    * tombstoned id still owns vector rows, so re-adding it refuses
    * until [[compact]] reclaims them.
    */
  def delete(ids: DataFrame, dir: String): Unit = {
    val spark = ids.sparkSession
    val idx = load(spark, dir)
    val n = ids.count()
    val present = ids.select(col("id"))
      .join(idx.vectors.select(col("id")), "id").count()
    require(present == n,
      s"delete batch has ${n - present} ids not in the index — " +
        "delete is strict, not a filter")
    val already = ids.select(col("id"))
      .join(idx.tombstones.select(col("id")), "id").count()
    require(already == 0,
      s"$already ids are already tombstoned — double delete")
    ids.select(col("id"))
      .write.mode("append").parquet(s"$dir/tombstones.parquet")
    writeManifest(spark, dir, idx.dim, idx.graphK)
  }

  /** COMPACT (E310): physically drop tombstoned vectors, signatures,
    * and every edge touching a tombstoned endpoint, then clear the
    * tombstones — search output identical before and after by
    * construction (GraphDeleteSpec pins it). Side-dir writes + swap
    * before the manifest rewrite: a crash mid-swap leaves a missing
    * or count-mismatched table [[load]] refuses.
    */
  def compact(dir: String): Unit = {
    val spark = SparkSession.active
    val idx = load(spark, dir)
    if (idx.tombstones.isEmpty) return
    def swapIn(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dir/$name.compacting.parquet")
      val live = java.nio.file.Paths.get(dir, s"$name.parquet")
      java.nio.file.Files.walk(live)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(dir, s"$name.compacting.parquet"), live)
    }
    swapIn("vectors", idx.liveVectors)
    swapIn("sigs", idx.liveSigs)
    swapIn("edges", idx.liveEdges)
    spark.read.parquet(s"$dir/vectors.parquet").select(col("id")).limit(0)
      .write.mode("overwrite").parquet(s"$dir/tombstones.parquet")
    writeManifest(spark, dir, idx.dim, idx.graphK)
  }

  /** Incrementally APPEND `newVecs (id, part, vec)` to a persisted
    * graph index (E299) — the batch shape of the HNSW insert: each
    * new node gets its top-`graphK` within-bucket out-edges computed
    * against the FULL post-append population (existing ∪ batch), the
    * existing nodes' edge lists stay FROZEN (no rebuild), and the
    * manifest is rewritten LAST with re-read counts (a crashed append
    * fails the count check, never serves a short index). Guards:
    * batch ids disjoint from the indexed set (add, not upsert), batch
    * vector width must match the manifest dim.
    *
    * Reachability contract, stated not hidden: appended nodes are
    * immediately findable through the SEED tier (their signatures
    * join the scan) and through their own out-edges, but existing
    * nodes point no edges AT them until a rebuild — the staleness is
    * the explicit price, and GraphAppendSpec MEASURES appended-vs-
    * rebuilt recall instead of assuming it away (the E262
    * discipline).
    */
  def append(newVecs: DataFrame, dir: String): Unit = {
    val spark = newVecs.sparkSession
    val idx = load(spark, dir)
    val nv = newVecs.localCheckpoint(false)
    val batchDim = nv.select(size(col("vec"))).head().getInt(0)
    require(batchDim == idx.dim,
      s"append batch has dim $batchDim, index geometry says ${idx.dim}")
    val dup = nv.select(col("id"))
      .join(idx.vectors.select(col("id")), "id").count()
    require(dup == 0,
      s"append batch shares $dup ids with the indexed set — " +
        "append is add, not upsert")
    val full = idx.vectors.select(col("id"), col("part"), col("vec"))
      .unionByName(nv.select(col("id"), col("part"), col("vec")))
      .withColumn("nrm", sqrt(Similarity.dot(col("vec"), col("vec"))))
      .localCheckpoint(false)
    val q = nv
      .withColumn("qnrm", sqrt(Similarity.dot(col("vec"), col("vec"))))
      .select(col("id").as("nid"), col("part").as("npart"),
        col("vec").as("nvec"), col("qnrm"))
    val denom = col("qnrm") * col("nrm")
    val cs = when(denom === 0.0, lit(0.0))
      .otherwise(Similarity.dot(col("nvec"), col("vec")) / denom)
    val newEdges = q.join(full,
        col("npart") === col("part") && col("nid") =!= col("id"))
      .select(col("nid").as("src0"), col("id").as("dst0"), cs.as("cs"))
      .groupBy(col("src0"))
      .agg(Similarity.topkUdaf(idx.graphK)(col("cs"), col("dst0")).as("t"))
      .select(col("src0").as("src"),
        explode(col("t.items")).as("it"))
      .select(col("src"), col("it.id").as("dst"))
    nv.write.mode("append").parquet(s"$dir/vectors.parquet")
    Similarity.binarySigs(nv, idx.dim)
      .write.mode("append").parquet(s"$dir/sigs.parquet")
    newEdges.write.mode("append").parquet(s"$dir/edges.parquet")
    writeManifest(spark, dir, idx.dim, idx.graphK)
  }

  /** Load + validate. Throws (IllegalArgumentException) on a missing,
    * truncated, or wrong-version artifact.
    */
  def load(spark: SparkSession, dir: String): Index = {
    val m = spark.read.parquet(s"$dir/manifest.parquet").head()
    def mi(f: String): Int = m.getAs[Int](f)
    def ml(f: String): Long = m.getAs[Long](f)
    require(mi("format_version") == FormatVersion,
      s"graph index at $dir has format ${mi("format_version")}, " +
        s"this reader speaks $FormatVersion")
    val vectors = spark.read.parquet(s"$dir/vectors.parquet")
    val sigs = spark.read.parquet(s"$dir/sigs.parquet")
    val edges = spark.read.parquet(s"$dir/edges.parquet")
    val tomb = spark.read.parquet(s"$dir/tombstones.parquet")
    def check(name: String, df: DataFrame, want: Long): Unit = {
      val got = df.count()
      require(got == want,
        s"graph-index table $name has $got rows, manifest says $want " +
          "— truncated or mixed-version artifact")
    }
    check("vectors", vectors, ml("n_vectors"))
    check("sigs", sigs, ml("n_sigs"))
    check("edges", edges, ml("n_edges"))
    check("tombstones", tomb, ml("n_tombstones"))
    require(ml("n_sigs") == ml("n_vectors"),
      "every vector needs a signature: artifact inconsistent")
    Index(mi("dim"), mi("graph_k"), vectors, sigs, edges, tomb)
  }

  /** Serve top-k from the persisted artifact: seeds from the stored
    * signatures, `hops` expansion rounds over the stored edges, exact
    * rerank against the stored vectors — the same core the in-memory
    * chain runs, over read-back tables.
    */
  def searchTopK(spark: SparkSession, dir: String, numQueries: Int,
      seeds: Int, hops: Int, k: Int): DataFrame = {
    val idx = load(spark, dir)
    val cand = Similarity.graphExpandCandidatesFrom(
      idx.liveSigs.localCheckpoint(false),
      idx.liveEdges.select(col("src").as("esrc"), col("dst").as("edst"))
        .localCheckpoint(false),
      numQueries, seeds, hops)
    Similarity.graphRerank(idx.liveVectors.localCheckpoint(false), cand,
      numQueries, k)
  }
}
