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
  *   edges.parquet    (src, dst / bucket=B/)     — kNN out-edges,
  *                                                 HIVE-PARTITIONED by
  *                                                 src bucket
  *   manifest.parquet (1 row: format/geometry/counts)
  *
  * The bucket-partitioned edge layout (v3, VERDICT r13 #1) prices the
  * walk by the FRONTIER, not the corpus: each hop's frontier is
  * per-query bounded (≤ seeds·(graphK+1)^hop ids regardless of corpus
  * size — the graph family's defining property), so [[searchTopK]]
  * resolves the frontier's source buckets (`pmod(id, edge_buckets)`,
  * a bounded set) and scans `edges.parquet` through a static
  * `bucket IN (…)` partition filter. A billion-vector index holds
  * ~k·N edges; a 30-node frontier touches ≤ 30 of its
  * `edge_buckets` directories instead of every row group.
  * GraphPruneSpec pins the filter and the file count; the walk's
  * OUTPUT is unchanged — the bucket filter is exactly the set of
  * directories the equi-join on `src` could match.
  *
  * The manifest is written LAST with counts re-read from the written
  * files (the [[AnnIndex]] discipline): a crashed build never
  * presents a loadable index, and [[load]] re-asserts version,
  * geometry, and per-table counts so a truncated artifact fails
  * loudly. Since v3 that integrity gate runs ONCE PER SESSION per
  * artifact ([[loadCached]]) instead of once per search; writers
  * invalidate the cache. Parquet round-trips IEEE doubles bit-exactly
  * and the search half runs the same expansion arithmetic as the
  * in-memory chain, so the round trip is hash-identical —
  * GraphIndexSpec pins it, and the `emb_graph_persisted` gate row
  * hashes the read-back search against the same oracle as
  * `emb_graph_search`.
  *
  * Scale shape: serving touches the integer signature table (seed
  * scan), the PRUNED slice of the (src, dst) edge table (`hops`
  * hash joins), and fetches raw vectors only for the visited set's
  * rerank — per-query work independent of corpus size.
  */
object GraphIndex {

  /** v2 added the tombstone table (E310); v3 hive-partitions
    * `edges.parquet` by `bucket = pmod(src, edge_buckets)` (recorded
    * in the manifest) and moves count verification off the per-search
    * path; v4 (r15, E321) adds the HIERARCHICAL ENTRY LAYER — the
    * HNSW-style upper layer: a deterministic node sample
    * (`id % layer_mod = 0`, recorded in the manifest) with its own
    * kNN edge table (`layeredges.parquet`, bucket-partitioned like
    * level 0). [[searchTopKLayered]] seeds on the LAYER's signatures,
    * walks the small upper graph, descends through the best visited
    * layer nodes into the level-0 walk — entry points near the query
    * at a fraction of the full seed scan. Each bump keeps an older
    * reader from mis-reading the layout.
    */
  val FormatVersion = 4

  /** Default upper-layer sampling modulus: 1/4 of the nodes form the
    * entry layer (HNSW's level-1 occupancy for M = 4). Deterministic
    * (id-derived), so the layer is replayable by any engine.
    */
  val DefaultLayerMod = 4

  /** Default edge-bucket count. At fixture scale this already yields
    * measurable directory pruning; a billion-vector deployment raises
    * it (buckets should comfortably exceed the expected frontier size
    * so the IN-list prunes to frontier/buckets of the files).
    */
  val DefaultEdgeBuckets = 16

  final case class Index(dim: Int, graphK: Int, edgeBuckets: Int,
      layerMod: Int, vectors: DataFrame, sigs: DataFrame,
      edges: DataFrame, layerEdges: DataFrame, tombstones: DataFrame) {
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
    def liveLayerEdges: DataFrame =
      layerEdges
        .join(tombstones.select(col("id").as("src")), Seq("src"), "left_anti")
        .join(tombstones.select(col("id").as("dst")), Seq("dst"), "left_anti")
  }

  /** Once-per-session validated loads (the [[AnnIndex.loadCached]]
    * discipline); writers invalidate via [[invalidate]].
    */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Index]()

  /** Every-session invalidation for `dir` (writers call it). */
  def invalidate(dir: String): Unit =
    cache.keySet.removeIf(_._2 == dir)

  /** Session-scoped (see [[AnnIndex.loadCached]]): the key carries
    * the session's identity so handles never outlive their session —
    * r16 (ADVICE) a [[SessionToken]] UUID in a tuple key, for the
    * same uniqueness/aliasing reasons as AnnIndex.
    */
  def loadCached(spark: SparkSession, dir: String): Index =
    cache.computeIfAbsent(
      (SessionToken.of(spark), dir), _ => load(spark, dir))

  /** Edge rows carry their hive-partition bucket derived from the
    * SOURCE id — the join side every hop probes.
    */
  private def withBucket(edges: DataFrame, buckets: Int): DataFrame =
    edges.withColumn("bucket",
      pmod(col("src"), lit(buckets.toLong)).cast("int"))

  private def writeManifest(spark: SparkSession, dir: String,
      dim: Int, graphK: Int, edgeBuckets: Int, layerMod: Int): Unit = {
    val nVecs = spark.read.parquet(s"$dir/vectors.parquet").count()
    val nSigs = spark.read.parquet(s"$dir/sigs.parquet").count()
    val nEdges = spark.read.parquet(s"$dir/edges.parquet").count()
    val nLay = spark.read.parquet(s"$dir/layeredges.parquet").count()
    val nTomb = spark.read.parquet(s"$dir/tombstones.parquet").count()
    import spark.implicits._
    Seq((FormatVersion, dim, graphK, edgeBuckets, layerMod,
        nVecs, nSigs, nEdges, nLay, nTomb))
      .toDF("format_version", "dim", "graph_k", "edge_buckets",
        "layer_mod", "n_vectors", "n_sigs", "n_edges", "n_layer_edges",
        "n_tombstones")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest.parquet")
    invalidate(dir)
  }

  /** Build and persist the graph index for `vecs (id, part, vec)`
    * under `outDir` (`part` buckets the kNN pair stage, the E267
    * convention).
    */
  def build(vecs: DataFrame, dim: Int, graphK: Int, outDir: String,
      edgeBuckets: Int = DefaultEdgeBuckets,
      layerMod: Int = DefaultLayerMod): Unit = {
    val spark = vecs.sparkSession
    val v = vecs.localCheckpoint(false) // four table writes, one scan
    v.write.mode("overwrite").parquet(s"$outDir/vectors.parquet")
    Similarity.binarySigs(v, dim)
      .write.mode("overwrite").parquet(s"$outDir/sigs.parquet")
    withBucket(Similarity.knnGraph(v, graphK)
        .select(col("src_id").as("src"), col("dst_id").as("dst")),
        edgeBuckets)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$outDir/edges.parquet")
    // v4 entry layer: kNN edges over the deterministic node sample.
    // The upper layer's job is GLOBAL navigability — a walk must be
    // able to route ACROSS coarse buckets to reach the query's region
    // — so its kNN is UNRESTRICTED (constant part ⇒ all-pairs among
    // layer nodes; measured: the label-restricted variant strands the
    // descent in the seed's bucket and recall collapses). Cost is
    // (N/layerMod)² pair work — 1/layerMod² of naive level-0 all-
    // pairs; a billion-vector deployment recurses the same sampling
    // into a layer hierarchy (each level all-pairs over a geometric
    // fraction) exactly as HNSW's log-layers do.
    withBucket(Similarity.knnGraph(
          v.filter(col("id") % layerMod === 0)
            .withColumn("part", lit(0L)), graphK)
        .select(col("src_id").as("src"), col("dst_id").as("dst")),
        edgeBuckets)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$outDir/layeredges.parquet")
    // empty tombstone set with the VECTORS id type — delete() appends
    // to this file, and parquet append demands an identical schema
    spark.read.parquet(s"$outDir/vectors.parquet").select(col("id"))
      .limit(0)
      .write.mode("overwrite").parquet(s"$outDir/tombstones.parquet")
    writeManifest(spark, outDir, dim, graphK, edgeBuckets, layerMod)
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
    writeManifest(spark, dir, idx.dim, idx.graphK, idx.edgeBuckets,
      idx.layerMod)
  }

  /** COMPACT (E310): physically drop tombstoned vectors, signatures,
    * and every edge touching a tombstoned endpoint, then clear the
    * tombstones — search output identical before and after by
    * construction (GraphDeleteSpec pins it). Each table rewrites to a
    * side directory and [[IndexFiles.swapIn]] rename-asides it into
    * place through the Hadoop FileSystem API (works wherever
    * build/append/delete do, not just local disk): a crash mid-swap
    * leaves [[load]] refusing AND the old table intact on disk.
    */
  def compact(dir: String): Unit = {
    val spark = SparkSession.active
    val idx = load(spark, dir)
    if (idx.tombstones.isEmpty) return
    idx.liveVectors.write.mode("overwrite")
      .parquet(s"$dir/vectors.compacting.parquet")
    IndexFiles.swapIn(spark, dir, "vectors")
    idx.liveSigs.write.mode("overwrite")
      .parquet(s"$dir/sigs.compacting.parquet")
    IndexFiles.swapIn(spark, dir, "sigs")
    idx.liveEdges.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/edges.compacting.parquet")
    IndexFiles.swapIn(spark, dir, "edges")
    idx.liveLayerEdges.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/layeredges.compacting.parquet")
    IndexFiles.swapIn(spark, dir, "layeredges")
    spark.read.parquet(s"$dir/vectors.parquet").select(col("id")).limit(0)
      .write.mode("overwrite").parquet(s"$dir/tombstones.parquet")
    writeManifest(spark, dir, idx.dim, idx.graphK, idx.edgeBuckets,
      idx.layerMod)
  }

  /** Incrementally APPEND `newVecs (id, part, vec)` to a persisted
    * graph index (E299) — the batch shape of the HNSW insert: each
    * new node gets its top-`graphK` within-bucket out-edges computed
    * against the FULL post-append population (existing ∪ batch), the
    * existing nodes' edge lists stay FROZEN (no rebuild), and the
    * manifest is rewritten LAST with re-read counts (a crashed append
    * fails the count check, never serves a short index). Guards:
    * batch ids disjoint from the indexed set (add, not upsert), and
    * EVERY batch vector's width must match the manifest dim (min =
    * max = dim — a mixed-width batch must not half-write malformed
    * signatures or edges).
    *
    * Write order: the new EDGES go first. Their plan reads
    * `idx.vectors` — the artifact's vector table — so they must
    * materialize before `vectors.parquet` gains the batch rows;
    * writing them IS the materialization (no reliance on a stale
    * cached file listing). A crash after the edge write fails the
    * manifest count check on the next load — fail-loud, like every
    * other torn write here.
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
    val widths = nv
      .agg(min(size(col("vec"))).as("lo"), max(size(col("vec"))).as("hi"))
      .head()
    require(widths.getInt(0) == idx.dim && widths.getInt(1) == idx.dim,
      s"append batch has dims in [${widths.getInt(0)}, " +
        s"${widths.getInt(1)}], index geometry says ${idx.dim}")
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
    // v4: batch nodes that SAMPLE into the entry layer get their own
    // upper-layer out-edges against the full post-append LAYER
    // population — the same frozen-existing discipline as level 0
    val layNew = q.filter(col("nid") % idx.layerMod === 0)
    val layFull = full.filter(col("id") % idx.layerMod === 0)
    // upper-layer edges are UNRESTRICTED (global navigability — see
    // build): new layer nodes rank against the whole layer population
    val newLayerEdges = layNew.join(layFull,
        col("nid") =!= col("id"))
      .select(col("nid").as("src0"), col("id").as("dst0"), cs.as("cs"))
      .groupBy(col("src0"))
      .agg(Similarity.topkUdaf(idx.graphK)(col("cs"), col("dst0")).as("t"))
      .select(col("src0").as("src"), explode(col("t.items")).as("it"))
      .select(col("src"), col("it.id").as("dst"))
    // edges FIRST (see scaladoc): the plan reads idx.vectors, so it
    // must execute before vectors.parquet changes underneath it
    withBucket(newEdges, idx.edgeBuckets)
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$dir/edges.parquet")
    withBucket(newLayerEdges, idx.edgeBuckets)
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$dir/layeredges.parquet")
    nv.write.mode("append").parquet(s"$dir/vectors.parquet")
    Similarity.binarySigs(nv, idx.dim)
      .write.mode("append").parquet(s"$dir/sigs.parquet")
    writeManifest(spark, dir, idx.dim, idx.graphK, idx.edgeBuckets,
      idx.layerMod)
  }

  /** Load + validate. Throws (IllegalArgumentException) on a missing,
    * truncated, or wrong-version artifact. Searches go through
    * [[loadCached]] — this runs once per session per artifact.
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
    val layerEdges = spark.read.parquet(s"$dir/layeredges.parquet")
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
    check("layeredges", layerEdges, ml("n_layer_edges"))
    check("tombstones", tomb, ml("n_tombstones"))
    require(ml("n_sigs") == ml("n_vectors"),
      "every vector needs a signature: artifact inconsistent")
    Index(mi("dim"), mi("graph_k"), mi("edge_buckets"), mi("layer_mod"),
      vectors, sigs, edges, layerEdges, tomb)
  }

  /** Serve top-k from the persisted artifact: seeds from the stored
    * signatures, `hops` expansion rounds over the stored edges, exact
    * rerank against the stored vectors — the same expansion the
    * in-memory chain runs ([[Similarity.graphExpandCandidatesFrom]]'s
    * arithmetic, inlined so each hop can PRUNE), with every hop's
    * edge scan partition-pruned to the frontier's source buckets.
    * The per-hop bucket resolution is a bounded collect: the frontier
    * is ≤ numQueries·seeds·(graphK+1)^hop ids at ANY corpus size, and
    * the bucket set it maps to is ≤ min(frontier, edge_buckets).
    */
  def searchTopK(spark: SparkSession, dir: String, numQueries: Int,
      seeds: Int, hops: Int, k: Int): DataFrame = {
    val idx = loadCached(spark, dir)
    Similarity.graphRerank(idx.liveVectors.localCheckpoint(false),
      expandCandidates(spark, dir, numQueries, seeds, hops),
      numQueries, k)
  }

  /** The CANDIDATE half of [[searchTopK]] — the pruned walk's visited
    * set `(query_id, id)`, query self-hits excluded — public so
    * composed pipelines (candidate generation → their own rerank →
    * MMR) can serve from the persisted artifact instead of rebuilding
    * the graph per query (the VERDICT r13 #5 shared-artifact
    * discipline applied to the graph tier).
    */
  def expandCandidates(spark: SparkSession, dir: String,
      numQueries: Int, seeds: Int, hops: Int): DataFrame = {
    require(hops >= 1, "need at least one expansion hop")
    val idx = loadCached(spark, dir)
    var cand = Similarity.hammingTopKSigs(
        idx.liveSigs.localCheckpoint(false), numQueries, seeds)
      .select(col("query_id"), col("neighbor_id").as("id"))
      .localCheckpoint(false)
    for (_ <- 1 to hops) {
      val expanded = cand.join(hopEdges(idx, cand), col("id") === col("esrc"))
        .select(col("query_id"), col("edst").as("id"))
      // each hop's visited set feeds the next hop AND the final
      // rerank; checkpoint so the union chain never re-walks
      cand = cand.union(expanded).distinct().localCheckpoint(false)
    }
    cand.filter(col("query_id") =!= col("id"))
  }

  /** One hop's PRUNED edge slice `(esrc, edst)` for the current
    * frontier `cand (query_id, id)`: resolve the frontier's source
    * buckets (a bounded collect — the frontier is per-query bounded
    * at any corpus size) and push `bucket IN (…)` at the partitioned
    * edge scan. Package-private so GraphPruneSpec pins the SERVE
    * path's own scan (the hop output is checkpointed inside
    * [[searchTopK]], which truncates the visible plan).
    */
  private[ext] def hopEdges(idx: Index, cand: DataFrame): DataFrame = {
    val bks = cand
      .select(pmod(col("id"), lit(idx.edgeBuckets.toLong))
        .cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    idx.liveEdges.filter(col("bucket").isin(bks: _*))
      .select(col("src").as("esrc"), col("dst").as("edst"))
  }

  /** The upper layer's pruned hop slice — same bucket pruning as
    * [[hopEdges]], over `layeredges.parquet`.
    */
  private[ext] def layerHopEdges(idx: Index, cand: DataFrame): DataFrame = {
    val bks = cand
      .select(pmod(col("id"), lit(idx.edgeBuckets.toLong))
        .cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    idx.liveLayerEdges.filter(col("bucket").isin(bks: _*))
      .select(col("src").as("esrc"), col("dst").as("edst"))
  }

  /** HIERARCHICAL serve (r15, E321 — the HNSW entry-layer shape in
    * batch form): seed on the UPPER LAYER's signatures (a
    * 1/layer_mod-sized scan), walk `layerHops` rounds over the small
    * upper graph, pick each query's `seeds` best VISITED layer nodes
    * by exact cosine (the batched greedy descent), and start the
    * level-0 walk from those entries — same `hops` expansion and
    * exact rerank as [[searchTopK]], so the two tiers differ ONLY in
    * where the walk enters. Upper-layer visits do not join the
    * candidate set (the HNSW convention: upper layers route, layer 0
    * answers); candidate volume is therefore directly comparable to
    * the flat walk at equal seed count, which is what the layered
    * sweep row measures.
    */
  def searchTopKLayered(spark: SparkSession, dir: String,
      numQueries: Int, seeds: Int, layerHops: Int, hops: Int,
      k: Int): DataFrame = {
    val idx = loadCached(spark, dir)
    Similarity.graphRerank(idx.liveVectors.localCheckpoint(false),
      expandCandidatesLayered(spark, dir, numQueries, seeds, layerHops,
        hops),
      numQueries, k)
  }

  /** The candidate half of [[searchTopKLayered]] — visited level-0
    * set `(query_id, id)`, self-hits excluded; public for composed
    * pipelines, like [[expandCandidates]].
    */
  def expandCandidatesLayered(spark: SparkSession, dir: String,
      numQueries: Int, seeds: Int, layerHops: Int,
      hops: Int): DataFrame = {
    require(layerHops >= 1 && hops >= 1, "need at least one hop per tier")
    val idx = loadCached(spark, dir)
    var cand = entriesLayered(idx, numQueries, seeds, layerHops)
      .localCheckpoint(false)
    for (_ <- 1 to hops) {
      val expanded = cand.join(hopEdges(idx, cand), col("id") === col("esrc"))
        .select(col("query_id"), col("edst").as("id"))
      cand = cand.union(expanded).distinct().localCheckpoint(false)
    }
    cand.filter(col("query_id") =!= col("id"))
  }

  /** The UPPER tier's routing output — each query's `seeds` best
    * visited layer nodes by exact cosine, the level-0 entry points
    * shared by the blind ([[searchTopKLayered]]) and beam
    * ([[searchTopKHnsw]]) descents.
    */
  private def entriesLayered(idx: Index, numQueries: Int, seeds: Int,
      layerHops: Int): DataFrame = {
    val sigs = idx.liveSigs.localCheckpoint(false)
    // entry seeds: Hamming over the LAYER's signatures only — queries
    // still come from the full table (a query need not be a layer node)
    var lc = Similarity.hammingTopKSigsFrom(
        sigs.filter(col("id") % idx.layerMod === 0), sigs,
        numQueries, seeds)
      .select(col("query_id"), col("neighbor_id").as("id"))
      .localCheckpoint(false)
    for (_ <- 1 to layerHops) {
      val ex = lc.join(layerHopEdges(idx, lc), col("id") === col("esrc"))
        .select(col("query_id"), col("edst").as("id"))
      lc = lc.union(ex).distinct().localCheckpoint(false)
    }
    // batched greedy descent: the `seeds` closest visited layer nodes
    // per query (exact cosine, the heap's (cs DESC, id) tie order)
    // become the level-0 entry points
    val qv = idx.liveVectors.filter(col("id") < numQueries)
      .select(col("id").as("qid"), col("vec").as("qv"))
    lc.filter(col("query_id") =!= col("id"))
      .join(idx.liveVectors.select(col("id").as("vid"), col("vec")),
        col("id") === col("vid"))
      .join(broadcast(qv), col("query_id") === col("qid"))
      .select(col("query_id"), col("id"),
        Similarity.cosine(col("qv"), col("vec")).as("cs"))
      .groupBy(col("query_id"))
      .agg(Similarity.topkUdaf(seeds)(col("cs"), col("id")).as("t"))
      .select(col("query_id"), explode(col("t.items")).as("it"))
      .select(col("query_id"), col("it.id").as("id"))
  }

  /** BEAM-bounded serve (r15, E325 — the HNSW/DiskANN ef-search shape
    * in batch form): instead of expanding EVERY visited node each hop
    * (the blind walk, whose frontier grows (graphK+1)^hop), each hop
    * expands only the query's `ef` best visited candidates by exact
    * cosine — the batched greedy-with-beam discipline. Per-hop work is
    * ef·graphK edge lookups per query, so candidate volume is
    * ef-CONTROLLED at any depth (the knob HNSW exposes as efSearch):
    * visited ≤ seeds + hops·ef·graphK rows regardless of corpus size
    * or hop count, where the blind walk's budget is depth-exponential
    * until it saturates. The walk state per hop: visited_{h+1} =
    * visited_h ∪ expand(beam(visited_h)), beam = top-ef by (cs DESC,
    * id), query self-hits excluded from beam slots. Fully
    * value-replayable (per-hop rescoring windows in SQL), so the gate
    * row carries a complete DuckDB oracle; BeamSearchSpec records the
    * recall-vs-volume verdict against the blind walk either way.
    */
  def searchTopKBeam(spark: SparkSession, dir: String, numQueries: Int,
      seeds: Int, hops: Int, ef: Int, k: Int): DataFrame = {
    val idx = loadCached(spark, dir)
    Similarity.graphRerank(idx.liveVectors.localCheckpoint(false),
      expandCandidatesBeam(spark, dir, numQueries, seeds, hops, ef),
      numQueries, k)
  }

  /** The candidate half of [[searchTopKBeam]]: the ef-bounded walk's
    * visited set `(query_id, id)`, self-hits excluded.
    */
  def expandCandidatesBeam(spark: SparkSession, dir: String,
      numQueries: Int, seeds: Int, hops: Int, ef: Int): DataFrame = {
    require(hops >= 1 && ef >= 1, "need at least one hop and one beam slot")
    val idx = loadCached(spark, dir)
    beamWalk(idx,
      Similarity.hammingTopKSigs(
          idx.liveSigs.localCheckpoint(false), numQueries, seeds)
        .select(col("query_id"), col("neighbor_id").as("id")),
      numQueries, hops, ef)
  }

  /** The ef-bounded level-0 walk from a given entry set — shared by
    * the flat-seeded beam serve and the full-HNSW composition.
    */
  private def beamWalk(idx: Index, entries: DataFrame, numQueries: Int,
      hops: Int, ef: Int): DataFrame = {
    val v = idx.liveVectors.localCheckpoint(false)
    val qv = v.filter(col("id") < numQueries)
      .select(col("id").as("qid"), col("vec").as("qv"))
    // per-query top-ef of the visited set by exact cosine — the beam
    def beamOf(cand: DataFrame): DataFrame =
      cand.filter(col("query_id") =!= col("id"))
        .join(v.select(col("id").as("vid"), col("vec")),
          col("id") === col("vid"))
        .join(broadcast(qv), col("query_id") === col("qid"))
        .select(col("query_id"), col("id"),
          Similarity.cosine(col("qv"), col("vec")).as("cs"))
        .groupBy(col("query_id"))
        .agg(Similarity.topkUdaf(ef)(col("cs"), col("id")).as("t"))
        .select(col("query_id"), explode(col("t.items")).as("it"))
        .select(col("query_id"), col("it.id").as("id"))
    var visited = entries.localCheckpoint(false)
    for (_ <- 1 to hops) {
      val beam = beamOf(visited).localCheckpoint(false)
      val expanded = beam
        .join(hopEdges(idx, beam), col("id") === col("esrc"))
        .select(col("query_id"), col("edst").as("id"))
      visited = visited.union(expanded).distinct().localCheckpoint(false)
    }
    visited.filter(col("query_id") =!= col("id"))
  }

  /** The FULL HNSW shape (r15, E327): hierarchical entry
    * ([[entriesLayered]] — layer-restricted seeds, upper-graph walk,
    * cosine descent) composed with the ef-bounded level-0 walk
    * ([[beamWalk]]) — what HNSW actually runs: upper layers route,
    * efSearch explores layer 0 under a volume budget. Candidate
    * volume ≤ seeds + hops·ef·graphK per query at any corpus size,
    * entries cost a 1/layer_mod-sized seed scan. The two tiers are
    * the SAME shared definitions their standalone rows gate, so the
    * composition adds no new arithmetic — only the wiring.
    *
    * NOT the recommended serve (r16, VERDICT r15 #3): SCALING.md's
    * sweep measured the FLAT-seeded beam ([[searchTopKBeam]])
    * dominating this composition on recall at comparable candidate
    * volume (0.38@341 vs 0.26@324 at depth 3) — layered entry saves
    * seed-scan cost but loses deep-hop recall on this corpus
    * geometry. `IndexMain --graph` serves through the beam frontier;
    * this stays available as the named composition with its recorded
    * verdict.
    */
  def searchTopKHnsw(spark: SparkSession, dir: String, numQueries: Int,
      seeds: Int, layerHops: Int, hops: Int, ef: Int,
      k: Int): DataFrame = {
    val idx = loadCached(spark, dir)
    Similarity.graphRerank(idx.liveVectors.localCheckpoint(false),
      expandCandidatesHnsw(spark, dir, numQueries, seeds, layerHops,
        hops, ef),
      numQueries, k)
  }

  /** Candidate half of [[searchTopKHnsw]]. */
  def expandCandidatesHnsw(spark: SparkSession, dir: String,
      numQueries: Int, seeds: Int, layerHops: Int, hops: Int,
      ef: Int): DataFrame = {
    require(layerHops >= 1 && hops >= 1 && ef >= 1,
      "need at least one hop per tier and one beam slot")
    val idx = loadCached(spark, dir)
    beamWalk(idx, entriesLayered(idx, numQueries, seeds, layerHops),
      numQueries, hops, ef)
  }

  /** E301's hop-recall sweep re-run over the LAYERED walk (r15): one
    * pass, the level-0 visited set snapshotted at every depth 0..hops
    * (depth 0 = the entry points the upper layer routed to), each
    * snapshot reranked and priced against the exact cosine top-k —
    * recall and candidate volume per depth, directly comparable to
    * the flat `emb_graph_hop_sweep` curve at equal seed count (that
    * comparison is the "does the entry layer buy recall at fixed
    * candidate volume" question, answered by measurement in
    * SCALING.md).
    */
  def layeredHopSweep(spark: SparkSession, dir: String, numQueries: Int,
      seeds: Int, layerHops: Int, hops: Int, k: Int): DataFrame = {
    val idx = loadCached(spark, dir)
    val v = idx.liveVectors.localCheckpoint(false)
    // depth 0 = the ENTRY set (the upper tier's routing output),
    // computed once; deeper snapshots expand it over level 0
    val entries = entriesLayered(idx, numQueries, seeds, layerHops)
      .localCheckpoint(false)
    var cand = entries
    var snaps = List((0, cand))
    for (h <- 1 to hops) {
      val expanded = cand.join(hopEdges(idx, cand), col("id") === col("esrc"))
        .select(col("query_id"), col("edst").as("id"))
      cand = cand.union(expanded).distinct().localCheckpoint(false)
      snaps ::= ((h, cand))
    }
    val q = v.filter(col("id") < numQueries)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val exact = Similarity.topK(v, q, k)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(false)
    // r16: one grouped rerank + count over all depths (identical
    // per-hop results; see Similarity.hopSweepRows).
    Similarity.hopSweepRows(v, snaps.reverse, exact, numQueries, k)
  }
}
