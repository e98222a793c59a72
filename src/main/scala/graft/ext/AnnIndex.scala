package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted-index serving contract for the residual IVF-PQ tier
  * (E260, VERDICT r12 #3): a real deployment builds its ANN index
  * ONCE — coarse centroids, trained codebooks, per-vector codes — and
  * serves many queries from the persisted artifact, where every
  * in-repo ANN row so far rebuilt the index inside the query.
  *
  * Artifact layout under one directory (all parquet — the index IS a
  * set of tables, readable by any engine):
  *
  *   centroids.parquet  (cpart, cvec: double[])     — coarse quantizer
  *   codebooks.parquet  (cl, m, cvec: double[])     — trained PQ books
  *   codes.parquet      (id, c0..c{M−1}, cell)      — integer codes
  *   manifest.parquet   (1 row: format/geometry/counts)
  *
  * The manifest is written LAST, so a crashed build never presents a
  * loadable index; [[load]] re-asserts it — format version, geometry
  * arithmetic, and the row count of every table against the counts
  * recorded at build time (a truncated or mixed-version artifact fails
  * loudly, not as silent recall loss). Parquet round-trips IEEE
  * doubles bit-exactly, so a search over the re-loaded artifact is
  * hash-identical to the in-memory chain — AnnIndexSpec pins that, and
  * the `emb_persisted_topk` gate row hashes the read-back search
  * against the same oracle as the in-memory E243 row.
  *
  * Scale shape: the build is the E243 build (one corpus scan per
  * stage, bounded driver state in training); serving reads two small
  * broadcast tables plus the integer code table — the raw vectors
  * never load at query time.
  */
object AnnIndex {

  val FormatVersion = 1

  /** Loaded, validated artifact handles. */
  final case class Index(numSub: Int, subDim: Int,
      centroids: DataFrame, codebooks: DataFrame, codes: DataFrame)

  /** Build and persist the index for `vecs (id, part, vec)` under
    * `outDir` (`part` seeds the coarse quantizer, the repo-wide IVF
    * convention).
    */
  def build(vecs: DataFrame, numSub: Int, subDim: Int,
      outDir: String): Unit = {
    val spark = vecs.sparkSession
    val (cvecs, cw, codes) = Similarity.residualIndexBuild(
      vecs, numSub, subDim)
    cvecs.write.mode("overwrite").parquet(s"$outDir/centroids.parquet")
    cw.write.mode("overwrite").parquet(s"$outDir/codebooks.parquet")
    codes.write.mode("overwrite").parquet(s"$outDir/codes.parquet")
    // counts from the WRITTEN tables — the manifest describes the
    // artifact on disk, not the plan that produced it
    val nCells = spark.read.parquet(s"$outDir/centroids.parquet").count()
    val nBook = spark.read.parquet(s"$outDir/codebooks.parquet").count()
    val nVecs = spark.read.parquet(s"$outDir/codes.parquet").count()
    import spark.implicits._
    Seq((FormatVersion, numSub, subDim, numSub * subDim,
        Similarity.PqCodewords, Similarity.PqTrainIters,
        nCells, nBook, nVecs))
      .toDF("format_version", "num_sub", "sub_dim", "dim",
        "num_codewords", "train_iters",
        "n_cells", "n_codebook_rows", "n_vectors")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/manifest.parquet")
  }

  /** Load + validate. Throws (IllegalArgumentException) on a missing,
    * truncated, or wrong-version artifact.
    */
  def load(spark: SparkSession, dir: String): Index = {
    val m = spark.read.parquet(s"$dir/manifest.parquet").head()
    def mi(f: String): Int = m.getAs[Int](f)
    def ml(f: String): Long = m.getAs[Long](f)
    require(mi("format_version") == FormatVersion,
      s"index at $dir has format ${mi("format_version")}, " +
        s"this reader speaks $FormatVersion")
    require(mi("num_sub") * mi("sub_dim") == mi("dim"),
      s"manifest geometry inconsistent: ${mi("num_sub")}×${mi("sub_dim")}" +
        s" != ${mi("dim")}")
    val cvecs = spark.read.parquet(s"$dir/centroids.parquet")
    val cw = spark.read.parquet(s"$dir/codebooks.parquet")
    val codes = spark.read.parquet(s"$dir/codes.parquet")
    def check(name: String, df: DataFrame, want: Long): Unit = {
      val got = df.count()
      require(got == want,
        s"index table $name has $got rows, manifest says $want — " +
          "truncated or mixed-version artifact")
    }
    check("centroids", cvecs, ml("n_cells"))
    check("codebooks", cw, ml("n_codebook_rows"))
    check("codes", codes, ml("n_vectors"))
    Index(mi("num_sub"), mi("sub_dim"), cvecs, cw, codes)
  }

  /** Serve top-k for `q (qid, qv)` from the persisted index with the
    * fixed multi-probe rule — the same search half the in-memory E243
    * chain runs, pointed at the re-loaded tables.
    */
  def searchTopK(spark: SparkSession, dir: String, q: DataFrame,
      k: Int, probe: Int): DataFrame = {
    val idx = load(spark, dir)
    Similarity.residualIndexSearch(idx.centroids, idx.codebooks,
      idx.codes, q, idx.numSub, idx.subDim, k,
      Similarity.fixedProbePicker(probe))
  }
}
