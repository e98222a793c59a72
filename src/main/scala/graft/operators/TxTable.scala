package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional commit log for the lakehouse lane (E314,
  * VERDICT r13 "What's missing" #3) — the Delta/Iceberg atomicity
  * CONTRACT rebuilt from public knowledge on two primitives every
  * Hadoop-compatible filesystem offers: immutable data files and an
  * atomic single-file rename. MERGE INTO (E278), CDC apply (E280) and
  * compaction (E107) used to rewrite bare parquet directories, where
  * a crash mid-rewrite leaves mixed state a reader can see; here a
  * reader can only ever observe a COMMITTED version.
  *
  * Layout under one table directory:
  *
  *   data/v<version>-<uuid>/part-*.parquet  — one immutable snapshot
  *                                            dir per commit, never
  *                                            rewritten
  *   _commits/<version 20-digit>.commit     — the version manifest:
  *                                            header + the snapshot's
  *                                            file list (tab-separated
  *                                            text, one atomic file)
  *
  * The protocol (the [[graft.ext.AnnIndex]] manifest discipline,
  * generalized from "one index" to "any table"):
  *
  *  - WRITE: data files land first, under a version+uuid directory no
  *    reader ever lists directly; the manifest is then written to a
  *    temp name and RENAMED into `_commits/` — rename-with-no-
  *    overwrite is the atomic commit point. A crash before the rename
  *    leaves orphan data files that no manifest references: invisible
  *    (TxTableSpec plants exactly that torn write and proves readers
  *    never see it). Two racing committers target the same version
  *    name; the rename admits one, the loser fails LOUDLY (optimistic
  *    concurrency, first-writer-wins) and its orphan files stay
  *    invisible.
  *  - READ: [[snapshot]] = the file list of the HIGHEST committed
  *    version; [[snapshotAt]] = any retained version (time travel —
  *    old snapshots stay readable because commits never delete data
  *    files). Readers list ONE directory (`_commits/`) and read ONE
  *    small manifest — no full-table listing, which is what keeps a
  *    million-file table's planning driver-cheap at 100 TB.
  *  - The commit records the snapshot's row count RE-READ from the
  *    written files (verification at write time, the serve path pays
  *    nothing); [[validate]] re-asserts any version on demand.
  *
  * Copy-on-write semantics by construction: each commit is a full
  * snapshot file-set. That is exactly what MERGE/compaction produce
  * anyway (they rewrite the table); an append-only lane can commit
  * `old snapshot's files ++ new files` without rewriting bytes —
  * [[commitFiles]] exposes that path and [[append]] uses it.
  */
object TxTable {

  private val CommitDirName = "_commits"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def commitPath(dir: String, v: Long) =
    new Path(dir, f"$CommitDirName/$v%020d.commit")

  /** Committed versions in ascending order (empty for a fresh or
    * never-committed directory — orphan data files do not count).
    */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val cd = new Path(dir, CommitDirName)
    if (!f.exists(cd)) return Seq.empty
    f.listStatus(cd).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".commit"))
      .map(n => n.stripSuffix(".commit").toLong)
      .sorted
  }

  /** Highest committed version, or -1 for an empty table. */
  def currentVersion(spark: SparkSession, dir: String): Long =
    versions(spark, dir).lastOption.getOrElse(-1L)

  /** COMMIT `df` as the next version's full snapshot. Returns the
    * committed version. Fails loudly (and leaves only invisible
    * orphans) if a racing committer takes the version first.
    */
  def commit(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val v = currentVersion(spark, dir) + 1
    val snapDir = s"data/v$v-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("error").parquet(s"$dir/$snapDir")
    val f = fs(spark, dir)
    val files = f.listStatus(new Path(dir, snapDir)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted
      .map(n => s"$snapDir/$n")
    require(files.nonEmpty, s"commit produced no data files under $snapDir")
    commitFiles(spark, dir, v, files)
    v
  }

  /** APPEND: commit a new version whose snapshot is the previous
    * version's file list plus `df`'s files — no byte rewriting; the
    * append-only lane of the same contract.
    */
  def append(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val prev = currentVersion(spark, dir)
    require(prev >= 0, s"append to $dir: no committed version to extend")
    val v = prev + 1
    val snapDir = s"data/v$v-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("error").parquet(s"$dir/$snapDir")
    val f = fs(spark, dir)
    val newFiles = f.listStatus(new Path(dir, snapDir)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted
      .map(n => s"$snapDir/$n")
    commitFiles(spark, dir, v, manifestFiles(spark, dir, prev) ++ newFiles)
    v
  }

  /** The atomic commit point: recount the snapshot, write the
    * manifest to a temp name, rename into place (no-overwrite rename
    * = one winner). `txn`, when present, records an (appId, version)
    * idempotence token in the manifest header — the Delta `txn`
    * action's design, used by [[appendIdempotent]]. Package-private
    * so the spec can drive torn-write scenarios directly.
    */
  private[graft] def commitFiles(spark: SparkSession, dir: String,
      v: Long, files: Seq[String],
      txn: Option[(String, Long)] = None): Unit = {
    val nRows = spark.read
      .parquet(files.map(p => s"$dir/$p"): _*).count()
    val f = fs(spark, dir)
    val tmp = new Path(dir,
      s"$CommitDirName/.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, false)
    val txnField = txn.map { case (app, tv) => s"\ttxn=$app:$tv" }.getOrElse("")
    try {
      out.write((s"version=$v\tn_files=${files.size}\tn_rows=$nRows$txnField\n" +
        files.mkString("\n") + "\n").getBytes("UTF-8"))
    } finally out.close()
    val target = commitPath(dir, v)
    if (f.exists(target) || !f.rename(tmp, target)) {
      f.delete(tmp, true)
      throw new IllegalStateException(
        s"commit conflict on $dir version $v: another writer committed " +
          "first (this writer's files are orphaned, not visible)")
    }
  }

  /** Idempotence tokens already committed for `appId`: the set of
    * txn versions present in any manifest header. One small header
    * read per version — bounded by the commit count.
    */
  def committedTxns(spark: SparkSession, dir: String,
      appId: String): Set[Long] = {
    val f = fs(spark, dir)
    versions(spark, dir).flatMap { v =>
      val in = f.open(commitPath(dir, v))
      val header = try {
        new java.io.BufferedReader(
          new java.io.InputStreamReader(in, "UTF-8")).readLine()
      } finally in.close()
      header.split("\t").collectFirst {
        case s if s.startsWith(s"txn=$appId:") =>
          s.stripPrefix(s"txn=$appId:").toLong
      }
    }.toSet
  }

  /** EXACTLY-ONCE APPEND under at-least-once delivery (E317, the
    * Delta `txn`/`foreachBatch(batchId)` pattern): append `df` tagged
    * with `(appId, txnVersion)`; a REPLAY of an already-committed
    * (appId, txnVersion) is a silent no-op, so a streaming
    * `foreachBatch((batch, id) => appendIdempotent(batch, dir, "q",
    * id))` sink lands each micro-batch exactly once no matter how
    * often the engine retries it. The check and the commit share the
    * rename's atomicity: a racing duplicate that passes the check
    * still loses the no-overwrite rename and fails loudly — at worst
    * a retry observes the token and no-ops. Returns the committed
    * version, or -1 for a skipped replay.
    */
  def appendIdempotent(df: DataFrame, dir: String, appId: String,
      txnVersion: Long): Long = {
    val spark = df.sparkSession
    if (committedTxns(spark, dir, appId).contains(txnVersion)) return -1L
    val prev = currentVersion(spark, dir)
    val v = prev + 1
    val snapDir = s"data/v$v-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("error").parquet(s"$dir/$snapDir")
    val f = fs(spark, dir)
    val newFiles = f.listStatus(new Path(dir, snapDir)).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .sorted
      .map(n => s"$snapDir/$n")
    val base = if (prev >= 0) manifestFiles(spark, dir, prev) else Seq.empty
    commitFiles(spark, dir, v, base ++ newFiles,
      txn = Some((appId, txnVersion)))
    v
  }

  /** Parse a version's manifest → relative file list. */
  private def manifestFiles(spark: SparkSession, dir: String,
      v: Long): Seq[String] = {
    val f = fs(spark, dir)
    val p = commitPath(dir, v)
    require(f.exists(p), s"table $dir has no committed version $v " +
      s"(have: ${versions(spark, dir).mkString(", ")})")
    val in = f.open(p)
    val lines = ArrayBuffer.empty[String]
    try {
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, "UTF-8"))
      var l = rd.readLine()
      while (l != null) { if (l.nonEmpty) lines += l; l = rd.readLine() }
    } finally in.close()
    val header = lines.head
    require(header.startsWith(s"version=$v\t"),
      s"manifest $p is corrupt: header '$header'")
    val nFiles = header.split("\t")(1).stripPrefix("n_files=").toInt
    val files = lines.tail.toSeq
    require(files.size == nFiles,
      s"manifest $p is torn: lists ${files.size} files, header says $nFiles")
    files
  }

  /** Recorded row count of version `v` (written at commit time). */
  def committedRows(spark: SparkSession, dir: String, v: Long): Long = {
    val f = fs(spark, dir)
    val in = f.open(commitPath(dir, v))
    try {
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(in, "UTF-8"))
      rd.readLine().split("\t")(2).stripPrefix("n_rows=").toLong
    } finally in.close()
  }

  /** TIME TRAVEL: the table exactly as committed at version `v`. */
  def snapshotAt(spark: SparkSession, dir: String, v: Long): DataFrame =
    spark.read.parquet(manifestFiles(spark, dir, v).map(p => s"$dir/$p"): _*)

  /** The current table = highest committed version; a table with no
    * commits fails loudly (orphan data files are not a table).
    */
  def snapshot(spark: SparkSession, dir: String): DataFrame = {
    val v = currentVersion(spark, dir)
    require(v >= 0, s"$dir has no committed version — nothing to read " +
      "(a crashed initial commit leaves only invisible orphans)")
    snapshotAt(spark, dir, v)
  }

  /** Integrity audit for version `v`: the files exist and their row
    * count equals the count recorded at commit time.
    */
  def validate(spark: SparkSession, dir: String, v: Long): Unit = {
    val got = snapshotAt(spark, dir, v).count()
    val want = committedRows(spark, dir, v)
    require(got == want,
      s"version $v of $dir has $got rows, manifest says $want — " +
        "data files were mutated behind the log")
  }

  /** RETENTION + VACUUM: drop every commit older than the newest
    * `keepLast` versions, then physically delete the snapshot
    * directories no retained manifest references. Deletion order is
    * the crash-safety argument: manifests go FIRST (time travel to a
    * dropped version refuses immediately and atomically, per-version),
    * data files second — a crash between the two leaves only
    * PRESENT-but-unreferenced files, which are invisible to every
    * reader (the torn-write property) and reclaimed by the next
    * retain. A snapshot directory is removed only when NONE of its
    * files is referenced by a retained manifest; append-made versions
    * reference earlier dirs wholesale, so shared dirs survive as long
    * as any retained version needs them. Idempotence tokens riding on
    * dropped commits are forgotten with them — retention bounds the
    * replay-dedup horizon exactly like it bounds time travel, which is
    * the Delta/Iceberg trade stated openly.
    */
  def retain(spark: SparkSession, dir: String, keepLast: Int): Unit = {
    require(keepLast >= 1, "retention must keep at least one version")
    val vs = versions(spark, dir)
    val drop = vs.dropRight(keepLast)
    if (drop.isEmpty) return
    val keep = vs.takeRight(keepLast)
    val referenced = keep.flatMap(v => manifestFiles(spark, dir, v)).toSet
    val f = fs(spark, dir)
    drop.foreach(v => f.delete(commitPath(dir, v), false))
    val dataDir = new Path(dir, "data")
    if (f.exists(dataDir)) {
      f.listStatus(dataDir).foreach { st =>
        val sub = st.getPath.getName
        val files = f.listStatus(st.getPath).toSeq
          .map(_.getPath.getName)
          .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
        if (files.nonEmpty &&
            files.forall(n => !referenced.contains(s"data/$sub/$n")))
          f.delete(st.getPath, true)
      }
    }
  }
}
