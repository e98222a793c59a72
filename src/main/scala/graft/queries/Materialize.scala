package graft.queries

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Write-once materialization for the round-trip source queries
  * (partitioned/CSV/JSON write → read back): the written layout is a
  * pure function of the fixture dir CONTENTS, so per-JVM it is produced
  * exactly once per fixture state and every later invocation (Bench
  * warmup, timed pass, row count) only SCANS it — the benchmark number
  * measures the read path, and repeated runs don't accumulate one full
  * table copy per call. The cache key folds in a fingerprint of the
  * fixture's file names/sizes/mtimes, so regenerated fixture data under
  * the same path invalidates the stale copy instead of serving it; a
  * JVM shutdown hook deletes every directory this object created, so
  * repeated JVMs don't accumulate copies in /tmp.
  */
object Materialize {
  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    dirs.values.forEach { d =>
      val p = Paths.get(d)
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
  }, "graft-materialize-cleanup"))

  /** name/size/mtime digest of the (flat) fixture files under `dir`.
    * The directory stream must be closed explicitly — NIO directory
    * streams hold an fd with no finalizer, and this runs on every
    * once() call.
    */
  private def fingerprint(dir: String): String = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) return "absent"
    val parts = scala.util.Using.resource(Files.list(p)) { s =>
      s.sorted().toArray.toSeq.collect {
        case f: Path if Files.isRegularFile(f) =>
          s"${f.getFileName}:${Files.size(f)}:${Files.getLastModifiedTime(f).toMillis}"
      }
    }
    Integer.toHexString(parts.mkString("\n").hashCode)
  }

  /** Path of the materialization for `key` at the current contents of
    * `fixtureDir`, writing it on first use.
    */
  def once(key: String, fixtureDir: String)(write: String => Unit): String =
    dirs.computeIfAbsent(s"$key@${fingerprint(fixtureDir)}", _ => {
      val p = Files.createTempDirectory("graft_mat").toString
      write(p)
      p
    })
}
