package graft.core

import java.nio.file.{Files, Path}

/** Per-run scratch directories that clean themselves up at JVM exit.
  *
  * The engine stages stream sources/sinks/checkpoints, bucketed-table
  * scratch, and trained-centroid parquet under per-run-UNIQUE temp
  * roots (uniqueness is what makes concurrent harness runs on one
  * host safe), which means nothing ever reuses the paths: without
  * cleanup every verify/bench/test invocation permanently leaks its
  * staged layouts into the system tmpdir. Every root created here is
  * registered with a single JVM shutdown hook that deletes it
  * recursively, best-effort — a failed delete (root already gone,
  * permission oddity) must never turn JVM shutdown into a crash.
  */
object TempDirs {

  private val roots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(
    () => roots.forEach(deleteRecursively),
    "graft-tempdir-cleanup"))

  /** Create a fresh temp directory, registered for exit-time removal. */
  def path(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    roots.add(p)
    p
  }

  /** [[path]] as a String, the shape most call sites want. */
  def create(prefix: String): String = path(prefix).toString

  private def deleteRecursively(root: Path): Unit =
    try {
      val walk = Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder()).forEach { p =>
        try { Files.deleteIfExists(p); () }
        catch { case _: java.io.IOException => () }
      }
      finally walk.close()
    } catch { case _: java.io.IOException => () }
}
