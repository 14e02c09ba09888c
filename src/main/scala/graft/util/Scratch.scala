package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-JVM scratch space for queries that must round-trip through the
  * filesystem (IO round-trips, partition-evolution rewrites, the
  * malformed-CSV quarantine, the backfill planner's partition listing).
  *
  * All directories live under ONE root per JVM, deleted recursively by
  * a shutdown hook — repeated verify/bench runs no longer accumulate
  * orphaned temp data. Deliberately driver-local: the data written here
  * is query-fixture scale (a cluster deployment would point the same
  * queries at real table paths, not scratch).
  */
object Scratch {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh directory under the per-JVM root; cleaned up on JVM exit. */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { Files.deleteIfExists(f); () })
      finally walk.close()
    }
}
