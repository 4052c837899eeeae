package graft.sources

import java.nio.file.{Files, Path}

/** JVM-lifetime temp directories for queries that stage an intermediate
  * table copy (hash-clustered rewrites, MV rollups, streaming watch dirs,
  * format round-trips).
  *
  * Deletion must be DEFERRED, not eager: the DataFrame a query returns is
  * lazy, and the staged files are read when the CALLER later runs an action
  * (Verify writes the result, Bench counts it) — deleting in a `finally`
  * inside the query would yield FileNotFound at materialization time. A
  * single shutdown hook deleting everything registered here gives the
  * correct lifetime: files survive as long as any plan in this JVM might
  * read them, and repeated bench/verify invocations (each a fresh JVM) no
  * longer accumulate unbounded table copies in /tmp.
  */
object TempDirs {

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val it = registered.iterator()
      while (it.hasNext) deleteRecursively(it.next())
    }, "graft-tempdir-cleanup"))
  }

  /** Scratch root: the engine's ephemeral staging (streaming checkpoints +
    * state stores, staged table copies, sink dirs) is create-write-read-
    * delete churn whose cost is bounded by the local filesystem — the same
    * finding as GraftSession.localDir (the sandbox's /tmp is a slow overlay
    * mount; streaming micro-batches pay it per offset-log/commit-log/state
    * delta file). SPARK_GRAFT_TMP overrides (empty = platform default);
    * otherwise /dev/shm/graft_tmp when writable, else the platform default.
    * Capacity note: everything here is MB-scale per run and deleted at JVM
    * exit; a deployment with big staging keeps a disk path via the env. */
  private lazy val root: Option[Path] =
    graft.GraftSession.scratchRoot("SPARK_GRAFT_TMP", "graft_tmp")
      .map(java.nio.file.Paths.get(_))

  /** Create a temp directory that is removed (recursively) at JVM exit. */
  def create(prefix: String): Path = {
    hookInstalled
    val p = root match {
      case Some(r) => Files.createTempDirectory(r, prefix)
      case None => Files.createTempDirectory(prefix)
    }
    registered.add(p)
    p
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      // NOFOLLOW: registered dirs may contain symlinks to real data (the
      // streaming watch dirs link the shared parquet fixtures) — delete the
      // link itself, never recurse through it into the target.
      if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
        val listing = Files.list(p)
        try {
          val it = listing.iterator()
          while (it.hasNext) deleteRecursively(it.next())
        } finally listing.close()
      }
      Files.deleteIfExists(p)
    } catch {
      // Best-effort at exit, and never let one bad entry kill the hook:
      // directory-stream iteration surfaces racing deletes as UNCHECKED
      // DirectoryIteratorException/UncheckedIOException, not IOException.
      case _: Exception => ()
    }
  }
}
