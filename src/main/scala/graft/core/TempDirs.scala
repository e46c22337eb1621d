package graft.core

/** Per-JVM scratch space for operators that need a materialization
  * barrier (iterative connected components, LSH candidate reuse).
  * One base directory per JVM, deleted on exit; a STABLE subdirectory
  * per (operation, input) tag so repeated runs inside a long-lived
  * session overwrite their previous files instead of accumulating —
  * repeated runs must not fill the disk. Callers rely on Spark's
  * `mode("overwrite")` for atomic replace within the subdir.
  *
  * On a real cluster the same barrier writes to the job's staging
  * prefix on the shared filesystem; only the path provider changes. */
object TempDirs {
  private lazy val base: java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(d.toFile)))
    d
  }

  /** Stable scratch dir for `tag` (hashed — tags may contain paths).
    *
    * CONCURRENCY CONTRACT: the path is stable per (tag), so two
    * concurrent runs of the same operator over the same input in one
    * JVM would overwrite each other's barrier files mid-read. Callers
    * are single-threaded per tag today (Verify/Bench run queries
    * sequentially; each operator owns a distinct tag, e.g. minhash vs
    * cc vs simhash). A future parallel-query executor must scope the
    * tag by run id (and clean up explicitly) instead of relying on
    * this overwrite-in-place scheme. */
  def stable(tag: String): String = {
    val safe = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val p = base.resolve(safe)
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
