package graft

import java.io.File

/** Once-per-working-dir fixture materialization, shared by the derived
  * partsupp table and the media fixture (one discipline, one
  * implementation — review r8).
  *
  * Layout: `fixtures/<name>-<version>/`, completeness marked by a
  * `_SUCCESS` file created AFTER `generate` returns. The version string
  * participates in the path, so changing a generator's derivation (bump
  * the version alongside) self-invalidates stale fixtures instead of
  * silently serving rows from an older formula. `fixtures/` is
  * .gitignored scratch; stale versions are simply abandoned on disk.
  *
  * The JVM-wide lock serializes generation across the driver's
  * query-thread pool. Cross-JVM publication is ATOMIC (ADVICE r8):
  * generation happens in a private `fixtures/.tmp-<pid>-<nanos>`
  * directory that is renamed onto the versioned path in one filesystem
  * op, so a concurrent `sbt test` and bench run can never observe (or
  * overwrite-delete) each other's half-written parquet — the loser of
  * the rename race discards its tmp dir and reads the winner's
  * identical bytes. A destination lacking `_SUCCESS` can only be
  * pre-atomic-era residue (generation never writes there directly), so
  * it is deleted before publishing.
  */
object Fixtures {
  private val lock = new Object

  def ensure(name: String, version: String)(generate: File => Unit): String =
    lock.synchronized {
      val dir = new File(s"${sys.props("user.dir")}/fixtures/$name-$version")
      val done = new File(dir, "_SUCCESS")
      if (!done.exists()) {
        val tmp = new File(dir.getParentFile,
          s".tmp-${ProcessHandle.current().pid()}-${System.nanoTime()}")
        tmp.mkdirs()
        try {
          generate(tmp)
          new File(tmp, "_SUCCESS").createNewFile()
          if (dir.exists() && !done.exists()) deleteRecursively(dir)
          try
            java.nio.file.Files.move(tmp.toPath, dir.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            // Another JVM published between our check and move: use theirs
            // (deterministic generation ⇒ identical bytes).
            case _: java.nio.file.FileAlreadyExistsException
               | _: java.nio.file.DirectoryNotEmptyException
               | _: java.nio.file.AccessDeniedException if done.exists() => ()
          }
        } finally if (tmp.exists()) deleteRecursively(tmp)
        if (!done.exists()) sys.error(
          s"fixture $name-$version failed to publish: no _SUCCESS at $dir")
      }
      dir.getAbsolutePath
    }

  private[graft] def deleteRecursively(f: File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRecursively)
    f.delete()
  }

  /** Collision-proof tag for a source path: readable last segment plus a
    * hash of the FULL path (a sanitized path alone maps e.g. /a/b_1 and
    * /a/b/1 to the same string). */
  def pathTag(path: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(path.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val last = path.split('/').filter(_.nonEmpty).lastOption.getOrElse("root")
      .replaceAll("[^A-Za-z0-9.]+", "_")
    s"${last}_$digest"
  }
}
