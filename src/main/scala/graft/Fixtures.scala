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
  * query-thread pool. (Cross-JVM races are benign for these fixtures:
  * generation is deterministic, and the `_SUCCESS` check-then-generate
  * window at worst regenerates identical bytes.)
  */
object Fixtures {
  private val lock = new Object

  def ensure(name: String, version: String)(generate: File => Unit): String =
    lock.synchronized {
      val dir = new File(s"${sys.props("user.dir")}/fixtures/$name-$version")
      val done = new File(dir, "_SUCCESS")
      if (!done.exists()) {
        dir.mkdirs()
        generate(dir)
        done.createNewFile()
      }
      dir.getAbsolutePath
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
