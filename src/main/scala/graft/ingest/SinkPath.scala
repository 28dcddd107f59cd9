package graft.ingest

/** Sink path resolution for log display (A24 — the last §2-A operator:
  * reference ingestor.go:757-769 `logSinkWrite` + sink_s3.go:151-175
  * `ResolvePath`/`joinPrefix`/`trimLeftSlashes`): turn a sink key into
  * the fully-qualified path a human greps for, and the base file name,
  * for the structured sink-write success event.
  *
  * Spark's writer manages the physical file names itself, so the unit
  * here is the sink ROOT (the reference logs per-object keys); the
  * same trim/join/qualify rules apply.
  */
object SinkPath {

  /** `scheme://root/prefix/key` with leading slashes trimmed off the key
    * and an empty prefix collapsing to no separator — byte-for-byte the
    * reference's joinPrefix + ResolvePath behavior. */
  def resolve(scheme: String, root: String, prefix: String, key: String): String = {
    val clean = key.dropWhile(_ == '/')
    val joined = if (prefix.isEmpty) clean else s"$prefix/$clean"
    s"$scheme://$root/$joined"
  }

  /** Display form of a sink path: qualified URIs are re-composed through
    * [[resolve]] (so the reference's trim/join rules normalize e.g.
    * accidental double slashes in the logged path); bare paths qualify
    * as absolute `file:` URIs. */
  def display(path: String): String =
    path.split("://", 2) match {
      case Array(scheme, rest) =>
        val (root, key) = rest.span(_ != '/')
        resolve(scheme, root, "", key)
      case _ => "file://" + new java.io.File(path).getAbsolutePath
    }

  /** Base name of a key (reference: `path.Base` — "." for the empty
    * string, "/" when the key is all slashes). */
  def fileName(key: String): String = {
    if (key.isEmpty) "."
    else {
      val trimmed = key.reverse.dropWhile(_ == '/').reverse
      val i = trimmed.lastIndexOf('/')
      if (trimmed.isEmpty) "/" else trimmed.substring(i + 1)
    }
  }
}
