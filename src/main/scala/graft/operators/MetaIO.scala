package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Index-metadata I/O through the Hadoop `FileSystem` API — the r19
  * directive #3 fix for the `java.nio` local-FS assumption that every
  * persisted-index sidecar (PQ / IVF-PQ / semantic / inverted / band),
  * the [[IndexWitness]] listing walk, and the frame index's `counts/`
  * existence check shared: on an object-store path (`s3a://…`) those
  * died with a bare `NoSuchFileException`, so the index family was
  * local-only in practice even though every DATA read/write already
  * went through Spark (which is Hadoop-FS-native). Routing the sidecar
  * verbs through the same `FileSystem` the data uses makes a persisted
  * index deployable wherever its parquet lives — `file:`, `hdfs:`,
  * `s3a:` — with unchanged semantics (spec-gated: BandIndexLifecycleSpec runs a
  * full text-index lifecycle through an explicit `file:`-scheme URI).
  *
  * Scope is METADATA-priced operations only: properties sidecars of a
  * few hundred bytes, existence probes, and the recursive data-file
  * LISTING the witness fingerprints — never data pages. The atomic
  * publish idiom is write-temp + [[renameOverwrite]]: one atomic
  * rename on POSIX; on stores that refuse an existing destination the
  * fallback is delete-then-rename, whose crash window leaves the loud
  * MISSING-meta state every reader names — never a torn file (on S3A a
  * rename is copy+delete, but each object still appears
  * all-or-nothing: PUT is atomic).
  *
  * The Hadoop `Configuration` comes from the active `SparkSession` when
  * one exists (so `fs.s3a.*`/credential settings flow through), else a
  * fresh default — enough for `file:`-scheme fixture work in bare unit
  * tests.
  */
object MetaIO {

  def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Resolve `path` against its owning FileSystem; the returned Path is
    * fully qualified (scheme + authority), the string form every
    * catalog LOCATION / writer `path` option should use so save and
    * load land on the same files whatever the working scheme.
    *
    * On the local scheme the CHECKSUM wrapper is unwrapped to the raw
    * filesystem: sidecars are a few hundred bytes (a `.crc` sibling per
    * meta buys nothing), an operator legitimately edits/repairs a
    * sidecar with a text editor (a stale `.crc` would then fail every
    * read with a bare ChecksumException), and the previous `java.nio`
    * implementation these verbs replaced was raw too — behavior
    * preserved. Real stores (HDFS block checksums, S3 ETags) verify
    * integrity internally. */
  def resolve(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf()) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case o => o
    }
    (fs, fs.makeQualified(p))
  }

  def qualified(path: String): String = resolve(path)._2.toString

  def exists(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.exists(p)
  }

  def isDirectory(path: String): Boolean = {
    val (fs, p) = resolve(path)
    fs.isDirectory(p)
  }

  def mkdirs(path: String): Unit = {
    val (fs, p) = resolve(path)
    fs.mkdirs(p)
  }

  def deleteIfExists(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.delete(p, false)
  }

  def deleteRecursively(path: String): Unit = {
    val (fs, p) = resolve(path)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Overwriting directory/file move (`src` onto `dst`), the swap /
    * publish primitive: plain rename first (one atomic op on POSIX and
    * HDFS when dst is absent or an overwritable file), falling back to
    * delete-then-rename where the FS refuses an existing dst — that
    * window's crash state is a loudly MISSING target (the no-meta /
    * no-dir states every reader names), never a torn one. */
  def renameOverwrite(src: String, dst: String): Unit = {
    val (fs, s) = resolve(src)
    val (_, d) = resolve(dst)
    if (!fs.rename(s, d)) {
      if (fs.exists(d)) fs.delete(d, true)
      require(fs.rename(s, d), s"rename $s -> $d failed")
    }
  }

  /** Load a properties sidecar, or None when absent. */
  def readProps(path: String): Option[java.util.Properties] = {
    val (fs, p) = resolve(path)
    if (!fs.exists(p)) None
    else {
      val props = new java.util.Properties()
      val in = fs.open(p)
      try props.load(in) finally in.close()
      Some(props)
    }
  }

  /** Publish a properties sidecar at `dir/name` atomically: write to a
    * hidden temp name in the same directory, then rename-overwrite into
    * place — a reader never observes a torn sidecar, and a crash
    * leaves either the old meta or the new one (or a stray dot-file the
    * hidden-entry convention already ignores). */
  def writePropsAtomic(dir: String, name: String,
                       props: java.util.Properties, comment: String): Unit = {
    val (fs, d) = resolve(dir)
    val tmp = new Path(d, s".$name.${System.nanoTime()}.tmp")
    val out = fs.create(tmp, true)
    try props.store(out, comment) finally out.close()
    renameOverwrite(tmp.toString, new Path(d, name).toString)
  }

  /** Recursive listing of VISIBLE data files under `dir`:
    * (relative path, byte size), hidden entries (any path segment
    * starting with `_` or `.`) excluded — Spark's own data-file
    * visibility rule, shared with [[IndexWitness.fingerprint]]. One
    * LIST-priced walk, no data pages. */
  def listDataFiles(dir: String): Seq[(String, Long)] = {
    val (fs, root) = resolve(dir)
    require(fs.isDirectory(root),
      s"$dir is not a directory — cannot list an index that is not there")
    fs match {
      case _: org.apache.hadoop.fs.RawLocalFileSystem =>
        // local fast path: `fs.listFiles` materializes LocatedFileStatus
        // PERMISSIONS, and RawLocalFileSystem loads those by shelling
        // out (`ls -ld`) PER FILE — measured 1.07 s for a 130-file
        // index vs ~1 ms through java.nio, which turned every
        // witness-checked search into a fork-storm (r20 bench record
        // caught pq06/07/08 at 2-5x on floors). Object stores don't
        // have this failure mode; local dirs don't need the FS API.
        val rootP = java.nio.file.Paths.get(root.toUri)
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        val stream = java.nio.file.Files.walk(rootP)
        try {
          stream.forEach { p =>
            if (java.nio.file.Files.isRegularFile(p)) {
              val rel = rootP.relativize(p)
              val hidden = (0 until rel.getNameCount).exists { i =>
                val seg = rel.getName(i).toString
                seg.startsWith("_") || seg.startsWith(".")
              }
              if (!hidden)
                out += ((rel.toString, java.nio.file.Files.size(p)))
            }
          }
        } finally stream.close()
        out.toSeq
      case _ =>
        val rootUri = root.toUri
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        val it = fs.listFiles(root, true)
        while (it.hasNext) {
          val st = it.next()
          val rel = rootUri.relativize(st.getPath.toUri).getPath
          val hidden = rel.split('/')
            .exists(seg => seg.startsWith("_") || seg.startsWith("."))
          if (!hidden) out += ((rel, st.getLen))
        }
        out.toSeq
    }
  }

  /** Count + total bytes of visible `.parquet` files DIRECTLY under
    * `dir` (non-recursive) — the compaction no-op test for flat table
    * dirs (bucketed path tables, counts tables). */
  def parquetLeafStats(dir: String): (Int, Long) = {
    val (fs, p) = resolve(dir)
    val files = fs.listStatus(p).filter(s => s.isFile &&
      s.getPath.getName.endsWith(".parquet") &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    (files.length, files.map(_.getLen).sum)
  }
}
