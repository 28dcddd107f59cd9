package graft.operators

/** Filesystem-METADATA consistency witness for persisted index
  * directories ([[ProductQuantizer]], [[Similarity]] semantic index,
  * [[InvertedIndex]]) — the r16-advisory fix for the per-query
  * `count()` witness: instead of running a Spark job over the whole
  * code/corpus/posting table before every search (pointless at a
  * billion-row index), the save/append path records a fingerprint of
  * the data FILE LISTING (sorted relative paths + byte sizes, hashed)
  * in the index meta, and the query path re-lists the directory and
  * compares — O(#files) filesystem metadata, zero Spark jobs, zero
  * data pages read.
  *
  * What it catches, loudly: any interrupted build or append that
  * touched the data tree — extra files (append without a meta update),
  * missing files (partial overwrite), truncated or grown files (size
  * change), renamed layout. A rebuild with identical row COUNTS but
  * different parameters also changes the listing (Spark writes fresh
  * task-UUID file names), which the old row-count witness could not
  * see. What it deliberately does not catch: in-place byte corruption
  * at identical length — parquet's own page checksums own that layer.
  *
  * Hidden entries (any RELATIVE-PATH segment starting with `_` or `.`:
  * `_SUCCESS`, the meta sidecar itself, temp files, and everything
  * under a `_temporary/` tree left by a killed write) are excluded,
  * matching Spark's own data-file visibility convention — which skips
  * hidden DIRECTORIES too, so a leaf-name-only check would bake a
  * stray temp tree into a save-time fingerprint and then fail every
  * later query as "stale" even though the visible data matches (r17
  * advisory). The walk goes through [[MetaIO.listDataFiles]] — the
  * Hadoop `FileSystem` listing, so the witness prices as one LIST call
  * on `file:`, `hdfs:`, and `s3a:` alike (r19 directive #3; the old
  * `java.nio` walk made every persisted index local-FS-only) — still
  * metadata-priced, still no data scan.
  */
object IndexWitness {

  /** Fingerprint of `dir`'s visible data files: sha-256 over the
    * sorted `relativePath|byteSize` listing. */
  def fingerprint(dir: String): String = {
    val entries = MetaIO.listDataFiles(dir).map { case (rel, len) => s"$rel|$len" }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    entries.sorted.foreach(e => md.update((e + "\n").getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Loud staleness check: the recorded fingerprint vs the directory's
    * current listing. `what`/`hint` compose the caller's error idiom
    * (e.g. "stale index from an interrupted build; rebuild with
    * savePqIndex"). */
  def check(dir: String, expected: String, what: String, hint: String): Unit = {
    val actual = fingerprint(dir)
    require(actual == expected,
      s"$dir: data-file listing fingerprint $actual does not match the meta's " +
        s"$expected — $what; $hint")
  }

  /** Meta formatVersion enforcement, shared by every persisted-index
    * sidecar reader (PQ / IVF-PQ / semantic / inverted): the version is
    * written into every meta but was never read back (r18 advisory), so
    * an index written by a NEWER engine format would be silently
    * misread — fields it knows nothing about dropped on the floor —
    * rather than failing with a named message. Reads fail loudly in
    * BOTH directions: older format → the named upgrade/rebuild hint;
    * newer format → "upgrade the engine". An absent property predates
    * versioned metas entirely (pre-v2) and gets the same upgrade hint.
    */
  def requireFormat(metaPath: String, props: java.util.Properties,
                    current: Int, hint: String): Unit = {
    val v = props.getProperty("formatVersion")
    require(v != null,
      s"$metaPath predates versioned index metas (this engine reads format " +
        s"v$current) — index format upgraded; $hint")
    // toIntOption, not toInt: a corrupt/non-numeric version must die with
    // the named corrupt-meta message every other sidecar field gets, not a
    // bare NumberFormatException (r19 advisory)
    val parsed = v.toIntOption
    require(parsed.isDefined,
      s"$metaPath has a non-numeric formatVersion '$v' — corrupt index meta; $hint")
    val n = parsed.get
    require(n >= current,
      s"$metaPath is index meta format v$n; this engine reads v$current — " +
        s"index format upgraded; $hint")
    require(n <= current,
      s"$metaPath is index meta format v$n; this engine reads v$current — " +
        "the index was written by a NEWER engine; upgrade the engine (or " +
        s"rebuild the index with this one: $hint)")
  }
}
