package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the file-listing fingerprint that carries every
  * persisted index's staleness witness (PQ / semantic / inverted —
  * r16 advisory #2: filesystem metadata, never a Spark job). */
class IndexWitnessSpec extends AnyFunSuite {

  private def tmp(): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory("iw-spec")
    d.toFile.deleteOnExit()
    d
  }

  private def write(dir: java.nio.file.Path, rel: String, content: String): Unit = {
    val p = dir.resolve(rel)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
  }

  test("fingerprint is stable, path-relative, and covers nested partition dirs") {
    val a = tmp(); val b = tmp()
    for (d <- Seq(a, b)) {
      write(d, "codes/part-0.parquet", "AAAA")
      write(d, "corpus/cluster=0/part-1.parquet", "BBBBBB")
    }
    assert(IndexWitness.fingerprint(a.toString) == IndexWitness.fingerprint(a.toString))
    // same LISTING in a different absolute location → same fingerprint
    // (indexes are rsync/rename-portable, the Layout portability rule)
    assert(IndexWitness.fingerprint(a.toString) == IndexWitness.fingerprint(b.toString))
  }

  test("extra, missing, and truncated files all change the fingerprint") {
    val d = tmp()
    write(d, "codes/part-0.parquet", "AAAA")
    write(d, "codes/part-1.parquet", "BBBB")
    val fp = IndexWitness.fingerprint(d.toString)
    // extra file (interrupted append)
    write(d, "codes/part-2.parquet", "CC")
    assert(IndexWitness.fingerprint(d.toString) != fp)
    java.nio.file.Files.delete(d.resolve("codes/part-2.parquet"))
    assert(IndexWitness.fingerprint(d.toString) == fp)
    // truncation (same name, fewer bytes — the case a row-count witness
    // needs a full scan to see)
    write(d, "codes/part-1.parquet", "BB")
    assert(IndexWitness.fingerprint(d.toString) != fp)
    write(d, "codes/part-1.parquet", "BBBB")
    // missing file
    java.nio.file.Files.delete(d.resolve("codes/part-0.parquet"))
    assert(IndexWitness.fingerprint(d.toString) != fp)
  }

  test("hidden entries (_meta, _SUCCESS, dotfiles) are excluded — Spark's visibility rule") {
    val d = tmp()
    write(d, "part-0.parquet", "AAAA")
    val fp = IndexWitness.fingerprint(d.toString)
    write(d, "_SUCCESS", "")
    write(d, "_graft_pq_index.properties", "d=64")
    write(d, ".part-0.parquet.crc", "x")
    assert(IndexWitness.fingerprint(d.toString) == fp,
      "meta sidecars must not perturb the witness (the meta WRITE would " +
        "invalidate the fingerprint it records)")
  }

  test("requireFormat: absent, old, new, and CORRUPT versions all get named messages") {
    val props = new java.util.Properties()
    val e0 = intercept[IllegalArgumentException](
      IndexWitness.requireFormat("/idx/meta", props, 3, "rebuild with saveX"))
    assert(e0.getMessage.contains("predates versioned index metas") &&
      e0.getMessage.contains("rebuild with saveX"))
    props.setProperty("formatVersion", "2")
    val eOld = intercept[IllegalArgumentException](
      IndexWitness.requireFormat("/idx/meta", props, 3, "rebuild with saveX"))
    assert(eOld.getMessage.contains("index format upgraded"))
    props.setProperty("formatVersion", "4")
    val eNew = intercept[IllegalArgumentException](
      IndexWitness.requireFormat("/idx/meta", props, 3, "rebuild with saveX"))
    assert(eNew.getMessage.contains("NEWER engine"))
    // corrupt version: the named corrupt-meta message, not a bare
    // NumberFormatException (r19 advisory)
    props.setProperty("formatVersion", "v3!")
    val eBad = intercept[IllegalArgumentException](
      IndexWitness.requireFormat("/idx/meta", props, 3, "rebuild with saveX"))
    assert(eBad.getMessage.contains("/idx/meta") &&
      eBad.getMessage.contains("non-numeric formatVersion 'v3!'") &&
      eBad.getMessage.contains("rebuild with saveX"), eBad.getMessage)
    props.setProperty("formatVersion", "3")
    IndexWitness.requireFormat("/idx/meta", props, 3, "rebuild with saveX")
  }

  test("check() is loud on mismatch with the caller's idiom, silent on match") {
    val d = tmp()
    write(d, "part-0.parquet", "AAAA")
    val fp = IndexWitness.fingerprint(d.toString)
    IndexWitness.check(d.toString, fp, "stale", "rebuild")
    write(d, "part-1.parquet", "B")
    val e = intercept[IllegalArgumentException](
      IndexWitness.check(d.toString, fp, "stale index detected", "rebuild with saveX"))
    assert(e.getMessage.contains("stale index detected") &&
      e.getMessage.contains("rebuild with saveX"))
    val e2 = intercept[IllegalArgumentException](
      IndexWitness.fingerprint(d.resolve("nope").toString))
    assert(e2.getMessage.contains("not a directory"))
  }
}
