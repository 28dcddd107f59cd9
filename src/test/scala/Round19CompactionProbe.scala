import graft.GraftSession
import graft.operators.ProductQuantizer

import org.apache.spark.sql.functions._

/** Round-19 scale probe for index compaction under the witness (ix01):
  * the maintenance economics the r18 verdict asked for, at 500,000
  * 64-dim vectors —
  *
  *   - TWENTY nightly appendToPqIndex runs leave codes/ with one
  *     batch-sized file set per night (file count grows linearly with
  *     append count — the degradation being bounded);
  *   - compactPqIndex rewrites the table to ~target-size files and
  *     re-blesses the witness: file count collapses to the byte-derived
  *     bound and STAYS there however many nights preceded it;
  *   - the probe search's top-10 (ids and integer ADC distances) is
  *     bit-identical pre/post — compaction is pure layout maintenance;
  *   - search latency is measured on the fragmented and compacted
  *     layouts (same probe, medians of 5). Honest adjudication: on the
  *     LOCAL filesystem at this byte scale the two are within noise of
  *     each other (file opens are ~free locally, and more files even
  *     buys scan parallelism) — the measured win here is the BOUNDED
  *     listing/file count, which is what degrades on an object store
  *     (per-open request latency + LIST cost scale with file count,
  *     the 100 TB failure mode compaction exists for).
  * `Test/runMain Round19CompactionProbe`.
  */
object Round19CompactionProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-compact-probe19")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    val n = 500000L
    val nights = 20
    val emb = spark.range(n).toDF("vec_id")
      .select(col("vec_id"),
        expr("""transform(sequence(1, 64), j -> CAST(
          pmod(xxhash64(vec_id, j), 1000) / 1000.0 AS FLOAT))""").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"PROBE19C corpus: ${emb.count()} vectors x 64 dims, $nights nightly appends")

    def files(dir: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try s.filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val dir = java.nio.file.Files.createTempDirectory("probe19-pq").toString
    // base = the first half; nights split the second half evenly
    ProductQuantizer.savePqIndex(emb.filter(col("vec_id") < n / 2),
      d = 64, m = 4, k = 16, iterations = 1, path = dir)
    val f0 = files(s"$dir/codes")
    (0 until nights).foreach { night =>
      val lo = n / 2 + night * (n / 2 / nights)
      val hi = n / 2 + (night + 1) * (n / 2 / nights)
      ProductQuantizer.appendToPqIndex(
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi), dir)
    }
    val fGrown = files(s"$dir/codes")
    assert(fGrown >= f0 + nights,
      s"each night must add at least one file: $f0 -> $fGrown")

    val probe = emb.filter(col("vec_id") === 7L)
    def search(): Seq[(Long, Long)] = {
      import spark.implicits._
      ProductQuantizer.adcTopKIndexed(probe, dir, topK = 10)
        .as[(Long, Long)].collect().toSeq
    }
    def median5(): Double = {
      val ts = (1 to 5).map(_ => timed(search())._2).sorted
      ts(2)
    }
    val before = search()
    val tFrag = median5()

    val (stats, tCompact) = timed(ProductQuantizer.compactPqIndex(spark, dir))
    assert(stats.compacted, s"expected a real compaction, got $stats")
    val fCompact = files(s"$dir/codes")
    val after = search()
    val tComp = median5()
    assert(after == before,
      "compaction must not change the search top-10 (ids or distances)")
    // bounded: the compacted count is the byte-derived target, not a
    // function of how many nights preceded it
    assert(fCompact <= math.max(1, stats.bytes / (128L * 1024 * 1024)) + 1,
      s"compacted file count $fCompact not bounded by bytes/target")

    println(f"PROBE19C files: $f0 at build -> $fGrown after $nights appends " +
      f"-> $fCompact after compactPqIndex (${stats.bytes / 1048576}%,d MB, " +
      f"compaction itself $tCompact%.1f s, one-off)")
    println(f"PROBE19C probe search median-of-5: $tFrag%.2f s fragmented -> " +
      f"$tComp%.2f s compacted (local-FS parity — opens are ~free here; " +
      "the bounded file count is the object-store win); top-10 " +
      "bit-identical pre/post")
    spark.stop()
  }
}
