import graft.GraftSession
import graft.multimodal.ImageHash

import org.apache.spark.sql.functions._

/** Round-17 scale probe for the image dHash dedup family (mm03/mm04/
  * st15): the banded Hamming join at 1,000,000 hashes — 5·10^11
  * all-pairs comparisons if done brute-force — plus the flat-image
  * flood guard and the incremental-index nightly cost.
  *
  * Corpus: 500k engineered near-dup pairs (even id = xxhash64(id), odd
  * id = its even neighbor's hash with 2 bits flipped — Hamming 2), so
  * the expected pair count is EXACTLY 500,000: random 64-bit hashes
  * land within 3 bits of each other with probability ~2.4e-15, so
  * accidental pairs are absent and any count deviation is a recall or
  * precision bug, not noise. `Test/runMain Round17ImageProbe`.
  */
object Round17ImageProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-image-probe17")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    // Synthetic hashes have NO decode upstream: the working-set
    // materialization that keeps a real image pipeline from decoding
    // every frame twice only adds persist cost here (measured: 11.0 s
    // vs 7.8 s on the 1M join) — so this probe runs the lazy mode,
    // which is exactly what the conf exists for (cheap/scan-only
    // prefixes). Production image pipelines keep the default: one
    // decode beats one persist.
    spark.conf.set("spark.graft.dedup.materialize", "none")

    val n = 1000000L
    def hashes(ids: org.apache.spark.sql.DataFrame) = {
      val base = xxhash64(col("id") - col("id") % 2)
      ids.select(col("id"),
        when(col("id") % 2 === 1, base.bitwiseXOR(lit(5L)))
          .otherwise(base).as("dhash"))
    }
    val corpus = hashes(spark.range(n).toDF("id"))

    // --- 1M-hash banded join ---------------------------------------
    val t0 = System.nanoTime()
    val pairs = ImageHash.nearDupPairs(corpus, maxHamming = 3).count()
    val t1 = (System.nanoTime() - t0) / 1e9
    assert(pairs == n / 2, s"expected ${n / 2} engineered pairs, got $pairs")
    println(f"PROBE17I nearDupPairs: $n%,d hashes -> $pairs%,d verified pairs " +
      f"in $t1%.1f s (brute force would be ${n * (n - 1) / 2}%,d comparisons)")

    // --- flat-image flood: the guard fires before the pair explosion
    def msgOf(e: Throwable): String =
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    val flood = spark.range(500000).select(col("id"), lit(0L).as("dhash"))
    val t2 = System.nanoTime()
    val floodFailed =
      try { ImageHash.nearDupPairs(flood, maxHamming = 3,
        maxBandBucket = 100000).count(); false }
      catch { case e: Exception =>
        val m = msgOf(e)
        assert(m.contains("over maxBandBucket=100000"), s"wrong failure: $m")
        true
      }
    val t3 = (System.nanoTime() - t2) / 1e9
    assert(floodFailed, "band-bucket guard must fire on a 500k flat-image flood")
    println(f"PROBE17I flood guard fired in $t3%.1f s on a 500,000-image " +
      f"flat bucket (prevented ~${500000L * 499999 / 2}%,d pair rows)")

    // --- incremental index: nightly cost = the batch, not the corpus
    val idxDir = java.nio.file.Files.createTempDirectory("probe17-dhash-idx").toString
    val t4 = System.nanoTime()
    ImageHash.saveDhashIndex(corpus, idxDir, nBuckets = 32)
    val t5 = (System.nanoTime() - t4) / 1e9
    // 10k new images; 1k of them are near-dups of history (2-bit flips
    // of historical even hashes), the rest fresh randoms
    val batch = spark.range(n, n + 10000).toDF("id")
      .select(col("id"),
        when(col("id") % 10 === 0,
            xxhash64((col("id") % 2000) * 2).bitwiseXOR(lit(9L)))
          .otherwise(xxhash64(col("id"))).as("dhash"))
    val t6 = System.nanoTime()
    val inc = ImageHash.incrementalNearDupPairs(batch, idxDir, maxHamming = 3).count()
    val t7 = (System.nanoTime() - t6) / 1e9
    assert(inc >= 1000, s"expected >= 1000 old-new pairs, got $inc")
    println(f"PROBE17I index build over $n%,d hashes: $t5%.1f s (once); " +
      f"10,000-image nightly batch -> $inc%,d pairs in $t7%.1f s " +
      "(history never re-hashed)")
    new scala.reflect.io.Directory(new java.io.File(idxDir)).deleteRecursively()

    // --- video form: 100k videos x 10 frames = 1M frame hashes ------
    // Every even-id video's odd neighbor is a 2-bit-flipped re-encode
    // of ALL TEN frames, so expected pairs = 50,000 exactly, each at
    // n_matched = 10; frame_idx keying must keep candidates bounded by
    // per-position buckets (the alignment IS the blocking).
    val nv = 100000L
    val frames = spark.range(nv).toDF("id")
      .select(col("id"), explode(sequence(lit(0), lit(9))).as("frame_idx"))
      .select(col("id"), col("frame_idx"),
        when(col("id") % 2 === 1,
            xxhash64(concat((col("id") - 1).cast("string"), lit("#"),
              col("frame_idx").cast("string"))).bitwiseXOR(lit(5L)))
          .otherwise(xxhash64(concat(col("id").cast("string"), lit("#"),
            col("frame_idx").cast("string")))).as("dhash"))
    val t8 = System.nanoTime()
    val vp = ImageHash.videoNearDupPairs(frames, maxHamming = 3,
      minMatchNum = 2, minMatchDen = 3)
    val vMatched = vp.agg(count(lit(1)), sum("n_matched")).head()
    val t9 = (System.nanoTime() - t8) / 1e9
    assert(vMatched.getLong(0) == nv / 2 && vMatched.getLong(1) == nv / 2 * 10,
      s"expected ${nv / 2} pairs at 10 matches each, got $vMatched")
    println(f"PROBE17I videoNearDupPairs: $nv%,d videos x 10 frames " +
      f"(${nv * 10}%,d frame hashes) -> ${vMatched.getLong(0)}%,d verified " +
      f"video pairs in $t9%.1f s")
    spark.stop()
  }
}
