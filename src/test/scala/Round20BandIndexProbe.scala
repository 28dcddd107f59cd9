import graft.GraftSession
import graft.multimodal.ImageHash
import graft.operators.MetaIO

import org.apache.spark.sql.functions._

/** Round-20 scale probe for the band-index APPEND lifecycle (r19
  * directives #1/#2/#8): the day-N economics the append functions
  * exist for, at a 100,000-clip × 10-position history (1M position
  * hashes) with TWENTY consecutive nightly cycles — each night a
  * 2,000-clip batch (every even-id clip a 2-bit trimmed copy of a
  * history clip) is (a) queried against the index
  * (`incrementalNearDupPairsOffset`) and (b) APPENDED
  * (`appendToFrameIndex`), so night k's index holds history + k−1
  * survivor batches without any rebuild. Adjudicated claims:
  *
  *   - **flat nightly query cost**: the per-night sweep time must not
  *     trend with night number — the index side joins exchange-free
  *     on its bucket key and the batch alone is replicated, so 19
  *     appended batches (+3.8% corpus growth per night) cannot bend
  *     the curve (asserted: mean of nights 16–20 ≤ 2× mean of nights
  *     1–5 — generous because local wall-clock is noisy; the printed
  *     series is the record);
  *   - **bounded file count** (the ix01 failure mode): every append
  *     adds at most nBuckets band files + 1 counts file (the
  *     bucket-aligned insert — the un-aligned first run of this probe
  *     measured 257 files/night and a 4.08× nightly-query slowdown by
  *     night 20), and the WEEKLY `compactFrameIndex` collapses the
  *     week's growth back to one file per bucket + one counts file,
  *     however many nights preceded;
  *   - **maintained-layout answers**: night-21 on the fully compacted
  *     tree must find its 1,000 planted copies with the exact closed
  *     form (9/10 matches at shift +1) — content-asserted per row.
  *
  * Honest adjudication (the Round19SegIndexProbe discipline): both
  * sides start from already-fingerprinted hashes, so the measured
  * nightly cost is the JOIN tail; the append's production win is what
  * it lets every later night SKIP — re-decoding and re-fingerprinting
  * the growing history (~220 s per 1M segments at the round-19
  * measured 4,539 seg/s), which a rebuild-per-night user pays 20×.
  * `Test/runMain Round20BandIndexProbe`.
  */
object Round20BandIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-bandidx-probe20")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    spark.conf.set("spark.graft.dedup.materialize", "none") // no decode prefix

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val nHist = 100000L
    val hist = spark.range(nHist).toDF("id")
      .select(col("id"), explode(sequence(lit(0), lit(9))).as("frame_idx"))
      .select(col("id"), col("frame_idx"),
        xxhash64(concat(col("id").cast("string"), lit("#"),
          col("frame_idx").cast("string"))).as("dhash"))

    // night n's batch: ids base+k; even k = a trimmed 2-bit re-encode of
    // HISTORY clip k/2 (distinct per night via the night offset), odd
    // k = novel — so every night finds exactly nBatch/2 pairs against
    // the ORIGINAL history, whatever was appended since
    val nBatch = 2000L
    def nightBatch(n: Int) = {
      val base = 200000L + n * 10000L
      spark.range(nBatch).toDF("k")
        .select((col("k") + base).as("id"), col("k"),
          explode(sequence(lit(0), lit(8))).as("frame_idx"))
        .select(col("id"), col("frame_idx"),
          when(col("k") % 2 === 0,
              xxhash64(concat(((col("k") / 2) + (n - 1) * 1000L).cast("long")
                  .cast("string"), lit("#"),
                (col("frame_idx") + 1).cast("string"))).bitwiseXOR(lit(5L)))
            .otherwise(xxhash64(concat(col("id").cast("string"), lit("#"),
              col("frame_idx").cast("string"), lit("!novel")))).as("dhash"))
    }

    val dir = java.nio.file.Files.createTempDirectory("probe20-bandidx").toString
    val (_, tBuild) = timed(ImageHash.saveFrameIndex(hist, dir))
    println(f"PROBE20B saveFrameIndex: 1M position hashes indexed in $tBuild%.1f s (once)")

    val nightly = scala.collection.mutable.ArrayBuffer.empty[Double]
    var prevFiles = MetaIO.listDataFiles(dir).size
    (1 to 20).foreach { n =>
      val batch = nightBatch(n)
      val (rows, tQ) = timed {
        ImageHash.incrementalNearDupPairsOffset(batch, dir,
            maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
          .collect()
      }
      assert(rows.length == nBatch / 2,
        s"night $n: expected ${nBatch / 2} trimmed-copy pairs, got ${rows.length}")
      val (_, tA) = timed(ImageHash.appendToFrameIndex(batch, dir))
      nightly += tQ
      val files = MetaIO.listDataFiles(dir).size
      // the first structural claim: an append adds at most nBuckets
      // band files + 1 counts file (the bucket-aligned insert — the
      // first run of this probe measured 257 files/night without it)
      assert(files - prevFiles <= 8 + 1,
        s"night $n grew the tree by ${files - prevFiles} files — append is not bucket-aligned")
      // weekly maintenance: compaction no-ops when already compact,
      // collapses the week's appends otherwise
      val wk = if (n % 5 == 0) {
        val stats = ImageHash.compactFrameIndex(spark, dir)
        s" [weekly compact: ${stats.map(s => s"${s.filesBefore}->${s.filesAfter}").mkString(", ")}]"
      } else ""
      prevFiles = MetaIO.listDataFiles(dir).size
      println(f"PROBE20B night $n%2d: query $tQ%5.2f s, append $tA%5.2f s, " +
        f"${rows.length} pairs, $files data files$wk")
    }
    val early = nightly.take(5).sum / 5
    val late = nightly.takeRight(5).sum / 5
    println(f"PROBE20B nightly query mean: nights 1-5 $early%.2f s, nights 16-20 $late%.2f s " +
      f"(ratio ${late / early}%.2f)")
    assert(late <= early * 2,
      f"nightly query cost must stay flat across appends, got $early%.2f -> $late%.2f")

    val filesBefore = MetaIO.listDataFiles(dir).size
    val (stats, tC) = timed(ImageHash.compactFrameIndex(spark, dir))
    val filesAfter = MetaIO.listDataFiles(dir).size
    println(f"PROBE20B compactFrameIndex: $filesBefore -> $filesAfter data files " +
      f"in $tC%.1f s (${stats.map(s => s"${s.filesBefore}->${s.filesAfter}").mkString(", ")})")
    assert(filesAfter <= 8 + 1,
      s"post-maintenance tree must be one file per bucket + counts, got $filesAfter")

    // night-21 on the fully maintained tree: every pair row's content
    // is asserted (1,000 trimmed copies, 9/10 matches at shift +1 —
    // the same closed form as every prior night), so the maintained
    // layout provably answers like the fresh one. (A REPEAT of night
    // 20's own query would violate the append contract — its ids are
    // now in counts/, so the fraction-gate join would see them twice;
    // exact pre/post-compaction row identity is pinned in
    // BandIndexLifecycleSpec for all three families.)
    val (rowsPost, tPost) = timed {
      ImageHash.incrementalNearDupPairsOffset(nightBatch(21), dir,
          maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
        .collect()
    }
    assert(rowsPost.length == nBatch / 2 &&
      rowsPost.forall(r => r.getLong(2) == 9L && r.getInt(3) == 1),
      s"night-21 on the maintained tree must find its ${nBatch / 2} planted " +
        s"copies at 9/10, shift +1 — got ${rowsPost.length}")
    println(f"PROBE20B night-21 on the maintained tree: $tPost%.2f s, " +
      f"${rowsPost.length} pairs, all 9/10 at shift +1")
    spark.stop()
  }
}
