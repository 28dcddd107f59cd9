import graft.GraftSession
import graft.multimodal.ImageHash

import org.apache.spark.sql.functions._

/** Round-19 scale probe for the persisted segment/frame band index
  * (au04/mm07): the nightly economics the index exists for, at a
  * 100,000-clip × 10-segment history (1M position hashes) and a
  * 2,000-clip nightly batch in which every even-id batch clip is a
  * 2-bit TRIMMED copy of a history clip —
  *
  *   - `saveFrameIndex` is paid ONCE;
  *   - the nightly `incrementalNearDupPairsOffset` replicates ONLY the
  *     batch (the index side joins exchange-free on its bucket key,
  *     never ×(2·maxShift+1)) and takes the fraction gate's history
  *     lengths from the counts/ table, never a corpus re-scan;
  *   - the comparison point is the full re-sweep
  *     (`videoNearDupPairsOffset` over history ∪ batch) a user without
  *     the index would run nightly;
  *   - correctness: the incremental answer must equal the full sweep
  *     restricted to pairs involving the batch — asserted row-for-row
  *     at this scale, expected exactly 1,000 trimmed-copy pairs at
  *     shift +1 with 9/10 matches.
  *
  * Honest adjudication: both sides of this probe start from ALREADY
  * FINGERPRINTED hashes, so the measured ratio is the JOIN-only delta
  * (no 3× history replication, no history×history candidates) — the
  * production delta is dominated by what the index lets a nightly run
  * SKIP upstream: re-decoding and re-fingerprinting the history PCM,
  * which the Round19AudioOffsetProbe measured at 4,539 segments/s —
  * ≈ 220 s per 1M segments avoided every night, an order of magnitude
  * over the join saving shown here (the same adjudication as dd11's:
  * the index amortizes the EXPENSIVE prefix, the join is the cheap
  * tail).
  * `Test/runMain Round19SegIndexProbe`.
  */
object Round19SegIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-segidx-probe19")
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
    // nightly batch: ids 200000+k; even k = a trimmed 2-bit re-encode of
    // history clip k/2 (segment i = history segment i+1), odd k = novel
    val nBatch = 2000L
    val batch = spark.range(nBatch).toDF("k")
      .select((col("k") + 200000L).as("id"), col("k"),
        explode(sequence(lit(0), lit(8))).as("frame_idx"))
      .select(col("id"), col("frame_idx"),
        when(col("k") % 2 === 0,
            xxhash64(concat((col("k") / 2).cast("long").cast("string"), lit("#"),
              (col("frame_idx") + 1).cast("string"))).bitwiseXOR(lit(5L)))
          .otherwise(xxhash64(concat(col("id").cast("string"), lit("#"),
            col("frame_idx").cast("string"), lit("!novel")))).as("dhash"))

    val dir = java.nio.file.Files.createTempDirectory("probe19-segidx").toString
    val (_, tBuild) = timed(ImageHash.saveFrameIndex(hist, dir))
    println(f"PROBE19I saveFrameIndex: 1M position hashes indexed in $tBuild%.1f s (once)")

    val (inc, tInc) = timed {
      ImageHash.incrementalNearDupPairsOffset(batch, dir,
          maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
        .collect()
    }
    assert(inc.length == nBatch / 2,
      s"expected ${nBatch / 2} trimmed-copy pairs, got ${inc.length}")
    assert(inc.forall(r => r.getLong(2) == 9L && r.getInt(3) == 1),
      "every pair must match 9/10 at shift +1")

    val (full, tFull) = timed {
      ImageHash.videoNearDupPairsOffset(hist.unionAll(batch),
          maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
        .filter(col("id_a") >= 200000L || col("id_b") >= 200000L)
        .collect()
    }
    assert(inc.map(_.toString).toSeq.sorted == full.map(_.toString).toSeq.sorted,
      "incremental must equal the full sweep restricted to the batch")
    println(f"PROBE19I nightly batch (2k clips vs 100k-clip history): " +
      f"incremental $tInc%.1f s vs full re-sweep $tFull%.1f s " +
      f"(${tFull / tInc}%.1f× on the JOIN alone — the production win is the " +
      f"skipped history re-decode, ~220 s/1M segments at the measured " +
      f"4,539 seg/s; ${inc.length}%,d trimmed copies found at shift +1, " +
      "row-identical to the restricted full sweep)")
    spark.stop()
  }
}
