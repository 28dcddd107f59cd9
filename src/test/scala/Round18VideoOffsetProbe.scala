import graft.GraftSession
import graft.multimodal.ImageHash

import org.apache.spark.sql.functions._

/** Round-18 scale probe for offset-tolerant video matching (mm06):
  * the ±1 alignment sweep at 100,000 videos × 10 frames (1M frame
  * hashes). Every even-id video's odd neighbor is a 2-bit re-encode of
  * all ten frames SHIFTED one frame forward (a trimmed-intro copy:
  * copy frame i = original frame i+1, 9 aligned matches at shift +1),
  * so the expected pair count is exactly 50,000 at the 2/3 fraction —
  * and exactly 0 for the ALIGNED operator (mm05), which is the
  * miss-them-all failure mode the offset form exists to close. The
  * replication factor is the constant 3, so candidates stay bounded by
  * per-(shifted)-position buckets. `Test/runMain Round18VideoOffsetProbe`. */
object Round18VideoOffsetProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-vidoff-probe18")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    spark.conf.set("spark.graft.dedup.materialize", "none") // no decode prefix

    val nv = 100000L
    // even video v: frames 0..9 with hash H(v, i); odd video v+1:
    // frames 0..8 with hash H(v, i+1) xor 2 bits (trim of v's intro)
    val frames = spark.range(nv).toDF("id")
      .select(col("id"), explode(sequence(lit(0), lit(9))).as("frame_idx"))
      .filter(col("id") % 2 === 0 || col("frame_idx") <= 8)
      .select(col("id"), col("frame_idx"),
        when(col("id") % 2 === 1,
            xxhash64(concat((col("id") - 1).cast("string"), lit("#"),
              (col("frame_idx") + 1).cast("string"))).bitwiseXOR(lit(5L)))
          .otherwise(xxhash64(concat(col("id").cast("string"), lit("#"),
            col("frame_idx").cast("string")))).as("dhash"))

    val t0 = System.nanoTime()
    val aligned = ImageHash.videoNearDupPairs(frames, maxHamming = 3,
      minMatchNum = 2, minMatchDen = 3).count()
    val t1 = (System.nanoTime() - t0) / 1e9
    assert(aligned == 0, s"aligned matching must miss every trimmed copy, got $aligned")

    val t2 = System.nanoTime()
    val off = ImageHash.videoNearDupPairsOffset(frames, maxHamming = 3,
      minMatchNum = 2, minMatchDen = 3, maxShift = 1)
    val agg = off.agg(count(lit(1)), sum("n_matched"),
      sum(when(col("shift") === 1, 1).otherwise(0))).head()
    val t3 = (System.nanoTime() - t2) / 1e9
    assert(agg.getLong(0) == nv / 2 && agg.getLong(1) == nv / 2 * 9 &&
      agg.getLong(2) == nv / 2,
      s"expected ${nv / 2} pairs at 9 matches each, all at shift +1, got $agg")
    println(f"PROBE18V 1M frame hashes: aligned operator finds 0 trimmed copies " +
      f"($t1%.1f s); offset sweep (±1) finds exactly ${agg.getLong(0)}%,d pairs, " +
      f"all at shift +1 with 9/10 matches, in $t3%.1f s " +
      "(3x bounded replication, per-position buckets)")
    spark.stop()
  }
}
