import graft.GraftSession
import graft.multimodal.{AudioHash, MediaFixture, Multimodal}

import org.apache.spark.sql.functions._

/** Round-19 scale probe for offset-tolerant audio matching (au03):
  *
  * Segment leg: 20,000 real 3-segment WAVs (12,288 frames each) are
  * ENCODED ON THE EXECUTORS and cut + fingerprinted by
  * [[AudioHash.segmentHashes]] — every segment is a fixture waveform
  * class plus a per-id DC offset, so each of the 60,000 segment hashes
  * must equal its class's closed form EXACTLY (DC invariance): the
  * throughput number carries a 60,000-way correctness assertion, and
  * memory per task is O(segFrames), not O(clip).
  *
  * Sweep leg: 100,000 clips × 10 segments (1M segment hashes); every
  * odd-id clip is a TRIMMED-INTRO copy of its even neighbor (segment
  * i = original segment i+1, 2-bit re-encode flip). The ALIGNED
  * segment matcher must find 0 of the 50,000 copies — the exact
  * failure mode au03 exists to close — and the ±1 sweep must find all
  * 50,000 at shift +1 with 9/10 matches, through the delegated mm06
  * machinery (constant 3× replication, per-position buckets).
  * `Test/runMain Round19AudioOffsetProbe`.
  */
object Round19AudioOffsetProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-audiooff-probe19")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    import spark.implicits._

    // --- segment leg: 20k executor-encoded 3-segment WAVs ------------
    val segFrames = MediaFixture.AfpSegFrames
    val classes = Seq(0, 3, 5) // mutually-far closed forms
    val expected = classes.map(i =>
      i -> AudioHash.fingerprintSamples(Array.tabulate(segFrames)(
        MediaFixture.afpSample(i, _).toLong))).toMap
    val nClips = 20000
    val clips = spark.range(nClips).as[Long].mapPartitions { it =>
      it.map { id =>
        val dc = (id % 100).toInt
        val raw = new Array[Byte](3 * segFrames * 2)
        var k = 0
        while (k < 3 * segFrames) {
          // segment s of clip id carries class classes((id + s) % 3)
          val cls = classes(((id + k / segFrames) % 3).toInt)
          val s = (MediaFixture.afpSample(cls, k % segFrames) + dc).toShort
          raw(2 * k) = (s & 0xFF).toByte
          raw(2 * k + 1) = ((s >> 8) & 0xFF).toByte
          k += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, (3 * segFrames).toLong)
        val out = new java.io.ByteArrayOutputStream()
        try javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        finally ais.close()
        Multimodal.MediaItem(id, "audio/wav", out.toByteArray, Map.empty)
      }
    }
    val t0 = System.nanoTime()
    val byClass = AudioHash.segmentHashes(clips, segFrames).toDF
      .groupBy(((col("media_id") + col("seg_idx")) % 3).as("cls"), col("afp"))
      .count().collect()
    val t1 = (System.nanoTime() - t0) / 1e9
    assert(byClass.length == 3,
      s"every segment must hash to its class's single closed form: ${byClass.toSeq}")
    byClass.foreach { r =>
      assert(r.getLong(1) == expected(classes(r.getLong(0).toInt)),
        s"class slot ${r.getLong(0)}: hash != closed form")
      assert(r.getLong(2) == nClips.toLong,
        s"class slot ${r.getLong(0)}: ${r.getLong(2)} segments, want $nClips")
    }
    println(f"PROBE19S segment decode: $nClips%,d real 3-segment WAVs " +
      f"(${3 * nClips}%,d segments) in $t1%.1f s " +
      f"(${3 * nClips / t1}%,.0f segments/s; every hash equal to its " +
      "class's closed form; memory O(segFrames) per task)")

    // --- sweep leg: 1M segment hashes, trimmed copies -----------------
    spark.conf.set("spark.graft.dedup.materialize", "none") // no decode prefix
    val nc = 100000L
    val segs = spark.range(nc).toDF("id")
      .select(col("id"), explode(sequence(lit(0), lit(9))).as("seg_idx"))
      .filter(col("id") % 2 === 0 || col("seg_idx") <= 8)
      .select(col("id"), col("seg_idx"),
        when(col("id") % 2 === 1,
            xxhash64(concat((col("id") - 1).cast("string"), lit("#"),
              (col("seg_idx") + 1).cast("string"))).bitwiseXOR(lit(5L)))
          .otherwise(xxhash64(concat(col("id").cast("string"), lit("#"),
            col("seg_idx").cast("string")))).as("afp"))

    val t2 = System.nanoTime()
    val aligned = AudioHash.segmentNearDupPairs(segs, maxHamming = 3,
      minMatchNum = 2, minMatchDen = 3).count()
    val t3 = (System.nanoTime() - t2) / 1e9
    assert(aligned == 0, s"aligned matching must miss every trimmed copy, got $aligned")

    val t4 = System.nanoTime()
    val agg = AudioHash.nearDupPairsOffset(segs, maxHamming = 3,
        minMatchNum = 2, minMatchDen = 3, maxShift = 1)
      .agg(count(lit(1)), sum("n_matched"),
        sum(when(col("shift") === 1, 1).otherwise(0))).head()
    val t5 = (System.nanoTime() - t4) / 1e9
    assert(agg.getLong(0) == nc / 2 && agg.getLong(1) == nc / 2 * 9 &&
      agg.getLong(2) == nc / 2,
      s"expected ${nc / 2} pairs at 9 matches each, all at shift +1, got $agg")
    println(f"PROBE19S 1M segment hashes: aligned matcher finds 0 trimmed " +
      f"copies ($t3%.1f s); offset sweep (±1) finds exactly " +
      f"${agg.getLong(0)}%,d pairs, all at shift +1 with 9/10 matches, in " +
      f"$t5%.1f s (mm06 machinery verbatim over segment positions)")
    spark.stop()
  }
}
