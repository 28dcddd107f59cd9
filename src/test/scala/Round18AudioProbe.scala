import graft.GraftSession
import graft.multimodal.{AudioHash, MediaFixture, Multimodal}

import org.apache.spark.sql.functions._

/** Round-18 scale probe for the audio fingerprint family (au01/st16):
  * distributed WAV decode+fingerprint throughput with a per-clip
  * closed-form correctness check, plus the banded Hamming join at
  * 1,000,000 fingerprints and the silence-flood guard.
  *
  * Decode leg: 20,000 real 4096-frame WAV clips are ENCODED ON THE
  * EXECUTORS (javax.sound round-trip — no files), each a fixture
  * formula class plus a per-id DC offset; DC invariance means every
  * clip's fingerprint must equal its class's closed form EXACTLY, so
  * the throughput number carries a 20,000-way correctness assertion.
  *
  * Join leg: 500k engineered near-dup pairs (even id = xxhash64, odd =
  * 2-bit flip) at the PRODUCTION band geometry (nBands=4, 16-bit band
  * values) — 8-band/8-bit geometry would put ~N/256 hashes in every
  * band bucket of a near-uniform population, which is exactly what the
  * AudioHash scaladoc warns against and the width guard enforces.
  * `Test/runMain Round18AudioProbe`.
  */
object Round18AudioProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-audio-probe18")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    import spark.implicits._

    // --- decode leg: 20k executor-encoded WAVs, closed-form-checked --
    val expected = (0 until MediaFixture.AfpN).map(i =>
      i -> AudioHash.fingerprintSamples(Array.tabulate(MediaFixture.AfpFrames)(
        MediaFixture.afpSample(i, _).toLong))).toMap
    val nClips = 20000
    val clips = spark.range(nClips).as[Long].mapPartitions { it =>
      it.map { id =>
        val cls = (id % MediaFixture.AfpN).toInt
        val dc = (id % 100).toInt // DC offset: invariance says hash(class) holds
        val frames = MediaFixture.AfpFrames
        val raw = new Array[Byte](frames * 2)
        var k = 0
        while (k < frames) {
          val s = (MediaFixture.afpSample(cls, k) + dc).toShort
          raw(2 * k) = (s & 0xFF).toByte
          raw(2 * k + 1) = ((s >> 8) & 0xFF).toByte
          k += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, frames.toLong)
        val out = new java.io.ByteArrayOutputStream()
        try javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        finally ais.close()
        Multimodal.MediaItem(id, "audio/wav", out.toByteArray, Map.empty)
      }
    }
    val t0 = System.nanoTime()
    val byClass = AudioHash.hashAudio(clips).toDF
      .groupBy((col("media_id") % MediaFixture.AfpN).as("cls"), col("afp"))
      .count().collect()
    val t1 = (System.nanoTime() - t0) / 1e9
    assert(byClass.length == MediaFixture.AfpN,
      s"every clip must hash to its class's single closed form: ${byClass.toSeq}")
    byClass.foreach { r =>
      assert(r.getLong(1) == expected(r.getLong(0).toInt),
        s"class ${r.getLong(0)}: ${r.getLong(1)} != closed form")
    }
    println(f"PROBE18A decode+fingerprint: $nClips%,d real 4096-frame WAVs in " +
      f"$t1%.1f s (${nClips / t1}%,.0f clips/s; every hash equal to its " +
      "class's closed form)")

    // --- join leg: 1M fingerprints, production band geometry ---------
    spark.conf.set("spark.graft.dedup.materialize", "none") // no decode prefix
    val n = 1000000L
    val base = xxhash64(col("id") - col("id") % 2)
    val corpus = spark.range(n).toDF("id")
      .select(col("id"),
        when(col("id") % 2 === 1, base.bitwiseXOR(lit(5L)))
          .otherwise(base).as("afp"))
    val t2 = System.nanoTime()
    val pairs = AudioHash.nearDupPairs(corpus, maxHamming = 3).count()
    val t3 = (System.nanoTime() - t2) / 1e9
    assert(pairs == n / 2, s"expected ${n / 2} engineered pairs, got $pairs")
    println(f"PROBE18A nearDupPairs: $n%,d fingerprints -> $pairs%,d verified " +
      f"pairs in $t3%.1f s")

    // --- silence flood: hashes collapse to 0L, the guard must fire ---
    def msgOf(e: Throwable): String =
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    val flood = spark.range(500000).select(col("id"), lit(0L).as("afp"))
    val t4 = System.nanoTime()
    val floodFailed =
      try { AudioHash.nearDupPairs(flood, maxHamming = 3,
        maxBandBucket = 100000).count(); false }
      catch { case e: Exception =>
        val m = msgOf(e)
        assert(m.contains("over maxBandBucket=100000"), s"wrong failure: $m")
        true
      }
    val t5 = (System.nanoTime() - t4) / 1e9
    assert(floodFailed, "band-bucket guard must fire on a 500k silence flood")
    println(f"PROBE18A silence-flood guard fired in $t5%.1f s " +
      f"(prevented ~${500000L * 499999 / 2}%,d pair rows)")
    spark.stop()
  }
}
