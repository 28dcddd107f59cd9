package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.MediaItem
import org.apache.spark.sql.functions.{col, first}

class AudioHashSpec extends SparkSpec {
  import spark.implicits._

  // the fixture fingerprints through the REAL WAV encode -> javax.sound
  // decode -> fingerprint path (the au01 entry's own route)
  private lazy val fixtureHashes: Map[Int, Long] = {
    val dir = MediaFixture.ensureAfp()
    (0 until MediaFixture.AfpN).map { i =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"afp_$i.wav"))
      i -> AudioHash.afp64(bytes)
    }.toMap
  }

  private def formulaHash(i: Int): Long =
    AudioHash.fingerprintSamples(
      Array.tabulate(MediaFixture.AfpFrames)(MediaFixture.afpSample(i, _).toLong))

  test("fixture fingerprints equal the analytic closed forms") {
    // the au01 VALUES oracle rests on these exact longs (derivation in
    // the MediaFixture afp comment: per-window lag-energy counts of
    // aligned square waves)
    assert(fixtureHashes(0) == 0x8787878787878787L, "period-8 square")
    assert(fixtureHashes(1) == 0x8787878787878787L,
      "DC offset leaves the fingerprint unchanged (differences cancel it)")
    assert(fixtureHashes(2) == 0x8787878787878787L,
      "uniform gain leaves the fingerprint unchanged (energies scale together)")
    assert(fixtureHashes(3) == 0x7F7F7F7F7F7F7F7FL, "period-16 square")
    assert(fixtureHashes(4) == 0L, "silence: no strict inequality anywhere")
    assert(fixtureHashes(5) == 0x7F87878787878787L,
      "one swapped window flips exactly that window's byte")
  }

  test("WAV roundtrip is transparent: decode path == formula path") {
    (0 until MediaFixture.AfpN).foreach { i =>
      assert(fixtureHashes(i) == formulaHash(i), s"i=$i")
    }
  }

  test("stereo channels sum; gain/DC invariance holds on the mixed series") {
    // a stereo clip whose L+R sum equals clip 0's mono series must
    // fingerprint identically through the real decoder
    val frames = MediaFixture.AfpFrames
    val raw = new Array[Byte](frames * 4)
    var k = 0
    while (k < frames) {
      val s = MediaFixture.afpSample(0, k)
      val l = (s / 2 + 100).toShort // asymmetric split, summing to s + 200
      val r = (s - s / 2 + 100).toShort
      raw(4 * k) = (l & 0xFF).toByte; raw(4 * k + 1) = ((l >> 8) & 0xFF).toByte
      raw(4 * k + 2) = (r & 0xFF).toByte; raw(4 * k + 3) = ((r >> 8) & 0xFF).toByte
      k += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out) finally ais.close()
    // mixed series = clip 0 + constant 200 -> DC invariance -> same hash
    assert(AudioHash.afp64(out.toByteArray) == fixtureHashes(0))
  }

  test("undecodable, too-short, and unsupported payloads throw (DLQ path)") {
    intercept[IllegalArgumentException](AudioHash.afp64(Array[Byte](1, 2, 3)))
    // shorter than the 8-window x 10-frame minimum
    val dir = java.nio.file.Files.createTempDirectory("afp-short")
    val f = new java.io.File(dir.toFile, "short.wav")
    val raw = new Array[Byte](40 * 2)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 40L)
    try javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, f) finally ais.close()
    val e = intercept[IllegalArgumentException](
      AudioHash.afp64(java.nio.file.Files.readAllBytes(f.toPath)))
    assert(e.getMessage.contains("shorter than"), e.getMessage)
    // direct arithmetic guards
    intercept[IllegalArgumentException](
      AudioHash.fingerprintSamples(new Array[Long](10)))
  }

  private def brute(hashes: Seq[(Int, Long)], maxHamming: Int): Seq[(Int, Int, Int)] =
    (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxHamming
    } yield (a, b, d)).sortBy(p => (p._1, p._2))

  test("nearDupPairs finds exactly the fixture near pairs (banded == brute)") {
    val hs = fixtureHashes.toSeq.sortBy(_._1)
    // hamming-5 pairs need nBands >= 6 for pigeonhole recall; 8 divides 64
    val got = AudioHash.nearDupPairs(hs.toDF("id", "afp"), maxHamming = 5,
      nBands = 8).as[(Int, Int, Int)].collect().toSeq
    assert(got == Seq((0, 1, 0), (0, 2, 0), (0, 5, 5), (1, 2, 0), (1, 5, 5),
      (2, 5, 5)))
    assert(got == brute(hs, 5))
  }

  test("hashAudio runs the distributed decode end-to-end") {
    val dir = MediaFixture.ensureAfp()
    val items = Multimodal.readMedia(spark, dir, "audio/wav", Some("*.wav"))
    val byPath = items.collect().map(m =>
      m.meta("path").split('/').last -> m.media_id).toMap
    val hashed = AudioHash.hashAudio(items).collect()
      .map(h => h.media_id -> h.afp).toMap
    (0 until MediaFixture.AfpN).foreach { i =>
      assert(hashed(byPath(s"afp_$i.wav")) == fixtureHashes(i), s"i=$i")
    }
  }

  test("undecodable items fail the distributed hash task (not fabricated)") {
    val junk = Seq(MediaItem(9L, "audio/wav", Array[Byte](0, 1), Map.empty)).toDS()
    intercept[org.apache.spark.SparkException] {
      AudioHash.hashAudio(junk).collect()
    }
  }

  test("persisted index: incremental pairs == batch-involving pairs, history never re-emits") {
    val hs = fixtureHashes.toSeq.sortBy(_._1)
    val (history, batch) = hs.partition(h => Set(0, 1, 3)(h._1))
    val dir = tmpDir("afp-idx")
    AudioHash.saveAfpIndex(history.toDF("id", "afp"), dir, nBands = 8)
    val got = AudioHash.incrementalNearDupPairs(
        batch.toDF("id", "afp"), dir, maxHamming = 5)
      .as[(Int, Int, Int)].collect().toSeq
    val batchIds = batch.map(_._1).toSet
    val expected = brute(hs, 5).filter(p => batchIds(p._1) || batchIds(p._2))
    assert(got == expected && got.nonEmpty)
    // the history-history pair (0,1) must NOT re-emit
    assert(brute(history, 5).nonEmpty)
    assert(!got.contains((0, 1, 0)))
  }

  // ---- offset-tolerant segment tier (au03) --------------------------

  // expected segment hashes per clip: each segment is a pinned afp
  // pattern (derivation in the MediaFixture afp-segment comment)
  private val patternHash = Map(
    0 -> 0x8787878787878787L, 1 -> 0x8787878787878787L,
    2 -> 0x8787878787878787L,
    3 -> 0x7F7F7F7F7F7F7F7FL, 5 -> 0x7F87878787878787L)

  private lazy val segFixture: Map[Int, Seq[Long]] = {
    val dir = MediaFixture.ensureAfpSeg()
    (0 until MediaFixture.AfpSegN).map { i =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"afps_$i.wav"))
      i -> AudioHash.afpSegments64(bytes, MediaFixture.AfpSegFrames).toSeq
    }.toMap
  }

  test("segment fingerprints equal the pinned per-pattern closed forms") {
    (0 until MediaFixture.AfpSegN).foreach { i =>
      val expected = MediaFixture.afpSegPatterns(i).map(patternHash)
      assert(segFixture(i) == expected, s"clip $i")
    }
    // clip 3's 100-frame sub-segment tail is DROPPED by the fixed cut:
    // 3 full segments, hashes undisturbed
    assert(segFixture(3).length == 3)
  }

  test("gain/DC invariance holds per segment (clips 1 and 4 == clip 0 hash-for-hash)") {
    assert(segFixture(1) == segFixture(0))
    assert(segFixture(4) == segFixture(0))
  }

  private def segDf = segFixture.toSeq.flatMap { case (id, hs) =>
    hs.zipWithIndex.map { case (h, p) => (id, p, h) }
  }.toDF("id", "seg_idx", "afp")

  test("aligned segment matching MISSES the trimmed copy; the sweep catches it") {
    // aligned form: only the full-length gain/DC copies pair
    val aligned = AudioHash.segmentNearDupPairs(segDf, maxHamming = 3,
      minMatchNum = 2, minMatchDen = 3).as[(Int, Int, Long)].collect().toSeq
    assert(aligned == Seq((0, 1, 3L), (0, 4, 3L), (1, 4, 3L)))
    // the ±1 sweep additionally pairs the intro-trimmed copy (at +1
    // against the full clips, −1 seen from clip 4's side of the id
    // order); the shuffled remix (clip 3) shares no single alignment
    // and never pairs
    val swept = AudioHash.nearDupPairsOffset(segDf, maxHamming = 3,
      minMatchNum = 2, minMatchDen = 3, maxShift = 1)
      .as[(Int, Int, Long, Int)].collect().toSeq
    assert(swept == Seq((0, 1, 3L, 0), (0, 2, 2L, 1), (0, 4, 3L, 0),
      (1, 2, 2L, 1), (1, 4, 3L, 0), (2, 4, 2L, -1)))
  }

  test("au04: incremental offset pairs == full sweep restricted to the batch; history never re-emits") {
    val dir = tmpDir("afp-seg-idx")
    AudioHash.saveSegmentIndex(segDf.filter(col("id").isin(0, 3, 4)), dir)
    val got = AudioHash.incrementalNearDupPairsOffset(
        segDf.filter(col("id").isin(1, 2)), dir,
        maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
      .as[(Int, Int, Long, Int)].collect().toSeq
    val full = AudioHash.nearDupPairsOffset(segDf, maxHamming = 3,
      minMatchNum = 2, minMatchDen = 3, maxShift = 1)
      .as[(Int, Int, Long, Int)].collect().toSeq
    val batchIds = Set(1, 2)
    assert(got == full.filter(p => batchIds(p._1) || batchIds(p._2)))
    // the all-history pair (0,4) was emitted at build time, not here
    assert(full.exists(p => p._1 == 0 && p._2 == 4) &&
      !got.exists(p => p._1 == 0 && p._2 == 4))
    // clip- and frame-level indexes refuse each other
    val e1 = intercept[Exception](AudioHash.incrementalNearDupPairs(
      segDf.select(col("id"), col("afp")), s"$dir/bands", maxHamming = 3))
    assert(e1.getMessage.contains("FRAME-level"), e1.getMessage)
    val clipDir = tmpDir("afp-clip-idx")
    AudioHash.saveAfpIndex(
      segDf.groupBy("id").agg(first("afp").as("afp")), clipDir)
    val e2 = intercept[Exception](AudioHash.incrementalNearDupPairsOffset(
      segDf.filter(col("id").isin(1, 2)), clipDir,
      maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1))
    assert(e2.getMessage.contains("bands"), e2.getMessage)
  }

  test("segmentHashes runs the distributed per-segment decode end-to-end") {
    val dir = MediaFixture.ensureAfpSeg()
    val items = Multimodal.readMedia(spark, dir, "audio/wav", Some("*.wav"))
    val byPath = items.collect().map(m =>
      m.meta("path").split('/').last -> m.media_id).toMap
    val got = AudioHash.segmentHashes(items, MediaFixture.AfpSegFrames)
      .collect().groupBy(_.media_id)
      .map { case (mid, rows) => mid -> rows.sortBy(_.seg_idx).map(_.afp).toSeq }
    (0 until MediaFixture.AfpSegN).foreach { i =>
      assert(got(byPath(s"afps_$i.wav")) == segFixture(i), s"clip $i")
    }
  }

  test("segment tier guards: bad segFrames, too-short clip (DLQ path)") {
    val dir = MediaFixture.ensureAfp()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "afp_0.wav"))
    // segFrames below the fingerprint minimum / over the overflow bound
    intercept[IllegalArgumentException](AudioHash.afpSegments64(bytes, 10))
    // a clip shorter than one segment is too short for this tier
    val e = intercept[IllegalArgumentException](
      AudioHash.afpSegments64(bytes, MediaFixture.AfpFrames + 1))
    assert(e.getMessage.contains("shorter than one"), e.getMessage)
  }

  test("segment tier routes a TRUNCATED stream to the DLQ, not a short tail (r19 advisory)") {
    val dir = MediaFixture.ensureAfp()
    val full = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "afp_0.wav"))
    // chop PCM data off the END: the RIFF header still declares the full
    // frame count, so the reader's stream ends early — a cut-mid-data
    // clip, exactly what afp64 already throws on
    val cut = java.util.Arrays.copyOf(full, full.length - 64)
    val seg = MediaFixture.AfpFrames / 2 // 2 declared segments, data ends in #2
    val e = intercept[IllegalArgumentException](AudioHash.afpSegments64(cut, seg))
    assert(e.getMessage.contains("truncated"), e.getMessage)
    // the whole-clip path agrees (shared DLQ contract)
    val e2 = intercept[IllegalArgumentException](AudioHash.afp64(cut))
    assert(e2.getMessage.contains("truncated"), e2.getMessage)
    // and a complete stream with a genuine sub-segment REMAINDER still
    // yields the full segments, silently dropping only the tail
    val odd = MediaFixture.AfpFrames / 3 // 3 segments + a remainder
    assert(AudioHash.afpSegments64(full, odd).length == 3)
  }

  test("streaming dedup replay converges to the batch answer on any chunking") {
    // st16: the SAME band-bucket state machine as images, over audio
    // fingerprints — gated by the identical pair set
    val hs = fixtureHashes.toSeq.sortBy(_._1)
    val expected = brute(hs, 5).map { case (a, b, d) => (a.toLong, b.toLong, d) }
    Seq(2, 3, 6).foreach { n =>
      val got = graft.streaming.StreamReplay.imageDedupReplay(
          spark, hs.toDF("id", "dhash"), maxHamming = 5, nBands = 8, nChunks = n)
        .as[(Long, Long, Int)].collect().toSeq
      assert(got == expected, s"nChunks=$n")
    }
  }
}
