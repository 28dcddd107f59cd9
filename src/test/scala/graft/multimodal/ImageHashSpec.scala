package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.MediaItem

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureHashes: Map[Int, Long] = {
    val dir = MediaFixture.ensureDhash()
    (0 until MediaFixture.DhashN).map { i =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"dh_$i.png"))
      i -> ImageHash.dHash64(bytes)
    }.toMap
  }

  test("fixture dHashes equal the analytic closed forms") {
    // the mm03 VALUES oracle rests on these exact longs
    assert(fixtureHashes(0) == -1L, "monotone gradient: every bit set")
    assert(fixtureHashes(1) == -1L, "brightness shift leaves dHash unchanged")
    assert(fixtureHashes(2) == (-1L & ~(1L << 3)), "one dipped cell flips exactly bit 3")
    assert(fixtureHashes(3) == 0L, "reversed gradient: no bit set")
    assert(fixtureHashes(4) == 0L)
    assert(fixtureHashes(5) == 0x5555555555555555L, "stripes: bits at even columns")
    (0 until MediaFixture.DhashN).foreach { i =>
      assert(fixtureHashes(i) == MediaFixture.dhashExpected(i), s"i=$i")
    }
  }

  test("dHash is invariant under resize that preserves gradient structure") {
    // the same cell pattern rendered at 3x the resolution (108x96, 12x12
    // cells) must hash identically — the downscale-to-grid is the point
    def bigPng(i: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(108, 96,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 96; x <- 0 until 108) {
        val v = MediaFixture.dhashCell(i, y / 12, x / 12)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    (0 until MediaFixture.DhashN).foreach { i =>
      assert(ImageHash.dHash64(bigPng(i)) == fixtureHashes(i), s"i=$i")
    }
  }

  test("undecodable, too-small, and oversized payloads throw (DLQ path)") {
    intercept[IllegalArgumentException](ImageHash.dHash64(Array[Byte](1, 2, 3)))
    val tiny = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val e = intercept[IllegalArgumentException](ImageHash.dHash64(tiny))
    assert(e.getMessage.contains("smaller than"))
  }

  private def pairsOf(hashes: Seq[(Int, Long)], maxHamming: Int,
                      nBands: Int = 4): Seq[(Int, Int, Int)] =
    ImageHash.nearDupPairs(hashes.toDF("id", "dhash"), maxHamming, nBands)
      .as[(Int, Int, Int)].collect().toSeq

  private def brute(hashes: Seq[(Int, Long)], maxHamming: Int): Seq[(Int, Int, Int)] =
    (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxHamming
    } yield (a, b, d)).sortBy(p => (p._1, p._2))

  test("nearDupPairs finds exactly the fixture near pairs") {
    val hs = fixtureHashes.toSeq.sortBy(_._1)
    val got = pairsOf(hs, maxHamming = 3)
    assert(got == Seq((0, 1, 0), (0, 2, 1), (1, 2, 1), (3, 4, 0)))
    assert(got == brute(hs, 3))
  }

  test("banded join equals brute force on engineered bit-flip families") {
    // base hashes far apart; each spawns variants 1-3 bit flips away,
    // with flips spread across DIFFERENT bands (the adversarial case
    // for banding — recall must come from the untouched band)
    val bases = Seq(0L, -1L, 0x5555555555555555L, 0x123456789abcdefL)
    val hs = bases.zipWithIndex.flatMap { case (h, i) =>
      Seq((i * 10, h),
        (i * 10 + 1, h ^ (1L << 2)),                            // 1 flip, band 0
        (i * 10 + 2, h ^ (1L << 2) ^ (1L << 20)),               // 2 flips, bands 0,1
        (i * 10 + 3, h ^ (1L << 2) ^ (1L << 20) ^ (1L << 40))). // 3 flips, bands 0,1,2
        map { case (id, v) => (id, v) }
    }
    (0 to 3).foreach { t =>
      assert(pairsOf(hs, t) == brute(hs, t), s"maxHamming=$t")
    }
  }

  test("recall precondition and band arithmetic are enforced") {
    val hs = Seq((1, 1L), (2, 2L)).toDF("id", "dhash")
    // maxHamming >= nBands would lose the pigeonhole recall guarantee
    intercept[IllegalArgumentException](ImageHash.nearDupPairs(hs, 4, nBands = 4))
    intercept[IllegalArgumentException](ImageHash.nearDupPairs(hs, 2, nBands = 5))
    intercept[IllegalArgumentException](ImageHash.nearDupPairs(hs, -1))
  }

  test("band-bucket width cap dies loudly before any pair row") {
    // 6 all-zero hashes share every band: C(6,2) pairs uncapped
    val flood = (1 to 6).map(i => (i, 0L)) :+ (7, -1L)
    val e = intercept[Exception] {
      ImageHash.nearDupPairs(flood.toDF("id", "dhash"), 3,
        maxBandBucket = 5).collect()
    }
    assert(e.getMessage.contains("over maxBandBucket=5"), e.getMessage)
    // at the cap it completes and matches brute force
    assert(pairsOf(flood, 3).toSet ==
      brute(flood, 3).toSet)
  }

  test("plan: banded equi-join, no cartesian product") {
    val hs = fixtureHashes.toSeq.map { case (i, h) => (i, h) }.toDF("id", "dhash")
    // materialize=none keeps the plan lazy so the join shape is real,
    // not a checkpoint scan (BasketsSpec discipline)
    spark.conf.set("spark.graft.dedup.materialize", "none")
    try {
      val plan = ImageHash.nearDupPairs(hs, 3).queryExecution.executedPlan.toString
      assert(plan.contains("Join"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.conf.set("spark.graft.dedup.materialize", "local")
  }

  test("hashImages runs the partition-local batch lifecycle end-to-end") {
    val dir = MediaFixture.ensureDhash()
    val items = Multimodal.readMedia(spark, dir, "image/png", Some("*.png"))
    val byPath = items.collect().map(m =>
      m.meta("path").split('/').last -> m.media_id).toMap
    val hashed = ImageHash.hashImages(items).collect()
      .map(h => h.media_id -> h.dhash).toMap
    (0 until MediaFixture.DhashN).foreach { i =>
      assert(hashed(byPath(s"dh_$i.png")) == fixtureHashes(i), s"i=$i")
    }
  }

  test("persisted index: incremental pairs == inline pairs involving the batch") {
    // generic property on the engineered families, not just the fixture
    val bases = Seq(0L, -1L, 0x5555555555555555L, 0x123456789abcdefL)
    val hs = bases.zipWithIndex.flatMap { case (h, i) =>
      Seq((i * 10, h), (i * 10 + 1, h ^ (1L << 2)),
        (i * 10 + 2, h ^ (1L << 2) ^ (1L << 20)),
        (i * 10 + 3, h ^ (1L << 2) ^ (1L << 20) ^ (1L << 40)))
    }
    val (history, batch) = hs.partition(_._1 % 10 < 2)
    val dir = tmpDir("dhash-idx")
    ImageHash.saveDhashIndex(history.toDF("id", "dhash"), dir)
    val got = ImageHash.incrementalNearDupPairs(
      batch.toDF("id", "dhash"), dir, maxHamming = 3)
      .as[(Int, Int, Int)].collect().toSeq
    val batchIds = batch.map(_._1).toSet
    val expected = brute(hs, 3)
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(got == expected)
    // never (indexed x indexed): a history-only near pair must not re-emit
    val historyOnly = brute(history, 3)
    assert(historyOnly.nonEmpty, "fixture must contain a history-history pair")
    assert(historyOnly.forall(p => !got.contains(p)))
  }

  test("persisted index: banding geometry comes from the sidecar, misuse is loud") {
    val dir = tmpDir("dhash-idx-meta")
    ImageHash.saveDhashIndex(Seq((1, 0L), (2, -1L)).toDF("id", "dhash"), dir,
      nBands = 8)
    // maxHamming validated against the INDEX's nBands (8), not a default
    val ok = ImageHash.incrementalNearDupPairs(
      Seq((3, 1L)).toDF("id", "dhash"), dir, maxHamming = 7)
    assert(ok.collect().nonEmpty) // (1,3) at hamming 1
    intercept[IllegalArgumentException] {
      ImageHash.incrementalNearDupPairs(
        Seq((3, 1L)).toDF("id", "dhash"), dir, maxHamming = 8)
    }
    // a directory that is not an index fails loudly, never reads as empty
    val foreign = tmpDir("dhash-not-an-index")
    intercept[RuntimeException] {
      ImageHash.incrementalNearDupPairs(
        Seq((3, 1L)).toDF("id", "dhash"), foreign, maxHamming = 3)
    }
  }

  test("persisted index: the candidate join reads a genuinely bucketed index side") {
    val dir = tmpDir("dhash-idx-plan")
    ImageHash.saveDhashIndex(
      (0 until 16).map(i => (i, i.toLong)).toDF("id", "dhash"), dir)
    // materialize=none keeps the plan lazy so the join shape is
    // assertable (the BasketsSpec plan-gating discipline)
    spark.conf.set("spark.graft.dedup.materialize", "none")
    try {
      val plan = ImageHash.incrementalNearDupPairs(
          Seq((100, 3L)).toDF("id", "dhash"), dir, maxHamming = 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
    } finally spark.conf.set("spark.graft.dedup.materialize", "local")
  }

  test("video fixtures: per-frame dHashes equal the single-image closed forms") {
    val dir = MediaFixture.ensureDhash()
    (0 until MediaFixture.DhashVidN).foreach { i =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"dhv_$i.gif"))
      val got = Multimodal.Decoders.gifFrameImages(bytes).map(ImageHash.dHashImage)
      val want = MediaFixture.dhashVidFrames(i).map(MediaFixture.dhashExpected)
      assert(got == want, s"video $i: $got != $want")
    }
  }

  test("videoNearDupPairs: aligned matches pair, reordered and flat videos do not") {
    // frame table straight from the fixture derivation (no decode —
    // decode equivalence is the previous test)
    val frames = (0 until MediaFixture.DhashVidN).flatMap { i =>
      MediaFixture.dhashVidFrames(i).zipWithIndex.map { case (p, f) =>
        (i, f, MediaFixture.dhashExpected(p))
      }
    }.toDF("id", "frame_idx", "dhash")
    val got = ImageHash.videoNearDupPairs(frames, maxHamming = 3,
      minMatchNum = 2, minMatchDen = 3).as[(Int, Int, Long)].collect().toSeq
    assert(got == Seq((0, 1, 3L), (0, 2, 3L), (1, 2, 3L)))
    // at 1/3 the single-aligned-match videos (3,4) come in — the
    // fraction gate, not the blocking, is what excludes them above
    val loose = ImageHash.videoNearDupPairs(frames, maxHamming = 3,
      minMatchNum = 1, minMatchDen = 3).as[(Int, Int, Long)].collect().toSeq
    assert(loose.map(p => (p._1, p._2)).contains((3, 4)),
      s"stripes frame 0 aligns between vids 3 and 4: $loose")
    assert(!loose.map(p => (p._1, p._2)).contains((0, 3)),
      "reordered scenes never align, at any fraction")
  }

  private def fixtureFrames = (0 until MediaFixture.DhashVidN).flatMap { i =>
    MediaFixture.dhashVidFrames(i).zipWithIndex.map { case (p, f) =>
      (i, f, MediaFixture.dhashExpected(p))
    }
  }.toDF("id", "frame_idx", "dhash")

  test("videoNearDupPairsOffset: trim and rotation pair at their shift, a shuffle never") {
    val got = ImageHash.videoNearDupPairsOffset(fixtureFrames, maxHamming = 3,
        minMatchNum = 2, minMatchDen = 3, maxShift = 1)
      .as[(Int, Int, Long, Int)].collect().toSeq
    // derivation in the MediaFixture dhash-video comment: the aligned
    // trio at shift 0; the ROTATION (vid 3) = a 2-frame overlap at
    // shift -1; the TRIMMED-INTRO copy (vid 5) at shift +1; the
    // SHUFFLE (vid 6) and flat video (vid 4) at <= 1 match at every
    // shift - never pair
    assert(got == Seq(
      (0, 1, 3L, 0), (0, 2, 3L, 0), (0, 3, 2L, -1), (0, 5, 2L, 1),
      (1, 2, 3L, 0), (1, 3, 2L, -1), (1, 5, 2L, 1),
      (2, 3, 2L, -1), (2, 5, 2L, 1)))
    assert(!got.exists(p => p._2 == 6 || p._1 == 6), "a shuffled cut never pairs")
  }

  test("videoNearDupPairsOffset at maxShift=0 equals the aligned operator") {
    val aligned = ImageHash.videoNearDupPairs(fixtureFrames, maxHamming = 3,
      minMatchNum = 2, minMatchDen = 3).as[(Int, Int, Long)].collect().toSeq
    val offset0 = ImageHash.videoNearDupPairsOffset(fixtureFrames, maxHamming = 3,
        minMatchNum = 2, minMatchDen = 3, maxShift = 0)
      .as[(Int, Int, Long, Int)].collect().toSeq
    assert(offset0.map(p => (p._1, p._2, p._3)) == aligned)
    assert(offset0.forall(_._4 == 0))
  }

  test("videoNearDupPairsOffset: guards and per-position flood cap are loud") {
    intercept[IllegalArgumentException](
      ImageHash.videoNearDupPairsOffset(fixtureFrames, 3, 2, 3, maxShift = -1))
    intercept[IllegalArgumentException](
      ImageHash.videoNearDupPairsOffset(fixtureFrames, 3, 3, 2, maxShift = 1))
    val flood = ((1 to 6).map(i => (i, 0, 0L)) :+ (7, 1, 0L))
      .toDF("id", "frame_idx", "dhash")
    val e = intercept[Exception] {
      ImageHash.videoNearDupPairsOffset(flood, 3, 1, 2, maxShift = 1,
        maxBandBucket = 5).count()
    }
    assert(e.getMessage.contains("frame position 0"), e.getMessage)
    assert(e.getMessage.contains("over maxBandBucket=5"), e.getMessage)
  }

  test("streaming video dedup replay equals the batch gate on any chunking") {
    val expected = ImageHash.videoNearDupPairs(fixtureFrames, maxHamming = 3,
        minMatchNum = 2, minMatchDen = 3)
      .as[(Int, Int, Long)].collect().toSeq
      .map { case (a, b, n) => (a.toLong, b.toLong, n) }
    assert(expected.nonEmpty)
    Seq(2, 3, 5).foreach { n =>
      val got = graft.streaming.StreamReplay.videoDedupReplay(
          spark, fixtureFrames, maxHamming = 3, minMatchNum = 2,
          minMatchDen = 3, nChunks = n)
        .as[(Long, Long, Long)].collect().toSeq
      assert(got == expected, s"nChunks=$n")
    }
  }

  test("plan: the offset sweep stays a banded equi-join (no cartesian, no NL join)") {
    // the ±shift replication must land in the join KEY (aligned pos),
    // never as a join condition a planner could only satisfy with a
    // nested-loop — the mm06 scale contract
    spark.conf.set("spark.graft.dedup.materialize", "none")
    try {
      val plan = ImageHash.videoNearDupPairsOffset(fixtureFrames, maxHamming = 3,
          minMatchNum = 2, minMatchDen = 3, maxShift = 1)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Join"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.conf.set("spark.graft.dedup.materialize", "local")
  }

  test("plan: the incremental offset sweep stays a banded equi-join too (au04/mm07)") {
    // same contract as the inline sweep: both role replications land in
    // the join KEY (bucket, aligned pos); the index side must join on
    // its bucket without a cartesian/NL fallback
    spark.conf.set("spark.graft.dedup.materialize", "none")
    try {
      val dir = tmpDir("imghash-fidx-plan")
      ImageHash.saveFrameIndex(
        fixtureFrames.filter(org.apache.spark.sql.functions.col("id") <= 2), dir)
      val plan = ImageHash.incrementalNearDupPairsOffset(
          fixtureFrames.filter(org.apache.spark.sql.functions.col("id") > 2), dir,
          maxHamming = 3, minMatchNum = 2, minMatchDen = 3, maxShift = 1)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Join"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.conf.set("spark.graft.dedup.materialize", "local")
  }

  test("videoNearDupPairs: fraction uses the LONGER video; misuse is loud") {
    // a 2-frame prefix copy of a 4-frame video: 2 matches = 2/4 of the
    // longer — at 1/2 it pairs, at 2/3 it must not (truncation is not
    // a re-encode)
    val frames = (Seq((1, 0, 0L), (1, 1, -1L), (1, 2, 0x0FL), (1, 3, 0xF0L)) ++
      Seq((2, 0, 0L), (2, 1, -1L))).toDF("id", "frame_idx", "dhash")
    def run(num: Int, den: Int) =
      ImageHash.videoNearDupPairs(frames, 3, num, den).count()
    assert(run(1, 2) == 1 && run(2, 3) == 0)
    intercept[IllegalArgumentException](run(3, 2))
    intercept[IllegalArgumentException](run(0, 3))
    intercept[IllegalArgumentException](
      ImageHash.videoNearDupPairs(frames, 4, 1, 2, nBands = 4))
  }

  test("videoNearDupPairs: flat-frame flood guard fires per frame position") {
    val flood = ((1 to 6).map(i => (i, 0, 0L)) :+ (7, 1, 0L))
      .toDF("id", "frame_idx", "dhash")
    val e = intercept[Exception] {
      ImageHash.videoNearDupPairs(flood, 3, 1, 2, maxBandBucket = 5).count()
    }
    assert(e.getMessage.contains("frame position 0"), e.getMessage)
    assert(e.getMessage.contains("over maxBandBucket=5"), e.getMessage)
  }

  test("streaming dedup replay converges to the batch answer on any chunking") {
    val bases = Seq(0L, -1L, 0x5555555555555555L, 0x123456789abcdefL)
    val hs = bases.zipWithIndex.flatMap { case (h, i) =>
      Seq((i * 10, h), (i * 10 + 1, h ^ (1L << 2)),
        (i * 10 + 2, h ^ (1L << 2) ^ (1L << 20)),
        (i * 10 + 3, h ^ (1L << 2) ^ (1L << 20) ^ (1L << 40)))
    }
    val expected = brute(hs, 3).map { case (a, b, d) => (a.toLong, b.toLong, d) }
    Seq(2, 3, 5).foreach { n =>
      val got = graft.streaming.StreamReplay.imageDedupReplay(
          spark, hs.toDF("id", "dhash"), maxHamming = 3, nChunks = n)
        .as[(Long, Long, Int)].collect().toSeq
      assert(got == expected, s"nChunks=$n")
    }
  }

  test("undecodable items fail the distributed hash task (not fabricated)") {
    val junk = Seq(MediaItem(9L, "image/png", Array[Byte](0, 1), Map.empty)).toDS()
    intercept[org.apache.spark.SparkException] {
      ImageHash.hashImages(junk).collect()
    }
  }
}
