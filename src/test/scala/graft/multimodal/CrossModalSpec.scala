package graft.multimodal

import graft.SparkSpec

class CrossModalSpec extends SparkSpec {
  import spark.implicits._

  // texts engineered against the languageId/qualityScore closed forms:
  // 30 tokens, 1/30 'the' (>= 0.02 -> 'de'), quality = min(1, 30/100) *
  // (1 - 1/30) = 0.29 -> fails 0.5... so use 60 tokens of which 2 'the':
  // quality = 0.6 * (1 - 2/60) = 0.58 >= 0.5, lang 'de' (2/60 = 0.033)
  private def deText(seed: String) =
    (Seq("the", "the") ++ (1 to 58).map(i => s"w$seed$i")).mkString(" ")

  test("survivors: each modality through its own dedup + gates, one manifest") {
    val docs = Seq(
      (1L, deText("a")),          // survives (de, quality 0.58, 60 tokens)
      (2L, deText("a")),          // exact dup of 1 -> drops
      (3L, deText("b")),          // survives
      (4L, "short text only"),    // fails token floor
      (5L, (1 to 60).map(i => s"x$i").mkString(" ")) // no stopwords -> 'zh' -> drops
    ).toDF("doc_id", "text")
    val images = Seq(
      // clique {0,1}: hamming 1 -> keep 0; {2}: far, keeps; 3 fails px
      (0, 0x0F0FL, 30, 30),
      (1, 0x0F0EL, 30, 30),
      (2, -1L, 30, 30),
      (3, 0x0F0FL, 10, 10) // 100 px < 256: gated BEFORE the pair join
    ).toDF("id", "dhash", "width", "height")
    val got = CrossModal.curate(docs, images, langs = Seq("en", "de", "fr"),
        minQuality = 0.5, minTokens = 20L, minPixels = 256, maxHamming = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("image", 0L), ("image", 2L), ("text", 1L), ("text", 3L)))
  }

  test("gate order: sub-floor image floods never reach the banded join") {
    // 10 identical-hash images, all under the pixel floor, with a
    // band-bucket cap of 5: if the quality gate ran AFTER banding the
    // width guard would fire — it must not, because gate-first is the
    // pipeline's scale contract (cheap filters shrink the quadratic
    // stage)
    val docs = Seq((1L, deText("a"))).toDF("doc_id", "text")
    val flood = ((1 to 10).map(i => (i, 0L, 10, 10)) :+ ((99, -1L, 30, 30)))
      .toDF("id", "dhash", "width", "height")
    val got = CrossModal.curate(docs, flood, langs = Seq("de"),
        minQuality = 0.5, minTokens = 20L, minPixels = 256, maxHamming = 3,
        maxBandBucket = 5)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("image", 99L), ("text", 1L)))
  }

  test("three modalities: audio goes through the silence gate then near-dup dedup") {
    val docs = Seq((1L, deText("a"))).toDF("doc_id", "text")
    val images = Seq((0, 0x0FL, 30, 30)).toDF("id", "dhash", "width", "height")
    val audio = Seq(
      (0, 0x33L, 0.25),  // clique {0,1}: keep 0
      (1, 0x32L, 0.25),
      (2, -1L, 0.30),    // far: keeps
      (3, 0L, 0.0)       // silence: gated BEFORE the pair join
    ).toDF("id", "afp", "rms")
    val got = CrossModal.curate(docs, images, audio, langs = Seq("de"),
        minQuality = 0.5, minTokens = 20L, minPixels = 256, minRms = 0.01,
        imageMaxHamming = 3, audioMaxHamming = 5,
        imageNBands = 4, audioNBands = 8, maxBandBucket = 1000000)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("audio", 0L), ("audio", 2L), ("image", 0L), ("text", 1L)))
    // gate order: a silent flood under a tiny band cap never reaches
    // the banded join (silence all hashes 0L — one bucket)
    val flood = ((1 to 10).map(i => (i, 0L, 0.0)) :+ ((99, -1L, 0.5)))
      .toDF("id", "afp", "rms")
    val gated = CrossModal.curate(docs, images, flood, Seq("de"), 0.5, 20L,
        minPixels = 256, minRms = 0.01, imageMaxHamming = 3,
        audioMaxHamming = 5, imageNBands = 4, audioNBands = 8,
        maxBandBucket = 5)
      .as[(String, Long)].collect().toSeq
    assert(gated == Seq(("audio", 99L), ("image", 0L), ("text", 1L)))
  }

  test("plan: both modality branches stay hash-partitioned (no cartesian)") {
    val docs = Seq((1L, deText("a"))).toDF("doc_id", "text")
    val images = Seq((0, 0x0FL, 30, 30), (1, -1L, 30, 30))
      .toDF("id", "dhash", "width", "height")
    spark.conf.set("spark.graft.dedup.materialize", "none")
    try {
      val plan = CrossModal.curate(docs, images, Seq("de"), 0.5, 20L,
          minPixels = 256, maxHamming = 3)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    } finally spark.conf.set("spark.graft.dedup.materialize", "local")
  }

  test("guards: pixel floor validated") {
    val docs = Seq((1L, "t")).toDF("doc_id", "text")
    val images = Seq((0, 0L, 1, 1)).toDF("id", "dhash", "width", "height")
    intercept[IllegalArgumentException](
      CrossModal.curate(docs, images, Seq("en"), 0.5, 20L,
        minPixels = 0, maxHamming = 3))
  }
}
