package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The nightly append + compaction lifecycle of the BAND-index family
  * (r19 directives #1/#2): minhash text bands (TextDedup), clip-level
  * dHash bands (ImageHash/AudioHash), and position-level frame/segment
  * bands (the offset-sweep tier). The contract under test, per family:
  * day-2 batches dedup against day-1 SURVIVORS after an append (no
  * rebuild), history pairs never re-emit, compaction collapses the
  * per-night small files while answers stay row-identical, and stale
  * trees (data changed without the meta re-bless) refuse both append
  * and compaction loudly.
  */
class BandIndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def dataFileCount(dir: String): Int =
    MetaIO.listDataFiles(dir).size

  /** Corrupt an index tree the way an interrupted append does: a data
    * file the meta's fingerprint has never blessed. */
  private def plantRogueFile(dir: String): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir.stripPrefix("file:"), "rogue.parquet"),
      "not really parquet".getBytes("UTF-8"))

  // ---- text (minhash) band index -----------------------------------

  test("text band index: day-2 dedups against appended day-1 survivors; compaction is invisible") {
    val docs = tables.documents.select("doc_id", "text")
    val day0 = docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 10 =!= 5)
    val day1 = docs.filter(col("doc_id") % 10 === 5)
    val day2 = docs.filter(col("doc_id") % 10 === 0)
    // run through an EXPLICIT file:-scheme Hadoop path — the MetaIO
    // contract (r19 directive #3): sidecars, witness, append, and
    // compaction must behave identically on a scheme-qualified URI
    val idx = s"file:${tmpDir("bandidx-life")}/idx"

    TextDedup.saveBandIndex(day0, idx)
    TextDedup.appendToBandIndex(day1, idx)

    val got = TextDedup.incrementalCandidatePairs(day2, idx)
      .orderBy("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    val all = TextDedup.lshCandidatePairs(
        TextDedup.minhashSignatures(TextDedup.shingleSet(docs)))
      .as[(Long, Long)].collect().toSeq
    val want = all.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0).sorted
    assert(want.nonEmpty, "expected candidates involving day-2 in testdata")
    assert(got == want,
      "appended index must answer exactly like an index built over day-0 + day-1")
    // history (day-0 x day-1) pairs do NOT re-emit from the day-2 query
    assert(got.forall(p => p._1 % 10 == 0 || p._2 % 10 == 0))

    // day-1's band rows landed as extra per-append files; compaction
    // collapses them and the day-2 answer is row-identical
    val before = dataFileCount(idx)
    val stats = TextDedup.compactBandIndex(spark, idx)
    assert(stats.compacted && stats.filesAfter < stats.filesBefore,
      s"expected a real compaction, got $stats")
    assert(dataFileCount(idx) < before)
    val after = TextDedup.incrementalCandidatePairs(day2, idx)
      .orderBy("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(after == got, "compaction is layout maintenance — rows must not change")

    // the appended + compacted index still joins exchange-free on its
    // bucket key (the DedupSpec warehouse gate, re-proven on the
    // MAINTAINED layout: append must write real bucket ids and the
    // rewrite must preserve them)
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqeBcast = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val idxDf = TextDedup.loadBandIndex(spark, idx)
      val nb = TextDedup.bandRows(TextDedup.minhashSignaturesNoShuffle(day2))
        .withColumn("bucket", concat_ws("#", col("band_id"), col("band_key")))
      val joined = idxDf.select(col("doc_id").as("doc_o"), col("bucket"))
        .join(nb.select(col("doc_id").as("doc_n"), col("bucket")), Seq("bucket"))
      joined.collect()
      val plan = graft.PlanSig.finalPlanText(joined)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1 && plan.contains("Bucketed: true"),
        s"maintained index must read pre-bucketed (got $exchanges exchanges):\n${plan.take(1500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      prevAqeBcast match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("text band index: stale tree refuses append and compaction; v1 sidecar refuses with the upgrade message") {
    val docs = tables.documents.select("doc_id", "text").limit(50)
    val idx = tmpDir("bandidx-stale") + "/idx"
    TextDedup.saveBandIndex(docs, idx)
    plantRogueFile(idx)
    val e1 = intercept[IllegalArgumentException](
      TextDedup.appendToBandIndex(docs.limit(5), idx))
    assert(e1.getMessage.contains("stale index"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      TextDedup.compactBandIndex(spark, idx))
    assert(e2.getMessage.contains("stale index"), e2.getMessage)

    // a v1 sidecar (pre-formatVersion) gets the named upgrade hint, not
    // a silent mis-read
    val idx2 = tmpDir("bandidx-v1") + "/idx"
    TextDedup.saveBandIndex(docs, idx2)
    val props = Layout.pathTableProps(idx2).get - "formatVersion" - "dataFp"
    Layout.rewritePathTableProps(idx2, props -- Set("schemaDdl", "bucketCol", "nBuckets"))
    val e3 = intercept[Exception](TextDedup.readBandIndexMeta(idx2))
    assert(e3.getMessage.contains("predates versioned index metas"), e3.getMessage)
  }

  // ---- clip-level dHash band index ----------------------------------

  private val B = 0x5A5A5A5A5A5A5A5AL
  private val C = 0x0123456789ABCDEFL

  test("dhash index: append then incremental equals the full join involving the batch") {
    // day0: 0=B, 1=B^bit0 (ham 1), 3=C; day1: 2=B^bits(0,1) (ham 2),
    // 4=C^bit7; day2: 5=B^bit2 (pairs with 0,1,2 — 2 only via day1's
    // APPENDED rows), 6 = far
    val day0 = Seq((0L, B), (1L, B ^ 1L), (3L, C)).toDF("id", "dhash")
    val day1 = Seq((2L, B ^ 3L), (4L, C ^ 128L)).toDF("id", "dhash")
    val day2 = Seq((5L, B ^ 4L), (6L, 0x00FF00FF00FF00FFL)).toDF("id", "dhash")
    val all = day0.unionAll(day1).unionAll(day2)
    val idx = tmpDir("dhashidx-life") + "/idx"

    graft.multimodal.ImageHash.saveDhashIndex(day0, idx, nBuckets = 2)
    graft.multimodal.ImageHash.appendToDhashIndex(day1, idx)

    val got = graft.multimodal.ImageHash
      .incrementalNearDupPairs(day2, idx, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSeq
    val want = graft.multimodal.ImageHash.nearDupPairs(all, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSeq
      .filter(p => p._1 >= 5 || p._2 >= 5)
    assert(want.exists(p => p._1 == 2L && p._2 == 5L),
      "fixture must force a (day-1 x day-2) pair through the appended rows")
    assert(got == want)

    val stats = graft.multimodal.ImageHash.compactDhashIndex(spark, idx)
    assert(stats.compacted && stats.filesAfter < stats.filesBefore, s"$stats")
    val after = graft.multimodal.ImageHash
      .incrementalNearDupPairs(day2, idx, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(after == got)

    plantRogueFile(idx)
    val e = intercept[IllegalArgumentException](
      graft.multimodal.ImageHash.appendToDhashIndex(day2, idx))
    assert(e.getMessage.contains("stale index"), e.getMessage)
  }

  // ---- position-level frame/segment index (counts must merge) -------

  private def clip(id: Long, hashes: Seq[Long]): DataFrame =
    hashes.zipWithIndex.map { case (h, i) => (id, i, h) }
      .toDF("id", "frame_idx", "dhash")

  test("frame index: appended day-1 clip pairs with day-2 via the offset sweep; counts merge") {
    // day0: clip 0 = [h0 h1 h2 h3 h4]; clip 1 = far noise
    // day1: clip 2 = clip 0 trimmed by one frame (pairs with 0 at shift 1)
    // day2: clip 3 = clip 2's frames verbatim (pairs with BOTH 0 and 2;
    //        the (2,3) pair needs day-1's bands AND counts in the index)
    val h = (0 until 5).map(i => B ^ (0xFFL << (8 * i)))
    val far = (0 until 5).map(i => C ^ (1L << i))
    val day0 = clip(0, h).unionAll(clip(1, far))
    val day1 = clip(2, h.drop(1))
    val day2 = clip(3, h.drop(1))
    val all = day0.unionAll(day1).unionAll(day2)
    val idx = tmpDir("frameidx-life") + "/idx"

    graft.multimodal.ImageHash.saveFrameIndex(day0, idx, nBuckets = 2)
    graft.multimodal.ImageHash.appendToFrameIndex(day1, idx)

    def q(newFrames: DataFrame) = graft.multimodal.ImageHash
      .incrementalNearDupPairsOffset(newFrames, idx, maxHamming = 0,
        minMatchNum = 3, minMatchDen = 4, maxShift = 2)
      .as[(Long, Long, Long, Int)].collect().toSeq
    val got = q(day2)
    val want = graft.multimodal.ImageHash
      .videoNearDupPairsOffset(all, maxHamming = 0, minMatchNum = 3,
        minMatchDen = 4, maxShift = 2)
      .as[(Long, Long, Long, Int)].collect().toSeq
      .filter(p => p._1 == 3L || p._2 == 3L)
    assert(want.map(p => (p._1, p._2)).toSet == Set((0L, 3L), (2L, 3L)),
      s"fixture must force day-2 pairs against BOTH index generations, got $want")
    assert(got == want)

    // counts/ merged: the index reports day-0 AND day-1 clip lengths
    val (_, counts, _) = graft.multimodal.ImageHash.loadFrameIndex(spark, idx)
    val byId = counts.as[(Long, Long)].collect().toMap
    assert(byId == Map(0L -> 5L, 1L -> 5L, 2L -> 4L))

    val stats = graft.multimodal.ImageHash.compactFrameIndex(spark, idx)
    assert(stats.exists(_.compacted), s"expected some table to compact, got $stats")
    assert(q(day2) == got, "compaction must not change the sweep's rows")

    plantRogueFile(idx)
    val e = intercept[IllegalArgumentException](
      graft.multimodal.ImageHash.appendToFrameIndex(day2, idx))
    assert(e.getMessage.contains("stale index"), e.getMessage)
  }

  test("audio segment index delegates carry the same lifecycle") {
    // minimal smoke over the AudioHash delegation (machinery is
    // ImageHash verbatim — this pins the rename plumbing)
    val day0 = clip(0, (0 until 4).map(i => B ^ (0xFL << (4 * i))))
      .withColumnRenamed("frame_idx", "seg_idx").withColumnRenamed("dhash", "afp")
    val day1 = clip(7, (0 until 4).map(i => B ^ (0xFL << (4 * i))))
      .withColumnRenamed("frame_idx", "seg_idx").withColumnRenamed("dhash", "afp")
    val idx = tmpDir("segidx-life") + "/idx"
    graft.multimodal.AudioHash.saveSegmentIndex(day0, idx, nBuckets = 2)
    graft.multimodal.AudioHash.appendToSegmentIndex(day1, idx)
    val got = graft.multimodal.AudioHash.incrementalNearDupPairsOffset(
        clip(9, (0 until 4).map(i => B ^ (0xFL << (4 * i))))
          .withColumnRenamed("frame_idx", "seg_idx").withColumnRenamed("dhash", "afp"),
        idx, maxHamming = 0, minMatchNum = 1, minMatchDen = 1, maxShift = 1)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got.map(p => (p._1, p._2)) == Seq((0L, 9L), (7L, 9L)),
      s"day-2 must pair with both the built and the appended clip, got $got")
    val stats = graft.multimodal.AudioHash.compactSegmentIndex(spark, idx)
    assert(stats.nonEmpty)
  }
}
