package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = tables.documents

  test("minhash-LSH pairs match exact jaccard pairs on testdata") {
    // At threshold 0.8 the planted near-dups are far above the LSH
    // detection band, so candidate recall is total and the verified
    // outputs must be identical.
    val lsh = TextDedup.minhashDedupPairs(docs, threshold = 0.8).collect().toSeq
    val exact = TextDedup.exactJaccardPairs(docs, threshold = 0.8).collect().toSeq
    assert(lsh.nonEmpty, "expected planted near-dup pairs in testdata")
    assert(lsh == exact)
  }

  test("incremental candidates vs a saved band index equal the batch pairs involving new docs") {
    import org.apache.spark.sql.functions.col
    val old = docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val fresh = docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    val idx = tmpDir("bandidx")
    TextDedup.saveBandIndex(old, idx)
    val got = TextDedup.incrementalCandidatePairs(fresh, idx)
      .orderBy("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    val all = TextDedup.lshCandidatePairs(
        TextDedup.minhashSignatures(TextDedup.shingleSet(docs.select("doc_id", "text"))))
      .distinct().as[(Long, Long)].collect().toSeq
    val want = all.filter(p => p._1 % 10 == 0 || p._2 % 10 == 0).sorted
    assert(want.nonEmpty, "expected candidates involving the new slice in testdata")
    assert(got == want)
    // never an (indexed x indexed) pair — those were found at index build
    assert(got.forall(p => p._1 % 10 == 0 || p._2 % 10 == 0))
  }

  test("shingle-less docs never band: no spurious \"\" bucket on the no-shuffle path") {
    import org.apache.spark.sql.functions.col
    // two <3-word docs would share an all-NULL signature row; concat_ws
    // would collapse them into one "" bucket → 4 spurious candidate
    // pairs, diverging from the grouped path and the oracle (both drop
    // them at the shingle explode)
    val docs = Seq((1L, "hi there"), (2L, "ok bye"),
      (3L, "alpha beta gamma delta"), (4L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val bands = TextDedup.bandRows(TextDedup.minhashSignaturesNoShuffle(docs))
    assert(bands.filter(col("doc_id").isin(1L, 2L)).count() == 0,
      "short docs must be dropped, not banded into a shared empty key")
    val idx = tmpDir("bandidx-short")
    TextDedup.saveBandIndex(docs.filter(col("doc_id") <= 2), idx)
    val got = TextDedup.incrementalCandidatePairs(docs.filter(col("doc_id") >= 3), idx)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((3L, 4L)), s"only the real near-dup pair may survive, got $got")
  }

  test("bucketed band index joins with zero Exchange on the index side") {
    import org.apache.spark.sql.functions.col
    // The saveBandIndex scaladoc's warehouse-scale claim, proven ON THE
    // ENTRY PATH (VERDICT r13 #3): saveBandIndex now writes the
    // bucketed composite-key layout itself, and incrementalCandidatePairs
    // consumes it — so the production form IS the dd11 form. The index
    // is bucketed by ONE composite key (bucket = band_id '#' band_key:
    // co-partitioning requires the bucket keys to BE the join keys; a
    // band_key-only bucketing cannot pair with a two-column join —
    // EnsureRequirements reshuffles both sides), so only the (small)
    // new-batch side exchanges. The recurring nightly join cost is then
    // the new batch alone, whatever the index size.
    val old = docs.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text")
    val fresh = docs.filter(col("doc_id") % 10 === 0).select("doc_id", "text")
    val idxPath = tmpDir("bandidx-bucketed")
    TextDedup.saveBandIndex(old, idxPath)
    // fingerprint parameters persist WITH the index (ADVICE r13): the
    // read path derives banding from this record, never from callers
    assert(TextDedup.readBandIndexMeta(idxPath) ==
      TextDedup.BandIndexMeta(numHashes = 16, rowsPerBand = 4, nBuckets = 8))
    // At this tiny SF the planner would broadcast the new side and skip
    // bucketed reading entirely ("disabled by query planner") — the
    // warehouse regime being proven is the SHUFFLE join, so pin it.
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // getOption: the adaptive threshold is usually UNSET (falls back to
    // the main threshold) — restoring it as a pinned value would leak a
    // 10MB override into the shared session and break other suites'
    // withSQLConf(-1) plan assertions order-dependently
    val prevAqeBcast = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      // (1) the isolated old-new probe — the join incrementalCandidatePairs
      // runs against the index — has exactly ONE hash exchange: the new
      // side aligning to the index's buckets; the index side reads
      // pre-partitioned.
      val idx = TextDedup.loadBandIndex(spark, idxPath)
      val nb = TextDedup.bandRows(TextDedup.minhashSignaturesNoShuffle(fresh))
        .withColumn("bucket", concat_ws("#", col("band_id"), col("band_key")))
      val joined = idx.select(col("doc_id").as("doc_o"), col("bucket"))
        .join(nb.select(col("doc_id").as("doc_n"), col("bucket")), Seq("bucket"))
      joined.collect() // finalize AQE
      val plan = graft.PlanSig.finalPlanText(joined)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"index side must read pre-bucketed (1 exchange = new side only), got $exchanges:\n${plan.take(1500)}")
      assert(plan.contains("Bucketed: true"),
        s"join must consume the bucketed layout:\n${plan.take(1500)}")
      // and the join result equals the unbucketed old-new candidates
      val viaIdx = joined.filter(col("doc_o") =!= col("doc_n"))
        .selectExpr("least(doc_o, doc_n) AS a", "greatest(doc_o, doc_n) AS b")
        .distinct().as[(Long, Long)].collect().toSet
      val all = TextDedup.lshCandidatePairs(
          TextDedup.minhashSignatures(TextDedup.shingleSet(docs.select("doc_id", "text"))))
        .as[(Long, Long)].collect().toSet
      val wantOldNew = all.filter(p => (p._1 % 10 == 0) != (p._2 % 10 == 0))
      assert(viaIdx == wantOldNew)
      // (2) the full dd11 entry operator consumes the SAME bucketed
      // scan (the new-new half and the distinct add their own shuffles;
      // the index side stays exchange-free by (1)). The default eager
      // mode checkpoints the result (its returned plan is an RDD scan),
      // so the whole-pipeline plan is inspected in lazy mode.
      spark.conf.set(TextDedup.MaterializeConf, "none")
      val entry = try TextDedup.incrementalCandidatePairs(fresh, idxPath)
        finally spark.conf.unset(TextDedup.MaterializeConf)
      entry.collect()
      val entryPlan = graft.PlanSig.finalPlanText(entry)
      assert(entryPlan.contains("Bucketed: true"),
        s"entry path must consume the bucketed index:\n${entryPlan.take(1500)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      prevAqeBcast match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }

  test("a band index without metadata is rejected loudly") {
    // ADVICE r13: a parameter mismatch used to produce silent zero
    // old-new collisions; now the read path requires the persisted
    // metadata and derives banding from it.
    val bogus = tmpDir("bandidx-bogus")
    docs.select("doc_id").write.mode("overwrite").parquet(bogus)
    val e = intercept[IllegalArgumentException] {
      TextDedup.incrementalCandidatePairs(docs.select("doc_id", "text"), bogus)
    }
    assert(e.getMessage.contains("not a graft band index"))
  }

  test("materialize=none returns identical results from a fully lazy plan") {
    // Lazy cluster mode must be value-identical to the default eager
    // mode — only the caching/checkpointing strategy differs.
    val eagerPairs = TextDedup.minhashDedupPairs(docs, threshold = 0.8).collect().toSeq
    val eagerFull = TextDedup.fullDedup(docs, threshold = 0.8)
      .orderBy("doc_id").collect().toSeq
    spark.conf.set(TextDedup.MaterializeConf, "none")
    try {
      val lazyDf = TextDedup.minhashDedupPairs(docs, threshold = 0.8)
      // the returned plan must not be a checkpoint scan: its optimized
      // plan still reaches the parquet source (pushdown-able)
      assert(lazyDf.queryExecution.optimizedPlan.collectLeaves()
        .exists(_.getClass.getSimpleName.contains("LogicalRelation")),
        "lazy mode must keep lineage to the source")
      assert(lazyDf.collect().toSeq == eagerPairs)
      assert(TextDedup.fullDedup(docs, threshold = 0.8)
        .orderBy("doc_id").collect().toSeq == eagerFull)
    } finally spark.conf.unset(TextDedup.MaterializeConf)
    intercept[IllegalArgumentException] {
      spark.conf.set(TextDedup.MaterializeConf, "bogus")
      try TextDedup.minhashDedupPairs(docs) finally spark.conf.unset(TextDedup.MaterializeConf)
    }
  }

  test("withWorkingSet honors materialize=none for query-layer compositions (dd06)") {
    def dd06Shape() = TextDedup.withWorkingSet(
      TextDedup.simhashFingerprints(TextDedup.shingleSet(docs))) { fps =>
      TextDedup.simhashNearDupPairs(fps, maxDist = 3)
    }
    spark.conf.set(TextDedup.MaterializeConf, "none")
    try {
      val lazyDf = dd06Shape()
      val leaves = lazyDf.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.exists(_.getClass.getSimpleName.contains("LogicalRelation")),
        "none mode must keep lineage to the parquet source")
      assert(!leaves.exists(_.getClass.getSimpleName.contains("LogicalRDD")),
        "none mode must not checkpoint/localCheckpoint the result")
    } finally spark.conf.unset(TextDedup.MaterializeConf)
    // Default (eager) mode: the same composition IS materialized — the
    // returned plan is a checkpoint scan, not live lineage.
    assert(dd06Shape().queryExecution.analyzed.collectLeaves()
      .exists(_.getClass.getSimpleName.contains("LogicalRDD")),
      "eager mode must return a materialized result")
  }

  test("paragraph dedup keeps first global occurrence and reassembles in order") {
    val d = Seq(
      (1L, "A\n\nB\n\nC"),   // first occurrences of A, B, C
      (2L, "B\n\nD"),        // B duplicated -> only D survives
      (3L, "A\n\nA"),        // both copies lose to (1,0) -> doc dropped
      (4L, "E\n\nE"),        // first copy survives, within-doc dup removed
      (5L, "C\n\nF\n\nB"))   // C and B lose, F survives
      .toDF("doc_id", "text")
    val got = TextDedup.paragraphDedup(d).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "A\n\nB\n\nC"),
      (2L, "D"),
      (4L, "E"),
      (5L, "F")))
  }

  test("paragraph dedup never pairs documents — the plan is group/join on the paragraph") {
    // one shuffle keyed on para + semi-join back: no cartesian/BNLJ
    val d = Seq((1L, "x\n\ny"), (2L, "y\n\nz")).toDF("doc_id", "text")
    val plan = TextDedup.paragraphDedup(d).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"paragraph dedup must stay an equi-join plan:\n${plan.take(600)}")
  }

  test("exact dedup collapses duplicated text") {
    val d = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val got = TextDedup.exactDedup(d).orderBy("keep_id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (3L, 1L)))
  }

  test("simhash: identical docs share fingerprints, distinct docs differ") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words appear in this other document here"))
      .toDF("doc_id", "text")
    val fps = TextDedup.simhashFingerprints(TextDedup.shingleSet(d))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("simhash near-dup pairs find hamming-0 duplicates via byte bands") {
    val d = Seq((1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words appear in this other document here"))
      .toDF("doc_id", "text")
    val fps = TextDedup.simhashFingerprints(TextDedup.shingleSet(d))
    val pairs = TextDedup.simhashNearDupPairs(fps, maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("shingles guard short documents") {
    val d = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    val sh = TextDedup.shingleSet(d).groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(!sh.contains(1L)) // < 3 tokens ⇒ no shingles
    assert(sh(2L) == 2L)     // 4 tokens ⇒ 2 trigrams
  }

  test("identical documents pair with jaccard exactly 1.0") {
    val d = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val pairs = TextDedup.exactJaccardPairs(d, threshold = 0.99)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 1.0)))
  }

  test("stop-shingle cap removes near-universal shingles only") {
    val d = Seq(
      (1L, "common base text alpha one"),
      (2L, "common base text beta two"),
      (3L, "common base text gamma three"))
      .toDF("doc_id", "text")
    val sh = TextDedup.shingleSet(d)
    val capped = TextDedup.dropStopShingles(sh, maxDocFraction = 0.67)
    import org.apache.spark.sql.functions._
    // "common base text" appears in all 3 docs (df=3 > cap=2) => gone
    assert(capped.filter(col("s") === "common base text").count() == 0)
    // doc-unique shingles survive
    assert(capped.filter(col("s") === "text alpha one").count() == 1)
  }

  test("cappedJaccardPairs: cap bounds the hottest join key yet keeps true near-dups") {
    // One near-universal boilerplate shingle ("the quick brown" opens
    // every doc) plus two planted duplicate pairs. The cap must (a)
    // drop the universal shingle so no surviving key exceeds
    // maxDocFraction * |docs| — the bounded-hottest-key property — and
    // (b) still report the planted pairs, with sizes measured on the
    // CAPPED sets (4 shared shingles survive of the raw 5).
    val n = 40
    val base = (0 until n)
      .map(i => (i.toLong, s"the quick brown unique$i tail$i words$i end$i"))
    val dupped = base ++ Seq((100L, base(0)._2), (101L, base(1)._2))
    val docs = dupped.toDF("doc_id", "text")
    val frac = 0.1
    val cap = math.max(1L, (docs.count() * frac).toLong)

    val capped = TextDedup.dropStopShingles(TextDedup.shingleSet(docs), frac)
    val maxDf = capped.groupBy("s").count().agg(max("count")).head().getLong(0)
    assert(maxDf <= cap, s"surviving hottest key df=$maxDf exceeds cap=$cap")

    val pairs = TextDedup.cappedJaccardPairs(docs, maxDocFraction = frac, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    // raw shingles per doc = 5 ("the quick brown" + 4 tail shingles);
    // the universal one is capped away => na = nb = 4, jaccard = 1.0
    assert(pairs == Seq((0L, 100L, 4L, 4L, 1.0), (1L, 101L, 4L, 4L, 1.0)),
      s"unexpected capped pairs: $pairs")
  }

  test("scale story: exact-jaccard self-join work is sum(df²); the stop-shingle cap bounds it") {
    // Corpus with one near-universal boilerplate shingle: every doc opens
    // with the same 3 words, then a unique tail. The exact-Jaccard
    // self-join's work on a shingle with document frequency df is
    // df·(df-1)/2 pairs — quadratic in df, the reason dd03 cannot be the
    // 100 TB path and dropStopShingles/LSH exist.
    def corpus(n: Int) = (0 until n)
      .map(i => (i.toLong, s"the quick brown unique$i tail$i words$i"))
      .toDF("doc_id", "text")
    def selfJoinPairs(docs: org.apache.spark.sql.DataFrame): Long = {
      val sh = TextDedup.shingleSet(docs)
      sh.select(col("doc_id").as("doc_a"), col("s"))
        .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
        .filter(col("doc_a") < col("doc_b")).count()
    }
    val p30 = selfJoinPairs(corpus(30))
    val p60 = selfJoinPairs(corpus(60))
    // only "the quick brown" is shared: exactly C(n,2) joined pairs
    assert(p30 == 30L * 29 / 2 && p60 == 60L * 59 / 2,
      s"expected C(n,2) hot-key pairs, got $p30/$p60")
    assert(p60.toDouble / p30 > 3.9, "work grows quadratically with df")

    // the cap removes the near-universal shingle => the join collapses
    val capped = TextDedup.dropStopShingles(TextDedup.shingleSet(corpus(60)), maxDocFraction = 0.1)
    val cappedPairs = capped.select(col("doc_id").as("doc_a"), col("s"))
      .join(capped.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .filter(col("doc_a") < col("doc_b")).count()
    assert(cappedPairs == 0L, "no shared shingles survive the df cap in this corpus")

    // and the LSH path never builds the quadratic candidate set at all:
    // banding admits only docs agreeing on a full band of signatures
    val lshCand = TextDedup.lshCandidatePairs(
      TextDedup.minhashSignatures(TextDedup.shingleSet(corpus(60)))).count()
    assert(lshCand < p60 / 10,
      s"LSH candidates ($lshCand) must be far below the exact join's $p60")
  }

  test("fullDedup collapses exact copies then removes near-dups") {
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val variant = (1 to 19).map(i => s"tok$i").mkString(" ") + " changed"
    val d = Seq(
      (10L, base),
      (11L, base),    // exact copy: collapsed by the exact pass
      (12L, variant), // jaccard ~0.9 near-dup of 10: LSH pass removes it
      (13L, "totally different content shares no words here at all"))
      .toDF("doc_id", "text")
    val kept = TextDedup.fullDedup(d, threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(10L, 13L), s"got $kept")
  }

  test("no-shuffle minhash signatures equal the grouped-aggregate form exactly") {
    val docs = tables.documents
    val grouped = TextDedup.minhashSignatures(TextDedup.shingleSet(docs))
    val noShuffle = TextDedup.minhashSignaturesNoShuffle(docs)
    assert(grouped.except(noShuffle).isEmpty && noShuffle.except(grouped).isEmpty,
      "both formulations must produce bit-identical signature matrices")
    // and the no-shuffle plan really has no exchange
    val plan = noShuffle.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n${plan.take(600)}")
  }

  test("no-shuffle simhash fingerprints equal the grouped-aggregate form exactly") {
    val docs = tables.documents
    val grouped = TextDedup.simhashFingerprints(TextDedup.shingleSet(docs))
    val noShuffle = TextDedup.simhashFingerprintsNoShuffle(docs)
    assert(grouped.except(noShuffle).isEmpty && noShuffle.except(grouped).isEmpty)
    assert(!noShuffle.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("connected components: min-id label propagation over pair chains") {
    // components: {1,2,3,4} (a chain), {7,9}, singletons absent from pairs
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L)).toDF("doc_a", "doc_b")
    val comp = TextDedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connected components: log-bounded rounds on a deep chain") {
    // A 64-vertex path has diameter 63 — min-label propagation needed 63
    // rounds on exactly this shape (the round-2 scale probe); the
    // large-star/small-star alternation must converge in O(log n):
    // ⌈log₂ 64⌉ = 6, +4 slack for the alternation constant.
    val chain = (1L to 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = TextDedup.connectedComponentsWithRounds(chain, maxIter = 15)
    val comp = labels.as[(Long, Long)].collect().toMap
    assert(comp.size == 64 && comp.values.forall(_ == 1L),
      s"single component rooted at 1 expected, got ${comp.values.toSet}")
    assert(rounds <= 10, s"expected ≤10 alternation rounds on a 63-diameter chain, took $rounds")
  }

  test("connected components: self-loop-only vertices keep their label") {
    // (5,5) is x's ONLY pair: the edge is degenerate but the vertex
    // appears in a pair, so the contract requires (5 -> 5) in the output.
    val pairs = Seq((1L, 2L), (5L, 5L)).toDF("doc_a", "doc_b")
    val comp = TextDedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
  }

  test("connected components: empty graph converges with maxIter = 1") {
    // The deferred-count sentinel used to force two rounds even on an
    // empty edge set; the 0-count short-circuit makes maxIter = 1 legal
    // for the trivially empty graph.
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val (labels, rounds) = TextDedup.connectedComponentsWithRounds(empty, maxIter = 1)
    assert(labels.isEmpty && rounds == 1)
  }

  test("connected components: self-loop-only input converges with maxIter = 1") {
    // Self-loops are dropped from the edge worklist, so the working
    // graph is empty — round 1 must detect that while the self-loop
    // vertex still labels itself through the raw-pairs arm.
    val pairs = Seq((5L, 5L)).toDF("doc_a", "doc_b")
    val (labels, rounds) = TextDedup.connectedComponentsWithRounds(pairs, maxIter = 1)
    assert(labels.as[(Long, Long)].collect().toMap == Map(5L -> 5L))
    assert(rounds == 1)
  }

  test("fullDedup keeps one representative per transitive near-dup chain") {
    // a~b and b~c verify, a~c does NOT (different ends of the chain):
    // pairwise higher-id drop would also remove c via b even though b is
    // itself dropped; components keep exactly one of {a,b,c}.
    // 30 tokens, two replaced per end: J(left,mid)=J(right,mid)=26/30≈0.87
    // (≥0.8, verifies) while J(left,right)=24/32=0.75 (<0.8, does not)
    val mid = (1 to 30).map(i => s"w$i").mkString(" ")
    val left = "x1 x2 " + (3 to 30).map(i => s"w$i").mkString(" ")
    val right = (1 to 28).map(i => s"w$i").mkString(" ") + " z1 z2"
    val d = Seq((1L, left), (2L, mid), (3L, right),
      (9L, "completely unrelated payload with its own words only"))
      .toDF("doc_id", "text")

    val pairs = TextDedup.minhashDedupPairs(d, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)) && !pairs.contains((1L, 3L)),
      s"chain precondition, got $pairs")

    val kept = TextDedup.fullDedup(d, threshold = 0.8)
    val keptIds = kept.select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds == Seq(1L, 9L), s"one survivor per component, got $keptIds")

    // property: no two retained docs verify above threshold
    val reverify = TextDedup.exactJaccardPairs(kept, threshold = 0.8)
    assert(reverify.isEmpty, "retained set must be mutually non-duplicate")
  }

  test("survivorsByQuality keeps the best copy, not the min id") {
    import org.apache.spark.sql.functions.col
    // component {1,2,3}: doc 3 has the highest score; singleton pair {8,9}
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (8L, 8L), (9L, 8L))
      .toDF("doc_id", "component")
    val scores = Seq((1L, 0.2), (2L, 0.5), (3L, 0.9), (8L, 0.4), (9L, 0.4))
      .toDF("doc_id", "quality")
    val got = TextDedup.survivorsByQuality(comp, scores)
      .orderBy("doc_id")
      .select("doc_id", "survivor_id")
      .as[(Long, Long)].collect().toSeq
    // component 1 → doc 3 (best quality); component 8 → doc 8 (tie → min id)
    assert(got == Seq((1L, 3L), (2L, 3L), (3L, 3L), (8L, 8L), (9L, 8L)), got.toString)
  }

  test("survivorsByQuality keeps unscored members as last-ranked candidates") {
    import org.apache.spark.sql.functions.col
    // doc 3 has no score row: it must stay in the output, lose to any
    // scored member, and still win a component where nobody is scored
    val comp = Seq((1L, 1L), (3L, 1L), (7L, 7L)).toDF("doc_id", "component")
    val scores = Seq((1L, 0.1)).toDF("doc_id", "quality")
    val got = TextDedup.survivorsByQuality(comp, scores)
      .orderBy("doc_id").select("doc_id", "survivor_id")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (3L, 1L), (7L, 7L)), got.toString)
  }

  test("survivorsByQuality over the real pipeline: one survivor per component, argmax") {
    val docs = tables.documents
    val comp = TextDedup.connectedComponents(
      TextDedup.exactJaccardPairs(docs, threshold = 0.8))
    val q = TextAnalysis.qualityScore(docs).select("doc_id", "quality")
    val got = TextDedup.survivorsByQuality(comp, q)
    val rows = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // survivor is a member of its own component and consistent per component
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (c, ms) =>
      assert(ms.map(_._3).distinct.length == 1, s"component $c has conflicting survivors")
      assert(ms.exists(m => m._1 == m._3), s"survivor of $c is not a member")
    }
    // argmax property against an independent computation
    val qual = q.as[(Long, Double)].collect().toMap
    byComp.foreach { case (c, ms) =>
      val best = ms.map(_._1).minBy(id => (-qual(id), id))
      assert(ms.head._3 == best, s"component $c survivor ${ms.head._3} != argmax $best")
    }
  }

  test("duplicatedSpanStats counts overlapping shared windows by hand") {
    // n=3 windows; docs 1 and 2 share the 4-token run "a b c d"
    // → 2 shared 3-windows each ("a b c", "b c d"); doc 1 has 3
    // windows total ("c d x" unique), doc 2 exactly 2; doc 3 disjoint;
    // doc 4 too short for any window.
    val docs = Seq(
      (1L, "a b c d x"),
      (2L, "a b c d"),
      (3L, "p q r s"),
      (4L, "t u")).toDF("doc_id", "text")
    val got = TextDedup.duplicatedSpanStats(docs, n = 3)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 2L, Some(0.666667))))
    assert(got(2L) == ((2L, 2L, Some(1.0))))
    assert(got(3L) == ((2L, 0L, Some(0.0))))
    assert(got(4L) == ((0L, 0L, None)))
  }

  test("duplicatedSpanStats counts WITHIN-doc repeats too") {
    // the same 3-token span twice in one doc: both windows duplicated
    val docs = Seq((1L, "a b c z z a b c")).toDF("doc_id", "text")
    val row = TextDedup.duplicatedSpanStats(docs, n = 3)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(row._2 == 6L && row._3 == 2L)
  }
}
