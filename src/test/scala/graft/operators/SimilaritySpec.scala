package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("brute-force top-k returns nearest by cosine, descending") {
    val df = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(1f, 0.1f),   // nearly parallel to probe
      2L -> Seq(0f, 1f),     // orthogonal
      3L -> Seq(-1f, 0f),    // opposite
      4L -> Seq(1f, 0.5f))
    val got = Similarity.bruteForceTopK(df, probeId = 0L, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 4L, 2L))
  }

  test("ann top-k searches only the probe's sign bucket") {
    val df = emb(
      0L -> Seq(1f, 1f, 1f, 1f, 1f, 1f),
      1L -> Seq(1f, 1f, 1f, 1f, 1f, 0.9f),   // same bucket, similar
      2L -> Seq(-1f, 1f, 1f, 1f, 1f, 1f))    // different bucket, excluded
    val got = Similarity.annTopK(df, probeId = 0L, k = 5, bits = 6)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("near-dup pairs respects threshold and bucket blocking") {
    val df = emb(
      1L -> Seq(1f, 1f, 0f, 0f),
      2L -> Seq(1f, 0.99f, 0f, 0f),  // near-dup of 1, same bucket
      3L -> Seq(-1f, -1f, 0f, 0f))   // different bucket
    val got = Similarity.nearDupPairs(df, threshold = 0.9, bits = 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("nearDupPairs: over-wide sign buckets fail loudly (quadratic axis guard)") {
    // r16 verdict: the bucket self-join is quadratic in bucket width —
    // same discipline as baskets/clusters/fuzzy blocks. Three vectors
    // share bucket "11.."; cap 2 must die naming the bucket and width.
    val df = emb(
      1L -> Seq(1f, 1f, 0f, 0f),
      2L -> Seq(1f, 0.99f, 0f, 0f),
      3L -> Seq(0.5f, 0.5f, 0f, 0f),
      4L -> Seq(-1f, -1f, 0f, 0f))
    val e = intercept[Exception](
      Similarity.nearDupPairs(df, threshold = 0.9, bits = 4, maxBucketSize = 2)
        .count())
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msg.contains("maxBucketSize=2") && msg.contains("3 vectors"), msg)
    // at the cap the same input works
    assert(Similarity.nearDupPairs(df, threshold = 0.9, bits = 4,
      maxBucketSize = 3).count() >= 1)
    val e2 = intercept[IllegalArgumentException](
      Similarity.nearDupPairs(df, threshold = 0.9, maxBucketSize = 0))
    assert(e2.getMessage.contains("maxBucketSize"))
  }

  test("semanticDedup: hand-checked clusters, survivors, and dominance") {
    // init centroids = ids 0/1 → one Lloyd round groups {0,2} and
    // {1,3}; within each, the higher id is a near-dup (cos ≈ 0.994)
    // of the lower and must be dropped
    val df = emb(
      0L -> Seq(1f, 0f),
      1L -> Seq(0f, 1f),
      2L -> Seq(0.9f, 0.1f),
      3L -> Seq(0.1f, 0.9f))
    val got = Similarity.semanticDedup(df, d = 2, k = 2, iterations = 1,
        threshold = 0.9)
      .orderBy("vec_id").as[(Long, Int)].collect().toSeq
    assert(got == Seq((0L, 0), (1L, 1)))
    // below the threshold nothing is a dup: all four survive
    assert(Similarity.semanticDedup(df, d = 2, k = 2, iterations = 1,
      threshold = 0.9999).count() == 4)
  }

  test("semanticDedup: cluster-size cap fails loudly (quadratic axis guard)") {
    val df = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f))
    val e = intercept[Exception](Similarity.semanticDedup(
      df, d = 2, k = 2, iterations = 1, threshold = 0.9,
      maxClusterSize = 1).count())
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msg.contains("maxClusterSize=1"), msg)
    intercept[IllegalArgumentException](Similarity.semanticDedup(
      df, d = 2, k = 2, iterations = 1, threshold = 0.9, maxClusterSize = 0))
  }

  test("semanticDedup on testdata: every cluster keeps its smallest id; drops are real") {
    val e = tables.embeddings
    val total = e.count()
    val got = Similarity.semanticDedup(e, d = 64, k = 4, iterations = 2,
      threshold = 0.3)
    val n = got.count()
    assert(n > 0 && n < total, s"expected real drops: $n of $total survive")
    // the smallest id of each cluster can never have a lower-id dup —
    // it must always survive
    val assign = KMeansExact.assignMicro(
      e.select(col("vec_id").as("id"), col("embedding").as("vec")),
      d = 64, k = 4, iterations = 2)
    val minIds = assign.groupBy("cluster").agg(min("id").as("vec_id"))
      .select("vec_id").as[Long].collect().toSet
    val kept = got.select("vec_id").as[Long].collect().toSet
    assert(minIds.subsetOf(kept))
  }

  test("semanticDedupIncremental: hand-checked assignment + both dominance paths") {
    // corpus {0,2} / {1,3} as in the sd01 hand test; persisted
    // centroids are the INIT geometry (iterations=1 → the centroids
    // the corpus assignment actually used)
    val corpus = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f))
    val path = tmpDir("semidx-hand")
    Similarity.saveSemanticIndex(corpus, d = 2, k = 2, iterations = 1, path)
    // batch: 10 dups corpus 0 (cos .9986) → dropped vs corpus;
    // 12/13 are mutual near-dups (cos ≈ 1) but far from the corpus
    // (cos ≈ .62-.71 < .9) → 13 dropped vs lower-id batch row 12
    val batch = emb(10L -> Seq(0.95f, 0.05f),
      12L -> Seq(0.7f, -0.7f), 13L -> Seq(0.71f, -0.7f))
    val got = Similarity.semanticDedupIncremental(batch, path, threshold = 0.9)
      .as[(Long, Int)].collect().toSet
    assert(got == Set((12L, 0)))
    // batch-side cluster cap is guarded like sd01
    val e = intercept[Exception](Similarity.semanticDedupIncremental(
      batch, path, threshold = 0.9, maxClusterSize = 2).count())
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msg.contains("maxClusterSize=2"), msg)
  }

  test("semanticDedupIncremental: stale or foreign index fails loudly") {
    val corpus = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    val path = tmpDir("semidx-stale")
    Similarity.saveSemanticIndex(corpus, d = 2, k = 2, iterations = 1, path)
    // simulate a crash between the corpus write and the meta write:
    // extra corpus rows the meta's witness does not record
    emb(99L -> Seq(1f, 1f))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        lit(0).as("cluster"))
      .write.mode("append").partitionBy("cluster").parquet(s"$path/corpus")
    val batch = emb(10L -> Seq(0.5f, 0.5f))
    val e = intercept[IllegalArgumentException](
      Similarity.semanticDedupIncremental(batch, path, threshold = 0.9))
    assert(e.getMessage.contains("stale index"))
    val bogus = tmpDir("semidx-bogus")
    val e2 = intercept[IllegalArgumentException](
      Similarity.semanticDedupIncremental(batch, bogus, threshold = 0.9))
    assert(e2.getMessage.contains("not a graft semantic index"))
  }

  test("appendToSemanticIndex: tomorrow's batch dedups against today's survivors") {
    val corpus = emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f))
    val path = tmpDir("semidx-append")
    Similarity.saveSemanticIndex(corpus, d = 2, k = 2, iterations = 1, path)
    // night 1: survivor 12 is far from the corpus → appended
    val night1 = emb(12L -> Seq(0.7f, -0.7f))
    assert(Similarity.semanticDedupIncremental(night1, path, threshold = 0.9)
      .count() == 1)
    Similarity.appendToSemanticIndex(night1, path)
    // night 2: a clone of 12 must now be dropped AGAINST THE INDEX
    // (not via the batch-batch path — it is alone in its batch)
    val night2 = emb(20L -> Seq(0.7f, -0.7f), 21L -> Seq(-0.7f, -0.7f))
    val got = Similarity.semanticDedupIncremental(night2, path, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(21L), s"clone of appended survivor must drop: $got")
    // witness maintained: a further manual append is detected as stale
    emb(99L -> Seq(1f, 1f))
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"),
        lit(0).as("cluster"))
      .write.mode("append").partitionBy("cluster").parquet(s"$path/corpus")
    intercept[IllegalArgumentException](
      Similarity.appendToSemanticIndex(emb(30L -> Seq(0.1f, 0.2f)), path))
  }

  test("semantic index: wrong-dimension embeddings fail loudly at every boundary") {
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val path = tmpDir("semidx-dim")
    val bad = emb(0L -> Seq(1f, 0f, 5f), 1L -> Seq(0f, 1f))
    val e1 = intercept[Exception](
      Similarity.saveSemanticIndex(bad, d = 2, k = 2, iterations = 1, path))
    assert(msgs(e1).contains("does not match the index dimensionality"), msgs(e1))
    Similarity.saveSemanticIndex(emb(0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f)),
      d = 2, k = 2, iterations = 1, path)
    val b3 = emb(10L -> Seq(0.5f, 0.5f, 0.5f))
    val e2 = intercept[Exception](
      Similarity.semanticDedupIncremental(b3, path, threshold = 0.9).count())
    assert(msgs(e2).contains("d=2"), msgs(e2))
    val e3 = intercept[Exception](Similarity.appendToSemanticIndex(b3, path))
    assert(msgs(e3).contains("d=2"), msgs(e3))
  }

  test("plan gate: sd01/sd02 pair joins are cluster-keyed equi-joins, no single partition") {
    val e = tables.embeddings
    val path = tmpDir("semidx-plan")
    Similarity.saveSemanticIndex(e.filter(col("vec_id") % 10 =!= 0)
      .select("vec_id", "embedding"), d = 64, k = 4, iterations = 2, path)
    spark.conf.set(TextDedup.MaterializeConf, "none")
    try {
      for (df <- Seq(
        Similarity.semanticDedup(e, d = 64, k = 4, iterations = 2, threshold = 0.3),
        Similarity.semanticDedupIncremental(
          e.filter(col("vec_id") % 10 === 0).select("vec_id", "embedding"),
          path, threshold = 0.3))) {
        df.collect()
        val plan = graft.PlanSig.finalPlanText(df)
        assert(!plan.contains("CartesianProduct"),
          s"no unbounded Cartesian:\n${plan.take(1500)}")
        assert(!plan.contains("Exchange SinglePartition"),
          s"no single-partition stage:\n${plan.take(1500)}")
      }
    } finally spark.conf.set(TextDedup.MaterializeConf, "local")
  }

  test("ivf with nProbe == nLists equals brute force exactly") {
    val e = tables.embeddings
    val brute = Similarity.bruteForceTopK(e, 0L, 5).as[(Long, Double)].collect().toSeq
    val ivfAll = Similarity.ivfTopK(e, 0L, 5, nLists = 8, nProbe = 8).as[(Long, Double)].collect().toSeq
    assert(ivfAll == brute)
  }

  test("ivf with partial probes returns k results from the probed lists") {
    val e = tables.embeddings
    val brute = Similarity.bruteForceTopK(e, 0L, 5).as[(Long, Double)].collect().toMap
    val ivf = Similarity.ivfTopK(e, 0L, 5, nLists = 8, nProbe = 3).as[(Long, Double)].collect().toSeq
    assert(ivf.size == 5)
    // scores of returned ids must match the exact ranking's scores
    ivf.foreach { case (id, s) => brute.get(id).foreach(b => assert(b == s)) }
  }

  test("ann agrees with brute force when buckets are warm (testdata probe)") {
    val e = tables.embeddings
    val brute = Similarity.bruteForceTopK(e, 0L, 5).as[(Long, Double)].collect().toSeq
    val ann = Similarity.annTopK(e, 0L, 5, bits = 6).as[(Long, Double)].collect().toSeq
    // ANN results must be a subset of the full ranking's scores ordering
    assert(ann.nonEmpty)
    assert(ann.map(_._2).sorted.reverse == ann.map(_._2)) // descending
    val bruteScores = brute.toMap
    ann.foreach { case (id, s) => bruteScores.get(id).foreach(b => assert(b == s)) }
  }

  test("int8 quantized cosine is within the SQ error bound of exact cosine") {
    // Per-component quantization error <= 0.5/127 of the vector's max
    // component; cosine error stays well under 2% on the testdata
    // embeddings. Also: codes must be integral and bounded by 127.
    import org.apache.spark.sql.functions._
    val emb = tables.embeddings
    val q = emb.select(col("vec_id"), Similarity.quantized(col("embedding")).as("q"))
    val bad = q.select(explode(col("q")).as("c"))
      .filter(abs(col("c")) > 127 || col("c") =!= floor(col("c")))
    assert(bad.isEmpty, "codes must be integral in [-127, 127]")

    val exact = Similarity.bruteForceTopKRaw(emb, probeId = 0L, k = 50)
      .select(col("vec_id"), col("score0").as("ce"))
    val pq = q.filter(col("vec_id") === 0L).select(col("q").as("pq"))
    val approx = q.filter(col("vec_id") =!= 0L).crossJoin(broadcast(pq))
      .select(col("vec_id"), graft.functions.cosine_similarity(col("q"), col("pq")).as("cq"))
    val maxErr = exact.join(approx, "vec_id")
      .agg(max(abs(col("ce") - col("cq")))).head().getDouble(0)
    assert(maxErr < 0.02, s"quantized-cosine error $maxErr exceeds the SQ bound")
  }

  test("quantized top-k keeps the no-UDF broadcast + TakeOrderedAndProject plan") {
    val df = Similarity.quantizedTopK(tables.embeddings, probeId = 0L, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(df.count() == 5)
  }

  test("law: quantization is scale-invariant (the property sq01 rests on)") {
    // cosine is scale-invariant and the int8 codes divide by the
    // vector's own maxAbs, so scaling a vector by ANY positive constant
    // must produce IDENTICAL codes — if this law broke, quantized
    // cosine would depend on storage magnitude, not direction.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecGen = for {
      d <- Gen.choose(2, 16)
      xs <- Gen.listOfN(d, Gen.choose(-1e3, 1e3)).suchThat(_.exists(_ != 0.0))
      c <- Gen.choose(1e-6, 1e6)
    } yield (xs.map(_.toFloat), c)
    val cases = Gen.listOfN(60, vecGen)
      .apply(Gen.Parameters.default, Seed(42L)).get
    val rows = cases.zipWithIndex.flatMap { case ((xs, c), i) =>
      // exact float scaling can overflow float range for extreme c; scale
      // in double then cast back, mirroring how a pipeline would rescale
      Seq((i.toLong * 2, xs), (i.toLong * 2 + 1, xs.map(x => (x.toDouble * c).toFloat)))
    }.toDF("vec_id", "embedding")
    val q = rows.select(col("vec_id"), Similarity.quantized(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    cases.indices.foreach { i =>
      val (orig, scaled) = (q(i.toLong * 2), q(i.toLong * 2 + 1))
      // float re-cast of the scaled vector perturbs components by <=1 ulp,
      // which can flip a code by at most 1 on exact .5 boundaries — require
      // near-identity, exact for the overwhelming majority
      val diffs = orig.zip(scaled).count { case (a, b) => math.abs(a - b) > 1.0 }
      assert(diffs == 0, s"case $i: codes differ by >1: $orig vs $scaled")
    }
  }
}
