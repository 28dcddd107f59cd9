package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("codes: each vector takes its nearest per-subspace centroid, hand-checked") {
    // d=4, m=2 (subspaces [0,1] and [2,3]), k=2, 1 iteration → the
    // codebooks ARE the two seed vectors' subvectors (ids 0, 1)
    val df = emb(
      0L -> Seq(1f, 0f, 0f, 1f),    // seed: sub0 centroid 0 = (1,0); sub1 c0 = (0,1)
      1L -> Seq(0f, 1f, 1f, 0f),    // seed: sub0 centroid 1 = (0,1); sub1 c1 = (1,0)
      2L -> Seq(0.9f, 0f, 0.9f, 0f), // sub0 → c0 (near (1,0)); sub1 → c1 (near (1,0))
      3L -> Seq(0f, 0.9f, 0f, 0.9f)) // sub0 → c1; sub1 → c0
    val (codes, _) = ProductQuantizer.fitCodes(df, d = 4, m = 2, k = 2,
      iterations = 1)
    val got = codes.as[(Long, Int, Int)].collect().toSet
    assert(got == Set(
      (0L, 0, 0), (0L, 1, 0), (1L, 0, 1), (1L, 1, 1),
      (2L, 0, 0), (2L, 1, 1), (3L, 0, 1), (3L, 1, 0)))
  }

  test("ADC distance equals the exact distance when codes are exact (centroid-coincident)") {
    // vectors equal to the seeds → quantization error is ZERO, so the
    // ADC distance from probe 0 must equal the true integer distance
    val df = emb(
      0L -> Seq(1f, 0f, 0f, 1f),
      1L -> Seq(0f, 1f, 1f, 0f))
    val got = ProductQuantizer.adcTopK(df, probeId = 0L, topK = 5,
        d = 4, m = 2, k = 2, iterations = 1)
      .as[(Long, Long)].collect().toSeq
    // per dim: (1e6)^2 difference ×4 dims = 4e12
    assert(got == Seq((1L, 4000000000000L)))
  }

  test("guards: d % m, k, topK, iterations validated") {
    val df = emb(0L -> Seq(1f, 0f, 0f, 1f))
    intercept[IllegalArgumentException](
      ProductQuantizer.fitCodes(df, d = 4, m = 3, k = 2, iterations = 1))
    intercept[IllegalArgumentException](
      ProductQuantizer.fitCodes(df, d = 4, m = 2, k = 0, iterations = 1))
    intercept[IllegalArgumentException](
      ProductQuantizer.adcTopK(df, 0L, topK = 0, d = 4, m = 2, k = 1, iterations = 1))
    intercept[IllegalArgumentException](
      ProductQuantizer.fitCodes(df, d = 4, m = 2, k = 1, iterations = 0))
  }

  test("ADC ranking tracks the exact ranking on testdata (recall sanity)") {
    val e = tables.embeddings
    val pq = ProductQuantizer.adcTopK(e, probeId = 0L, topK = 20,
        d = 64, m = 4, k = 4, iterations = 2)
      .select("vec_id").as[Long].collect().toSet
    // exact integer-quantized L2 top-20 (same micro-unit quantization)
    val v = e.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("dim", "__v")))
      .select(col("vec_id"), col("dim"),
        floor(col("__v").cast("double") * 1000000L + 0.5).cast("long").as("x"))
    val probe = v.filter(col("vec_id") === 0L)
      .select(col("dim"), col("x").as("px"))
    val exact = v.filter(col("vec_id") =!= 0L).join(probe, "dim")
      .groupBy("vec_id")
      .agg(sum((col("x") - col("px")) * (col("x") - col("px"))).as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(20)
      .select("vec_id").as[Long].collect().toSet
    // PQ with 4x4 codebooks over near-random vectors is coarse; demand
    // a NONTRIVIAL overlap, not equality (the full-hash gate is the
    // ORACLE's job — it pins the ADC arithmetic, this pins usefulness)
    assert((pq & exact).size >= 4,
      s"ADC top-20 shares ${(pq & exact).size} of exact top-20 — quantizer is broken")
  }

  test("indexed ADC equals the inline fit+search; stale/foreign index loud") {
    val e = tables.embeddings
    val path = tmpDir("pqidx")
    ProductQuantizer.savePqIndex(e, d = 64, m = 4, k = 4, iterations = 2, path)
    val probe = e.filter(col("vec_id") === 0L).select("vec_id", "embedding")
    val indexed = ProductQuantizer.adcTopKIndexed(probe, path, topK = 10)
      .as[(Long, Long)].collect().toSeq
    val inline = ProductQuantizer.adcTopK(e, probeId = 0L, topK = 10,
        d = 64, m = 4, k = 4, iterations = 2)
      .as[(Long, Long)].collect().toSeq
    assert(indexed == inline && indexed.size == 10)
    // wrong-width probe is a loud contract violation
    val bad = Seq((0L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val e1 = intercept[Exception](
      ProductQuantizer.adcTopKIndexed(bad, path, topK = 5).collect())
    val msg = Iterator.iterate(e1: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msg.contains("d=64"), msg)
    // extra code rows without a meta update = stale, detected
    spark.range(1).select(lit(0).as("sub"), lit(0).as("cluster"),
      lit(999999L).as("id"))
      .write.mode("append").parquet(s"$path/codes")
    intercept[IllegalArgumentException](
      ProductQuantizer.adcTopKIndexed(probe, path, topK = 5))
    val bogus = tmpDir("pqidx-bogus")
    intercept[IllegalArgumentException](
      ProductQuantizer.adcTopKIndexed(probe, bogus, topK = 5))
  }

  test("ivfPqTopK: nProbe == kCoarse visits everything; guards validated") {
    val e = tables.embeddings
    // with all lists probed, IVF prunes nothing: the candidate set is
    // the full corpus and every returned distance is a genuine ADC sum
    val all = ProductQuantizer.ivfPqTopK(e, probeId = 0L, topK = 10,
        d = 64, m = 4, kCoarse = 4, coarseIterations = 2,
        kPq = 4, pqIterations = 1, nProbe = 4)
      .as[(Long, Long)].collect().toSeq
    assert(all.size == 10 && all == all.sortBy(r => (r._2, r._1)))
    // pruned probes return a SUBSET of lists' candidates — still 10
    // rows here, and distances are the same arithmetic
    val pruned = ProductQuantizer.ivfPqTopK(e, probeId = 0L, topK = 10,
        d = 64, m = 4, kCoarse = 4, coarseIterations = 2,
        kPq = 4, pqIterations = 1, nProbe = 2)
      .as[(Long, Long)].collect().toSeq
    assert(pruned.size == 10)
    val allDist = all.toMap
    assert(pruned.forall { case (id, dst) => allDist.get(id).forall(_ == dst) },
      "a candidate's ADC distance must not depend on how many lists were probed")
    intercept[IllegalArgumentException](ProductQuantizer.ivfPqTopK(
      e, 0L, 10, d = 64, m = 4, kCoarse = 4, coarseIterations = 2,
      kPq = 4, pqIterations = 1, nProbe = 5))
    intercept[IllegalArgumentException](ProductQuantizer.ivfPqTopK(
      e, 0L, 0, d = 64, m = 4, kCoarse = 4, coarseIterations = 2,
      kPq = 4, pqIterations = 1, nProbe = 2))
  }

  test("indexed query path runs NO Spark job over the index (witness is FS metadata)") {
    // r16 advisory: the old witness was a full codes.count() per query.
    // Construction now runs exactly ONE job — the limit-2 probe-frame
    // validation (the one-probe contract) — and none over the index:
    // the witness is a file-listing fingerprint and the codes/centroids
    // reads carry pinned schemas (no footer-inference job).
    val e = tables.embeddings
    val path = tmpDir("pqidx-nojob")
    ProductQuantizer.savePqIndex(e, d = 64, m = 4, k = 4, iterations = 2, path)
    val probe = e.filter(col("vec_id") === 0L).select("vec_id", "embedding")
    val sc = spark.sparkContext
    // baseline: what the probe-frame validation alone costs (its exact
    // job count is an AQE detail, not the contract)
    sc.setJobGroup("pq-nojob-base", "probe validation baseline")
    try probe.limit(2).count() finally sc.clearJobGroup()
    val base = sc.statusTracker.getJobIdsForGroup("pq-nojob-base").length
    sc.setJobGroup("pq-nojob-probe", "indexed ADC construction")
    val q = try ProductQuantizer.adcTopKIndexed(probe, path, topK = 5)
    finally sc.clearJobGroup()
    val jobs = sc.statusTracker.getJobIdsForGroup("pq-nojob-probe").length
    // <= because the r18 probe materialization folds validation AND
    // collection into ONE limit-2 job (fewer than the count baseline)
    assert(jobs <= base, s"query construction ran $jobs Spark jobs vs $base " +
      "for the probe validation alone — the index witness must stay a " +
      "filesystem-metadata check (no job over codes/centroids)")
    assert(q.count() == 5) // and the frame still searches
    // the BATCH form validates nothing per probe: zero jobs at construction
    sc.setJobGroup("pq-nojob-batch", "batched ADC construction")
    val qb = try ProductQuantizer.adcTopKIndexedBatch(probe, path, topK = 5)
    finally sc.clearJobGroup()
    assert(sc.statusTracker.getJobIdsForGroup("pq-nojob-batch").isEmpty,
      "batched construction must run zero jobs")
    assert(qb.count() == 5)
  }

  test("adcTopKIndexed: multi-probe and empty-probe frames fail loudly") {
    // r16 advice (medium): a multi-probe frame used to SUM distances
    // across probes silently; an empty one returned silently empty.
    val e = tables.embeddings
    val path = tmpDir("pqidx-oneprobe")
    ProductQuantizer.savePqIndex(e, d = 64, m = 4, k = 4, iterations = 2, path)
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val two = e.filter(col("vec_id").isin(0L, 1L)).select("vec_id", "embedding")
    val e1 = intercept[Exception](
      ProductQuantizer.adcTopKIndexed(two, path, topK = 5).collect())
    assert(msgs(e1).contains("adcTopKIndexedBatch"), msgs(e1))
    val none = e.filter(col("vec_id") === -999L).select("vec_id", "embedding")
    val e2 = intercept[Exception](
      ProductQuantizer.adcTopKIndexed(none, path, topK = 5).collect())
    assert(msgs(e2).contains("empty"), msgs(e2))
  }

  test("adcTopKIndexedBatch equals N single-probe searches, per probe") {
    val e = tables.embeddings
    val path = tmpDir("pqidx-batch")
    ProductQuantizer.savePqIndex(e, d = 64, m = 4, k = 4, iterations = 2, path)
    val probeIds = Seq(0L, 1L, 2L)
    val batch = ProductQuantizer.adcTopKIndexedBatch(
        e.filter(col("vec_id").isin(probeIds: _*)).select("vec_id", "embedding"),
        path, topK = 10)
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    assert(batch.keySet == probeIds.toSet)
    for (pid <- probeIds) {
      val single = ProductQuantizer.adcTopKIndexed(
          e.filter(col("vec_id") === pid).select("vec_id", "embedding"),
          path, topK = 10)
        .as[(Long, Long)].collect().toSeq
      assert(batch(pid) == single, s"probe $pid: batched != single")
    }
    // empty probe batch = empty result (a valid zero-query batch)
    assert(ProductQuantizer.adcTopKIndexedBatch(
      e.filter(col("vec_id") === -999L).select("vec_id", "embedding"),
      path, topK = 10).count() == 0)
  }

  test("adcTopK / ivfPqTopK: an absent probe id fails loudly, not silently empty") {
    val e = tables.embeddings
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e1 = intercept[Exception](
      ProductQuantizer.adcTopK(e, probeId = -999L, topK = 5,
        d = 64, m = 4, k = 4, iterations = 1).collect())
    assert(msgs(e1).contains("absent"), msgs(e1))
    val e2 = intercept[Exception](
      ProductQuantizer.ivfPqTopK(e, probeId = -999L, topK = 5, d = 64, m = 4,
        kCoarse = 4, coarseIterations = 1, kPq = 4, pqIterations = 1,
        nProbe = 2).collect())
    assert(msgs(e2).contains("absent"), msgs(e2))
  }

  test("appendToPqIndex: batch encoded against the PERSISTED codebooks; witness maintained") {
    val e = tables.embeddings
    val hist = e.filter(col("vec_id") % 10 =!= 0)
    val night = e.filter(col("vec_id") % 10 === 0)
    val path = tmpDir("pqidx-append")
    ProductQuantizer.savePqIndex(hist, d = 64, m = 4, k = 4, iterations = 2, path)
    ProductQuantizer.appendToPqIndex(night, path)
    // the appended codes are EXACTLY the argmin of each batch vector
    // against the persisted centroids — recompute independently
    val centroids = spark.read.parquet(s"$path/centroids")
      .as[(Int, Int, Int, Long)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.sortBy(_._3).map(_._4).toSeq).toMap // (sub, cluster) -> c by j
    val nightVecs = night.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val expected = (for {
      (id, v) <- nightVecs
      sub <- 0 until 4
    } yield {
      val xs = (0 until 16).map(j => math.floor(v(sub * 16 + j).toDouble * 1e6 + 0.5).toLong)
      val best = (0 until 4).map { cl =>
        val cs = centroids((sub, cl))
        (xs.indices.map(j => { val dd = xs(j) - cs(j); dd * dd }).sum, cl)
      }.min
      (id, sub, best._2)
    }).toSet
    val gotCodes = spark.read.parquet(s"$path/codes")
      .join(night.select(col("vec_id").as("id")), "id", "left_semi")
      .as[(Long, Int, Int)].collect().toSet
    assert(gotCodes == expected, "appended codes must be the persisted-geometry argmin")
    // search now covers the union; probe 0 (appended) excluded as probe
    val got = ProductQuantizer.adcTopKIndexed(
      e.filter(col("vec_id") === 0L).select("vec_id", "embedding"),
      path, topK = 10).count()
    assert(got == 10)
    // a crash AFTER the data append but BEFORE the meta write = stale
    spark.range(1).select(lit(999999L).as("id"), lit(0).as("sub"),
        lit(0).as("cluster"))
      .write.mode("append").parquet(s"$path/codes")
    val e1 = intercept[IllegalArgumentException](
      ProductQuantizer.appendToPqIndex(night, path))
    assert(e1.getMessage.contains("stale"), e1.getMessage)
    intercept[IllegalArgumentException](
      ProductQuantizer.adcTopKIndexed(
        e.filter(col("vec_id") === 0L).select("vec_id", "embedding"),
        path, topK = 5))
  }

  test("ivfPqTopKIndexed equals the inline IVF-PQ stack and prunes to nProbe list partitions") {
    val e = tables.embeddings
    val path = tmpDir("ivfpqidx")
    ProductQuantizer.saveIvfPqIndex(e, d = 64, m = 4, kCoarse = 4,
      coarseIterations = 2, kPq = 4, pqIterations = 1, path = path)
    val probe = e.filter(col("vec_id") === 0L).select("vec_id", "embedding")
    for (nProbe <- Seq(2, 4)) {
      val indexed = ProductQuantizer.ivfPqTopKIndexed(probe, path, topK = 10,
        nProbe = nProbe).as[(Long, Long)].collect().toSeq
      val inline = ProductQuantizer.ivfPqTopK(e, probeId = 0L, topK = 10,
        d = 64, m = 4, kCoarse = 4, coarseIterations = 2,
        kPq = 4, pqIterations = 1, nProbe = nProbe)
        .as[(Long, Long)].collect().toSeq
      assert(indexed == inline && indexed.size == 10,
        s"persisted index must BE the inline derivation at nProbe=$nProbe")
    }
    // storage-layer pruning: the code-table scan must list at most
    // nProbe of the kCoarse list partitions (the IvfIndexSpec gate)
    val df = ProductQuantizer.ivfPqTopKIndexed(probe, path, topK = 10, nProbe = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"probed lists must prune code partitions:\n${plan.take(900)}")
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.find(_.relation.location.rootPaths.exists(_.toString.contains("codes")))
      .getOrElse(fail("no codes scan in plan"))
    // the list_id broadcast join also injects a DynamicPruningSubquery
    // (unevaluatable outside execution) — the STATIC isin filter alone
    // must already bound the listing to nProbe partitions
    val staticFilters = scan.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    val parts = scan.relation.location.listFiles(staticFilters, scan.dataFilters)
    assert(parts.length <= 2, s"expected <=2 list partitions read, got ${parts.length}")
  }

  test("ivfPqTopKIndexed: probe/nProbe/foreign-dir contracts are loud") {
    val e = tables.embeddings
    val path = tmpDir("ivfpqidx-guards")
    ProductQuantizer.saveIvfPqIndex(e, d = 64, m = 4, kCoarse = 4,
      coarseIterations = 2, kPq = 4, pqIterations = 1, path = path)
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val two = e.filter(col("vec_id").isin(0L, 1L)).select("vec_id", "embedding")
    assert(msgs(intercept[Exception](
      ProductQuantizer.ivfPqTopKIndexed(two, path, topK = 5, nProbe = 2)))
      .contains("more than one probe"))
    val none = e.filter(col("vec_id") === -999L).select("vec_id", "embedding")
    assert(msgs(intercept[Exception](
      ProductQuantizer.ivfPqTopKIndexed(none, path, topK = 5, nProbe = 2)))
      .contains("empty"))
    val bad = Seq((0L, Seq(1f, 2f))).toDF("vec_id", "embedding")
    assert(msgs(intercept[Exception](
      ProductQuantizer.ivfPqTopKIndexed(bad, path, topK = 5, nProbe = 2).collect()))
      .contains("d=64"))
    val probe = e.filter(col("vec_id") === 0L).select("vec_id", "embedding")
    intercept[IllegalArgumentException](
      ProductQuantizer.ivfPqTopKIndexed(probe, path, topK = 5, nProbe = 5))
    intercept[IllegalArgumentException](
      ProductQuantizer.ivfPqTopKIndexed(probe, tmpDir("ivfpq-bogus"),
        topK = 5, nProbe = 2))
  }

  test("ivfPqTopKIndexedBatch equals N single-probe searches, per probe") {
    val e = tables.embeddings
    val path = tmpDir("ivfpqidx-batch")
    ProductQuantizer.saveIvfPqIndex(e, d = 64, m = 4, kCoarse = 4,
      coarseIterations = 2, kPq = 4, pqIterations = 1, path = path)
    val probeIds = Seq(0L, 1L, 2L)
    val batch = ProductQuantizer.ivfPqTopKIndexedBatch(
        e.filter(col("vec_id").isin(probeIds: _*)).select("vec_id", "embedding"),
        path, topK = 10, nProbe = 2)
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    assert(batch.keySet == probeIds.toSet)
    for (pid <- probeIds) {
      val single = ProductQuantizer.ivfPqTopKIndexed(
          e.filter(col("vec_id") === pid).select("vec_id", "embedding"),
          path, topK = 10, nProbe = 2)
        .as[(Long, Long)].collect().toSeq
      assert(batch(pid) == single, s"probe $pid: batched != single")
    }
    // empty probe batch = empty result (a valid zero-query batch)
    assert(ProductQuantizer.ivfPqTopKIndexedBatch(
      e.filter(col("vec_id") === -999L).select("vec_id", "embedding"),
      path, topK = 10, nProbe = 2).count() == 0)
  }

  test("appendToIvfPqIndex: batch coarse-assigned + residual-encoded against the persisted geometry") {
    val e = tables.embeddings
    val hist = e.filter(col("vec_id") % 10 =!= 0)
    val night = e.filter(col("vec_id") % 10 === 0)
    val path = tmpDir("ivfpqidx-append")
    ProductQuantizer.saveIvfPqIndex(hist, d = 64, m = 4, kCoarse = 4,
      coarseIterations = 2, kPq = 4, pqIterations = 1, path = path)
    ProductQuantizer.appendToIvfPqIndex(night, path)
    // independently recompute the batch's list assignment + residual
    // codes against the PERSISTED tables (the appendToPqIndex gate)
    val coarse = spark.read.parquet(s"$path/coarse")
      .as[(Int, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val resid = spark.read.parquet(s"$path/centroids")
      .as[(Int, Int, Int, Long)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.sortBy(_._3).map(_._4).toSeq).toMap
    val nightVecs = night.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    val expected = (for {
      (id, vec) <- nightVecs.toSeq
    } yield {
      val xs = (0 until 64).map(i => math.floor(vec(i).toDouble * 1e6 + 0.5).toLong)
      val list = coarse.keys.toSeq.sorted.map { cl =>
        val cs = coarse(cl)
        ((0 until 64).map(i => { val dd = xs(i) - cs(i); dd * dd }).sum, cl)
      }.min._2
      val codes = (0 until 4).map { sub =>
        val rx = (0 until 16).map(j => xs(sub * 16 + j) - coarse(list)(sub * 16 + j))
        val best = (0 until 4).map { cl =>
          val cs = resid((sub, cl))
          (rx.indices.map(j => { val dd = rx(j) - cs(j); dd * dd }).sum, cl)
        }.min._2
        (id, sub, best, list)
      }
      codes
    }).flatten.toSet
    val gotCodes = spark.read.parquet(s"$path/codes")
      .join(night.select(col("vec_id").as("id")), "id", "left_semi")
      .select("id", "sub", "cluster", "list_id")
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(gotCodes == expected,
      "appended codes must be the persisted-geometry coarse argmin + residual argmin")
    // search covers the union (probe 0 is itself an appended vector)
    assert(ProductQuantizer.ivfPqTopKIndexed(
      e.filter(col("vec_id") === 0L).select("vec_id", "embedding"),
      path, topK = 10, nProbe = 4).count() == 10)
    // a crash AFTER the data append but BEFORE the meta write = stale
    spark.range(1).select(lit(999999L).as("id"), lit(0).as("sub"),
        lit(0).as("cluster"), lit(0).as("list_id"))
      .write.mode("append").partitionBy("list_id").parquet(s"$path/codes")
    val e1 = intercept[IllegalArgumentException](
      ProductQuantizer.appendToIvfPqIndex(night, path))
    assert(e1.getMessage.contains("stale"), e1.getMessage)
  }

  private def loadIvfPqProps(path: String): java.util.Properties = {
    val p = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(path, "_graft_ivfpq_index.properties"))
    try p.load(in) finally in.close()
    p
  }

  private def storeIvfPqProps(path: String, p: java.util.Properties): Unit = {
    val out = java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(path, "_graft_ivfpq_index.properties"))
    try p.store(out, "test rewrite") finally out.close()
  }

  test("ivf-pq meta: per-list counts recorded at save and merged on append") {
    val e = tables.embeddings
    val hist = e.filter(col("vec_id") % 10 =!= 0)
    val night = e.filter(col("vec_id") % 10 === 0)
    val path = tmpDir("ivfpqidx-counts")
    ProductQuantizer.saveIvfPqIndex(hist, d = 64, m = 4, kCoarse = 4,
      coarseIterations = 2, kPq = 4, pqIterations = 1, path = path)
    def counts(): Map[Int, Long] =
      loadIvfPqProps(path).getProperty("listCounts").split(',')
        .filter(_.nonEmpty).map { s =>
          val Array(l, c) = s.split(':'); l.toInt -> c.toLong }.toMap
    val atSave = counts()
    // counts agree with the actual partitioned code table, per list
    def actual(): Map[Int, Long] = spark.read.parquet(s"$path/codes")
      .groupBy("list_id").count().as[(Int, Long)].collect().toMap
    assert(atSave == actual())
    assert(atSave.values.sum.toString ==
      loadIvfPqProps(path).getProperty("codeRows"))
    ProductQuantizer.appendToIvfPqIndex(night, path)
    assert(counts() == actual(), "append must merge, not replace, the counts")
    // the maintenance hook exposes the same counts without a Spark job
    val meta = ProductQuantizer.verifyIvfPqIndex(path)
    assert(meta.listCounts == actual() && meta.codeRows == actual().values.sum)
  }

  test("appendToIvfPqIndex: list-skew witness refuses a drifted batch, index untouched") {
    val e = tables.embeddings
    val hist = e.filter(col("vec_id") % 10 =!= 0)
    val night = e.filter(col("vec_id") % 10 === 0)
    val path = tmpDir("ivfpqidx-skew")
    ProductQuantizer.saveIvfPqIndex(hist, d = 64, m = 4, kCoarse = 4,
      coarseIterations = 2, kPq = 4, pqIterations = 1, path = path)
    val before = loadIvfPqProps(path).getProperty("codeRows")
    // with the cap at its floor, any max > mean (lists are never exactly
    // uniform) trips the witness — the unit-gate stand-in for drift
    val e1 = intercept[IllegalArgumentException](
      ProductQuantizer.appendToIvfPqIndex(night, path, maxListSkew = 1.0))
    assert(e1.getMessage.contains("maxListSkew") &&
      e1.getMessage.contains("saveIvfPqIndex"), e1.getMessage)
    // the refusal happened BEFORE any write: meta unchanged, witness
    // still green, searches still run
    assert(loadIvfPqProps(path).getProperty("codeRows") == before)
    assert(ProductQuantizer.ivfPqTopKIndexed(
      e.filter(col("vec_id") === 1L).select("vec_id", "embedding"),
      path, topK = 5, nProbe = 2).count() == 5)
    // and the default cap admits the same (undrifted) batch
    ProductQuantizer.appendToIvfPqIndex(night, path)
  }

  test("ivf-pq meta format is enforced BOTH directions (r18 advisory)") {
    val e = tables.embeddings
    val path = tmpDir("ivfpqidx-fmt")
    ProductQuantizer.saveIvfPqIndex(e, d = 64, m = 4, kCoarse = 4,
      coarseIterations = 1, kPq = 4, pqIterations = 1, path = path)
    val probe = e.filter(col("vec_id") === 0L).select("vec_id", "embedding")
    // an OLDER format (a pre-listCounts v2 index) → named upgrade hint
    val p = loadIvfPqProps(path)
    p.setProperty("formatVersion", "2")
    storeIvfPqProps(path, p)
    val eOld = intercept[IllegalArgumentException](
      ProductQuantizer.ivfPqTopKIndexed(probe, path, topK = 5, nProbe = 2))
    assert(eOld.getMessage.contains("format upgraded") &&
      eOld.getMessage.contains("saveIvfPqIndex"), eOld.getMessage)
    // a NEWER format (written by a future engine) → upgrade-the-engine,
    // never a silent misread
    p.setProperty("formatVersion", "99")
    storeIvfPqProps(path, p)
    val eNew = intercept[IllegalArgumentException](
      ProductQuantizer.ivfPqTopKIndexed(probe, path, topK = 5, nProbe = 2))
    assert(eNew.getMessage.contains("NEWER engine"), eNew.getMessage)
  }

  test("ivfPqTopKIndexedBatch: maxProbes caps the driver-collect axis loudly") {
    val e = tables.embeddings
    val path = tmpDir("ivfpqidx-maxp")
    ProductQuantizer.saveIvfPqIndex(e, d = 64, m = 4, kCoarse = 4,
      coarseIterations = 1, kPq = 4, pqIterations = 1, path = path)
    val eCap = intercept[IllegalArgumentException](
      ProductQuantizer.ivfPqTopKIndexedBatch(
        e.filter(col("vec_id").isin(0L, 1L, 2L)).select("vec_id", "embedding"),
        path, topK = 5, nProbe = 2, maxProbes = 2))
    assert(eCap.getMessage.contains("maxProbes"), eCap.getMessage)
  }

  test("determinism: codes and top-k invariant under input partitioning") {
    val e = tables.embeddings
    def run(df: org.apache.spark.sql.DataFrame) =
      ProductQuantizer.adcTopK(df, probeId = 3L, topK = 10,
        d = 64, m = 4, k = 4, iterations = 2)
        .as[(Long, Long)].collect().toSeq
    assert(run(e) == run(e.repartition(17)))
  }
}
