package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{cosine_similarity, round4}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline; the LSH variant
  * (sign-bit hyperplane buckets) is the scale path: bucketing turns the
  * O(N) probe scan / O(N²) pair join into an equi-join on the bucket key.
  * Cosine itself is the native codegen'd [[graft.functions.CosineSimilarity]]
  * expression — no UDF serialization in the hot loop.
  */
object Similarity {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k neighbors of `probeId` by cosine (descending, vec_id
    * tie-break). Output: (vec_id, score[round4]).
    *
    * The probe row is broadcast; the scan stays embarrassingly parallel
    * and Catalyst plans the top-k as TakeOrderedAndProject (per-partition
    * heap + driver merge of k rows, no global sort).
    */
  def bruteForceTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame =
    bruteForceTopKRaw(emb, probeId, k)
      .select(col("vec_id"), round4(col("score0")).as("score"))

  /** [[bruteForceTopK]] with the UNROUNDED score0 kept alongside the
    * rounded score — for compositions that must re-sort downstream of a
    * join: sorting on the rounded value could diverge from the oracle's
    * unrounded order when two distinct cosines round equal. */
  def bruteForceTopKRaw(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe = emb.filter(col("vec_id") === probeId)
      .select(asDouble(col("embedding")).as("pe"))
    emb.filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        cosine_similarity(asDouble(col("embedding")), col("pe")).as("score0"))
      .orderBy(col("score0").desc, col("vec_id"))
      .limit(k)
  }

  /** Int8 scalar quantization of an embedding: per-vector symmetric
    * scale s = maxAbs/127, code q_i = round(x_i / s) ∈ [-127, 127],
    * computed as FLOOR(x/maxAbs*127 + 0.5) — the one rounding form both
    * engines evaluate identically. The codes are carried as
    * integer-VALUED doubles so downstream dot products are exact
    * regardless of accumulation order. A zero vector quantizes to
    * itself. At 100 TB this is the 4x memory / bandwidth cut for ANN
    * scans (int8 SQ, the standard first rung before PQ); because cosine
    * is scale-invariant, the per-vector scales cancel and quantized
    * cosine needs no dequantization at all.
    */
  def quantized(embCol: Column): Column = {
    val e = asDouble(embCol)
    val maxAbs = array_max(transform(e, x => abs(x)))
    when(maxAbs === 0, e)
      .otherwise(transform(e, x => floor(x / maxAbs * 127 + 0.5).cast("double")))
  }

  /** Top-k by QUANTIZED cosine — the int8-SQ search path. Same plan
    * shape as [[bruteForceTopK]] (broadcast probe, codegen'd cosine,
    * TakeOrderedAndProject); only the vectors are 8-bit codes. Exactly
    * reproducible cross-engine (integer dot products), so it gets a
    * full hash oracle (sq01), not a recall band.
    */
  def quantizedTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val q = emb.select(col("vec_id"), quantized(col("embedding")).as("q"))
    val probe = q.filter(col("vec_id") === probeId).select(col("q").as("pq"))
    q.filter(col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), cosine_similarity(col("q"), col("pq")).as("score0"))
      .orderBy(col("score0").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round4(col("score0")).as("score"))
  }

  /** Sign-bit LSH bucket key: one hyperplane per leading dimension
    * (axis-aligned random projection — deterministic and expressible in
    * the oracle SQL). */
  def signBucket(embCol: Column, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(element_at(embCol, i) >= 0, lit("1")).otherwise(lit("0"))): _*)

  /** Approximate top-k: search restricted to the probe's LSH bucket. */
  def annTopK(emb: DataFrame, probeId: Long, k: Int, bits: Int = 6): DataFrame = {
    val bucketed = emb.withColumn("bucket", signBucket(col("embedding"), bits))
    val probe = bucketed.filter(col("vec_id") === probeId)
      .select(asDouble(col("embedding")).as("pe"), col("bucket"))
    bucketed
      .join(broadcast(probe), Seq("bucket"))
      .filter(col("vec_id") =!= probeId)
      .select(col("vec_id"),
        cosine_similarity(asDouble(col("embedding")), col("pe")).as("score0"))
      .orderBy(col("score0").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round4(col("score0")).as("score"))
  }

  /** IVF (inverted-file) approximate top-k: a KMeans codebook of
    * `nLists` centroids partitions the corpus into cluster lists; a
    * probe scans only the `nProbe` nearest lists. The index build is one
    * MLlib KMeans fit (seeded, deterministic) + one assignment pass; the
    * search prunes (nLists - nProbe)/nLists of the corpus. With
    * `nProbe == nLists` the result equals brute force exactly (tested).
    *
    * Scale shape: the per-list scan is an equi-join on the cluster id —
    * same blocking structure as the sign-bucket LSH path, but with
    * data-adaptive regions instead of fixed hyperplanes.
    */
  def ivfTopK(emb: DataFrame, probeId: Long, k: Int,
              nLists: Int = 16, nProbe: Int = 2, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val withVec = emb.withColumn("features", array_to_vector(asDouble(col("embedding"))))
    val model = new KMeans().setK(nLists).setSeed(seed).setFeaturesCol("features")
      .fit(withVec)
    val assigned = model.transform(withVec).withColumnRenamed("prediction", "list_id")

    val probeVec = assigned.filter(col("vec_id") === probeId)
      .select("features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    // nProbe nearest centroids (tiny driver-side computation: nLists rows)
    val lists = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, math.sqrt(org.apache.spark.ml.linalg.Vectors.sqdist(c, probeVec))) }
      .sortBy(_._2).take(nProbe).map(_._1).toSeq

    val probe = assigned.filter(col("vec_id") === probeId)
      .select(asDouble(col("embedding")).as("pe"))
    assigned
      .filter(col("list_id").isin(lists: _*) && col("vec_id") =!= probeId)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"),
        cosine_similarity(asDouble(col("embedding")), col("pe")).as("score0"))
      .orderBy(col("score0").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round4(col("score0")).as("score"))
  }

  /** Embedding near-dup pairs: same LSH bucket AND cosine >= threshold.
    * Output: (vec_a, vec_b, score[round4]), a < b.
    *
    * The bucket equi-join is the blocking step — at 100 TB this is a
    * shuffle on the bucket key instead of an all-pairs cross join.
    */
  /** SemDeDup-style semantic deduplication (Abbas et al. 2023's recipe
    * re-expressed relationally): cluster the embedding corpus with the
    * DETERMINISTIC integer k-means ([[KMeansExact]] — bitwise
    * reproducible, unlike MLlib's float Lloyd), then WITHIN each
    * cluster drop every vector that has a lower-id near-duplicate at
    * `cosine >= threshold`; the kept row per duplicate neighborhood is
    * the smallest id (deterministic survivorship, the dd10 convention).
    *
    * Scale shape: clustering is the blocking step — the pair join is
    * keyed on the cluster id, so pair volume is Σ C(|cluster|,2), never
    * N². That makes cluster SIZE the quadratic skew axis (exactly the
    * Baskets basket-width axis), and it is ENFORCED the same way:
    * `maxClusterSize` raise_errors per offending cluster, with the
    * width count riding the cluster-keyed window on the same
    * hashpartitioning the self-join needs anyway. Callers hitting the
    * cap should raise k (more, smaller clusters), not the cap.
    *
    * @param emb (vec_id, embedding) rows
    * @param d   embedding dimensionality
    * @return (vec_id, cluster) — the SURVIVING corpus */
  def semanticDedup(emb: DataFrame, d: Int, k: Int, iterations: Int,
                    threshold: Double,
                    maxClusterSize: Int = 100000): DataFrame = {
    require(maxClusterSize >= 1,
      s"maxClusterSize must be >= 1, got $maxClusterSize")
    val assign = KMeansExact.assignMicro(
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        d = d, k = k, iterations = iterations)
      .select(col("id").as("vec_id"), col("cluster"))
    val withCl = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .join(assign, "vec_id")
    val wC = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
    val guarded = withCl
      .withColumn("__w", count(lit(1)).over(wC))
      .withColumn("vec_id",
        when(col("__w") > maxClusterSize, raise_error(concat(
          lit("semanticDedup: cluster "), col("cluster").cast("string"),
          lit(" holds "), col("__w").cast("string"),
          lit(s" vectors, over maxClusterSize=$maxClusterSize; the in-cluster " +
            "pair join is quadratic in cluster size — raise k or the cap " +
            "deliberately"))))
          .otherwise(col("vec_id")))
      .select("vec_id", "cluster", "e")
    val dupOf = guarded.select(col("cluster"), col("vec_id").as("va"), col("e").as("ea"))
      .join(guarded.select(col("cluster"), col("vec_id").as("vb"), col("e").as("eb")),
        Seq("cluster"))
      .filter(col("vb") < col("va"))
      .filter(cosine_similarity(col("ea"), col("eb")) >= threshold)
      .select(col("va").as("vec_id")).distinct()
    guarded.join(dupOf, Seq("vec_id"), "left_anti")
      .select("vec_id", "cluster")
  }

  // ------------------------------------------------------------------
  // Persisted semantic index + INCREMENTAL semantic dedup — the dd11 /
  // ir03 incremental discipline applied to [[semanticDedup]]: the
  // expensive corpus pass (k-means fit + full in-cluster dedup) happens
  // ONCE at build time; a nightly embedding batch is assigned to the
  // PERSISTED centroids (broadcast k·d rows — the batch never
  // re-clusters the corpus) and deduped against (a) the persisted
  // same-cluster corpus and (b) lower-id batch rows, so the nightly
  // cost is |batch| × cluster-local work, never a corpus re-fit.
  // ------------------------------------------------------------------

  private val SemMetaFile = "_graft_semantic_index.properties"

  /** Model/layout parameters persisted with the index; `dataFp` is the
    * consistency witness the query path checks — an [[IndexWitness]]
    * file-listing fingerprint, NO Spark job over the corpus (r16
    * advisory: the old `corpusRows` count was a full scan before every
    * nightly batch). `corpusRows` stays as the maintained row count. */
  final case class SemIndexMeta(d: Int, k: Int, iterations: Int,
                                unitScale: Long, corpusRows: Long, dataFp: String)

  /** Meta format version, bumped on every backward-incompatible sidecar
    * change so an old index fails with a NAMED upgrade message, not a
    * generic missing-property error (r17 advisory). v2 = the dataFp
    * file-listing witness replaced the per-query corpus count. */
  private val SemMetaFormatVersion = 2

  private def writeSemMeta(path: String, m: SemIndexMeta): Unit = {
    val p = new java.util.Properties()
    p.setProperty("formatVersion", SemMetaFormatVersion.toString)
    p.setProperty("d", m.d.toString); p.setProperty("k", m.k.toString)
    p.setProperty("iterations", m.iterations.toString)
    p.setProperty("unitScale", m.unitScale.toString)
    p.setProperty("corpusRows", m.corpusRows.toString)
    p.setProperty("dataFp", m.dataFp)
    MetaIO.writePropsAtomic(path, SemMetaFile, p, "graft semantic index")
  }

  private def readSemMeta(path: String): SemIndexMeta = {
    val pOpt = MetaIO.readProps(s"$path/${SemMetaFile}")
    require(pOpt.isDefined,
      s"$path has no $SemMetaFile — not a graft semantic index; build with saveSemanticIndex")
    val p = pOpt.get
    // format check first, BOTH directions (r18 advisory: the version
    // was written but never read back, so a newer-format index would be
    // silently misread): old/absent → NAMED upgrade message; newer →
    // upgrade-the-engine message
    IndexWitness.requireFormat(s"$path/$SemMetaFile", p, SemMetaFormatVersion,
      "rebuild with saveSemanticIndex")
    def prop(k: String): String = {
      val v = p.getProperty(k)
      require(v != null, s"$path/$SemMetaFile is missing '$k' — corrupt; rebuild")
      v
    }
    SemIndexMeta(prop("d").toInt, prop("k").toInt, prop("iterations").toInt,
      prop("unitScale").toLong, prop("corpusRows").toLong, prop("dataFp"))
  }

  /** Loud staleness check — filesystem-metadata fingerprint only, no
    * Spark job over the corpus (r16 advisory). */
  private def checkSemWitness(path: String, meta: SemIndexMeta, who: String): Unit =
    // Two-crash-window adjudication (the corrected ProductQuantizer
    // wording, r19 verdict): a crash BEFORE the corpus append commits
    // leaves the listing matching the old meta — no staleness, a re-run
    // just works. This error fires only in the POST-commit window
    // (files landed, meta re-bless lost), where appendToSemanticIndex's
    // own pre-append check would refuse the same state — so the honest
    // hint is rebuild, never "re-run the append".
    IndexWitness.check(path, meta.dataFp,
      s"$who found a stale index: corpus files changed without their meta (an " +
        "append or compaction crashed after its file commit, before the meta " +
        "re-bless)",
      "re-running the append/compaction would refuse this same state — " +
        "rebuild with saveSemanticIndex to re-bless the index")

  /** Fit + persist the semantic index: `centroids/` (the k·d rows the
    * corpus assignments were computed against —
    * [[KMeansExact.fitMicro]]'s used-centroids, so batch assignment
    * shares the corpus's exact geometry) and `corpus/` (vec_id,
    * embedding as double[], partitioned by cluster). */
  /** Per-row loud dimensionality check (KMeansExact declares d as
    * caller-asserted; the PERSISTED index makes this a cross-job
    * contract, so it is enforced at the boundary instead): a vector of
    * the wrong length would silently join fewer dims and mis-assign. */
  private def checkedDim(emb: DataFrame, d: Int, who: String): DataFrame =
    emb.select(col("vec_id"),
      when(size(col("embedding")) =!= d, raise_error(concat(
        lit(s"$who: embedding of length "), size(col("embedding")).cast("string"),
        lit(" for vec_id "), col("vec_id").cast("string"),
        lit(s" does not match the index dimensionality d=$d"))))
        .otherwise(asDouble(col("embedding"))).as("e"))

  def saveSemanticIndex(emb: DataFrame, d: Int, k: Int, iterations: Int,
                        path: String): Unit = {
    val unitScale = 1000000L
    val checked = checkedDim(emb, d, "saveSemanticIndex")
    val (assign, centroids) = KMeansExact.fitMicro(
      checked.select(col("vec_id").as("id"), col("e").as("vec")),
      d = d, k = k, iterations = iterations, unitScale = unitScale)
    // Old meta deleted BEFORE the data overwrite, new meta written
    // last: a crash mid-rebuild leaves a loud no-meta state, never an
    // old meta over new data (r16 advice — a changed unitScale/k with
    // coinciding row counts would otherwise mis-quantize silently).
    MetaIO.mkdirs(path)
    MetaIO.deleteIfExists(s"$path/${SemMetaFile}")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    checked
      .join(assign.select(col("id").as("vec_id"), col("cluster")), "vec_id")
      .write.mode("overwrite").partitionBy("cluster").parquet(s"$path/corpus")
    val n = emb.sparkSession.read.parquet(s"$path/corpus").count()
    writeSemMeta(path, SemIndexMeta(d, k, iterations, unitScale, n,
      IndexWitness.fingerprint(path)))
  }

  /** Append a batch's SURVIVORS into the index corpus — the lifecycle
    * step after [[semanticDedupIncremental]], mirroring
    * [[InvertedIndex.appendToIndex]]: assign against the persisted
    * centroids (the geometry never changes on append — that is the
    * point: tomorrow's batch dedups against today's survivors under
    * the same clusters), parquet-append into the cluster directories,
    * update the witness. The pre-append witness check makes a
    * previously-interrupted append fail loudly before compounding.
    * Contract: rows are survivors with vec_ids new to the index. */
  def appendToSemanticIndex(survivors: DataFrame, path: String): Unit = {
    val meta = readSemMeta(path)
    checkSemWitness(path, meta, "appendToSemanticIndex")
    val checked = checkedDim(survivors, meta.d, "appendToSemanticIndex")
    val assigned = assignToCentroids(checked, path, meta)
    val rows = checked.join(assigned, "vec_id").select("vec_id", "e", "cluster")
    rows.write.mode("append").partitionBy("cluster").parquet(s"$path/corpus")
    val added = rows.count()
    writeSemMeta(path, meta.copy(corpusRows = meta.corpusRows + added,
      dataFp = IndexWitness.fingerprint(path)))
  }

  /** Compact the small files nightly [[appendToSemanticIndex]] runs
    * accrete in the cluster partitions (ix01 — the
    * [[ProductQuantizer.compactPqIndex]] lifecycle): witness first,
    * compact every over-fragmented `cluster=` leaf of `corpus/`,
    * re-bless the meta. Corpus CONTENT and the maintained row count are
    * untouched — incremental dedup answers are hash-identical pre/post
    * (spec-gated). Crash between swap and re-bless = the loud
    * witness-stale state = rebuild. */
  def compactSemanticIndex(spark: org.apache.spark.sql.SparkSession,
                           path: String,
                           targetFileBytes: Long = 128L * 1024 * 1024)
      : Seq[graft.ingest.Compaction.CompactionStats] = {
    val meta = readSemMeta(path)
    checkSemWitness(path, meta, "compactSemanticIndex")
    val stats = graft.ingest.Compaction.compactPartitioned(
      spark, s"$path/corpus", targetFileBytes)
    if (stats.exists(_.compacted))
      writeSemMeta(path, meta.copy(dataFp = IndexWitness.fingerprint(path)))
    stats
  }

  /** Open a persisted semantic index for composition OUTSIDE the batch
    * dedup path (the st14 streaming replay): meta + centroid and corpus
    * frames, witness-checked loudly up front. */
  def loadSemanticIndexParts(spark: org.apache.spark.sql.SparkSession,
                             path: String): (SemIndexMeta, DataFrame, DataFrame) = {
    val meta = readSemMeta(path)
    checkSemWitness(path, meta, "loadSemanticIndexParts")
    (meta, spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/corpus"))
  }

  /** The persisted-centroid argmin as a LOCAL function over collected
    * k·d centroid rows — the streaming twin of [[assignToCentroids]]
    * (ONE definition of the assignment geometry would be ideal, but a
    * stream cannot run the relational two-stage argmin without a
    * stateful aggregation; this mirrors it exactly: micro-quantized
    * components, integer Σ(x−c)², ties → lower cluster id — all-long
    * arithmetic, so the two forms are bit-identical by construction,
    * and Session3LawsSpec-style equality is pinned in the streaming
    * spec). */
  def assignLocal(vec: Seq[Double], centroids: Map[Int, Array[Long]],
                  unitScale: Long): Int = {
    require(centroids.nonEmpty, "assignLocal: no centroids")
    val x = new Array[Long](vec.length)
    var i = 0
    while (i < vec.length) {
      x(i) = math.floor(vec(i) * unitScale + 0.5).toLong; i += 1
    }
    var best = -1; var bestD = Long.MaxValue
    centroids.keysIterator.toSeq.sorted.foreach { cl =>
      val cs = centroids(cl)
      require(cs.length == x.length,
        s"assignLocal: centroid $cl has dim ${cs.length}, vector has ${x.length}")
      var d = 0L; var j = 0
      while (j < x.length) { val dd = x(j) - cs(j); d += dd * dd; j += 1 }
      if (d < bestD) { bestD = d; best = cl }
    }
    best
  }

  /** The batch→persisted-centroid argmin, shared by the dedup and
    * append paths (one definition of the assignment geometry). */
  private def assignToCentroids(checked: DataFrame, path: String,
                                meta: SemIndexMeta): DataFrame = {
    val centroids = checked.sparkSession.read.parquet(s"$path/centroids")
    checked
      .select(col("vec_id"), posexplode(col("e")).as(Seq("dim", "__v")))
      .select(col("vec_id"), col("dim"),
        floor(col("__v") * meta.unitScale + 0.5).cast("long").as("x"))
      .join(broadcast(centroids), "dim")
      .groupBy(col("vec_id"), col("cluster"))
      .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("__dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("__dist"), col("cluster"))).as("m"))
      .select(col("vec_id"), col("m.cluster").as("cluster"))
  }

  /** Dedup a NEW batch against a [[saveSemanticIndex]] directory:
    * returns the batch rows that survive — a batch row is dropped when
    * some same-cluster corpus vector, or a lower-id same-cluster batch
    * row, has `cosine >= threshold` with it. Contract: batch vec_ids
    * are new to the index (the dd11/ir03 ingest contract). Assignment
    * runs against the PERSISTED centroids as a broadcast join — the
    * corpus is never re-clustered; only its matching cluster
    * partitions are read for the dedup join (directory-partitioned).
    * `maxClusterSize` guards the batch-side quadratic axis exactly as
    * in [[semanticDedup]].
    *
    * @return (vec_id, cluster) — surviving batch rows */
  def semanticDedupIncremental(newBatch: DataFrame, path: String,
                               threshold: Double,
                               maxClusterSize: Int = 100000): DataFrame = {
    require(maxClusterSize >= 1,
      s"maxClusterSize must be >= 1, got $maxClusterSize")
    val spark = newBatch.sparkSession
    val meta = readSemMeta(path)
    checkSemWitness(path, meta, "semanticDedupIncremental")
    val corpus = spark.read.parquet(s"$path/corpus")
    // dim-checked batch + the shared broadcast-centroid argmin (the
    // assignment stage of KMeansExact.fitMicro verbatim, against the
    // persisted geometry)
    val checked = checkedDim(newBatch, meta.d, "semanticDedupIncremental")
    val batch = checked.join(assignToCentroids(checked, path, meta), "vec_id")
    TextDedup.withWorkingSet(batch) { b =>
      val wC = org.apache.spark.sql.expressions.Window.partitionBy("cluster")
      val guarded = b
        .withColumn("__w", count(lit(1)).over(wC))
        .withColumn("vec_id",
          when(col("__w") > maxClusterSize, raise_error(concat(
            lit("semanticDedupIncremental: batch puts "), col("__w").cast("string"),
            lit(" vectors into cluster "), col("cluster").cast("string"),
            lit(s", over maxClusterSize=$maxClusterSize — split the batch or " +
              "rebuild with a larger k"))))
            .otherwise(col("vec_id")))
        .select("vec_id", "cluster", "e")
      val dupVsCorpus = guarded.select(col("cluster"), col("vec_id"), col("e"))
        .join(corpus.select(col("cluster"), col("e").as("ce")), Seq("cluster"))
        .filter(cosine_similarity(col("e"), col("ce")) >= threshold)
        .select("vec_id")
      val dupVsBatch = guarded.select(col("cluster"), col("vec_id").as("va"), col("e").as("ea"))
        .join(guarded.select(col("cluster"), col("vec_id").as("vb"), col("e").as("eb")),
          Seq("cluster"))
        .filter(col("vb") < col("va"))
        .filter(cosine_similarity(col("ea"), col("eb")) >= threshold)
        .select(col("va").as("vec_id"))
      guarded.join(dupVsCorpus.unionAll(dupVsBatch).distinct(),
          Seq("vec_id"), "left_anti")
        .select("vec_id", "cluster")
    }
  }

  /** @param maxBucketSize loud cap on the sign-bucket width — the
    *   self-join's quadratic axis (the Baskets/semanticDedup/FuzzyJoin
    *   discipline): at `bits` hyperplanes there are only 2^bits buckets,
    *   so a corpus of N vectors averages N/2^bits per bucket and each
    *   bucket emits C(width, 2) pair rows. The width check is a
    *   map-side-combined aggregate + broadcast raise (the FuzzyJoin
    *   blockGuarded shape — a count window over 2^bits partitions would
    *   sort the whole corpus on a low-cardinality key), so an over-wide
    *   bucket dies loudly — named — before any pair row materializes.
    *   Callers hitting the cap should raise `bits` (more, narrower
    *   buckets — the operator's actual scale lever), not the cap. */
  def nearDupPairs(emb: DataFrame, threshold: Double, bits: Int = 4,
                   maxBucketSize: Int = 1000000): DataFrame = {
    require(maxBucketSize >= 1, s"maxBucketSize must be >= 1, got $maxBucketSize")
    val raw = emb.select(col("vec_id"), asDouble(col("embedding")).as("e"),
      signBucket(col("embedding"), bits).as("bucket"))
    val offend = raw.groupBy("bucket")
      .agg(count(lit(1)).as("__w"))
      .filter(col("__w") > maxBucketSize)
    val b = raw.join(broadcast(offend), Seq("bucket"), "left")
      .withColumn("vec_id",
        when(col("__w").isNotNull, raise_error(concat(
          lit("nearDupPairs: bucket '"), col("bucket"), lit("' holds "),
          col("__w").cast("string"),
          lit(s" vectors, over maxBucketSize=$maxBucketSize; the in-bucket " +
            "pair join is quadratic in bucket width — raise bits (more, " +
            "narrower buckets) or the cap deliberately"))))
          .otherwise(col("vec_id")))
      .select("vec_id", "e", "bucket")
    // the guarded frame feeds BOTH self-join sides: working-set
    // materialization keeps the signBucket projection + the offend
    // aggregate/broadcast guard at ONE evaluation (the r17 fuzzy-join
    // prefix lesson, as in ImageHash.nearDupPairs)
    TextDedup.withWorkingSet(b) { g =>
      val a2 = g.select(col("vec_id").as("vec_a"), col("e").as("ea"), col("bucket"))
      val b2 = g.select(col("vec_id").as("vec_b"), col("e").as("eb"), col("bucket"))
      a2.join(b2, Seq("bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          cosine_similarity(col("ea"), col("eb")).as("score0"))
        .filter(col("score0") >= threshold)
        .select(col("vec_a"), col("vec_b"), round4(col("score0")).as("score"))
        .orderBy("vec_a", "vec_b")
    }
  }
}
