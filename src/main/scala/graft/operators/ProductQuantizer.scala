package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the standard compression
  * rung for ANN at corpus scales where raw vectors do not fit:
  * split each d-dim vector into `m` contiguous subvectors, learn a
  * small codebook per subspace, and represent a vector by its m
  * nearest-centroid ids — N·m small ints instead of N·d floats (64-dim
  * float32 → 4 bytes of codes at m=4/k=4 is a 64× memory cut).
  * Search uses ASYMMETRIC DISTANCE (ADC): the probe stays exact, a
  * per-subspace probe→centroid distance table (m·k entries) is
  * precomputed once, and each candidate's approximate distance is m
  * table lookups summed — no vector arithmetic per candidate.
  *
  * Determinism discipline ([[KMeansExact]] applied per subspace):
  * components quantize to micro-units, per-subspace Lloyd runs in
  * exact integer arithmetic (distances Σ(x−c)², centroid update
  * sum DIV count, argmin ties → lower cluster id, init = the k
  * smallest ids' subvectors), so codes, ADC tables, and the final
  * top-k are bit-identical across engines and partitionings — a full
  * hash oracle, not a recall band.
  *
  * Scale shape: training joins the long-form (id, sub, j, x) frame —
  * materialized ONCE — against m·k·(d/m) broadcast centroid rows per
  * iteration; codes are one (id, sub)-keyed argmin. ADC search joins
  * the N·m code table against the m·k broadcast lookup table and
  * reduces per id: one shuffle on id, then TakeOrderedAndProject.
  * Nothing collects.
  */
object ProductQuantizer {

  /** Per-subspace codebooks + codes.
    * @param emb (vec_id, embedding) rows
    * @param d   dimensionality; must be divisible by m
    * @param m   number of subspaces
    * @param k   centroids per subspace
    * @return (codes, centroids): codes = (id, sub, cluster) — m rows
    *         per vector; centroids = (sub, cluster, j, c) — the
    *         geometry the codes were assigned against */
  def fitCodes(emb: DataFrame, d: Int, m: Int, k: Int, iterations: Int,
               unitScale: Long = 1000000L): (DataFrame, DataFrame) = {
    require(m >= 1 && d % m == 0, s"d=$d must be divisible by m=$m")
    val subDim = d / m
    val v = emb
      .select(col("vec_id").as("id"), posexplode(col("embedding")).as(Seq("dim", "__v")))
      .select(col("id"), (col("dim") / subDim).cast("int").as("sub"),
        (col("dim") % subDim).cast("int").as("j"),
        floor(col("__v").cast("double") * unitScale + 0.5).cast("long").as("x"))
    fitCodesFromLong(v, emb.select(col("vec_id").as("id")), k, iterations)
  }

  /** The Lloyd core over an ALREADY-INTEGER long form (id, sub, j, x) —
    * shared by [[fitCodes]] (micro-quantized raw vectors) and the
    * IVF-PQ residual path ([[ivfPqTopK]]: residuals are differences of
    * micro-units, already exact integers). `ids` supplies the id
    * universe for the smallest-k init. */
  private[operators] def fitCodesFromLong(v: DataFrame, ids: DataFrame,
                                          k: Int, iterations: Int): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    // the working-set persist discipline by hand: this returns a
    // (codes, centroids) PAIR, which withWorkingSet's DataFrame
    // signature cannot carry — both results are round-checkpointed
    // before the unpersist, so the lifetime contract is identical
    val eagerHere = TextDedup.eagerMode(v.sparkSession)
    val vw = if (eagerHere)
      v.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) else v
    try {
      val smallK = ids.orderBy("id").limit(k)
        .withColumn("cluster",
          (row_number().over(Window.orderBy("id")) - 1).cast("int"))
      require(smallK.count() == k, s"product quantizer needs at least k=$k vectors")
      var centroids = vw.join(broadcast(smallK), "id")
        .select(col("sub"), col("cluster"), col("j"), col("x").as("c"))
        .transform(TextDedup.roundCheckpoint)
      var codes: DataFrame = null
      var used: DataFrame = null
      for (_ <- 1 to iterations) {
        used = centroids
        val dists = vw.join(broadcast(centroids), Seq("sub", "j"))
          .groupBy(col("id"), col("sub"), col("cluster"))
          .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("__dist"))
        codes = dists
          .groupBy("id", "sub")
          .agg(min(struct(col("__dist"), col("cluster"))).as("m"))
          .select(col("id"), col("sub"), col("m.cluster").as("cluster"))
          .transform(TextDedup.roundCheckpoint)
        val updated = vw.join(codes, Seq("id", "sub"))
          .groupBy("sub", "cluster", "j")
          .agg(expr("sum(x) DIV count(1)").as("c_new"))
        centroids = centroids
          .join(updated, Seq("sub", "cluster", "j"), "left")
          .select(col("sub"), col("cluster"), col("j"),
            coalesce(col("c_new"), col("c")).as("c"))
          .transform(TextDedup.roundCheckpoint)
      }
      (codes, used)
    } finally if (eagerHere) vw.unpersist()
  }

  // ---------------------------------------------------------------
  // Persisted PQ index — the production path (ivf_loaded / ir04 /
  // sd02 discipline): the fit runs ONCE; a query reads the N·m code
  // table plus the m·k·(d/m) centroid rows, builds the probe's ADC
  // lookup table, and reduces — no vector arithmetic per candidate,
  // no re-fit, and the raw embeddings are not read at all (the 64×
  // memory cut is realized at QUERY time, which is the point of PQ).
  // ---------------------------------------------------------------

  private val MetaFile = "_graft_pq_index.properties"

  final case class PqIndexMeta(d: Int, m: Int, k: Int, iterations: Int,
                               unitScale: Long, codeRows: Long)

  private def writeMeta(path: String, meta: PqIndexMeta): Unit = {
    val p = new java.util.Properties()
    p.setProperty("d", meta.d.toString); p.setProperty("m", meta.m.toString)
    p.setProperty("k", meta.k.toString)
    p.setProperty("iterations", meta.iterations.toString)
    p.setProperty("unitScale", meta.unitScale.toString)
    p.setProperty("codeRows", meta.codeRows.toString)
    val dir = java.nio.file.Paths.get(path)
    val tmp = java.nio.file.Files.createTempFile(dir, "." + MetaFile, ".tmp")
    val out = java.nio.file.Files.newOutputStream(tmp)
    try p.store(out, "graft pq index") finally out.close()
    java.nio.file.Files.move(tmp, dir.resolve(MetaFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def readMeta(path: String): PqIndexMeta = {
    val f = java.nio.file.Paths.get(path, MetaFile)
    require(java.nio.file.Files.exists(f),
      s"$path has no $MetaFile — not a graft pq index; build with savePqIndex")
    val p = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(f)
    try p.load(in) finally in.close()
    def prop(k: String): String = {
      val v = p.getProperty(k)
      require(v != null, s"$path/$MetaFile is missing '$k' — corrupt; rebuild")
      v
    }
    PqIndexMeta(prop("d").toInt, prop("m").toInt, prop("k").toInt,
      prop("iterations").toInt, prop("unitScale").toLong, prop("codeRows").toLong)
  }

  /** Fit + persist: `codes/` (N·m rows) and `centroids/`, with an
    * atomic meta carrying the parameters and a code-row witness. */
  def savePqIndex(emb: DataFrame, d: Int, m: Int, k: Int, iterations: Int,
                  path: String, unitScale: Long = 1000000L): Unit = {
    val (codes, centroids) = fitCodes(emb, d, m, k, iterations, unitScale)
    codes.write.mode("overwrite").parquet(s"$path/codes")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    val n = emb.sparkSession.read.parquet(s"$path/codes").count()
    writeMeta(path, PqIndexMeta(d, m, k, iterations, unitScale, n))
  }

  /** ADC top-k against a PERSISTED index: `probe` is ONE (vec_id,
    * embedding) row — its id is excluded from candidates (pass an id
    * absent from the index to search with an external vector). The
    * probe's dimensionality is a loud per-row contract against the
    * index meta; a stale index (interrupted build) fails loudly via
    * the code-row witness. */
  def adcTopKIndexed(probe: DataFrame, path: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val spark = probe.sparkSession
    val meta = readMeta(path)
    val codes = spark.read.parquet(s"$path/codes")
    val actual = codes.count()
    require(actual == meta.codeRows,
      s"$path: index has $actual code rows but meta records ${meta.codeRows} — " +
        "stale index from an interrupted build; rebuild with savePqIndex")
    val centroids = spark.read.parquet(s"$path/centroids")
    val subDim = meta.d / meta.m
    val pv = probe
      .select(col("vec_id"),
        when(size(col("embedding")) =!= meta.d, raise_error(concat(
          lit("adcTopKIndexed: probe embedding of length "),
          size(col("embedding")).cast("string"),
          lit(s" does not match the index dimensionality d=${meta.d}"))))
          .otherwise(col("embedding")).as("embedding"))
      .select(col("vec_id").as("__pid"),
        posexplode(col("embedding")).as(Seq("dim", "__v")))
      .select(col("__pid"), (col("dim") / subDim).cast("int").as("sub"),
        (col("dim") % subDim).cast("int").as("j"),
        floor(col("__v").cast("double") * meta.unitScale + 0.5).cast("long").as("px"))
    val table = centroids.join(broadcast(pv), Seq("sub", "j"))
      .groupBy("sub", "cluster", "__pid")
      .agg(sum((col("px") - col("c")) * (col("px") - col("c"))).as("pdist"))
    codes
      .join(broadcast(table), Seq("sub", "cluster"))
      .filter(col("id") =!= col("__pid"))
      .groupBy(col("id").as("vec_id"))
      .agg(sum("pdist").as("dist_u"))
      .orderBy(col("dist_u"), col("vec_id"))
      .limit(topK)
  }

  /** IVF-PQ (Jégou et al.'s IVFADC — the standard billion-scale ANN
    * stack, composed from the house pieces): a coarse integer k-means
    * ([[KMeansExact.fitMicro]]) partitions the corpus into lists; the
    * product quantizer is trained on the RESIDUALS (vector − assigned
    * coarse centroid — exact integer differences of micro-units, so
    * determinism survives the composition); a probe visits only its
    * `nProbe` nearest lists, and candidates there are scored by ADC
    * over the residual codes with a PER-LIST lookup table (the probe's
    * residual differs per list).
    *
    * Scale shape: search touches nProbe/kCoarse of the code table
    * (list-pruned — IVF's lever) and does m lookups per candidate
    * (PQ's lever); the only candidate-sized work is one id-keyed sum.
    * Every stage is the already-gated machinery of km01 + pq01 —
    * this entry proves they COMPOSE (the er01 precedent).
    *
    * @return (vec_id, dist_u) top-`topK` by integer ADC distance
    *         ascending, vec_id tie-break, probe excluded */
  def ivfPqTopK(emb: DataFrame, probeId: Long, topK: Int, d: Int, m: Int,
                kCoarse: Int, coarseIterations: Int,
                kPq: Int, pqIterations: Int, nProbe: Int,
                unitScale: Long = 1000000L): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(nProbe >= 1 && nProbe <= kCoarse,
      s"nProbe must be in [1, kCoarse=$kCoarse], got $nProbe")
    require(m >= 1 && d % m == 0, s"d=$d must be divisible by m=$m")
    val subDim = d / m
    val (coarseAssign, coarseCentroids) = KMeansExact.fitMicro(
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      d = d, k = kCoarse, iterations = coarseIterations, unitScale = unitScale)
    val v = emb
      .select(col("vec_id").as("id"), posexplode(col("embedding")).as(Seq("dim", "__v")))
      .select(col("id"), col("dim"),
        floor(col("__v").cast("double") * unitScale + 0.5).cast("long").as("x"))
    // residuals against the ASSIGNED coarse centroid, already integer
    val rv = v
      .join(coarseAssign.select(col("id"), col("cluster").as("__cc")), "id")
      .join(broadcast(coarseCentroids.select(col("cluster").as("__cc"),
        col("dim"), col("c"))), Seq("__cc", "dim"))
      .select(col("id"), (col("dim") / subDim).cast("int").as("sub"),
        (col("dim") % subDim).cast("int").as("j"),
        (col("x") - col("c")).as("x"))
    val (codes, residCentroids) =
      fitCodesFromLong(rv, emb.select(col("vec_id").as("id")), kPq, pqIterations)
    // probe's nProbe nearest coarse lists (exact integer distance over
    // kCoarse broadcast rows — orderBy/limit on a k-row frame)
    val pv = v.filter(col("id") === probeId).select(col("dim"), col("x").as("px"))
    val probed = coarseCentroids.join(broadcast(pv), "dim")
      .groupBy(col("cluster").as("__cc"))
      .agg(sum((col("px") - col("c")) * (col("px") - col("c"))).as("__cdist"))
      .orderBy(col("__cdist"), col("__cc"))
      .limit(nProbe)
      .select("__cc")
    // per-list probe residuals → per-list ADC tables over the residual
    // codebooks (nProbe·m·kPq rows — broadcast-tiny)
    val prx = coarseCentroids
      .join(broadcast(probed.withColumnRenamed("__cc", "cluster")), "cluster")
      .join(broadcast(pv), "dim")
      .select(col("cluster").as("__cc"),
        (col("dim") / subDim).cast("int").as("sub"),
        (col("dim") % subDim).cast("int").as("j"),
        (col("px") - col("c")).as("rx"))
    val table = prx
      .join(broadcast(residCentroids.select(col("sub"), col("cluster"), col("j"),
        col("c"))), Seq("sub", "j"))
      .groupBy("__cc", "sub", "cluster")
      .agg(sum((col("rx") - col("c")) * (col("rx") - col("c"))).as("pdist"))
    // candidates: codes of vectors living in the probed lists
    codes
      .join(coarseAssign.select(col("id"), col("cluster").as("__cc")), "id")
      .join(broadcast(probed), Seq("__cc"), "left_semi")
      .filter(col("id") =!= probeId)
      .join(broadcast(table), Seq("__cc", "sub", "cluster"))
      .groupBy(col("id").as("vec_id"))
      .agg(sum("pdist").as("dist_u"))
      .orderBy(col("dist_u"), col("vec_id"))
      .limit(topK)
  }

  /** ADC top-k: the `topK` nearest candidates to `probeId` by PQ
    * distance (sum of per-subspace probe→centroid distances under the
    * candidate's codes), ascending, vec_id tie-break, probe excluded.
    * @return (vec_id, dist_u) — dist_u the exact integer ADC distance */
  def adcTopK(emb: DataFrame, probeId: Long, topK: Int,
              d: Int, m: Int, k: Int, iterations: Int,
              unitScale: Long = 1000000L): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val subDim = d / m
    val (codes, centroids) = fitCodes(emb, d, m, k, iterations, unitScale)
    // exact probe subvectors → the m·k ADC lookup table, in one
    // aggregate over broadcast-joined centroid rows
    val probe = emb.filter(col("vec_id") === probeId)
      .select(posexplode(col("embedding")).as(Seq("dim", "__v")))
      .select((col("dim") / subDim).cast("int").as("sub"),
        (col("dim") % subDim).cast("int").as("j"),
        floor(col("__v").cast("double") * unitScale + 0.5).cast("long").as("px"))
    val table = centroids.join(broadcast(probe), Seq("sub", "j"))
      .groupBy("sub", "cluster")
      .agg(sum((col("px") - col("c")) * (col("px") - col("c"))).as("pdist"))
    codes.filter(col("id") =!= probeId)
      .join(broadcast(table), Seq("sub", "cluster"))
      .groupBy(col("id").as("vec_id"))
      .agg(sum("pdist").as("dist_u"))
      .orderBy(col("dist_u"), col("vec_id"))
      .limit(topK)
  }
}
