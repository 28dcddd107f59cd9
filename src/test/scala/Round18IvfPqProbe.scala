import graft.GraftSession
import graft.operators.ProductQuantizer

import org.apache.spark.sql.functions._

/** Round-18 scale probe for the persisted IVF-PQ index (pq06/pq07):
  * the economics the r17 verdict asked the persistence to buy, at
  * 1,000,000 64-dim vectors —
  *
  *   - the coarse+residual fit is paid ONCE (saveIvfPqIndex);
  *   - an indexed probe reads ONLY its nProbe/kCoarse list partitions
  *     of the code table (literal partition filters), so per-query
  *     cost tracks the probed fraction, not the corpus;
  *   - ADC distances are pruning-independent: candidates shared
  *     between a 2-list probe and an all-list probe must carry
  *     IDENTICAL integer distances (the ProductQuantizerSpec
  *     invariant, asserted here at 1M).
  *
  * Flat persisted PQ (savePqIndex/adcTopKIndexed) runs alongside as
  * the no-pruning comparison point. `Test/runMain Round18IvfPqProbe`.
  */
object Round18IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-ivfpq-probe18")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    val n = 1000000L
    // deterministic pseudo-random embeddings with 16 planted cluster
    // offsets (near-random per-dim noise + a cluster shift, so the
    // coarse quantizer has real structure to find)
    val emb = spark.range(n).toDF("vec_id")
      .select(col("vec_id"),
        expr("""transform(sequence(1, 64), j -> CAST(
          pmod(xxhash64(vec_id, j), 1000) / 1000.0
          + (CASE WHEN pmod(CAST(j AS BIGINT), 16) = pmod(vec_id, 16) THEN 2.0 ELSE 0.0 END)
          AS FLOAT))""").as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"PROBE18P corpus: ${emb.count()} vectors x 64 dims")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val ivfDir = java.nio.file.Files.createTempDirectory("probe18-ivfpq").toString
    val (_, tBuild) = timed {
      ProductQuantizer.saveIvfPqIndex(emb, d = 64, m = 4, kCoarse = 16,
        coarseIterations = 2, kPq = 16, pqIterations = 1, path = ivfDir)
    }
    println(f"PROBE18P saveIvfPqIndex (1M, kCoarse=16, m=4, kPq=16): $tBuild%.1f s (once)")

    val flatDir = java.nio.file.Files.createTempDirectory("probe18-pq").toString
    val (_, tFlat) = timed {
      ProductQuantizer.savePqIndex(emb, d = 64, m = 4, k = 16, iterations = 1,
        path = flatDir)
    }
    println(f"PROBE18P savePqIndex (flat, same corpus): $tFlat%.1f s (once)")

    val probeIds = (0 until 10).map(_ * 97L)
    def probeOf(id: Long) =
      emb.filter(col("vec_id") === id).select("vec_id", "embedding")

    // warm one probe each (plan/codegen), then time 10
    ProductQuantizer.ivfPqTopKIndexed(probeOf(13L), ivfDir, topK = 10, nProbe = 2).count()
    ProductQuantizer.adcTopKIndexed(probeOf(13L), flatDir, topK = 10).count()

    val (_, tIvf) = timed {
      probeIds.foreach(id => ProductQuantizer
        .ivfPqTopKIndexed(probeOf(id), ivfDir, topK = 10, nProbe = 2).collect())
    }
    val (_, tAdc) = timed {
      probeIds.foreach(id => ProductQuantizer
        .adcTopKIndexed(probeOf(id), flatDir, topK = 10).collect())
    }
    println(f"PROBE18P 10 indexed probes: IVF-PQ (2 of 16 lists) $tIvf%.1f s " +
      f"(${tIvf / 10}%.2f s/probe) vs flat ADC full-scan $tAdc%.1f s " +
      f"(${tAdc / 10}%.2f s/probe)")

    // what the pruning actually buys — bytes read from the code table
    // per probe (the 100 TB lever; at 1M rows the per-probe fixed job
    // machinery dominates wall-clock, so bytes are the honest metric)
    val dfNarrow = ProductQuantizer.ivfPqTopKIndexed(probeOf(13L), ivfDir,
      topK = 10, nProbe = 2)
    val scan = dfNarrow.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.find(_.relation.location.rootPaths.exists(_.toString.contains("codes"))).get
    val staticFilters = scan.partitionFilters.filterNot(_.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    val readParts = scan.relation.location.listFiles(staticFilters, scan.dataFilters)
    val readBytes = readParts.flatMap(_.files.map(_.getLen)).sum
    val allBytes = scan.relation.location.listFiles(Nil, Nil)
      .flatMap(_.files.map(_.getLen)).sum
    println(f"PROBE18P code-table bytes per probe: $readBytes%,d of $allBytes%,d " +
      f"(${readParts.length} of 16 list partitions — the nProbe/kCoarse fraction " +
      "a 100 TB index would read)")

    // ...and what the PERSISTENCE buys: the pre-pq06 alternative was
    // ivfPqTopK's per-call refit of BOTH codebooks (the r17 'weak')
    val (_, tInline) = timed {
      ProductQuantizer.ivfPqTopK(emb, probeId = 13L, topK = 10, d = 64, m = 4,
        kCoarse = 16, coarseIterations = 2, kPq = 16, pqIterations = 1,
        nProbe = 2).collect()
    }
    println(f"PROBE18P inline ivfPqTopK (per-call refit, the pre-index form): " +
      f"$tInline%.1f s PER QUERY vs ${tIvf / 10}%.2f s indexed — " +
      f"${tInline / (tIvf / 10)}%.0fx amortized away by saveIvfPqIndex")

    // pruning-independence of ADC distances, at 1M: candidates shared
    // between narrow and full probes carry identical integer distances
    val narrow = ProductQuantizer.ivfPqTopKIndexed(probeOf(13L), ivfDir,
      topK = 10, nProbe = 2).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = ProductQuantizer.ivfPqTopKIndexed(probeOf(13L), ivfDir,
      topK = 1000, nProbe = 16).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shared = narrow.keySet & full.keySet
    assert(shared.nonEmpty && shared.forall(k => narrow(k) == full(k)),
      "a candidate's ADC distance must not depend on how many lists were probed")
    println(s"PROBE18P pruning-independence: ${shared.size} shared candidates, " +
      "identical integer distances at nProbe=2 vs 16")

    new scala.reflect.io.Directory(new java.io.File(ivfDir)).deleteRecursively()
    new scala.reflect.io.Directory(new java.io.File(flatDir)).deleteRecursively()
    spark.stop()
  }
}
