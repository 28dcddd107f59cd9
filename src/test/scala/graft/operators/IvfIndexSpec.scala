package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  test("build/save/load/search round-trip equals brute force at full probe") {
    val e = tables.embeddings
    val path = tmpDir("ivf-index")
    IvfIndex.build(e, nLists = 8).save(path)

    val idx = IvfIndex.load(spark, path)
    val got = idx.searchById(probeId = 3L, k = 5, nProbe = 8)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(e, probeId = 3L, k = 5)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(got == want, s"full-probe search must equal brute force: $got vs $want")
  }

  test("recall@10 rises monotonically with nProbe and is high at half-probe") {
    // The accuracy/cost dial of IVF: scanning more lists buys recall.
    // Build is seeded => the curve is deterministic. Measured on this
    // corpus (16 lists, 10 query vectors): mean recall ~0.29 @ 1 list,
    // ~0.43 @ 2, ~0.72 @ 4, ~0.89 @ 8; floors below leave margin.
    val e = tables.embeddings
    val path = tmpDir("ivf-recall")
    IvfIndex.build(e, nLists = 16).save(path)
    val idx = IvfIndex.load(spark, path)
    // ground truth does not depend on nProbe — compute once per query
    val truths = (0 until 10).map { i =>
      Similarity.bruteForceTopK(e, i.toLong, 10)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    def meanRecall(nProbe: Int): Double = {
      val rs = (0 until 10).map { i =>
        val ann = idx.searchById(i.toLong, k = 10, nProbe = nProbe)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        ann.intersect(truths(i)).size.toDouble / truths(i).size
      }
      rs.sum / rs.size
    }
    val curve = Seq(1, 2, 4, 8).map(meanRecall)
    assert(curve == curve.sorted, s"recall must not drop as nProbe grows: $curve")
    assert(curve(2) >= 0.55, s"mean recall@10 at nProbe=4 too low: ${curve(2)}")
    assert(curve(3) >= 0.75, s"mean recall@10 at nProbe=8 too low: ${curve(3)}")
  }

  test("search scans only the probed lists (parquet partition pruning)") {
    val e = tables.embeddings
    val path = tmpDir("ivf-prune")
    IvfIndex.build(e, nLists = 8).save(path)
    val idx = IvfIndex.load(spark, path)

    val probe = e.filter(col("vec_id") === 3L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val df = idx.search(probe, k = 5, nProbe = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"probe filter must prune corpus partitions:\n${plan.take(900)}")
    // drive the scan's own pruning path: the file listing under the
    // plan's partition filters must touch at most nProbe list dirs
    val scan = df.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val parts = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(parts.length <= 2, s"expected <=2 list partitions read, got ${parts.length}")
    assert(df.count() == 5)
  }

  test("size-derived defaults: sqrt-N lists clamped to corpus, fraction-based probes") {
    // The round-14 probe's conclusions, encoded (VERDICT r13 #6):
    // nLists defaults to sqrt(N); nProbe is a FRACTION of nLists (on
    // weakly-clustered embeddings recall tracks the probed fraction,
    // so an absolute nProbe silently degrades as nLists grows).
    assert(IvfIndex.defaultNLists(16) == 4)        // clamp floor
    assert(IvfIndex.defaultNLists(2) == 2)          // KMeans needs k <= N
    assert(IvfIndex.defaultNLists(20000) == 141)    // sqrt(20000) ~ 141.4
    assert(IvfIndex.defaultNLists(100000000L) == 10000)
    intercept[IllegalArgumentException](IvfIndex.defaultNLists(0))
    assert(IvfIndex.defaultNProbe(141) == 71)       // ceil(141/2)
    assert(IvfIndex.defaultNProbe(16, fraction = 1.0) == 16)
    intercept[IllegalArgumentException](IvfIndex.defaultNProbe(16, fraction = 0.0))
    // auto build on the testdata corpus: k = sqrt(N), full probe still
    // equals brute force (correctness is probe-count-independent)
    val e = tables.embeddings
    val idx = IvfIndex.build(e) // AutoNLists
    val n = e.count()
    assert(idx.centroids.length == IvfIndex.defaultNLists(n))
    val got = idx.searchById(probeId = 3L, k = 5, nProbe = idx.centroids.length)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(e, probeId = 3L, k = 5)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(got == want)
  }

  test("the build is not re-paid per search: loaded index searches without a KMeans fit") {
    val e = tables.embeddings
    val path = tmpDir("ivf-reuse")
    IvfIndex.build(e, nLists = 4).save(path)
    val idx = IvfIndex.load(spark, path)
    // two different probes against the same loaded index
    val r1 = idx.searchById(1L, k = 3, nProbe = 4).select("vec_id").as[Long].collect()
    val r2 = idx.searchById(7L, k = 3, nProbe = 4).select("vec_id").as[Long].collect()
    assert(r1.length == 3 && r2.length == 3 && !r1.contains(1L) && !r2.contains(7L))
  }
}
