import graft.GraftSession
import graft.operators.IvfIndex

import org.apache.spark.sql.functions._

/** Round-14 IVF sizing probe (VERDICT r13 #6): nLists=16/nProbe=10 was
  * tuned for the ~2k-row testdata; this measures how the √N-lists
  * heuristic behaves at the sf1 scale point (fixtures/sf1 embeddings,
  * 20k vectors x 64 dims) so IvfIndex.build's size-derived default is
  * grounded in a measurement, not folklore.
  *
  * Grid: nLists ∈ {16, 64, 256} x probed fraction ∈ {1/16, 1/4, 1/2}.
  * For each cell: recall@5 vs the brute-force oracle averaged over 20
  * deterministic probe vectors, plus the summed search wall time and
  * the per-search scanned-row bound (corpus rows in probed lists).
  * Build time is recorded per nLists. Results -> NOTES.md.
  * `Test/runMain Round14IvfProbe`.
  */
object Round14IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-ivf-probe14")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    import spark.implicits._

    val emb = spark.read.parquet(s"${sys.props("user.dir")}/fixtures/sf1/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .persist()
    val n = emb.count()
    println(s"PROBE corpus n=$n dims=${emb.head().getSeq[Double](1).size} sqrtN=${math.round(math.sqrt(n.toDouble))}")

    // 20 deterministic probes spread across replicas (ids are
    // 0..1999 + r*1e7 by Sf1Gen construction).
    val probeIds = (0 until 20).map(i => (i % 10) * 10000000L + (i * 97L) % 2000)
    val probes: Map[Long, Array[Double]] = emb
      .filter(col("vec_id").isin(probeIds: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    require(probes.size == probeIds.size, s"probe ids missing: got ${probes.size}")

    // Brute-force oracle: top-5 by cosine (excluding self) per probe.
    def cosTop5(pe: Array[Double]): Seq[Long] = {
      val lit = typedLit(pe)
      emb.select(col("vec_id"),
          graft.functions.cosine_similarity(col("embedding"), lit).as("s"))
        .orderBy(col("s").desc, col("vec_id"))
        .limit(6).as[(Long, Double)].collect().map(_._1).toSeq
    }
    val truth: Map[Long, Set[Long]] = probes.map { case (id, pe) =>
      id -> cosTop5(pe).filterNot(_ == id).take(5).toSet
    }
    println(s"PROBE oracle built for ${truth.size} probes")

    for (nLists <- Seq(16, 64, 256)) {
      val t0 = System.nanoTime()
      val idx = IvfIndex.build(emb, nLists = nLists, seed = 42L)
      idx.corpus.persist().count()
      val buildS = (System.nanoTime() - t0) / 1e9
      // list occupancy: rows per list bounds the per-search scan
      val occ = idx.corpus.groupBy("list_id").count()
        .agg(min("count"), avg("count"), max("count")).head()
      println(f"PROBE nLists=$nLists%4d build=$buildS%6.1f s occupancy min=${occ.getLong(0)} avg=${occ.getDouble(1)}%.0f max=${occ.getLong(2)}")
      for (frac <- Seq(1.0 / 16, 1.0 / 4, 1.0 / 2)) {
        val nProbe = math.max(1, math.ceil(nLists * frac).toInt)
        val t1 = System.nanoTime()
        var hits = 0
        var scanned = 0L
        for ((id, pe) <- probes) {
          val got = idx.search(pe, k = 6, nProbe = nProbe)
            .as[(Long, Double)].collect().map(_._1).filterNot(_ == id).take(5).toSet
          hits += got.intersect(truth(id)).size
        }
        val searchS = (System.nanoTime() - t1) / 1e9
        val recall = hits.toDouble / (5 * probes.size)
        println(f"PROBE nLists=$nLists%4d nProbe=$nProbe%4d (frac=$frac%.3f) recall@5=$recall%.3f searchTotal=$searchS%6.1f s (${probes.size} probes)")
      }
      idx.corpus.unpersist()
    }
    spark.stop()
  }
}
