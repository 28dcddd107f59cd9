import graft.{GraftSession, Tables}
import graft.operators.{GlobalRank, IvfIndex, TextDedup}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 scale probe: measured evidence (not claims) that the new
  * operators hold beyond oracle scale. Run with `Test/runMain ScaleProbe`;
  * results are recorded in NOTES.md.
  */
object ScaleProbe {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[32]", "graft-scaleprobe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = Tables(spark, "/root/testdata/sf0.1")

    // --- GlobalRank: 6M-row global ranking, two-phase vs single-partition window
    val li = t.lineitem.select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .crossJoin(spark.range(10).select(col("id").as("rep")))
      .withColumn("uid", col("l_orderkey") * 100 + col("l_linenumber") + col("rep") * 1000000000L)
    val nLi = li.count()
    println(s"PROBE lineitem replicated rows = $nLi")
    timed("global row_number two-phase (6M rows)") {
      val r = GlobalRank.withGlobalRowNumber(li, Seq(col("l_extendedprice"), col("uid")),
        numPartitions = Some(64))
      assert(r.agg(max("rn")).head.getLong(0) == nLi)
    }
    timed("global row_number single-partition window (6M)") {
      val w = Window.orderBy(col("l_extendedprice"), col("uid"))
      val r = li.select(row_number().over(w).as("rn"))
      assert(r.agg(max("rn")).head.getInt(0) == nLi)
    }

    // --- connectedComponents: wide components + a deep chain
    // 50k nodes in 10k 5-cliques (shallow, the near-dup shape) plus one
    // 64-node chain (diameter 63 — worst case for label propagation).
    val cliques = spark.range(10000).flatMap { g =>
      val base = g * 5
      for (i <- 0 until 5; j <- (i + 1) until 5) yield (base + i, base + j)
    }.toDF("doc_a", "doc_b")
    val chain = spark.range(63).select((col("id") + 10000000L).as("doc_a"),
      (col("id") + 10000001L).as("doc_b"))
    timed("connectedComponents 10k cliques + 63-chain") {
      val comp = TextDedup.connectedComponents(cliques.union(chain), maxIter = 70)
      val nComp = comp.select("component").distinct().count()
      assert(nComp == 10001L, s"expected 10001 components, got $nComp")
    }

    // --- IvfIndex: build once over 200k vectors, amortized probe cost
    val emb = t.embeddings
    val big = emb.crossJoin(spark.range(20).select(col("id").as("rep")))
      .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"), col("embedding"))
    println(s"PROBE embeddings replicated rows = ${big.count()}")
    val path = java.nio.file.Files.createTempDirectory("probe-ivf").toString
    timed("IvfIndex.build+save (replicated corpus, 32 lists)") {
      IvfIndex.build(big, nLists = 32).save(path)
    }
    val idx = IvfIndex.load(spark, path)
    val probeVecs = (0 until 8).map { i =>
      emb.filter(col("vec_id") === i.toLong)
        .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    }
    timed("IvfIndex 8 probes @ nProbe=4 (1/8 of corpus each)") {
      probeVecs.foreach(v => assert(idx.search(v, 10, 4).count() == 10))
    }
    timed("brute-force 8 probes (full corpus each)") {
      probeVecs.foreach { v =>
        val pe = typedLit(v)
        val n = big.select(graft.functions.cosine_similarity(
            col("embedding").cast("array<double>"), pe).as("s"))
          .orderBy(col("s").desc).limit(10).count()
        assert(n == 10)
      }
    }

    // --- Remote queue connector: drain throughput vs poller fan-out.
    // The stub client answers instantly, so this measures the
    // connector's own machinery (partition planning, reader loop, row
    // conversion, admission accounting) — the per-message floor a real
    // service's latency sits on top of.
    {
      import graft.sources.remote.{BenchQueue, BenchQueueFactory, RemoteIngest, RemoteQueueConfig}
      for (pollers <- Seq(4, 16)) {
        BenchQueue.reset(200000)
        val cfg = RemoteQueueConfig(waitTimeSeconds = 0, maxMessages = 10,
          pollers = pollers, maxPerTrigger = 50000)
        val cp = java.nio.file.Files.createTempDirectory("probe-rq").toString
        timed(s"remote-queue drain 200k msgs, $pollers pollers") {
          val q = RemoteIngest.readStream(spark, classOf[BenchQueueFactory].getName, cfg)
            .writeStream.option("checkpointLocation", cp).format("noop").start()
          try q.processAllAvailable() finally q.stop()
        }
      }
    }
    spark.stop()
  }
}
