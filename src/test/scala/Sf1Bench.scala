import graft.{GraftSession, SparkEntry}

/** First sf1 (10× sf0.1) scale point (VERDICT r11 #8): run the most
  * expensive DATA-BOUND entries once against the Sf1Gen fixture and
  * print per-entry seconds, so the "would this survive a 10× scale-up"
  * claims get measured numbers. Streaming-replay (st*) and ingest (ig*)
  * entries are excluded by design: their cost is the fixed replay/
  * checkpoint harness, documented as data-size-insensitive — an sf1 run
  * of those measures the harness again, not scaling.
  *
  * Usage: `Test/runMain Sf1Bench [sf1Dir]` (default fixtures/sf1;
  * generate with `Test/runMain Sf1Gen` first). Two passes per entry,
  * floor reported; compare against BENCH_LOCAL.json sf0.1 floors.
  */
object Sf1Bench {
  // The 20 most expensive oracle entries from the round-12 sf0.1 bench
  // after dropping st*/ig* (harness-bound) — joins, aggregation-heavy
  // TPC-H shapes, the dedup suite, BPE, token packing, SCD2, ANN.
  private val Entries = Seq(
    "dd08_components", "dd02_minhash_lsh", "dd09_capped_jaccard",
    "dd03_ngram_jaccard", "tok01_bpe_tokenize", "dd06_simhash_pairs",
    "tp01_training_pipeline", "q46_tpch18_shape", "q53_tpch21_shape",
    "dd07_paragraph_dedup", "up02_scd2", "q49_tpch9_shape",
    "tp03_token_packing", "aj02_asof_next_purchase", "q36_tpch10_shape",
    "q43_tpch7_shape", "q26_similarity_ivf", "sq01_quantized_cosine",
    "zo01_zorder_key", "rj01_range_join")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(s"${sys.props("user.dir")}/fixtures/sf1")
    require(new java.io.File(sfDir, "lineitem.parquet").exists,
      s"$sfDir missing — run `Test/runMain Sf1Gen` first")
    val spark = GraftSession.builder("local[32]", "graft-sf1bench")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    // Warm-up outside the measurements: file indexes, codegen, and the
    // one-time partsupp fixture derivation at this scale point.
    SparkEntry.queries("q01_scan")(spark, sfDir).collect()
    graft.Tables(spark, sfDir).partsupp.count()

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }

    val floors = Entries.map { name =>
      val t = try Seq(once(name), once(name)).min
      catch { case e: Throwable =>
        println(s"SF1BENCH $name FAILED: ${e.getMessage.take(200)}"); -1.0 }
      println(f"SF1BENCH $name%-28s $t%8.2f s")
      name -> t
    }
    val ok = floors.filter(_._2 >= 0)
    println(f"SF1BENCH total ${ok.map(_._2).sum}%.1f s over ${ok.size} entries (floors of 2 passes)")
    spark.stop()
  }
}
