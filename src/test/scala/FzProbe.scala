import graft.{GraftSession, SparkEntry}

/** Round-17 timing probe for the fuzzy-join family at a chosen SF —
  * quantifies the block-guard cost and the guarded-prefix
  * materialization fix. `Test/runMain FzProbe [sfDir]`. */
object FzProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "graft-fz-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    val entries = Seq("fz02_qgram_join", "fz04_jw_threshold_join",
      "er01_entity_resolution", "dd05_embedding_neardup")
    for (pass <- 1 to 2; e <- entries) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(e)(spark, sfDir).count()
      println(f"FZPROBE pass $pass $e%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s ($n rows)")
    }
    spark.stop()
  }
}
