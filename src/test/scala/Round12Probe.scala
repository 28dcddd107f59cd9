import graft.{GraftSession, SparkEntry}

/** Round-12 probe: re-measure qr01_global_ranks' floor in isolation
  * (VERDICT r11 "Next round" #6 — its floor moved 0.52 → 0.90 s across
  * rounds 10-11 while GlobalRank.scala was untouched; the uniform
  * uplift pattern suggests host contention, but the two-rounds-running
  * trend warrants direct evidence). Run with `Test/runMain Round12Probe`;
  * results recorded in NOTES.md.
  *
  * Method: the same measurement the bench harness takes (noop sink,
  * cache cleared between passes), 6 passes of qr01 alone, plus
  * q15_window_rank (a plain windowed entry over the same orders/customer
  * tables) as a control, plus Spark job counts for one qr01 run so a
  * job-structure regression (e.g. the range shuffle being recomputed)
  * would be visible directly.
  */
object Round12Probe {
  private def timed(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"PROBE $label%-40s $s%8.2f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[32]", "graft-round12probe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    def run(name: String): Unit = {
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }

    // Warm file-index/codegen paths like the bench harness does.
    run("q01_scan")

    val qr = (1 to 6).map(i => timed(s"qr01_global_ranks pass $i")(run("qr01_global_ranks")))
    val ctl = (1 to 3).map(i => timed(s"q15_window_rank  pass $i")(run("q15_window_rank")))
    println(f"PROBE qr01 floor ${qr.min}%.2f median ${qr.sorted.apply(qr.size / 2)}%.2f")
    println(f"PROBE ctl  floor ${ctl.min}%.2f")

    // Job structure: count Spark jobs one qr01 run schedules.
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    run("qr01_global_ranks")
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    println(s"PROBE qr01 spark jobs per run: ${after - before}")
    spark.stop()
  }
}
