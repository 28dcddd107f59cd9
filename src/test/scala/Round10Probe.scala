import graft.{GraftSession, SparkEntry}

/** Round-10 probe: re-measure dd04_simhash's floor in isolation
  * (VERDICT r9 "What's wrong" #2 — its floor moved 1.56 -> 1.93 between
  * the round-8 and round-9 driver runs while TextDedup.scala itself was
  * untouched all round). Run with `Test/runMain Round10Probe`; results
  * recorded in NOTES.md.
  *
  * Method: the same measurement the bench harness takes (noop sink, cache
  * cleared between passes), but with nothing else competing in the JVM —
  * 6 passes of dd04 alone, plus dd06 (same fingerprint pipeline + pair
  * join) as a control, plus the executed plan so a plan-shape change
  * from round 9's Tables/GraftSession work would be visible directly.
  */
object Round10Probe {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[32]", "graft-round10probe")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    def run(name: String): Unit = {
      val q = SparkEntry.allQueries.find(_.name == name).get
      q.run(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
    }

    // Warm-up outside the measurement, as the bench harness does.
    run("q01_scan")

    for (pass <- 1 to 6) timed(s"dd04_simhash pass $pass")(run("dd04_simhash"))
    for (pass <- 1 to 3) timed(s"dd06_simhash_pairs pass $pass")(run("dd06_simhash_pairs"))

    val q = SparkEntry.allQueries.find(_.name == "dd04_simhash").get
    println("===== dd04_simhash executed plan =====")
    println(q.run(spark, sfDir).queryExecution.executedPlan.toString.take(6000))

    spark.stop()
  }
}
