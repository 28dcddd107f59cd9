import graft.{PlanSig, SparkEntry, SparkSpec}

/** Prints each TPC-H-family entry's AQE FINAL-plan signature — the
  * generator for TpchPlanSignatureSpec's golden table, running on the
  * SAME shared session the spec uses (identical confs, so generated
  * numbers are reproducible by the checker) and through the same
  * [[graft.PlanSig]] extraction. `Test/runMain PlanSigProbe`.
  */
object PlanSigProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    val names = SparkEntry.allQueries.map(_.name)
      .filter(_.matches("q(3[1-9]|4[0-9]|5[0-4])_.*"))
    for (name <- names) {
      val q = SparkEntry.allQueries.find(_.name == name).get
      println(s"SIG $name ${PlanSig.of(q.run(spark, sfDir))}")
    }
    spark.stop()
  }
}
