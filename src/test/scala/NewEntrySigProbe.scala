package graft

import graft.{PlanSig, SparkEntry, SparkSpec}

/** Generator for NewEntryPlanSignatureSpec's golden table (same
  * session/extraction discipline as PlanSigProbe — see its doc).
  * `Test/runMain graft.NewEntrySigProbe`. Covers the round-13 session-2
  * entries whose returned plan is a live Catalyst plan (the
  * working-set-materialized entries bottom out at a checkpoint scan
  * and have no signature to pin).
  */
object NewEntrySigProbe {
  val Names = Seq("q55_pivot", "q56_unpivot", "ct01_cohort_retention", "up04_snapshot_diff")

  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.spark
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    for (name <- Names) {
      val q = SparkEntry.allQueries.find(_.name == name).get
      println(s"SIG $name ${PlanSig.of(q.run(spark, sfDir))}")
    }
    spark.stop()
  }
}
