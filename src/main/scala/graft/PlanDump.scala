package graft

/** Debug utility: print the physical plan of named SparkEntry queries
  * against sf0.01 — `runMain graft.PlanDump q40_tpch19_shape ...`.
  * The per-operator plan review (pushdown reached the scan? join
  * broadcast-able? shuffle count right?) runs through this.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "plan-dump").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    val sf = "/root/testdata/sf0.01"
    for (name <- args) {
      val q = SparkEntry.allQueries.find(_.name == name).get
      println(s"===== $name =====")
      println(q.run(spark, sf).queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
