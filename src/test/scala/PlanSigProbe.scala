import graft.{GraftSession, SparkEntry}

/** Prints the (shuffle-exchange count, broadcast-exchange count,
  * join-strategy multiset) signature of each TPC-H-family entry's AQE
  * FINAL plan at sf0.001 — the generator for TpchPlanSignatureSpec's
  * golden table. `Test/runMain PlanSigProbe`.
  */
object PlanSigProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", "plan-sig-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    val sfDir = "/root/testdata/sf0.001"
    val names = SparkEntry.allQueries.map(_.name)
      .filter(n => n.matches("q(3[1-9]|4[0-9]|5[0-4])_.*"))
    for (name <- names) {
      val q = SparkEntry.allQueries.find(_.name == name).get
      val df = q.run(spark, sfDir)
      df.write.mode("overwrite").format("noop").save()
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      def n(re: String) = re.r.findAllIn(plan).size
      val joins = Seq(
        "BroadcastHashJoin" -> n("BroadcastHashJoin"),
        "SortMergeJoin" -> n("SortMergeJoin"),
        "ShuffledHashJoin" -> n("ShuffledHashJoin"),
        "BroadcastNestedLoopJoin" -> n("BroadcastNestedLoopJoin"),
        "CartesianProduct" -> n("CartesianProduct"))
        .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(",")
      println(s"SIG $name shuffle=${n("Exchange (hash|range)partitioning") + n("Exchange SinglePartition")} bcast=${n("BroadcastExchange")} joins=[$joins]")
    }
    spark.stop()
  }
}
