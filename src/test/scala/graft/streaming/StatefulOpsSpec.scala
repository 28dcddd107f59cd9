package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState keeps running counts across micro-batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val q = StatefulOps.runningCounts(ms.toDS())
      .toDF("user_id", "n")
      .writeStream.outputMode("update").format("memory").queryName("rc_out").start()
    try {
      ms.addData((1L, 0.5), (1L, 0.5), (2L, 1.0))
      q.processAllAvailable()
      ms.addData((1L, 0.5))
      q.processAllAvailable()
    } finally q.stop()
    // memory sink in update mode appends each update; take the last per key
    val last = spark.table("rc_out").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(last == Map(1L -> 3L, 2L -> 1L))
  }

  test("flatMapGroupsWithState admits at most N events per key across batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val q = StatefulOps.rateLimit(ms.toDS(), maxPerKey = 4)
      .toDF("user_id", "value")
      .writeStream.outputMode("append").format("memory").queryName("rl_out").start()
    try {
      ms.addData((1 to 3).map(i => (7L, i.toDouble)): _*)
      q.processAllAvailable()
      ms.addData((4 to 6).map(i => (7L, i.toDouble)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("rl_out").count() == 4, "only 4 of 6 events admitted")
  }
}
