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

  test("streaming upsert: latest record per key survives across micro-batches") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)] // (key, version, value)
    val q = StatefulOps.latestByKeyStream(ms.toDS())(_._1, _._2)
      .toDF("key", "version", "value")
      .writeStream.outputMode("update").format("memory").queryName("up_out").start()
    try {
      ms.addData(("a", 1L, 1.0), ("a", 3L, 3.0), ("b", 1L, 10.0))
      q.processAllAvailable()
      // batch 2: an OLDER record for a must NOT displace the incumbent;
      // a genuinely newer one for b must
      ms.addData(("a", 2L, 2.0), ("b", 5L, 50.0))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("up_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // last update per key = current state
    val current = rows.zipWithIndex.groupBy(_._1._1)
      .map { case (k, vs) => k -> vs.maxBy(_._2)._1 }
    assert(current("a") == (("a", 3L, 3.0)), s"stale version must not win: ${current("a")}")
    assert(current("b") == (("b", 5L, 50.0)))
    // change-only emission: the stale batch-2 record for 'a' must not
    // produce a spurious update row (1 from batch 1, none after)
    assert(rows.count(_._1 == "a") == 1, s"expected one update for 'a', got ${rows.toSeq}")
    assert(rows.count(_._1 == "b") == 2)
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

  test("rateLimit: maxPerKey beyond Int range admits everything (clamped take)") {
    // maxPerKey - used overflows Int: an unclamped .toInt truncates to a
    // negative/tiny count and silently under-admits
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val q = StatefulOps.rateLimit(ms.toDS(), maxPerKey = Long.MaxValue)
      .toDF("user_id", "value")
      .writeStream.outputMode("append").format("memory").queryName("rl_big_out").start()
    try {
      ms.addData((1 to 5).map(i => (7L, i.toDouble)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("rl_big_out").count() == 5,
      "all 5 events must pass under an effectively-unbounded budget")
  }

  test("funnelStream: a LATE earlier-stage event re-qualifies a parked later-stage event") {
    // batch 1: click@20 arrives BEFORE any view — useless for now (stage 0)
    // batch 2: view@10 arrives late — t1=10, and the parked click@20 must
    //          now qualify (20 > 10) → stage 2. An implementation that
    //          discarded the click on arrival answers 1 and fails here.
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Int)] // (user, tsMicros, stageIdx)
    val q = StatefulOps.funnelStream(ms.toDS(), nStages = 3)
      .toDF("user_id", "stage")
      .writeStream.outputMode("update").format("memory").queryName("fn_out").start()
    try {
      ms.addData((1L, 20L, 1))
      q.processAllAvailable()
      ms.addData((1L, 10L, 0))
      q.processAllAvailable()
      // batch 3: purchase@15 sits BETWEEN view and click — strictly-after
      // rule says it does NOT complete the funnel (15 < t2=20)
      ms.addData((1L, 15L, 2))
      q.processAllAvailable()
      // batch 4: purchase@30 does
      ms.addData((1L, 30L, 2))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("fn_out").as[(Long, Int)].collect().toSeq
    assert(emitted.map(_._2) == Seq(0, 2, 3),
      s"expected stage emissions 0 (parked click), 2 (late view cascades), 3: $emitted")
  }

  test("funnelStream: same-timestamp next stage does not qualify; non-funnel registers stage 0") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Int)]
    val q = StatefulOps.funnelStream(ms.toDS(), nStages = 2)
      .toDF("user_id", "stage")
      .writeStream.outputMode("update").format("memory").queryName("fn_out2").start()
    try {
      ms.addData((1L, 10L, 0), (1L, 10L, 1), (2L, 5L, -1))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("fn_out2").as[(Long, Int)].collect()
      .groupBy(_._1).map { case (u, vs) => u -> vs.last._2 }
    assert(last == Map(1L -> 1, 2L -> 0),
      s"strictly-after must reject ts==t1; non-funnel user registers at 0: $last")
  }
}
