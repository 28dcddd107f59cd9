package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class AdaptiveControllerSpec extends SparkSpec {

  test("controller scales up on sustained sink pressure from live progress") {
    var now = 0L
    val cfg = AdaptiveConfig(cooldownMs = 0) // every sample may act
    // trigger budget 1000ms; we'll claim the sink eats most of it via
    // rowsPerTriggerTarget=1 so sourceShare saturates, and small heap.
    val ctrl = new AdaptiveController(cfg, Parallelism(2, 2),
      triggerIntervalMs = 1000000L, // huge budget => busy ~ 0 (healthy cpu)
      rowsPerTriggerTarget = 1L,    // any input saturates sourceShare
      nowMs = () => { now += 20000; now })

    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Int]
    spark.streams.addListener(ctrl)
    val q = ms.toDS().writeStream.format("memory")
      .queryName("adaptive_ctrl_out").start()
    try {
      ms.addData(1 to 100)
      q.processAllAvailable()
      ms.addData(101 to 200)
      q.processAllAvailable()
      // listener delivery is async on the event bus — await it
      val deadline = System.currentTimeMillis + 10000
      while (ctrl.recommendations.isEmpty && ctrl.parallelism.pollers <= 2 &&
          System.currentTimeMillis < deadline) Thread.sleep(50)
    } finally {
      q.stop()
      spark.streams.removeListener(ctrl)
    }
    // source saturated + healthy cpu/flush => poller scale-up fired
    assert(ctrl.parallelism.pollers > 2 || !ctrl.recommendations.isEmpty,
      s"expected scaling recommendations, got ${ctrl.parallelism}")
  }

  test("closed loop: a live recommendation actuates PollerControl and WorkerControl") {
    import graft.sources.remote.PollerControl
    var now = 0L
    val qid = "adaptive-closed-queue"
    val wid = "adaptive-closed-pipe"
    PollerControl.clear(qid); WorkerControl.clear(wid)
    val cfg = AdaptiveConfig(cooldownMs = 0)
    // saturate sourceShare with healthy cpu/flush => poller scale-up path
    val ctrl = AdaptiveController.wired(Some(qid), Some(wid), cfg, Parallelism(2, 2),
      triggerIntervalMs = 1000000L, rowsPerTriggerTarget = 1L,
      nowMs = () => { now += 20000; now })

    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[Int]
    spark.streams.addListener(ctrl)
    val q = ms.toDS().writeStream.format("memory")
      .queryName("adaptive_closed_out").start()
    try {
      ms.addData(1 to 100)
      q.processAllAvailable()
      ms.addData(101 to 200)
      q.processAllAvailable()
      val deadline = System.currentTimeMillis + 10000
      while (ctrl.recommendations.isEmpty && System.currentTimeMillis < deadline)
        Thread.sleep(50)
    } finally {
      q.stop()
      spark.streams.removeListener(ctrl)
    }
    val recs = ctrl.recommendations.toArray(Array.empty[ScalingRecommendation])
    assert(recs.nonEmpty, "expected at least one scaling recommendation")
    val rec = recs.last // controls carry the most recent action
    // the loop is CLOSED: the controls the runtime consults were updated
    assert(PollerControl.get(qid, -1) == rec.pollers,
      "PollerControl must carry the live recommendation")
    assert(WorkerControl.get(wid).contains(rec.workers),
      "WorkerControl must carry the live recommendation")
    PollerControl.clear(qid); WorkerControl.clear(wid)
  }

  test("end-to-end: a wired controller changes a LIVE queue stream's fan-out mid-run") {
    import graft.sources.remote.{FakeFactoryScale, FakeQueueService, PollerControl, RemoteIngest, RemoteQueueConfig}
    val s = FakeQueueService.state("scale")
    val qid = "adaptive-e2e-queue"
    PollerControl.clear(qid)
    var now = 0L
    // source saturated + healthy cpu => ladder rule 4 (pollers+1) fires
    // on every progress event once the cooldown (disabled) allows
    val ctrl = AdaptiveController.wired(Some(qid), None,
      AdaptiveConfig(cooldownMs = 0, maxPollers = 6), Parallelism(2, 2),
      triggerIntervalMs = 1000000L, rowsPerTriggerTarget = 1L,
      nowMs = () => { now += 20000; now })

    val cfg = RemoteQueueConfig(waitTimeSeconds = 0, maxMessages = 10,
      pollers = 2, maxPerTrigger = 100)
    var fanOuts = List.empty[Int]
    spark.streams.addListener(ctrl)
    val q = RemoteIngest.readStream(spark, classOf[FakeFactoryScale].getName,
      cfg, queueId = Some(qid))
      .writeStream.option("checkpointLocation", tmpDir("adaptive-e2e-cp"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) fanOuts :+= b.rdd.getNumPartitions
        ()
      }
      .start()
    try {
      // several micro-batches; listener events arrive async, so keep
      // feeding until a post-recommendation batch has run
      val deadline = System.currentTimeMillis + 30000
      var round = 0
      while ((fanOuts.isEmpty || fanOuts.last <= 2) && System.currentTimeMillis < deadline) {
        (1 to 20).foreach(i => s.enqueue(s"e2e-$round-$i"))
        q.processAllAvailable()
        round += 1
      }
    } finally {
      q.stop()
      spark.streams.removeListener(ctrl)
      PollerControl.clear(qid)
    }
    assert(fanOuts.nonEmpty && fanOuts.head == 2, s"first batch at config fan-out, got $fanOuts")
    assert(fanOuts.last > 2,
      s"a live recommendation must raise the running stream's fan-out, got $fanOuts")
  }

  test("snapshot derivation maps progress fields onto ladder signals") {
    val ctrl = new AdaptiveController(triggerIntervalMs = 1000L, rowsPerTriggerTarget = 100L)
    // busy fraction clamps at 1.0
    assert(ctrl.heapUtil() > 0.0 && ctrl.heapUtil() <= 1.0)
  }
}
