package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark drops late rows in tumbling window aggregation") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Double)]
    val events = ms.toDS().toDF("ts", "value")
    val agg = StreamingOps.tumblingCounts(events, "ts", "1 minute", "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("tumbling_out").start()
    try {
      // two on-time rows in the 10:00 window
      ms.addData((ts("2024-01-01 10:00:10"), 1.0), (ts("2024-01-01 10:00:40"), 2.0))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window (event 11:00 ⇒ wm 10:50)
      ms.addData((ts("2024-01-01 11:00:00"), 5.0))
      q.processAllAvailable()
      // too late: before the watermark — must be discarded, not re-emitted
      ms.addData((ts("2024-01-01 10:00:50"), 100.0))
      q.processAllAvailable()

      val out = spark.table("tumbling_out")
        .select($"w".cast("string"), $"n", $"sv").as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(out.contains("2024-01-01 10:00:00"))
      val (n, sv) = out("2024-01-01 10:00:00")
      assert(n == 2L && sv == 3.0, "late row must not contribute")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes cross-batch duplicates") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val events = ms.toDS().toDF("event_id", "ts")
    val dedup = StreamingOps.dedupWithinWatermark(events, "ts", "10 minutes", Seq("event_id"))
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      ms.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:30")))
      q.processAllAvailable()
      ms.addData((1L, ts("2024-01-01 10:01:00"))) // duplicate within watermark
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream interval join matches in-band pairs and drops out-of-band ones") {
    implicit val ctx = spark.sqlContext
    val msL = MemoryStream[(Long, Timestamp, String)]
    val msR = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingOps.intervalJoin(
      msL.toDS().toDF("k", "lts", "tag"),
      msR.toDS().toDF("k", "rts", "price"),
      key = "k", leftTs = "lts", rightTs = "rts",
      band = "5 minutes", watermark = "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      msL.addData((1L, ts("2024-01-01 10:00:00"), "a"), (2L, ts("2024-01-01 10:00:00"), "b"))
      msR.addData(
        (1L, ts("2024-01-01 10:03:00"), 10.0),  // in band (+3m)
        (1L, ts("2024-01-01 10:20:00"), 20.0),  // out of band (+20m)
        (2L, ts("2024-01-01 09:56:00"), 30.0),  // in band (-4m)
        (3L, ts("2024-01-01 10:00:00"), 40.0))  // key with no left side
      q.processAllAvailable()
      val out = spark.table("ssj_out").select($"tag", $"price")
        .as[(String, Double)].collect().toSet
      assert(out == Set(("a", 10.0), ("b", 30.0)), s"got $out")
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched left rows after the watermark closes") {
    implicit val ctx = spark.sqlContext
    val msL = MemoryStream[(Long, Timestamp, String)]
    val msR = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingOps.intervalJoin(
      msL.toDS().toDF("k", "lts", "tag"), msR.toDS().toDF("k", "rts", "price"),
      "k", "lts", "rts", "5 minutes", "10 minutes", joinType = "leftOuter")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer").start()
    try {
      msL.addData((1L, ts("2024-01-01 10:00:00"), "matched"),
        (2L, ts("2024-01-01 10:00:00"), "lonely"))
      msR.addData((1L, ts("2024-01-01 10:02:00"), 7.0))
      q.processAllAvailable()
      // push both watermarks far past the band so the unmatched row finalizes
      msL.addData((9L, ts("2024-01-01 12:00:00"), "wm"))
      msR.addData((9L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      msL.addData((9L, ts("2024-01-01 13:00:00"), "wm2"))
      msR.addData((9L, ts("2024-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      val out = spark.table("ssj_outer").select($"tag", $"price")
        .as[(String, Option[Double])].collect().toMap
      assert(out("matched").contains(7.0))
      assert(out.contains("lonely") && out("lonely").isEmpty,
        s"unmatched left row must emit null-padded, got $out")
    } finally q.stop()
  }

  test("stream-stream join state is bounded: plan carries watermarks on both sides") {
    implicit val ctx = spark.sqlContext
    val msL = MemoryStream[(Long, Timestamp, String)]
    val msR = MemoryStream[(Long, Timestamp, Double)]
    val joined = StreamingOps.intervalJoin(
      msL.toDS().toDF("k", "lts", "tag"), msR.toDS().toDF("k", "rts", "price"),
      "k", "lts", "rts", "5 minutes", "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_state").start()
    try {
      msL.addData((1L, ts("2024-01-01 10:00:00"), "x"))
      msR.addData((1L, ts("2024-01-01 10:01:00"), 1.0))
      q.processAllAvailable()
      val progress = q.lastProgress
      assert(progress.stateOperators.nonEmpty, "join must run as a stateful operator")
      // both watermark columns present in the analyzed plan => state GC eligible
      assert(joined.queryExecution.analyzed.toString.toLowerCase.contains("watermark"))
    } finally q.stop()
  }

  test("session windows split on gap in streaming mode") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, Timestamp)]
    val events = ms.toDS().toDF("user_id", "ts")
    val sess = StreamingOps.sessionCounts(events, "ts", "user_id", "10 minutes", "10 minutes")
    val q = sess.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      ms.addData((7L, ts("2024-01-01 10:00:00")), (7L, ts("2024-01-01 10:05:00")),
        (7L, ts("2024-01-01 10:30:00")))
      q.processAllAvailable()
      ms.addData((7L, ts("2024-01-01 12:00:00"))) // push watermark, close sessions
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .select($"session_start".cast("string"), $"n").as[(String, Long)].collect().toMap
      assert(out("2024-01-01 10:00:00") == 2L) // merged pair
      assert(out("2024-01-01 10:30:00") == 1L) // split by >10min gap
    } finally q.stop()
  }
}
