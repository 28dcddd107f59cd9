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
