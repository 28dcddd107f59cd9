package graft.sources

import graft.SparkSpec
import graft.ingest.Sources
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Full-stack integration: custom queue source → declarative JSON parse
  * → event-time tumbling window with watermark → memory sink. The
  * ingestion layer and the analytics layer are the same engine — this
  * is the streaming-unification story end-to-end over our own source.
  */
class QueueToAnalyticsE2ESpec extends SparkSpec {
  import spark.implicits._

  test("queue -> json -> watermarked window aggregation") {
    val name = s"e2e-${System.nanoTime()}"
    val q = QueueRegistry.get(name)
    def ev(ts: String, v: Double) = s"""{"ts": "$ts", "value": $v}"""

    q.enqueue(ev("2024-01-01 10:00:10", 1.0))
    q.enqueue(ev("2024-01-01 10:00:40", 2.0))
    q.enqueue(ev("2024-01-01 10:05:10", 4.0))

    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    val parsed = Sources.queue(spark, name)
      .select(from_json(col("payload"), schema).as("j"))
      .select(col("j.ts").as("ts"), col("j.value").as("value"))
    val agg = StreamingOps.tumblingCounts(parsed, "ts", "1 minute", "10 minutes")
    val query = agg.writeStream.outputMode("append")
      .format("memory").queryName("qe2e_out").start()
    try {
      query.processAllAvailable()
      // advance the watermark so the 10:00 and 10:05 windows close
      q.enqueue(ev("2024-01-01 11:00:00", 0.0))
      query.processAllAvailable()
      val out = spark.table("qe2e_out")
        .select($"w".cast("string"), $"n", $"sv").as[(String, Long, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(out("2024-01-01 10:00:00") == ((2L, 3.0)))
      assert(out("2024-01-01 10:05:00") == ((1L, 4.0)))
    } finally query.stop()
  }
}
