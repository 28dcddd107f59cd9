package graft.ingest

import graft.SparkSpec
import graft.sources.QueueRegistry
import org.apache.spark.sql.DataFrame

class GracefulShutdownSpec extends SparkSpec {

  private def json(i: Int) = s"""{"id": $i, "name": "n$i", "value": 1.5}"""

  test("stopAndFlush drains the final batch within the budget and reports clean stop") {
    val name = s"gs-ok-${System.nanoTime()}"
    val q = QueueRegistry.get(name)
    (1 to 6).foreach(i => q.enqueue(json(i)))
    val sink = tmpDir("gs-sink")
    val pipe = IngestPipeline[Item](
      transformer = new ItemTransformer(),
      sinkPath = sink, checkpointPath = tmpDir("gs-cp"),
      policy = BatchPolicy(flushIntervalMs = 0L))
    val query = pipe.start(Sources.queue(spark, name))

    val clean = GracefulShutdown.stopAndFlush(query, timeoutMs = 30000L)
    assert(clean, "drain should finish well inside the budget")
    assert(!query.isActive)
    assert(spark.read.parquet(sink).count() == 6, "final flush wrote the buffered batch")
  }

  test("a flush slower than the budget forces the stop and counts a shutdown timeout") {
    val name = s"gs-slow-${System.nanoTime()}"
    val q = QueueRegistry.get(name)
    q.enqueue(json(1))
    val before = IngestMetrics.snapshot().getOrElse(GracefulShutdown.ShutdownTimeouts, 0.0)

    val query = Sources.queue(spark, name).writeStream
      .option("checkpointLocation", tmpDir("gs-slow-cp"))
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Envelope], _: Long) =>
        b.count() // materialize, then stall the flush
        Thread.sleep(5000L)
      }
      .start()
    val clean = GracefulShutdown.stopAndFlush(query, timeoutMs = 300L)
    assert(!clean, "stall must exceed the budget")
    assert(!query.isActive, "query force-stopped after the timeout")
    val after = IngestMetrics.snapshot().getOrElse(GracefulShutdown.ShutdownTimeouts, 0.0)
    assert(after >= before + 1.0, "forced shutdown must be counted")
  }
}
