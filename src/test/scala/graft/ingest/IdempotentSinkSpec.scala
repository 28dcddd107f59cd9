package graft.ingest

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.sources.QueueRegistry
import org.apache.spark.sql.Dataset

class IdempotentSinkSpec extends SparkSpec {

  test("once runs the body the first time and skips the replay") {
    val markers = tmpDir("idem-markers")
    val runs = new AtomicInteger(0)
    assert(IdempotentSink.once(spark, markers, 7L) { runs.incrementAndGet() })
    assert(!IdempotentSink.once(spark, markers, 7L) { runs.incrementAndGet() })
    assert(runs.get() == 1, "replayed batch body must not re-run")
    assert(IdempotentSink.once(spark, markers, 8L) { runs.incrementAndGet() })
    assert(runs.get() == 2)
    assert(IdempotentSink.committedBatches(spark, markers) == Seq(7L, 8L))
  }

  test("marker is written AFTER the body: a failing body stays uncommitted") {
    val markers = tmpDir("idem-fail")
    intercept[RuntimeException] {
      IdempotentSink.once(spark, markers, 1L) { throw new RuntimeException("sink down") }
    }
    assert(IdempotentSink.committedBatches(spark, markers).isEmpty)
    // the retry (same batchId) runs because nothing was committed
    assert(IdempotentSink.once(spark, markers, 1L) { () })
  }

  test("foreachBatch pipeline with once: duplicate-delivery of a batch writes exactly once") {
    val name = s"idem-${System.nanoTime()}"
    val q = QueueRegistry.get(name)
    (1 to 5).foreach(i => q.enqueue(s"""{"id": $i, "name": "n$i", "value": 1.0}"""))
    val (sink, markers) = (tmpDir("idem-sink"), tmpDir("idem-m"))

    def writeBatch(b: Dataset[Envelope], id: Long): Unit =
      IdempotentSink.once(spark, markers, id) {
        b.write.mode("append").json(sink)
      }

    val query = Sources.queue(spark, name).writeStream
      .option("checkpointLocation", tmpDir("idem-cp"))
      .foreachBatch { (b: Dataset[Envelope], id: Long) =>
        writeBatch(b, id)
        // simulate the crash-replay: Spark re-invokes the SAME batch id
        writeBatch(b, id)
      }
      .start()
    try query.processAllAvailable() finally query.stop()

    assert(spark.read.json(sink).count() == 5, "double delivery must not duplicate rows")
  }
}
