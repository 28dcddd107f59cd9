package graft.sources

import graft.SparkSpec
import graft.ingest._
import org.apache.spark.sql.streaming.StreamingQueryException

class QueueSourceSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshName(): String = { n += 1; s"qspec-${System.nanoTime()}-$n" }

  private def pipeline(sink: String, cp: String,
                       retry: SimpleRetry = SimpleRetry(sleep = _ => ())) =
    IngestPipeline[graft.ingest.Item](
      transformer = new ItemTransformer(),
      sinkPath = sink, checkpointPath = cp,
      policy = BatchPolicy(flushIntervalMs = 0L), retry = retry)

  private def json(i: Int) = s"""{"id": $i, "name": "n$i", "value": 1.5}"""

  test("messages flow from queue to parquet; ack fires when the next batch commits") {
    val name = freshName()
    val q = QueueRegistry.get(name)
    val (sink, cp) = (tmpDir("sink"), tmpDir("cp"))
    (1 to 5).foreach(i => q.enqueue(json(i), Map("MessageId" -> s"m$i")))
    assert(q.pending == 5 && q.ackedThrough == -1L)

    val query = pipeline(sink, cp).start(Sources.queue(spark, name))
    try {
      query.processAllAvailable()
      // Spark's offset-commit contract: batch N's source commit (our
      // ack) fires as batch N+1 is constructed — the ack trails the
      // durable write, never precedes it.
      assert(spark.read.parquet(sink).count() == 5, "wave 1 written")
      assert(q.ackedThrough == -1L, "no ack before the next batch")
      (6 to 8).foreach(i => q.enqueue(json(i)))
      query.processAllAvailable()
    } finally query.stop()

    assert(q.ackedThrough == 4L, "wave 1 acked once wave 2 committed")
    assert(q.pending == 3, "wave 2 still awaiting its ack")
    assert(spark.read.parquet(sink).count() == 8)
  }

  test("failed sink => NO ack: messages stay pending for redelivery") {
    val name = freshName()
    val q = QueueRegistry.get(name)
    (1 to 3).foreach(i => q.enqueue(json(i)))

    val blocker = java.nio.file.Files.createTempFile("qblock", "").toString
    val bad = pipeline(s"$blocker/sub", tmpDir("cp"))
    val query = bad.start(Sources.queue(spark, name))
    intercept[StreamingQueryException](query.processAllAvailable())
    query.stop()

    assert(q.pending == 3, "unacked messages must remain queued")
    assert(q.ackedThrough == -1L)
  }

  test("attributes travel with the envelope") {
    val name = freshName()
    val q = QueueRegistry.get(name)
    q.enqueue("payload-x", Map("MessageId" -> "abc", "ApproximateReceiveCount" -> "1"))
    val envs = Sources.queue(spark, name)
    val query = envs.writeStream.format("memory").queryName(s"qattr$n").start()
    try query.processAllAvailable() finally query.stop()
    val row = spark.table(s"qattr$n").as[Envelope].head()
    assert(row.payload == "payload-x")
    assert(row.attributes == Map("MessageId" -> "abc", "ApproximateReceiveCount" -> "1"))
  }

  test("checkpoint restart: a new query resumes from committed offsets, no loss or dupes") {
    val name = freshName()
    val q = QueueRegistry.get(name)
    val (sink, cp) = (tmpDir("sink"), tmpDir("cp"))
    (1 to 4).foreach(i => q.enqueue(json(i)))
    val q1 = pipeline(sink, cp).start(Sources.queue(spark, name))
    try {
      q1.processAllAvailable()
      (5 to 6).foreach(i => q.enqueue(json(i)))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart against the same checkpoint and queue; add one more wave
    (7 to 8).foreach(i => q.enqueue(json(i)))
    val q2 = pipeline(sink, cp).start(Sources.queue(spark, name))
    try q2.processAllAvailable() finally q2.stop()

    import spark.implicits._
    val ids = spark.read.parquet(sink).select("id").as[Long].collect().sorted.toSeq
    assert(ids == (1L to 8L), s"expected exactly-once per id in sink, got $ids")
  }

  test("concurrent producers with a live query: every message lands exactly once") {
    val name = freshName()
    val q = QueueRegistry.get(name)
    val (sink, cp) = (tmpDir("sink"), tmpDir("cp"))
    val query = pipeline(sink, cp).start(Sources.queue(spark, name))
    try {
      val threads = (0 until 4).map { t =>
        new Thread(() => (1 to 25).foreach(i => q.enqueue(json(t * 100 + i))))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      query.processAllAvailable()
    } finally query.stop()
    import spark.implicits._
    val ids = spark.read.parquet(sink).select("id").as[Long].collect().sorted.toSeq
    val expected = (for { t <- 0 until 4; i <- 1 to 25 } yield (t * 100 + i).toLong).sorted
    assert(ids == expected)
  }

  test("admission control: backlog larger than capacity drains fully in bounded batches") {
    val name = freshName()
    val q = QueueRegistry.get(name) // capacity 256
    val (sink, cp) = (tmpDir("sink"), tmpDir("cp"))
    (1 to 600).foreach(i => q.enqueue(json(i))) // elastic producer, no block
    val query = pipeline(sink, cp).start(Sources.queue(spark, name))
    try query.processAllAvailable() finally query.stop()
    import spark.implicits._
    val ids = spark.read.parquet(sink).select("id").as[Long].collect().sorted.toSeq
    assert(ids == (1L to 600L), s"expected full drain, got ${ids.size} rows")
  }
}
