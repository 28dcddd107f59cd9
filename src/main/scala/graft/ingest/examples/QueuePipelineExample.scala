package graft.ingest.examples

import graft.GraftSession
import graft.ingest._
import graft.sources.QueueRegistry

/** Runnable end-to-end example (the reference's examples/sqs_to_s3
  * analog): queue source → JSON transform → time-partitioned snappy
  * parquet with DLQ, metrics printed at the end.
  *
  * {{{ sbt 'runMain graft.ingest.examples.QueuePipelineExample /tmp/graft-example' }}}
  */
object QueuePipelineExample {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft-example")
    val spark = GraftSession("local[4]", "queue-pipeline-example")

    val queue = QueueRegistry.get("example")
    (1 to 500).foreach(i =>
      queue.enqueue(s"""{"id": $i, "name": "item-$i", "value": ${i * 1.5}}""",
        Map("MessageId" -> s"m$i")))
    queue.enqueue("not valid json") // → dead letter

    val pipeline = IngestPipeline[Item](
      transformer = new JsonItemTransformer,
      sinkPath = s"$base/sink",
      checkpointPath = s"$base/cp",
      policy = BatchPolicy(flushIntervalMs = 0L),
      codec = "snappy",
      dlqPath = Some(s"$base/dlq"),
      retry = SimpleRetry(attempts = 3))

    val query = pipeline.start(Sources.queue(spark, "example"))
    query.processAllAvailable()
    query.stop()

    println(s"sink rows: ${spark.read.parquet(s"$base/sink").count()}")
    println(s"dlq rows:  ${spark.read.parquet(s"$base/dlq").count()}")
    println("metrics:   " + IngestMetrics.snapshot().toSeq.sorted.mkString(", "))
    spark.stop()
  }
}
