package graft.sources.remote

import java.util.concurrent.atomic.AtomicLong

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** The whole connector stack over the SQS PROTOCOL layer: executor-side
  * partition readers instantiate [[SqsQueueClient]] (not a bespoke test
  * client) against an in-memory SQS-API-shaped service, so receive
  * mapping, attribute flattening, positional batch ids, chunking and
  * visibility resets are exercised through the real
  * DSv2 stream + ack dispatcher path — the integration the reference
  * proves with its fake `sqsAPI` under the full SourceSQS
  * (source_sqs_test.go:243+), here under the full RemoteQueueSource.
  */
object SqsE2EService {
  val Url = "https://sqs.fake/e2e"

  private val seq = new AtomicLong(0L)
  private[remote] val visible = mutable.Queue.empty[SqsReceivedMessage]
  private[remote] val inFlight = mutable.LinkedHashMap.empty[String, SqsReceivedMessage]
  val deleteChunks = new java.util.concurrent.CopyOnWriteArrayList[Integer]()
  val visibilityCalls = new java.util.concurrent.CopyOnWriteArrayList[(Int, Integer)]()
  val deleted = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def reset(): Unit = synchronized {
    visible.clear(); inFlight.clear(); deleteChunks.clear()
    visibilityCalls.clear(); deleted.clear()
  }

  def enqueue(n: Int): Unit = synchronized {
    (0 until n).foreach { _ =>
      val i = seq.getAndIncrement()
      visible.enqueue(SqsReceivedMessage(s"mid-$i", s"""{"n": $i}""", s"rh-$i",
        attributes = Map("ApproximateReceiveCount" -> "1")))
    }
  }

  /** The service side of the [[SqsApi]] seam. */
  final class Api extends SqsApi {
    override def receiveMessage(queueUrl: String, maxMessages: Int, waitTimeSeconds: Int,
                                visibilityTimeout: Int,
                                includeAttributes: Boolean): Seq[SqsReceivedMessage] =
      SqsE2EService.synchronized {
        require(queueUrl == Url, s"unexpected queue url $queueUrl")
        val out = (0 until math.min(maxMessages, visible.size)).map(_ => visible.dequeue())
        out.foreach(m => inFlight(m.receiptHandle) = m)
        out
      }

    override def deleteMessageBatch(queueUrl: String,
                                    entries: Seq[(String, String)]): Seq[SqsBatchFailure] =
      SqsE2EService.synchronized {
        deleteChunks.add(entries.size)
        entries.foreach { case (_, h) => inFlight.remove(h); deleted.add(h) }
        Nil
      }

    override def changeMessageVisibilityBatch(queueUrl: String, entries: Seq[(String, String)],
                                              timeoutSeconds: Int): Seq[SqsBatchFailure] =
      SqsE2EService.synchronized {
        visibilityCalls.add((entries.size, Int.box(timeoutSeconds)))
        // timeout 0 = immediately redeliverable (the reference Fail path)
        if (timeoutSeconds == 0) entries.foreach { case (_, h) =>
          inFlight.remove(h).foreach(visible.enqueue)
        }
        Nil
      }

    override def approximateNumberOfMessages(queueUrl: String): Long =
      SqsE2EService.synchronized(visible.size.toLong)
  }
}

/** Reflection-instantiated by the executor-side partition reader. */
class SqsE2EFactory extends RemoteQueueClientFactory {
  override def create(): RemoteQueueClient =
    new SqsQueueClient(new SqsE2EService.Api, SqsE2EService.Url, includeAttributes = true)
}

class SqsEndToEndSpec extends SparkSpec {

  private def cfg = RemoteQueueConfig(waitTimeSeconds = 0, maxMessages = 10,
    pollers = 3, maxPerTrigger = 1000)

  test("stream -> SqsQueueClient -> ack-after-write over the SQS protocol layer") {
    SqsE2EService.reset()
    SqsE2EService.enqueue(37)
    val cp = tmpDir("sqs-e2e-cp")
    val collected = mutable.ArrayBuffer.empty[(String, String, String)]
    val q = RemoteIngest.readStream(spark, classOf[SqsE2EFactory].getName, cfg)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // persist: without it each action re-plans the scan and re-polls
        // the (already-drained) source — the ack pass would see no rows
        val persisted = batch.persist()
        try {
          val rows = persisted.select(col("payload"), col("ack_handle"),
              element_at(col("attributes"), "MessageId").as("mid"))
            .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
          collected.synchronized { collected ++= rows }
          // ack AFTER the (stand-in) durable write, through the dispatcher
          RemoteIngest.ackAfterWrite(persisted, new SqsE2EFactory)
        } finally persisted.unpersist()
      }.start()
    try q.processAllAvailable() finally q.stop()

    assert(collected.size == 37, s"all enqueued messages arrive, got ${collected.size}")
    assert(collected.map(_._1).toSet.size == 37, "payloads are distinct")
    // attribute flattening: MessageId surfaced through the protocol layer
    assert(collected.forall(r => r._3 != null && r._3.startsWith("mid-")))
    assert(SqsE2EService.deleted.size == 37, "every message acked")
    assert(SqsE2EService.inFlight.isEmpty, "no lease left dangling")
    import scala.jdk.CollectionConverters._
    assert(SqsE2EService.deleteChunks.asScala.forall(_ <= 10),
      s"service never sees >10 entries per call: ${SqsE2EService.deleteChunks}")
  }

  test("failWithDelay resets visibility so the service redelivers (Message.Fail parity)") {
    SqsE2EService.reset()
    SqsE2EService.enqueue(12)
    import spark.implicits._
    // lease all 12 through the protocol layer, then fail them with delay 0
    val client = new SqsE2EFactory().create()
    val handles = try client.receive(10, 0, 30).map(_.handle) ++
      client.receive(10, 0, 30).map(_.handle) finally client.close()
    assert(handles.size == 12 && SqsE2EService.inFlight.size == 12)

    val failedBatch = handles.toDF("ack_handle")
    RemoteIngest.failWithDelay(failedBatch, new SqsE2EFactory, delaySec = 0)
    import scala.jdk.CollectionConverters._
    assert(SqsE2EService.visibilityCalls.asScala.map(_._1).sum == 12)
    assert(SqsE2EService.visibilityCalls.asScala.forall(_._1 <= 10), "chunked <= 10")
    assert(SqsE2EService.visibilityCalls.asScala.forall(_._2 == 0), "delay propagated")
    assert(SqsE2EService.visible.size == 12 && SqsE2EService.inFlight.isEmpty,
      "delay 0 = immediately redeliverable, nothing lost")
    intercept[IllegalArgumentException] {
      RemoteIngest.failWithDelay(failedBatch, new SqsE2EFactory, delaySec = -1)
    }
  }
}
