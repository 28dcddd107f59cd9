package graft.sources.remote

import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable

/** Unit suite for the SQS protocol layer, mirroring the reference's
  * strategy of faking the `sqsAPI` seam rather than the AWS transport
  * (source_sqs_test.go:28-120 fake client; the cases below mirror
  * source_sqs_test.go:243+ and source_sqs_batch_test.go:17-349). No
  * Spark session needed: the protocol layer is plain JVM code.
  */
class SqsQueueClientSpec extends AnyFunSuite {

  private val Url = "https://sqs.test/q"

  /** Recording fake of the [[SqsApi]] seam with injectable failures. */
  private class FakeSqsApi extends SqsApi {
    var queue: List[SqsReceivedMessage] = Nil
    val receiveCalls = mutable.ListBuffer.empty[(String, Int, Int, Int, Boolean)]
    val deleteCalls = mutable.ListBuffer.empty[(String, Seq[(String, String)])]
    val visibilityCalls = mutable.ListBuffer.empty[(String, Seq[(String, String)], Int)]
    var failEntriesFor: Set[String] = Set.empty // receipt handles -> Failed entries
    var backlog: Long = 0L
    var closed = false

    override def receiveMessage(queueUrl: String, maxMessages: Int, waitTimeSeconds: Int,
                                visibilityTimeout: Int,
                                includeAttributes: Boolean): Seq[SqsReceivedMessage] = {
      receiveCalls += ((queueUrl, maxMessages, waitTimeSeconds, visibilityTimeout, includeAttributes))
      val (out, rest) = queue.splitAt(maxMessages)
      queue = rest
      out
    }

    private def run(entries: Seq[(String, String)]): Seq[SqsBatchFailure] =
      entries.collect { case (id, h) if failEntriesFor.contains(h) =>
        SqsBatchFailure(id, "ReceiptHandleIsInvalid", s"bad $h", senderFault = true)
      }

    override def deleteMessageBatch(queueUrl: String,
                                    entries: Seq[(String, String)]): Seq[SqsBatchFailure] = {
      deleteCalls += ((queueUrl, entries))
      run(entries)
    }

    override def changeMessageVisibilityBatch(queueUrl: String, entries: Seq[(String, String)],
                                              timeoutSeconds: Int): Seq[SqsBatchFailure] = {
      visibilityCalls += ((queueUrl, entries, timeoutSeconds))
      run(entries)
    }

    override def approximateNumberOfMessages(queueUrl: String): Long = backlog
    override def close(): Unit = closed = true
  }

  private def msg(i: Int) = SqsReceivedMessage(s"mid-$i", s"payload-$i", s"rh-$i")

  // -- receive (source_sqs_test.go:243 Receive_DeliversMessages) --------

  test("receive maps Body/ReceiptHandle and passes the service params through") {
    val api = new FakeSqsApi
    api.queue = List(msg(1), msg(2), msg(3))
    val c = new SqsQueueClient(api, Url)
    val got = c.receive(max = 2, waitMs = 20000, visibilityTimeoutSec = 30)
    assert(got.map(_.payload) == Seq("payload-1", "payload-2"))
    assert(got.map(_.handle) == Seq("rh-1", "rh-2"))
    assert(api.receiveCalls.toList == List((Url, 2, 20, 30, false)))
  }

  test("wait time converts ms -> whole seconds, rounded up and capped at 20") {
    val api = new FakeSqsApi
    val c = new SqsQueueClient(api, Url)
    c.receive(1, waitMs = 0, visibilityTimeoutSec = 30)
    c.receive(1, waitMs = 250, visibilityTimeoutSec = 30) // sub-second -> 1
    c.receive(1, waitMs = 25000, visibilityTimeoutSec = 30) // clamp to SQS max
    assert(api.receiveCalls.map(_._3).toList == List(0, 1, 20))
  }

  test("attributes are not requested nor surfaced unless enabled (reference default)") {
    val api = new FakeSqsApi
    api.queue = List(msg(1).copy(attributes = Map("SentTimestamp" -> "123"),
      messageAttributes = Map("k" -> "v")))
    val got = new SqsQueueClient(api, Url).receive(1, 0, 30)
    assert(api.receiveCalls.head._5 == false, "includeAttributes must not be requested")
    assert(got.head.attributes.isEmpty, "no attribute allocation when disabled")
  }

  test("includeAttributes flattens system + message attributes + MessageId") {
    // extractSQSAttributes parity (source_sqs.go:489-509): system
    // attributes and string MessageAttributes merge flat; the message id
    // lands under "MessageId".
    val api = new FakeSqsApi
    api.queue = List(msg(7).copy(
      attributes = Map("SentTimestamp" -> "123", "ApproximateReceiveCount" -> "2"),
      messageAttributes = Map("trace" -> "abc")))
    val got = new SqsQueueClient(api, Url, includeAttributes = true).receive(1, 0, 30)
    assert(api.receiveCalls.head._5 == true)
    assert(got.head.attributes == Map(
      "SentTimestamp" -> "123", "ApproximateReceiveCount" -> "2",
      "trace" -> "abc", "MessageId" -> "mid-7"))
  }

  // -- delete batch (source_sqs_batch_test.go) --------------------------

  test("deleteBatch is one service call with positional ids 0..9") {
    val api = new FakeSqsApi
    val c = new SqsQueueClient(api, Url)
    val res = c.deleteBatch((0 until 10).map(i => s"rh-$i"))
    assert(res.allOk && res.ok == 10)
    assert(api.deleteCalls.size == 1)
    assert(api.deleteCalls.head._2.map(_._1) == (0 until 10).map(_.toString))
    assert(api.deleteCalls.head._2.map(_._2) == (0 until 10).map(i => s"rh-$i"))
  }

  test("deleteBatch rejects oversized batches instead of splitting silently") {
    val c = new SqsQueueClient(new FakeSqsApi, Url)
    intercept[IllegalArgumentException] { c.deleteBatch((0 until 11).map(i => s"rh-$i")) }
  }

  test("empty and null handles are skipped; an all-empty batch is a no-op success") {
    // TestAckBatch_Empty_ReturnsNil + NilMessageSkipped + EmptyHandle_Skipped
    val api = new FakeSqsApi
    val c = new SqsQueueClient(api, Url)
    assert(c.deleteBatch(Nil) == BatchCallResult(0, Nil))
    assert(c.deleteBatch(Seq("", null, "")) == BatchCallResult(0, Nil))
    assert(api.deleteCalls.isEmpty, "no service call for an effectively-empty batch")
    val res = c.deleteBatch(Seq("rh-a", "", "rh-b"))
    assert(res.ok == 2)
    assert(api.deleteCalls.head._2 == Seq(("0", "rh-a"), ("1", "rh-b")))
  }

  test("partial delete failure maps entry ids back to handles with codes") {
    // TestAckBatch_PartialFailure_ReturnsError: the caller must learn
    // WHICH handle failed, not the request-local positional id.
    val api = new FakeSqsApi
    api.failEntriesFor = Set("rh-1", "rh-3")
    val res = new SqsQueueClient(api, Url).deleteBatch(Seq("rh-0", "rh-1", "rh-2", "rh-3"))
    assert(res.ok == 2)
    assert(res.failed == Seq(("rh-1", "ReceiptHandleIsInvalid"),
      ("rh-3", "ReceiptHandleIsInvalid")))
  }

  test("service-level delete error propagates (TestAckBatch_DeleteError)") {
    val api = new FakeSqsApi {
      override def deleteMessageBatch(q: String, e: Seq[(String, String)]) =
        throw new RuntimeException("boom")
    }
    intercept[RuntimeException] { new SqsQueueClient(api, Url).deleteBatch(Seq("rh-0")) }
  }

  // -- visibility batch -------------------------------------------------

  test("changeVisibilityBatch propagates the timeout and rejects negatives") {
    val api = new FakeSqsApi
    val c = new SqsQueueClient(api, Url)
    val res = c.changeVisibilityBatch(Seq("rh-0", "rh-1"), timeoutSec = 45)
    assert(res.allOk && res.ok == 2)
    assert(api.visibilityCalls.toList == List((Url, Seq(("0", "rh-0"), ("1", "rh-1")), 45)))
    intercept[IllegalArgumentException] { c.changeVisibilityBatch(Seq("rh-0"), -1) }
  }

  test("partial visibility failure surfaces per-entry (TestExtendVisibilityBatch_PartialFailure)") {
    val api = new FakeSqsApi
    api.failEntriesFor = Set("rh-z")
    val res = new SqsQueueClient(api, Url).changeVisibilityBatch(Seq("rh-a", "rh-z"), 30)
    assert(res.ok == 1 && res.failed == Seq(("rh-z", "ReceiptHandleIsInvalid")))
  }

  // -- dispatcher integration (chunking lives above the client) ---------

  test("25 handles ack as service calls of 10/10/5 through AckDispatcher") {
    // TestSourceSQS_AckBatchMeta_SendsAllInChunksOf10 /
    // TestAckBatch_MultipleBatches_ChunksOf10
    val api = new FakeSqsApi
    val acked = AckDispatcher.ackAll(new SqsQueueClient(api, Url),
      (0 until 25).map(i => s"rh-$i").iterator)
    assert(acked == 25)
    assert(api.deleteCalls.map(_._2.size).toList == List(10, 10, 5))
  }

  test("dispatcher fails the operation naming the first failed entry; prior chunks stay acked") {
    // TestSourceSQS_AckBatchMeta_ReturnsErrorOnFailedEntry semantics at
    // the dispatcher level: at-least-once, never half-acked silently.
    val api = new FakeSqsApi
    api.failEntriesFor = Set("rh-17")
    val e = intercept[AckDispatcher.PartialFailure] {
      AckDispatcher.ackAll(new SqsQueueClient(api, Url),
        (0 until 25).map(i => s"rh-$i").iterator)
    }
    assert(e.firstHandle == "rh-17" && e.firstCode == "ReceiptHandleIsInvalid")
    assert(api.deleteCalls.size == 2, "first chunk acked, second failed, third never sent")
  }

  test("visibility extensions chunk ≤10 through AckDispatcher.extendAll") {
    val api = new FakeSqsApi
    val n = AckDispatcher.extendAll(new SqsQueueClient(api, Url),
      (0 until 12).map(i => s"rh-$i").iterator, timeoutSec = 60)
    assert(n == 12)
    assert(api.visibilityCalls.map(_._2.size).toList == List(10, 2))
    assert(api.visibilityCalls.forall(_._3 == 60))
  }

  // -- misc --------------------------------------------------------------

  test("approximateBacklog passes through; close closes the api") {
    val api = new FakeSqsApi
    api.backlog = 1234L
    val c = new SqsQueueClient(api, Url)
    assert(c.approximateBacklog() == 1234L)
    c.close()
    assert(api.closed)
  }

  test("construction validates the queue url") {
    intercept[IllegalArgumentException] { new SqsQueueClient(new FakeSqsApi, "") }
  }

  test("factory fails fast without config") {
    // The missing-SDK branch (ClassNotFoundException -> actionable
    // IllegalStateException naming the jar) can no longer be exercised
    // here: the test classpath now carries the recorded SDK shape fakes
    // (SqsSdkGoldenSpec), so Class.forName succeeds. The missing-config
    // branch stays; the with-SDK construction path is covered end-to-end
    // by the golden spec's factory test.
    val f = new SqsQueueClientFactory
    val before = sys.props.remove("graft.sqs.queueUrl")
    try intercept[IllegalArgumentException] { f.create() }
    finally before.foreach(v => sys.props("graft.sqs.queueUrl") = v)
  }
}
