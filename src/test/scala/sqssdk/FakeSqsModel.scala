// GOLDEN SHAPE RECORDING of the public AWS SDK for Java v2 SQS surface
// (software.amazon.awssdk:sqs 2.x), as published in the AWS SDK API
// reference. TEST-ONLY: these classes exist so ReflectiveSqsApi /
// SqsQueueClientFactory — which bind the real SDK reflectively and
// therefore compile with zero AWS dependency — can be exercised against
// the exact method names, arities and parameter types the published SDK
// exposes. If the binder drifts from this recorded surface (or an SDK
// upgrade renames a method, updated here), SqsSdkGoldenSpec fails at
// test time instead of the binder failing at first production call.
//
// Only the members the binder touches are recorded; signatures mirror
// the SDK docs exactly (boxed Integer setters, String... varargs with
// Collection overloads, static builder() entry points).
package software.amazon.awssdk.services.sqs.model {

  import java.util.{ArrayList => JArrayList, Collection => JCollection, HashMap => JHashMap, List => JList, Map => JMap}

  final class MessageAttributeValue(val stringValueV: String) {
    def stringValue(): String = stringValueV
  }

  final class Message(
      val messageIdV: String, val bodyV: String, val receiptHandleV: String,
      val attributesAsStringsV: JMap[String, String],
      val messageAttributesV: JMap[String, MessageAttributeValue]) {
    def messageId(): String = messageIdV
    def body(): String = bodyV
    def receiptHandle(): String = receiptHandleV
    def attributesAsStrings(): JMap[String, String] = attributesAsStringsV
    def messageAttributes(): JMap[String, MessageAttributeValue] = messageAttributesV
  }

  final class ReceiveMessageRequest(
      val queueUrlV: String, val maxNumberOfMessagesV: Integer,
      val waitTimeSecondsV: Integer, val visibilityTimeoutV: Integer,
      val attributeNamesV: JList[String], val messageAttributeNamesV: JList[String])
  object ReceiveMessageRequest {
    def builder(): Builder = new Builder
    final class Builder {
      private var queueUrlF: String = _
      private var maxF: Integer = _
      private var waitF: Integer = _
      private var visF: Integer = _
      private val attrNames = new JArrayList[String]
      private val msgAttrNames = new JArrayList[String]
      def queueUrl(v: String): Builder = { queueUrlF = v; this }
      def maxNumberOfMessages(v: Integer): Builder = { maxF = v; this }
      def waitTimeSeconds(v: Integer): Builder = { waitF = v; this }
      def visibilityTimeout(v: Integer): Builder = { visF = v; this }
      def attributeNamesWithStrings(v: Array[String]): Builder =
        { v.foreach(attrNames.add); this }
      def attributeNamesWithStrings(v: JCollection[String]): Builder =
        { attrNames.addAll(v); this }
      def messageAttributeNames(v: Array[String]): Builder =
        { v.foreach(msgAttrNames.add); this }
      def messageAttributeNames(v: JCollection[String]): Builder =
        { msgAttrNames.addAll(v); this }
      def build(): ReceiveMessageRequest = new ReceiveMessageRequest(
        queueUrlF, maxF, waitF, visF, attrNames, msgAttrNames)
    }
  }

  final class ReceiveMessageResponse(val messagesV: JList[Message]) {
    def messages(): JList[Message] = messagesV
  }

  final class BatchResultErrorEntry(
      val idV: String, val codeV: String, val messageV: String,
      val senderFaultV: java.lang.Boolean) {
    def id(): String = idV
    def code(): String = codeV
    def message(): String = messageV
    def senderFault(): java.lang.Boolean = senderFaultV
  }

  final class DeleteMessageBatchRequestEntry(val idV: String, val receiptHandleV: String)
  object DeleteMessageBatchRequestEntry {
    def builder(): Builder = new Builder
    final class Builder {
      private var idF: String = _
      private var handleF: String = _
      def id(v: String): Builder = { idF = v; this }
      def receiptHandle(v: String): Builder = { handleF = v; this }
      def build(): DeleteMessageBatchRequestEntry =
        new DeleteMessageBatchRequestEntry(idF, handleF)
    }
  }

  final class DeleteMessageBatchRequest(
      val queueUrlV: String, val entriesV: JList[DeleteMessageBatchRequestEntry])
  object DeleteMessageBatchRequest {
    def builder(): Builder = new Builder
    final class Builder {
      private var queueUrlF: String = _
      private val entriesF = new JArrayList[DeleteMessageBatchRequestEntry]
      def queueUrl(v: String): Builder = { queueUrlF = v; this }
      def entries(v: JCollection[DeleteMessageBatchRequestEntry]): Builder =
        { entriesF.addAll(v); this }
      def entries(v: Array[DeleteMessageBatchRequestEntry]): Builder =
        { v.foreach(entriesF.add); this }
      def build(): DeleteMessageBatchRequest =
        new DeleteMessageBatchRequest(queueUrlF, entriesF)
    }
  }

  final class DeleteMessageBatchResponse(val failedV: JList[BatchResultErrorEntry]) {
    def failed(): JList[BatchResultErrorEntry] = failedV
  }

  final class ChangeMessageVisibilityBatchRequestEntry(
      val idV: String, val receiptHandleV: String, val visibilityTimeoutV: Integer)
  object ChangeMessageVisibilityBatchRequestEntry {
    def builder(): Builder = new Builder
    final class Builder {
      private var idF: String = _
      private var handleF: String = _
      private var visF: Integer = _
      def id(v: String): Builder = { idF = v; this }
      def receiptHandle(v: String): Builder = { handleF = v; this }
      def visibilityTimeout(v: Integer): Builder = { visF = v; this }
      def build(): ChangeMessageVisibilityBatchRequestEntry =
        new ChangeMessageVisibilityBatchRequestEntry(idF, handleF, visF)
    }
  }

  final class ChangeMessageVisibilityBatchRequest(
      val queueUrlV: String, val entriesV: JList[ChangeMessageVisibilityBatchRequestEntry])
  object ChangeMessageVisibilityBatchRequest {
    def builder(): Builder = new Builder
    final class Builder {
      private var queueUrlF: String = _
      private val entriesF = new JArrayList[ChangeMessageVisibilityBatchRequestEntry]
      def queueUrl(v: String): Builder = { queueUrlF = v; this }
      def entries(v: JCollection[ChangeMessageVisibilityBatchRequestEntry]): Builder =
        { entriesF.addAll(v); this }
      def entries(v: Array[ChangeMessageVisibilityBatchRequestEntry]): Builder =
        { v.foreach(entriesF.add); this }
      def build(): ChangeMessageVisibilityBatchRequest =
        new ChangeMessageVisibilityBatchRequest(queueUrlF, entriesF)
    }
  }

  final class ChangeMessageVisibilityBatchResponse(val failedV: JList[BatchResultErrorEntry]) {
    def failed(): JList[BatchResultErrorEntry] = failedV
  }

  final class GetQueueAttributesRequest(
      val queueUrlV: String, val attributeNamesV: JList[String])
  object GetQueueAttributesRequest {
    def builder(): Builder = new Builder
    final class Builder {
      private var queueUrlF: String = _
      private val attrNames = new JArrayList[String]
      def queueUrl(v: String): Builder = { queueUrlF = v; this }
      def attributeNamesWithStrings(v: Array[String]): Builder =
        { v.foreach(attrNames.add); this }
      def attributeNamesWithStrings(v: JCollection[String]): Builder =
        { attrNames.addAll(v); this }
      def build(): GetQueueAttributesRequest =
        new GetQueueAttributesRequest(queueUrlF, attrNames)
    }
  }

  final class GetQueueAttributesResponse(val attributesAsStringsV: JMap[String, String]) {
    def attributesAsStrings(): JMap[String, String] = attributesAsStringsV
  }

  /** Convenience constructors for spec fixtures (not part of the SDK shape). */
  object TestFixtures {
    def message(id: String, body: String, handle: String,
                sysAttrs: Map[String, String],
                msgAttrs: Map[String, String],
                binaryAttrKeys: Set[String] = Set.empty): Message = {
      val sa = new JHashMap[String, String]; sysAttrs.foreach { case (k, v) => sa.put(k, v) }
      val ma = new JHashMap[String, MessageAttributeValue]
      msgAttrs.foreach { case (k, v) => ma.put(k, new MessageAttributeValue(v)) }
      // a binary attribute surfaces with stringValue() == null in the SDK
      binaryAttrKeys.foreach(k => ma.put(k, new MessageAttributeValue(null)))
      new Message(id, body, handle, sa, ma)
    }
    def errorEntry(id: String, code: String, msg: String, sender: Boolean): BatchResultErrorEntry =
      new BatchResultErrorEntry(id, code, msg, java.lang.Boolean.valueOf(sender))
  }
}

// The client + builder entry points, same recording rules as the model
// package above (SqsClient.builder().region(Region).endpointOverride(URI)
// .build() and the four service calls the binder makes).
package software.amazon.awssdk.services.sqs {

  import java.util.{ArrayList => JArrayList, List => JList}
  import software.amazon.awssdk.services.sqs.model._

  final class SqsClient {
    import SqsClient._
    def receiveMessage(req: ReceiveMessageRequest): ReceiveMessageResponse = {
      recordedReceives.add(req)
      new ReceiveMessageResponse(cannedMessages)
    }
    def deleteMessageBatch(req: DeleteMessageBatchRequest): DeleteMessageBatchResponse = {
      recordedDeletes.add(req)
      new DeleteMessageBatchResponse(cannedDeleteFailures)
    }
    def changeMessageVisibilityBatch(
        req: ChangeMessageVisibilityBatchRequest): ChangeMessageVisibilityBatchResponse = {
      recordedVisibilities.add(req)
      new ChangeMessageVisibilityBatchResponse(cannedVisibilityFailures)
    }
    def getQueueAttributes(req: GetQueueAttributesRequest): GetQueueAttributesResponse = {
      recordedGetAttrs.add(req)
      val m = new java.util.HashMap[String, String]
      cannedQueueAttributes.foreach { case (k, v) => m.put(k, v) }
      new GetQueueAttributesResponse(m)
    }
    def close(): Unit = SqsClient.closed = true
  }

  object SqsClient {
    def builder(): Builder = new Builder
    final class Builder {
      def region(r: software.amazon.awssdk.regions.Region): Builder =
        { recordedRegion = Option(r); this }
      def endpointOverride(uri: java.net.URI): Builder =
        { recordedEndpoint = Option(uri); this }
      def build(): SqsClient = new SqsClient
    }

    // Test-control state (reset per spec): canned responses + recorded requests.
    var cannedMessages: JList[Message] = new JArrayList
    var cannedDeleteFailures: JList[BatchResultErrorEntry] = new JArrayList
    var cannedVisibilityFailures: JList[BatchResultErrorEntry] = new JArrayList
    var cannedQueueAttributes: Map[String, String] = Map.empty
    val recordedReceives = new JArrayList[ReceiveMessageRequest]
    val recordedDeletes = new JArrayList[DeleteMessageBatchRequest]
    val recordedVisibilities = new JArrayList[ChangeMessageVisibilityBatchRequest]
    val recordedGetAttrs = new JArrayList[GetQueueAttributesRequest]
    var recordedRegion: Option[software.amazon.awssdk.regions.Region] = None
    var recordedEndpoint: Option[java.net.URI] = None
    var closed = false
    def reset(): Unit = {
      cannedMessages = new JArrayList
      cannedDeleteFailures = new JArrayList
      cannedVisibilityFailures = new JArrayList
      cannedQueueAttributes = Map.empty
      recordedReceives.clear(); recordedDeletes.clear()
      recordedVisibilities.clear(); recordedGetAttrs.clear()
      recordedRegion = None; recordedEndpoint = None; closed = false
    }
  }
}

package software.amazon.awssdk.regions {
  final class Region private (val idV: String) { def id(): String = idV }
  object Region { def of(v: String): Region = new Region(v) }
}
