package graft.sources.remote

/** One message as returned by the SQS ReceiveMessage API: body, receipt
  * handle, message id, system attributes (SentTimestamp,
  * ApproximateReceiveCount, ...) and user message attributes.
  * String-typed message attributes only — binary attributes have no
  * natural string representation and are skipped by the extraction,
  * matching the reference (source_sqs.go:489-509 extractSQSAttributes).
  */
final case class SqsReceivedMessage(messageId: String,
                                    body: String,
                                    receiptHandle: String,
                                    attributes: Map[String, String] = Map.empty,
                                    messageAttributes: Map[String, String] = Map.empty)

/** One failed entry of a DeleteMessageBatch / ChangeMessageVisibilityBatch
  * response (BatchResultErrorEntry): the request-entry `id`, the service
  * error `code`, and whether the fault was the sender's. */
final case class SqsBatchFailure(id: String, code: String,
                                 message: String, senderFault: Boolean)

/** The narrow SQS service surface the connector consumes — the direct
  * analog of the reference's `sqsAPI` seam (source_sqs.go:116-121),
  * which is the boundary its entire test suite fakes
  * (source_sqs_test.go:28-120). Implementations: [[ReflectiveSqsApi]]
  * binds the public AWS SDK v2 `SqsClient` at runtime; tests implement
  * it directly (no SDK required), exactly as the reference fakes
  * `sqsAPI` rather than the AWS transport.
  *
  * All operations are synchronous and throw on transport error. Entries
  * are (id, receiptHandle) pairs; ids need only be unique within one
  * request (source_sqs.go:19-21).
  */
trait SqsApi extends AutoCloseable {
  def receiveMessage(queueUrl: String, maxMessages: Int, waitTimeSeconds: Int,
                     visibilityTimeout: Int, includeAttributes: Boolean): Seq[SqsReceivedMessage]
  def deleteMessageBatch(queueUrl: String, entries: Seq[(String, String)]): Seq[SqsBatchFailure]
  def changeMessageVisibilityBatch(queueUrl: String, entries: Seq[(String, String)],
                                   timeoutSeconds: Int): Seq[SqsBatchFailure]
  /** GetQueueAttributes ApproximateNumberOfMessages. */
  def approximateNumberOfMessages(queueUrl: String): Long
  override def close(): Unit = ()
}

/** Production [[RemoteQueueClient]] over Amazon SQS: the protocol layer
  * between the connector's contract and the [[SqsApi]] service seam.
  * Mirrors the reference's SourceSQS behaviors
  * (source/source_sqs.go):
  *
  *   - receive maps Body/ReceiptHandle and, when `includeAttributes`,
  *     flattens system attributes + string MessageAttributes + the
  *     MessageId (under "MessageId") into one map (:489-509); when
  *     disabled, no attribute data is requested at all (:70-76);
  *   - deleteBatch/changeVisibilityBatch send one service call per
  *     invocation with positional entry ids "0".."9" (:19-36) — the
  *     connector's [[AckDispatcher]] owns chunking to ≤ 10, and this
  *     client REJECTS oversized batches rather than silently splitting
  *     (the service would: BatchRequestTooLong);
  *   - empty handles are skipped, empty effective batches are no-op
  *     successes (:356-357, :441-443);
  *   - partial failures surface per-entry (handle, code) so the
  *     dispatcher can fail the operation naming the first entry
  *     (:365-371) — senderFault distinguishes poison entries from
  *     service throttling in the error code.
  *
  * One instance per partition reader, executor-side, like every
  * [[RemoteQueueClient]]; closing closes the underlying api.
  */
final class SqsQueueClient(api: SqsApi, queueUrl: String,
                           includeAttributes: Boolean = false) extends RemoteQueueClient {
  require(queueUrl.nonEmpty, "queue url is required")

  override def receive(max: Int, waitMs: Long,
                       visibilityTimeoutSec: Int): Seq[QueueMessage] = {
    // SQS wait granularity is whole seconds, 0-20 (the connector's
    // RemoteQueueConfig already validates its own envelope).
    val waitSec = math.min(20L, (waitMs + 999) / 1000).toInt
    api.receiveMessage(queueUrl, max, waitSec, visibilityTimeoutSec, includeAttributes)
      .map { m =>
        val attrs =
          if (!includeAttributes) Map.empty[String, String]
          else m.attributes ++ m.messageAttributes ++
            (if (m.messageId.nonEmpty) Map("MessageId" -> m.messageId) else Map.empty)
        QueueMessage(m.body, attrs, m.receiptHandle)
      }
  }

  override def deleteBatch(handles: Seq[String]): BatchCallResult =
    batchCall(handles)(entries => api.deleteMessageBatch(queueUrl, entries))

  override def changeVisibilityBatch(handles: Seq[String],
                                     timeoutSec: Int): BatchCallResult = {
    require(timeoutSec >= 0, "timeoutSeconds must be non-negative")
    batchCall(handles)(entries =>
      api.changeMessageVisibilityBatch(queueUrl, entries, timeoutSec))
  }

  private def batchCall(handles: Seq[String])
                       (call: Seq[(String, String)] => Seq[SqsBatchFailure]): BatchCallResult = {
    require(handles.size <= RemoteQueueConfig.MaxBatchEntries,
      s"batch of ${handles.size} exceeds the service limit of " +
        s"${RemoteQueueConfig.MaxBatchEntries}; chunk via AckDispatcher")
    // Positional ids, empty handles skipped (reference :337-357).
    val entries = handles.filter(h => h != null && h.nonEmpty)
      .zipWithIndex.map { case (h, i) => (i.toString, h) }
    if (entries.isEmpty) return BatchCallResult(0, Nil)
    val failed = call(entries)
    val byId = entries.toMap
    BatchCallResult(entries.size - failed.size,
      failed.map(f => (byId.getOrElse(f.id, f.id), f.code)))
  }

  override def approximateBacklog(): Long = api.approximateNumberOfMessages(queueUrl)

  override def close(): Unit = api.close()
}

/** Runtime binder from [[SqsApi]] to the public AWS SDK v2 `SqsClient`
  * (software.amazon.awssdk:sqs), resolved reflectively so the engine
  * compiles and tests with ZERO AWS dependency: the SDK jar is needed
  * only on the cluster that actually talks to SQS, exactly like Spark's
  * own optional-integration pattern (e.g. its reflective Hive/cloud
  * committers). The bound surface is the same four calls the reference
  * makes over its injected client (source_sqs.go:204-247 receive,
  * :320-418 delete batch, :421-465 visibility batch) plus
  * GetQueueAttributes for backlog probing.
  *
  * Request construction uses the SDK's string-keyed variants
  * (`attributeNamesWithStrings`, `attributesAsStrings`) to avoid
  * reflecting over SDK enums. Any mismatch with the provided client
  * object fails fast with the offending method name.
  *
  * The protocol layer above this seam is what carries the tested
  * behavior; this binder is intentionally dumb — one reflective call
  * per [[SqsApi]] method, no retries, no state.
  */
final class ReflectiveSqsApi(client: AnyRef) extends SqsApi {
  require(client != null, "sqs client is required")

  private val Pkg = "software.amazon.awssdk.services.sqs.model"

  private def cls(name: String): Class[_] = Class.forName(s"$Pkg.$name")

  /** newBuilder("ReceiveMessageRequest") -> builder object. */
  private def builder(requestClass: String): AnyRef =
    cls(requestClass).getMethod("builder").invoke(null)

  /** Invoke a builder/accessor method by name, selecting among
    * overloads by argument-type compatibility (the SDK builders pair
    * `String...` varargs with `Collection` overloads); fails with the
    * method name on mismatch. */
  private def call(target: AnyRef, method: String, args: AnyRef*): AnyRef = {
    def compatible(p: Class[_], a: AnyRef): Boolean = {
      if (a == null) !p.isPrimitive
      else {
        val boxed: Class[_] = p match {
          case java.lang.Integer.TYPE => classOf[java.lang.Integer]
          case java.lang.Long.TYPE => classOf[java.lang.Long]
          case java.lang.Boolean.TYPE => classOf[java.lang.Boolean]
          case other => other
        }
        boxed.isAssignableFrom(a.getClass)
      }
    }
    val m = target.getClass.getMethods.find(m =>
      m.getName == method && m.getParameterCount == args.length &&
        m.getParameterTypes.zip(args).forall { case (p, a) => compatible(p, a) })
      .getOrElse(throw new NoSuchMethodException(
        s"${target.getClass.getName}.$method(${args.map(a => if (a == null) "null"
          else a.getClass.getSimpleName).mkString(", ")}) — AWS SDK v2 sqs jar " +
          "missing or incompatible"))
    m.setAccessible(true) // builder impls are package-private classes
    m.invoke(target, args: _*)
  }

  private def build(b: AnyRef): AnyRef = call(b, "build")

  private def asScalaList(l: AnyRef): Seq[AnyRef] = {
    import scala.jdk.CollectionConverters._
    l.asInstanceOf[java.util.List[AnyRef]].asScala.toSeq
  }

  private def asScalaMap(m: AnyRef): Map[AnyRef, AnyRef] = {
    import scala.jdk.CollectionConverters._
    m.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala.toMap
  }

  private def str(o: AnyRef): String = if (o == null) "" else o.toString

  override def receiveMessage(queueUrl: String, maxMessages: Int, waitTimeSeconds: Int,
                              visibilityTimeout: Int,
                              includeAttributes: Boolean): Seq[SqsReceivedMessage] = {
    var b = builder("ReceiveMessageRequest")
    b = call(b, "queueUrl", queueUrl)
    b = call(b, "maxNumberOfMessages", Int.box(maxMessages))
    b = call(b, "waitTimeSeconds", Int.box(waitTimeSeconds))
    b = call(b, "visibilityTimeout", Int.box(visibilityTimeout))
    if (includeAttributes) {
      b = call(b, "attributeNamesWithStrings", Array("All"))
      b = call(b, "messageAttributeNames", Array("All"))
    }
    val out = call(client, "receiveMessage", build(b))
    asScalaList(call(out, "messages")).map { m =>
      val sysAttrs =
        if (!includeAttributes) Map.empty[String, String]
        else asScalaMap(call(m, "attributesAsStrings"))
          .map { case (k, v) => str(k) -> str(v) }
      val msgAttrs =
        if (!includeAttributes) Map.empty[String, String]
        else asScalaMap(call(m, "messageAttributes")).flatMap { case (k, v) =>
          // stringValue is set for String and Number types; binary skipped
          Option(call(v, "stringValue")).map(sv => str(k) -> str(sv))
        }
      SqsReceivedMessage(str(call(m, "messageId")), str(call(m, "body")),
        str(call(m, "receiptHandle")), sysAttrs, msgAttrs)
    }
  }

  private def batchEntries(entryClass: String, entries: Seq[(String, String)],
                           timeoutSec: Option[Int]): java.util.List[AnyRef] = {
    val list = new java.util.ArrayList[AnyRef](entries.size)
    entries.foreach { case (id, handle) =>
      var e = builder(entryClass)
      e = call(e, "id", id)
      e = call(e, "receiptHandle", handle)
      timeoutSec.foreach(t => e = call(e, "visibilityTimeout", Int.box(t)))
      list.add(build(e))
    }
    list
  }

  private def failures(out: AnyRef): Seq[SqsBatchFailure] =
    asScalaList(call(out, "failed")).map { f =>
      SqsBatchFailure(str(call(f, "id")), str(call(f, "code")),
        str(call(f, "message")),
        Option(call(f, "senderFault"))
          .exists(_.asInstanceOf[java.lang.Boolean].booleanValue))
    }

  override def deleteMessageBatch(queueUrl: String,
                                  entries: Seq[(String, String)]): Seq[SqsBatchFailure] = {
    var b = builder("DeleteMessageBatchRequest")
    b = call(b, "queueUrl", queueUrl)
    b = call(b, "entries",
      batchEntries("DeleteMessageBatchRequestEntry", entries, None))
    failures(call(client, "deleteMessageBatch", build(b)))
  }

  override def changeMessageVisibilityBatch(queueUrl: String, entries: Seq[(String, String)],
                                            timeoutSeconds: Int): Seq[SqsBatchFailure] = {
    var b = builder("ChangeMessageVisibilityBatchRequest")
    b = call(b, "queueUrl", queueUrl)
    b = call(b, "entries",
      batchEntries("ChangeMessageVisibilityBatchRequestEntry", entries, Some(timeoutSeconds)))
    failures(call(client, "changeMessageVisibilityBatch", build(b)))
  }

  override def approximateNumberOfMessages(queueUrl: String): Long = {
    var b = builder("GetQueueAttributesRequest")
    b = call(b, "queueUrl", queueUrl)
    b = call(b, "attributeNamesWithStrings", Array("ApproximateNumberOfMessages"))
    val out = call(client, "getQueueAttributes", build(b))
    asScalaMap(call(out, "attributesAsStrings"))
      .collectFirst { case (k, v) if str(k) == "ApproximateNumberOfMessages" => str(v).toLong }
      // Fail fast (consistent with the binder's any-mismatch-throws
      // contract): defaulting to 0 would make a malformed or
      // access-denied response indistinguishable from an empty queue,
      // and this number drives scaling/drain decisions.
      .getOrElse(throw new IllegalStateException(
        s"GetQueueAttributes($queueUrl) response lacks ApproximateNumberOfMessages"))
  }

  override def close(): Unit = call(client, "close")
}

/** Executor-side factory for the SQS-backed connector. Referenced by
  * class name in the DataSource option, so configuration travels as JVM
  * system properties (set them via `spark.driver.extraJavaOptions` +
  * `spark.executor.extraJavaOptions`, the standard channel for
  * per-JVM connector config):
  *
  *   - `graft.sqs.queueUrl` (required)
  *   - `graft.sqs.region` (optional — SDK default-chain otherwise)
  *   - `graft.sqs.endpoint` (optional — e.g. a LocalStack URL)
  *   - `graft.sqs.includeAttributes` (optional, "true"/"false")
  *
  * `create()` builds the SDK v2 `SqsClient` reflectively
  * (SqsClient.builder() [.region(Region.of(...))]
  * [.endpointOverride(URI)] .build()) and wraps it in
  * [[ReflectiveSqsApi]] → [[SqsQueueClient]]. Requires the
  * software.amazon.awssdk:sqs jar on the executor classpath; absence
  * fails fast at create() with a clear message.
  */
final class SqsQueueClientFactory extends RemoteQueueClientFactory {

  override def create(): RemoteQueueClient = {
    val queueUrl = sys.props.getOrElse("graft.sqs.queueUrl",
      throw new IllegalArgumentException(
        "system property graft.sqs.queueUrl is required for SqsQueueClientFactory"))
    val includeAttributes = sys.props.get("graft.sqs.includeAttributes").contains("true")
    new SqsQueueClient(new ReflectiveSqsApi(buildSdkClient()), queueUrl, includeAttributes)
  }

  private def buildSdkClient(): AnyRef = {
    val clientCls =
      try Class.forName("software.amazon.awssdk.services.sqs.SqsClient")
      catch {
        case e: ClassNotFoundException =>
          throw new IllegalStateException(
            "software.amazon.awssdk:sqs not on the classpath — add the AWS SDK v2 " +
              "sqs jar to the executors to use SqsQueueClientFactory", e)
      }
    var b = clientCls.getMethod("builder").invoke(null)
    def call1(target: AnyRef, name: String, arg: AnyRef): AnyRef = {
      val m = target.getClass.getMethods
        .find(m => m.getName == name && m.getParameterCount == 1).get
      m.setAccessible(true)
      m.invoke(target, arg)
    }
    sys.props.get("graft.sqs.region").foreach { r =>
      val regionCls = Class.forName("software.amazon.awssdk.regions.Region")
      b = call1(b, "region", regionCls.getMethod("of", classOf[String]).invoke(null, r))
    }
    sys.props.get("graft.sqs.endpoint").foreach { ep =>
      b = call1(b, "endpointOverride", java.net.URI.create(ep))
    }
    b.getClass.getMethods.find(m => m.getName == "build" && m.getParameterCount == 0)
      .map { m => m.setAccessible(true); m.invoke(b) }
      .getOrElse(throw new IllegalStateException("SqsClient.builder().build missing"))
  }
}
