package graft.sources.remote

/** A message leased from a remote queue: the payload, optional
  * per-message attributes, and the opaque receipt `handle` that
  * acknowledges (deletes) or re-leases it. Mirrors the reference's
  * message surface (/root/reference/source/source.go:20-39 — Body,
  * Attributes, receipt-handle ack metadata).
  */
final case class QueueMessage(payload: String,
                              attributes: Map[String, String],
                              handle: String)

/** Result of one service batch call: `ok` entries succeeded, `failed`
  * carries (handle, errorCode) for entries the service rejected — the
  * DeleteMessageBatch/ChangeMessageVisibilityBatch partial-failure shape
  * (source_sqs.go:366-371).
  */
final case class BatchCallResult(ok: Int, failed: Seq[(String, String)]) {
  def allOk: Boolean = failed.isEmpty
}

/** The pluggable remote-queue service client — the engine's analog of
  * the reference's `sqsAPI` seam (source_sqs.go:116-121), which is what
  * makes the connector testable against fakes and portable across
  * SQS-shaped services. One client instance lives per partition reader
  * (executor-side); implementations need not be thread-safe but must be
  * usable from the executor JVM.
  *
  * Service limits the connector enforces FOR the client: `deleteBatch`
  * and `changeVisibilityBatch` are never called with more than
  * [[RemoteQueueConfig.MaxBatchEntries]] handles.
  */
trait RemoteQueueClient extends AutoCloseable {

  /** Long-poll up to `max` messages, waiting at most `waitMs`; received
    * messages become invisible to other consumers for
    * `visibilityTimeoutSec`. Returns empty when the queue has nothing
    * (the poll loop's drain signal). Throws on transport error.
    */
  def receive(max: Int, waitMs: Long, visibilityTimeoutSec: Int): Seq[QueueMessage]

  /** Delete (acknowledge) up to MaxBatchEntries messages. */
  def deleteBatch(handles: Seq[String]): BatchCallResult

  /** Re-lease up to MaxBatchEntries in-flight messages for another
    * `timeoutSec` seconds. */
  def changeVisibilityBatch(handles: Seq[String], timeoutSec: Int): BatchCallResult

  /** Approximate number of visible messages (GetQueueAttributes
    * ApproximateNumberOfMessages analog). The driver gates micro-batch
    * scheduling on this so an idle queue doesn't spin empty batches;
    * it's advisory — over- or under-counts only cost one empty or one
    * delayed batch.
    */
  def approximateBacklog(): Long

  override def close(): Unit = ()
}

/** Serializable factory shipped to executors; `create()` runs inside the
  * partition reader. Implementations are referenced by class name in the
  * DataSource option, so they need a public no-arg constructor.
  */
trait RemoteQueueClientFactory extends Serializable {
  def create(): RemoteQueueClient
}

/** Long-polling behavior knobs, mirroring the reference's config and
  * validation envelope (source_sqs.go:38-113): wait 0-20 s, 1-10
  * messages per receive, non-negative visibility, >=1 pollers, >=1
  * buffered messages per trigger.
  *
  * `maxPerTrigger` is the Spark realization of the reference's BufSize:
  * the bounded buffer that decouples polling from processing becomes a
  * per-micro-batch admission cap, split evenly across pollers.
  */
final case class RemoteQueueConfig(waitTimeSeconds: Int = 20,
                                   maxMessages: Int = 10,
                                   visibilityTimeoutSec: Int = 30,
                                   pollers: Int = 3,
                                   maxPerTrigger: Int = 256,
                                   receiveBackoffMs: Long = 250L,
                                   maxReceiveRetries: Int = 3) {
  require(waitTimeSeconds >= 0 && waitTimeSeconds <= 20,
    s"wait time seconds must be between 0 and 20, got $waitTimeSeconds")
  require(maxMessages >= 1 && maxMessages <= 10,
    s"max messages must be between 1 and 10, got $maxMessages")
  require(visibilityTimeoutSec >= 0,
    s"visibility timeout must be non-negative, got $visibilityTimeoutSec")
  require(pollers >= 1, s"pollers must be at least 1, got $pollers")
  require(maxPerTrigger >= 1, s"maxPerTrigger must be at least 1, got $maxPerTrigger")
  require(receiveBackoffMs >= 0, s"receive backoff must be non-negative")
  require(maxReceiveRetries >= 0, s"max receive retries must be non-negative")
}

object RemoteQueueConfig {
  /** Service batch-call limit (DeleteMessageBatch / ChangeMessageVisibilityBatch). */
  val MaxBatchEntries = 10
}
