package graft.sources.remote

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import scala.collection.mutable

/** In-memory SQS-shaped service for connector tests, mirroring the fake
  * client pattern of the reference's source tests
  * (/root/reference/source/source_sqs_test.go:243+): injectable receive
  * errors, partial batch failures, visibility-lease tracking, and
  * recording of every service call so specs can assert chunk sizes and
  * call counts. State lives in a JVM-global registry keyed by queue name
  * so the reflection-instantiated factories used by the DataSource
  * options share it with the test (local[*] = one JVM).
  */
object FakeQueueService {

  final class State(val name: String) {
    private val seq = new AtomicLong(0L)
    private[remote] val visible = mutable.Queue.empty[QueueMessage]
    private[remote] val inFlight = mutable.LinkedHashMap.empty[String, QueueMessage]

    /** next N receive calls throw (transient transport failure) */
    val receiveErrorsToInject = new AtomicInteger(0)
    /** next N delete calls throw (transient transport failure) */
    val deleteErrorsToInject = new AtomicInteger(0)
    /** handles whose delete the service reports as Failed entries */
    val failDeletesFor = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    /** handles whose visibility change the service reports as Failed */
    val failVisibilityFor = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

    // call recording
    val receiveCalls = new AtomicInteger(0)
    val deleteCalls = new AtomicInteger(0)
    val visibilityCalls = new AtomicInteger(0)
    val deleteChunkSizes = new java.util.concurrent.CopyOnWriteArrayList[Integer]()
    val visibilityChunkSizes = new java.util.concurrent.CopyOnWriteArrayList[Integer]()
    private[remote] val visibilityByHandle = new ConcurrentHashMap[String, Integer]()

    def enqueue(payload: String, attrs: Map[String, String] = Map.empty): Unit =
      synchronized {
        val n = seq.getAndIncrement()
        visible.enqueue(QueueMessage(payload, attrs, s"rh-$name-$n"))
      }

    def backlog: Int = synchronized(visible.size)
    def inFlightCount: Int = synchronized(inFlight.size)
    def deletedCount: Int = deletedTotal.get()
    private[remote] val deletedTotal = new AtomicInteger(0)

    /** Simulates visibility-timeout expiry: every in-flight message
      * becomes visible again (redelivery). Clock-free for determinism. */
    def expireAllLeases(): Unit = synchronized {
      inFlight.values.foreach(visible.enqueue)
      inFlight.clear()
    }

    def lastVisibilityOf(handle: String): Option[Int] =
      Option(visibilityByHandle.get(handle)).map(_.intValue)
  }

  private val states = new ConcurrentHashMap[String, State]()
  def state(name: String): State = states.computeIfAbsent(name, new State(_))
  def drop(name: String): Unit = states.remove(name)
}

/** One fake client per partition reader, sharing the named [[FakeQueueService.State]]. */
final class FakeQueueClient(s: FakeQueueService.State) extends RemoteQueueClient {

  override def receive(max: Int, waitMs: Long, visibilityTimeoutSec: Int): Seq[QueueMessage] = {
    s.receiveCalls.incrementAndGet()
    if (s.receiveErrorsToInject.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new RuntimeException("injected receive failure")
    s.synchronized {
      val n = math.min(max, s.visible.size)
      (0 until n).map { _ =>
        val m = s.visible.dequeue()
        s.inFlight.put(m.handle, m)
        m
      }
    }
  }

  override def deleteBatch(handles: Seq[String]): BatchCallResult = {
    s.deleteCalls.incrementAndGet()
    if (s.deleteErrorsToInject.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new RuntimeException("injected delete failure")
    s.deleteChunkSizes.add(handles.size)
    require(handles.size <= RemoteQueueConfig.MaxBatchEntries,
      s"service limit exceeded: ${handles.size} entries in one DeleteMessageBatch")
    val (bad, good) = handles.partition(s.failDeletesFor.contains)
    s.synchronized { good.foreach(s.inFlight.remove) }
    s.deletedTotal.addAndGet(good.size)
    BatchCallResult(good.size, bad.map(h => (h, "InternalError")))
  }

  override def changeVisibilityBatch(handles: Seq[String], timeoutSec: Int): BatchCallResult = {
    s.visibilityCalls.incrementAndGet()
    s.visibilityChunkSizes.add(handles.size)
    require(handles.size <= RemoteQueueConfig.MaxBatchEntries,
      s"service limit exceeded: ${handles.size} entries in one ChangeMessageVisibilityBatch")
    val (bad, good) = handles.partition(s.failVisibilityFor.contains)
    good.foreach(h => s.visibilityByHandle.put(h, timeoutSec))
    BatchCallResult(good.size, bad.map(h => (h, "ReceiptHandleIsInvalid")))
  }

  override def approximateBacklog(): Long = s.backlog.toLong
}

// Reflection-instantiable factories bound to fixed queue names; each
// spec uses its own queue and resets state.
class FakeFactoryPoll extends RemoteQueueClientFactory {
  override def create(): RemoteQueueClient = new FakeQueueClient(FakeQueueService.state("poll"))
}
class FakeFactoryBackoff extends RemoteQueueClientFactory {
  override def create(): RemoteQueueClient = new FakeQueueClient(FakeQueueService.state("backoff"))
}
class FakeFactoryE2E extends RemoteQueueClientFactory {
  override def create(): RemoteQueueClient = new FakeQueueClient(FakeQueueService.state("e2e"))
}
class FakeFactoryScale extends RemoteQueueClientFactory {
  override def create(): RemoteQueueClient = new FakeQueueClient(FakeQueueService.state("scale"))
}
class FakeFactoryRestart extends RemoteQueueClientFactory {
  override def create(): RemoteQueueClient = new FakeQueueClient(FakeQueueService.state("restart"))
}
class FakeFactorySoak extends RemoteQueueClientFactory {
  override def create(): RemoteQueueClient = new FakeQueueClient(FakeQueueService.state("soak"))
}
