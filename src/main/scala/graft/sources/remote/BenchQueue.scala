package graft.sources.remote

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** In-memory stub service for the connector micro-benches, mirroring the
  * reference's bench stubs (/root/reference/source/
  * source_sqs_bench_test.go:30-95: a client whose Receive/DeleteBatch
  * return instantly so the measurement isolates the connector machinery,
  * not a network). Lives in main scope because [[graft.Bench]] uses it;
  * not part of the production API.
  */
object BenchQueue {
  private[remote] val visible = new ConcurrentLinkedQueue[QueueMessage]()
  private[remote] val deleted = new AtomicInteger(0)

  def reset(n: Int): Unit = {
    visible.clear()
    deleted.set(0)
    (0 until n).foreach(i => visible.add(QueueMessage(
      s"""{"id": $i, "name": "item-$i", "value": ${i * 1.5}}""",
      Map.empty, s"bh-$i")))
  }

  def deletedCount: Int = deleted.get()
  def backlog: Int = visible.size()
}

final class BenchQueueClient extends RemoteQueueClient {
  override def receive(max: Int, waitMs: Long, visibilityTimeoutSec: Int): Seq[QueueMessage] = {
    val out = Seq.newBuilder[QueueMessage]
    var i = 0
    var m = BenchQueue.visible.poll()
    while (m != null) {
      out += m
      i += 1
      m = if (i < max) BenchQueue.visible.poll() else null
    }
    out.result()
  }
  override def deleteBatch(handles: Seq[String]): BatchCallResult = {
    BenchQueue.deleted.addAndGet(handles.size)
    BatchCallResult(handles.size, Nil)
  }
  override def changeVisibilityBatch(handles: Seq[String], timeoutSec: Int): BatchCallResult =
    BatchCallResult(handles.size, Nil)
  override def approximateBacklog(): Long = BenchQueue.backlog.toLong
}

class BenchQueueFactory extends RemoteQueueClientFactory {
  override def create(): RemoteQueueClient = new BenchQueueClient
}
