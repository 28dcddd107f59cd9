package graft.ingest

import java.util.concurrent.{Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Visibility-lease keep-alive (A15 analog): while a flush job is in
  * flight, periodically re-extend the source's claim on the in-flight
  * messages so they are not redelivered mid-write. The reference runs
  * this as a goroutine per flush
  * (/root/reference/ingestor/ingestor.go:618-648); here it is the
  * driver-side utility a remote-queue connector (e.g. SQS
  * ChangeMessageVisibilityBatch) plugs its extend call into. Stops on
  * the first failed extension (the reference's behavior) or on close.
  */
final class LeaseRunner(extend: () => Boolean, renewEveryMs: Long) extends AutoCloseable {
  require(renewEveryMs > 0)
  private val scheduler = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, "graft-lease"); t.setDaemon(true); t
  })
  private val extensions = new AtomicLong(0L)
  @volatile private var failed = false

  private val task: ScheduledFuture[_] = scheduler.scheduleAtFixedRate(() => {
    try {
      if (extend()) extensions.incrementAndGet()
      else { failed = true; task.cancel(false) }
    } catch {
      case _: Throwable => failed = true; task.cancel(false)
    }
  }, renewEveryMs, renewEveryMs, TimeUnit.MILLISECONDS)

  def extensionCount: Long = extensions.get()
  def hasFailed: Boolean = failed

  override def close(): Unit = {
    task.cancel(false)
    scheduler.shutdownNow()
  }
}
