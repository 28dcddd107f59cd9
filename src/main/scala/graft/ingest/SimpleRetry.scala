package graft.ingest

import scala.util.Random
import scala.util.control.NonFatal

/** Pluggable retry policy: N attempts with exponential backoff (base
  * doubling up to a cap) and optional ±20 % jitter — the observable
  * semantics of the reference policy (/root/reference/ingestor/retry.go:39-124),
  * used around sink writes inside `foreachBatch` (on top of Spark's own
  * task retries, which cover executor-side failures).
  */
final case class SimpleRetry(
    attempts: Int = 3,
    baseDelayMs: Long = 50,
    maxDelayMs: Long = 2000,
    jitter: Boolean = true,
    sleep: Long => Unit = Thread.sleep) {

  require(attempts >= 1, s"attempts must be >= 1, got $attempts")

  /** Delay before retry `i` (0-based): base * 2^i capped at max. */
  def delayMs(attempt: Int): Long =
    math.min(maxDelayMs, baseDelayMs * (1L << math.min(attempt, 30)))

  /** Runs `op`, retrying on non-fatal errors; rethrows the last error
    * once attempts are exhausted. InterruptedException aborts
    * immediately (cancellation-aware, mirroring ctx-cancel).
    */
  def apply[T](op: => T): T = {
    var i = 0
    while (true) {
      try return op
      catch {
        case e: InterruptedException => throw e
        case NonFatal(e) =>
          i += 1
          if (i >= attempts) throw e
          val d = delayMs(i - 1)
          val jittered =
            if (jitter) math.max(0L, (d * (0.8 + Random.nextDouble() * 0.4)).toLong)
            else d
          sleep(jittered)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
