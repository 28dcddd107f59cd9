package graft.ingest

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

import graft.observability.KvLogger

/** Graceful stop with a final flush under a timeout — the engine analog
  * of the reference's shutdown path (/root/reference/ingestor/
  * ingestor.go:650-697): stop the adaptive loop first (so it cannot
  * re-scale concurrently with teardown), drain what the source already
  * admitted (`processAllAvailable` = the final flush), and if the drain
  * does not complete within the timeout, count a forced shutdown and
  * stop anyway — losing no data (unacked work redelivers; the
  * checkpoint simply doesn't advance past the last durable batch).
  */
object GracefulShutdown {

  /** Counter mirroring `ingestor_shutdown_timeout_total`. */
  val ShutdownTimeouts = "ingestor_shutdown_timeout_total"

  /** Default final-flush budget, the reference's 10 s. */
  val DefaultTimeoutMs = 10000L

  /** Returns true when the final flush completed within the budget;
    * false when the stop was forced (timeout counted + warned). The
    * query is stopped in both cases.
    */
  def stopAndFlush(query: StreamingQuery,
                   timeoutMs: Long = DefaultTimeoutMs,
                   detachListener: Option[StreamingQueryListener] = None,
                   log: KvLogger = KvLogger.Nop): Boolean = {
    // Adaptive-loop-first ordering: remove the listener so no scaling
    // decision races the teardown (ingestor.go:652-656).
    detachListener.foreach(query.sparkSession.streams.removeListener)

    @volatile var drained = false
    val drain = new Thread(() => {
      try { query.processAllAvailable(); drained = true }
      catch { case _: Throwable => () } // a failing drain is a forced stop
    }, "graft-shutdown-drain")
    drain.setDaemon(true)
    drain.start()
    drain.join(math.max(1L, timeoutMs))
    // Snapshot at the deadline: once stop() runs below, the drain thread
    // unblocks (isActive=false) and would flip the flag late.
    val cleanAtDeadline = drained

    if (!cleanAtDeadline) {
      IngestMetrics.inc(ShutdownTimeouts)
      log.warn("ingest.run.stop_timeout", "timeout_ms" -> timeoutMs)
    }
    query.stop()
    if (cleanAtDeadline) log.info("ingest.run.stopped")
    cleanAtDeadline
  }
}
