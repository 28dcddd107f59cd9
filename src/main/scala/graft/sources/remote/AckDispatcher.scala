package graft.sources.remote

import graft.ingest.IngestMetrics

/** Chunked acknowledgement / visibility-extension over a
  * [[RemoteQueueClient]]: splits any number of handles into service-limit
  * chunks (≤ 10), counts successes and failures in the metrics registry,
  * and propagates partial failure as an exception naming the first
  * failing entry — the reference's AckBatch semantics
  * (source_sqs.go:320-374: chunk, call, fail the whole operation on the
  * first partially-failed chunk so the batch is redelivered rather than
  * half-acked silently).
  */
object AckDispatcher {

  final class PartialFailure(val op: String, val nFailed: Int, val nTotal: Int,
                             val firstHandle: String, val firstCode: String)
    extends RuntimeException(
      s"$op batch partially failed: $nFailed/$nTotal entries failed, " +
        s"first error: handle=$firstHandle code=$firstCode")

  // Metric names (source_sqs family, README.md:170-186 naming convention)
  val AckedTotal = "source_queue_acked_total"
  val AckErrors = "source_queue_ack_errors_total"
  val VisibilityExtensions = "source_queue_visibility_extensions_total"
  val VisibilityErrors = "source_queue_visibility_errors_total"

  /** Delete `handles` in chunks of ≤ MaxBatchEntries. Empty/null handles
    * are skipped (the reference tolerates nil messages in the slice).
    * Throws [[PartialFailure]] on the first chunk with failed entries;
    * chunks already acked stay acked (at-least-once: the un-acked
    * remainder is redelivered after its visibility lease lapses).
    */
  def ackAll(client: RemoteQueueClient, handles: Iterator[String]): Long = {
    var acked = 0L
    handles.filter(h => h != null && h.nonEmpty)
      .grouped(RemoteQueueConfig.MaxBatchEntries)
      .foreach { chunk =>
        val res =
          try client.deleteBatch(chunk)
          catch {
            case e: Throwable =>
              IngestMetrics.inc(AckErrors)
              throw e
          }
        if (!res.allOk) {
          IngestMetrics.inc(AckErrors, res.failed.size.toLong)
          val (h, code) = res.failed.head
          throw new PartialFailure("delete", res.failed.size, chunk.size, h, code)
        }
        acked += res.ok
        IngestMetrics.inc(AckedTotal, res.ok.toLong)
      }
    acked
  }

  /** Extend the visibility lease of `handles` by `timeoutSec`, chunked
    * ≤ MaxBatchEntries. Same partial-failure contract as [[ackAll]]
    * (source_sqs.go:421-465).
    */
  def extendAll(client: RemoteQueueClient, handles: Iterator[String], timeoutSec: Int): Long = {
    require(timeoutSec >= 0, "timeoutSeconds must be non-negative")
    var extended = 0L
    handles.filter(h => h != null && h.nonEmpty)
      .grouped(RemoteQueueConfig.MaxBatchEntries)
      .foreach { chunk =>
        val res =
          try client.changeVisibilityBatch(chunk, timeoutSec)
          catch {
            case e: Throwable =>
              IngestMetrics.inc(VisibilityErrors)
              throw e
          }
        if (!res.allOk) {
          IngestMetrics.inc(VisibilityErrors, res.failed.size.toLong)
          val (h, code) = res.failed.head
          throw new PartialFailure("change visibility", res.failed.size, chunk.size, h, code)
        }
        extended += res.ok
        IngestMetrics.inc(VisibilityExtensions, res.ok.toLong)
      }
    extended
  }
}
