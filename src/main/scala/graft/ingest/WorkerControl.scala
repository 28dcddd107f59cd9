package graft.ingest

import java.util.concurrent.ConcurrentHashMap

/** Runtime flush-worker scaling (the write-parallelism half of the
  * reference's adaptive actions, adaptive.go:127-260): the adaptive
  * control loop writes the desired worker count here; the NEXT
  * micro-batch flush of any [[IngestPipeline]] constructed with the
  * matching `controlId` repartitions its good rows to that count.
  * The poller half is [[graft.sources.remote.PollerControl]] — together
  * they make the adaptive runtime's recommendations take effect on a
  * RUNNING query, no restart required, exactly as the reference applies
  * its scaling actions live. Values below 1 clamp to 1.
  */
object WorkerControl {
  private val desired = new ConcurrentHashMap[String, Integer]()

  def set(controlId: String, n: Int): Unit = {
    desired.put(controlId, math.max(1, n))
    IngestMetrics.gauge("ingestor_flush_workers", math.max(1, n).toDouble)
  }

  def get(controlId: String): Option[Int] =
    Option(desired.get(controlId)).map(_.intValue)

  def clear(controlId: String): Unit = desired.remove(controlId)
}
