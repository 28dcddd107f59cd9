package graft.ingest

import java.util.concurrent.ConcurrentHashMap

/** A keyed runtime control: the adaptive loop (or an operator) writes a
  * desired integer here; the running component re-reads it at its next
  * natural decision point. One mechanism for both actuation paths —
  * [[graft.sources.remote.PollerControl]] (poller fan-out, read at every
  * `planInputPartitions`) and [[WorkerControl]] (flush parallelism, read
  * per micro-batch) extend it, so clamp/gauge semantics cannot drift
  * between them. Values below 1 clamp to 1, as in the reference's
  * SetPollers (source_sqs.go:249-285).
  */
abstract class ControlKnob(gaugeName: String) {
  private val desired = new ConcurrentHashMap[String, Integer]()

  def set(id: String, n: Int): Unit = {
    desired.put(id, math.max(1, n))
    IngestMetrics.gauge(gaugeName, math.max(1, n).toDouble)
  }

  def get(id: String): Option[Int] =
    Option(desired.get(id)).map(_.intValue)

  def get(id: String, default: Int): Int = get(id).getOrElse(default)

  def clear(id: String): Unit = desired.remove(id)
}
