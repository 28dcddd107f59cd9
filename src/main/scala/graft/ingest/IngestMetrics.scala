package graft.ingest

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Lock-free counter/gauge registry with snapshotting and pluggable
  * adapter fanout, mirroring the reference metrics surface
  * (/root/reference/observability/metrics.go:36-128, adapter fanout
  * :24-96, metric names from README.md:170-186). Counters are
  * LongAdders — contention-free increments from the foreachBatch driver
  * thread. Every update is recorded locally AND forwarded to each
  * registered [[graft.observability.MetricsAdapter]]; the no-adapter
  * case costs one volatile read (the reference's fast path).
  */
object IngestMetrics {
  private val counters = new ConcurrentHashMap[String, LongAdder]()
  private val gauges = new ConcurrentHashMap[String, java.lang.Double]()

  @volatile private var adapters: List[graft.observability.MetricsAdapter] = Nil

  def addAdapter(a: graft.observability.MetricsAdapter): Unit = synchronized {
    if (a != null) adapters = adapters :+ a
  }

  def clearAdapters(): Unit = synchronized { adapters = Nil }

  def inc(name: String, n: Long = 1L): Unit = {
    counters.computeIfAbsent(name, _ => new LongAdder).add(n)
    val as = adapters // single volatile read; Nil short-circuits the loop
    if (as.nonEmpty) as.foreach(_.addCounter(name, n))
  }

  def gauge(name: String, v: Double): Unit = {
    gauges.put(name, v)
    val as = adapters
    if (as.nonEmpty) as.foreach(_.setGauge(name, v))
  }

  def snapshot(): Map[String, Double] =
    counters.asScala.map { case (k, v) => k -> v.sum.toDouble }.toMap ++
      gauges.asScala.map { case (k, v) => k -> v.doubleValue }.toMap

  def reset(): Unit = { counters.clear(); gauges.clear() }

  // Metric names (reference README.md:170-186 family)
  val MessagesReceived = "ingestor_messages_received_total"
  val MessagesDropped = "ingestor_messages_dropped_total"
  val RecordsTransformed = "ingestor_records_transformed_total"
  val TransformErrors = "ingestor_transform_errors_total"
  val Flushes = "ingestor_flushes_total"
  val FlushErrors = "ingestor_flush_errors_total"
  val RecordsFlushed = "ingestor_records_flushed_total"
  val BatchDurationMs = "ingestor_batch_duration_ms"
  val InputRowsPerSec = "ingestor_input_rows_per_second"
}

/** StreamingQueryListener publishing per-batch progress into the
  * registry (the Spark-native analog of the reference's runtime metric
  * publication, adaptive.go:116-125).
  */
final class IngestMetricsListener extends StreamingQueryListener {
  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    IngestMetrics.gauge(IngestMetrics.BatchDurationMs, p.batchDuration.toDouble)
    IngestMetrics.gauge(IngestMetrics.InputRowsPerSec, p.inputRowsPerSecond)
    IngestMetrics.inc(IngestMetrics.MessagesReceived, p.numInputRows)
  }
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
