package graft.ingest

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** A recommendation emitted by the control loop: what the runtime should
  * do between (re)starts of the query. On a cluster, `workers` maps to
  * executor count (dynamic allocation target) / write parallelism and
  * `pollers` to the source admission limit multiplier
  * (`maxFilesPerTrigger` / `maxOffsetsPerTrigger`).
  */
final case class ScalingRecommendation(
    batchId: Long, workers: Int, pollers: Int, snapshot: RuntimeSnapshot)

/** The §7.6 control loop: a StreamingQueryListener that derives a
  * [[RuntimeSnapshot]] from each StreamingQueryProgress and feeds the
  * reference's decision ladder ([[AdaptiveAdvisor]], cooldown-gated).
  * Signals:
  *   - cpuUtil ≈ busy fraction = batchDuration / trigger interval
  *     (how saturated the micro-batch budget is);
  *   - flushQueueUsage ≈ addBatch time share of the batch (sink-side
  *     pressure);
  *   - sourceBufferUsage ≈ inputRows vs the admission limit (how hard
  *     the source side is pushing).
  * Memory utilization comes from the JVM heap (driver-local by
  * definition in local mode; executor metrics on a cluster).
  */
final class AdaptiveController(
    cfg: AdaptiveConfig = AdaptiveConfig(),
    initial: Parallelism = Parallelism(2, 2),
    triggerIntervalMs: Long = 1000L,
    rowsPerTriggerTarget: Long = 10000L,
    nowMs: () => Long = System.currentTimeMillis,
    onScale: ScalingRecommendation => Unit = _ => ()) extends StreamingQueryListener {

  private val loop = new AdaptiveAdvisor.Loop(cfg, initial, nowMs)
  val recommendations = new ConcurrentLinkedQueue[ScalingRecommendation]()

  def parallelism: Parallelism = loop.parallelism

  private[ingest] def heapUtil(): Double = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()).toDouble / rt.maxMemory()
  }

  private[ingest] def snapshotOf(p: org.apache.spark.sql.streaming.StreamingQueryProgress): RuntimeSnapshot = {
    val busy = math.min(1.0, p.batchDuration.toDouble / math.max(1L, triggerIntervalMs))
    val addBatchMs = Option(p.durationMs.get("addBatch")).map(_.toDouble).getOrElse(0.0)
    val sinkShare = math.min(1.0, addBatchMs / math.max(1L, triggerIntervalMs))
    val sourceShare = math.min(1.0, p.numInputRows.toDouble / math.max(1L, rowsPerTriggerTarget))
    RuntimeSnapshot(busy, heapUtil(), sinkShare, sourceShare)
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val snap = snapshotOf(event.progress)
    val before = loop.parallelism
    val after = loop.onSample(snap)
    if (after != before) {
      val rec = ScalingRecommendation(event.progress.batchId, after.workers, after.pollers, snap)
      recommendations.add(rec)
      IngestMetrics.gauge("ingestor_adaptive_workers", after.workers)
      IngestMetrics.gauge("ingestor_adaptive_pollers", after.pollers)
      onScale(rec) // close the loop: actuators apply the action live
    }
  }
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}

object AdaptiveController {

  /** Loop-CLOSING construction (the reference applies scaling actions
    * live, adaptive.go:127-260; so does this): each emitted
    * recommendation is actuated immediately —
    *   - `pollers` → [[graft.sources.remote.PollerControl]]: the queue
    *     source consults it at every `planInputPartitions`, so the NEXT
    *     micro-batch runs with the new partition fan-out;
    *   - `workers` → [[WorkerControl]]: any [[IngestPipeline]] built
    *     with the matching `controlId` repartitions its next flush to
    *     the new worker count.
    * Both take effect on the running query, no restart. Register the
    * returned listener via `spark.streams.addListener`.
    */
  def wired(queueId: Option[String] = None,
            workerControlId: Option[String] = None,
            cfg: AdaptiveConfig = AdaptiveConfig(),
            initial: Parallelism = Parallelism(2, 2),
            triggerIntervalMs: Long = 1000L,
            rowsPerTriggerTarget: Long = 10000L,
            nowMs: () => Long = System.currentTimeMillis): AdaptiveController =
    new AdaptiveController(cfg, initial, triggerIntervalMs, rowsPerTriggerTarget, nowMs,
      onScale = rec => {
        queueId.foreach(q => graft.sources.remote.PollerControl.set(q, rec.pollers))
        workerControlId.foreach(w => WorkerControl.set(w, rec.workers))
      })
}
