package graft.observability

import java.util.{Collections, Map => JMap}

import com.codahale.metrics.{Gauge, MetricRegistry}
import org.apache.spark.SparkContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}

import graft.ingest.IngestMetrics

/** Bridge from the graft metrics registry into Spark's Dropwizard metric
  * system, via the public plugin API: enable with
  * `--conf spark.plugins=graft.observability.GraftMetricsPlugin` and
  * every registered name appears as a driver gauge under the
  * `plugin.graft.observability.GraftMetricsPlugin` namespace, flowing to
  * whatever sinks (JMX/Graphite/Prometheus servlet) the cluster has
  * configured. This is the engine-native analog of the reference
  * registering its metrics with an external backend — Spark's metric
  * system IS the fleet-wide backend on a cluster.
  */
class GraftMetricsPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = new DriverPlugin {
    override def init(sc: SparkContext, ctx: PluginContext): JMap[String, String] = {
      GraftMetricsPlugin.register(ctx.metricRegistry())
      Collections.emptyMap()
    }
  }
  override def executorPlugin(): ExecutorPlugin = null
}

object GraftMetricsPlugin {

  /** Names exported by default: the full ingest family. Connector
    * metrics (remote queue) are registered dynamically on first use via
    * gauges that read the live snapshot.
    */
  val DefaultNames: Seq[String] = Seq(
    IngestMetrics.MessagesReceived, IngestMetrics.MessagesDropped,
    IngestMetrics.RecordsTransformed, IngestMetrics.TransformErrors,
    IngestMetrics.Flushes, IngestMetrics.FlushErrors,
    IngestMetrics.RecordsFlushed, IngestMetrics.BatchDurationMs,
    IngestMetrics.InputRowsPerSec)

  /** Registers one lazy gauge per name; each read pulls the live value
    * from the graft registry (0 until first update). Idempotent per
    * registry — re-registration of an existing name is a no-op.
    */
  def register(reg: MetricRegistry, names: Seq[String] = DefaultNames): Unit =
    names.foreach { name =>
      if (!reg.getGauges.containsKey(name)) {
        try reg.register(name, new Gauge[Double] {
          override def getValue: Double = IngestMetrics.snapshot().getOrElse(name, 0.0)
        })
        catch { case _: IllegalArgumentException => () /* raced: already present */ }
      }
    }
}
