package graft.observability

import scala.collection.mutable

import com.codahale.metrics.MetricRegistry
import graft.ingest.IngestMetrics
import org.scalatest.funsuite.AnyFunSuite

class ObservabilitySpec extends AnyFunSuite {

  test("registry fans out every update to registered adapters") {
    val seen = mutable.ArrayBuffer.empty[String]
    val adapter = new MetricsAdapter {
      override def addCounter(name: String, delta: Long): Unit = seen += s"c:$name:$delta"
      override def setGauge(name: String, value: Double): Unit = seen += s"g:$name:$value"
    }
    IngestMetrics.addAdapter(adapter)
    try {
      IngestMetrics.inc("obs_test_total", 3)
      IngestMetrics.gauge("obs_test_gauge", 1.5)
      assert(seen.contains("c:obs_test_total:3"))
      assert(seen.contains("g:obs_test_gauge:1.5"))
      // local registry recorded too (fanout is additive, not a redirect)
      assert(IngestMetrics.snapshot()("obs_test_total") == 3.0)
    } finally IngestMetrics.clearAdapters()
  }

  test("statsd adapter formats DogStatsD lines with prefix, tags and rate") {
    val lines = mutable.ArrayBuffer.empty[String]
    val a = new StatsdAdapter(lines += _, prefix = "graft", tags = Seq("env:test", "app:ingest"))
    a.addCounter("flushes_total", 2)
    a.setGauge("buffer_used", 17.0)
    a.setGauge("rate_rps", 2.5)
    assert(lines.toList == List(
      "graft.flushes_total:2|c|#env:test,app:ingest",
      "graft.buffer_used:17|g|#env:test,app:ingest",
      "graft.rate_rps:2.5|g|#env:test,app:ingest"))
  }

  test("statsd adapter without prefix/tags emits bare lines; bad rate clamps to 1.0") {
    val lines = mutable.ArrayBuffer.empty[String]
    val a = new StatsdAdapter(lines += _, rate = -3.0)
    a.addCounter("n_total", 1)
    assert(lines.toList == List("n_total:1|c"))
  }

  test("statsd sample rate drops updates client-side and encodes the rate") {
    val lines = mutable.ArrayBuffer.empty[String]
    // deterministic rng: alternate below/above the 0.5 rate
    var i = 0
    val rng = () => { i += 1; if (i % 2 == 1) 0.25 else 0.75 }
    val a = new StatsdAdapter(lines += _, rate = 0.5, rng = rng)
    (1 to 4).foreach(_ => a.addCounter("sampled_total", 1))
    assert(lines.size == 2, "half the updates sampled out")
    assert(lines.forall(_ == "sampled_total:1|c|@0.5"))
  }

  test("spark metrics bridge exposes registry values as codahale gauges") {
    val reg = new MetricRegistry
    GraftMetricsPlugin.register(reg)
    IngestMetrics.inc(IngestMetrics.Flushes, 7)
    val g = reg.getGauges.get(IngestMetrics.Flushes)
    assert(g != null, "gauge registered under the graft metric name")
    assert(g.getValue.asInstanceOf[Double] >= 7.0)
    // idempotent re-registration
    GraftMetricsPlugin.register(reg)
  }

  test("kv logger formats levels, filters below min level, truncates values") {
    val out = mutable.ArrayBuffer.empty[String]
    val log = new KvLogger.Line(out += _, minLevel = KvLogger.Info, truncateAt = 8)
    log.debug("ingest.poller.started", "id" -> 1) // below min level
    log.info("ingest.batch.flushed", "rows" -> 42, "codec" -> "snappy")
    log.error("ingest.flush.failed", "payload" -> "0123456789abcdef")
    assert(out.toList == List(
      "INFO ingest.batch.flushed rows=42 codec=snappy",
      "ERROR ingest.flush.failed payload=01234567..."))
  }

  test("nop logger is silent and free") {
    KvLogger.Nop.info("anything", "k" -> "v") // must not throw or print
  }
}
