package graft.observability

import java.util.concurrent.ThreadLocalRandom

/** External metrics sink: registered adapters receive every counter and
  * gauge update recorded in [[graft.ingest.IngestMetrics]], mirroring the
  * reference's pluggable adapter fanout (/root/reference/observability/
  * metrics.go:24-96). Implementations must be thread-safe.
  */
trait MetricsAdapter {
  def addCounter(name: String, delta: Long): Unit
  def setGauge(name: String, value: Double): Unit
}

/** DogStatsD-shaped adapter: formats datagram lines
  * (`prefix.name:value|type|@rate|#tag1,tag2`) into a pluggable
  * transport `send` — a UDP socket in production, a capturing buffer in
  * tests. Matches the reference's Datadog adapter surface
  * (/root/reference/observability/metrics.go:145-185): optional prefix
  * joined with '.', constant tags, and a client-side sample rate.
  *
  * Sampling follows the DogStatsD convention: an update is sent with
  * probability `rate` and the rate is encoded in the line so the server
  * can re-scale. `rng` is injectable for deterministic tests.
  */
final class StatsdAdapter(send: String => Unit,
                          prefix: String = "",
                          tags: Seq[String] = Nil,
                          rate: Double = 1.0,
                          rng: () => Double = () => ThreadLocalRandom.current().nextDouble())
  extends MetricsAdapter {

  // Out-of-range rates fall back to 1.0 (report everything) — the
  // reference's sampleRate() clamp.
  private val effRate = if (rate <= 0 || rate > 1) 1.0 else rate
  private val suffix = {
    val r = if (effRate == 1.0) "" else s"|@$effRate"
    val t = if (tags.isEmpty) "" else s"|#${tags.mkString(",")}"
    r + t
  }

  private def metricName(name: String): String =
    if (prefix.isEmpty) name else s"$prefix.$name"

  private def sampled: Boolean = effRate == 1.0 || rng() < effRate

  override def addCounter(name: String, delta: Long): Unit =
    if (sampled) send(s"${metricName(name)}:$delta|c$suffix")

  override def setGauge(name: String, value: Double): Unit =
    if (sampled) {
      // Integral gauges format without the trailing ".0" (statsd servers
      // parse both; the compact form matches wire examples).
      val v = if (value == math.rint(value) && !value.isInfinite) value.toLong.toString
              else value.toString
      send(s"${metricName(name)}:$v|g$suffix")
    }
}
