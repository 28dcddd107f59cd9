package graft.ingest

/** Adaptive runtime advisor: a pure port of the reference's scaling
  * decision ladder (/root/reference/ingestor/adaptive.go:127-260, rules
  * documented in its README.md:218-249), re-targeted at Spark knobs.
  *
  * In-process goroutine scaling has no direct Spark analog; the
  * deliverable is a CLOSED control loop over `StreamingQueryProgress`
  * ([[AdaptiveController.wired]]) whose actions take effect on the
  * running query, no restart: "pollers" actuate
  * [[graft.sources.remote.PollerControl]] (the queue source re-reads it
  * at every `planInputPartitions`, so the next micro-batch runs with the
  * new partition fan-out) and "workers" actuate [[WorkerControl]] (the
  * next [[IngestPipeline]] flush repartitions to the new count). On a
  * real cluster "workers" additionally maps to the dynamic-allocation
  * executor target. The ladder itself is pure and unit-testable 1:1
  * against the reference's scenarios.
  */
final case class AdaptiveConfig(
    minWorkers: Int = 1, maxWorkers: Int = 8,
    minPollers: Int = 1, maxPollers: Int = 8,
    cpuTarget: Double = 0.70,
    memTarget: Double = 0.80,
    severeFactor: Double = 1.15,
    flushQueueHigh: Double = 0.70,
    flushQueueLow: Double = 0.50,
    sourceBufferHigh: Double = 0.60,
    idleCpu: Double = 0.20,
    idleUsage: Double = 0.10,
    sampleIntervalMs: Long = 2000,
    cooldownMs: Long = 10000)

/** One sampled state: CPU/heap utilization plus queue fill fractions. */
final case class RuntimeSnapshot(
    cpuUtil: Double, memUtil: Double,
    flushQueueUsage: Double, sourceBufferUsage: Double)

final case class Parallelism(workers: Int, pollers: Int)

object AdaptiveAdvisor {

  /** Applies the decision ladder; at most ONE scaling action per call
    * (the caller enforces the cooldown between calls). Ladder order:
    *  1. severe CPU/mem pressure  → workers−1, else pollers−1
    *  2. moderate CPU/mem pressure → pollers−1, else workers−1
    *  3. flush queue ≥ high & healthy → workers+1
    *  4. source buffer ≥ high & flush ≤ low & headroom → pollers+1
    *  5. idle → drift one step back toward minimums
    */
  def decide(s: RuntimeSnapshot, p: Parallelism, cfg: AdaptiveConfig): Parallelism = {
    val severeCpu = cfg.cpuTarget * cfg.severeFactor
    val severeMem = cfg.memTarget * cfg.severeFactor
    val healthy = s.cpuUtil < cfg.cpuTarget && s.memUtil < cfg.memTarget

    if (s.cpuUtil >= severeCpu || s.memUtil >= severeMem) {
      if (p.workers > cfg.minWorkers) p.copy(workers = p.workers - 1)
      else if (p.pollers > cfg.minPollers) p.copy(pollers = p.pollers - 1)
      else p
    } else if (s.cpuUtil >= cfg.cpuTarget || s.memUtil >= cfg.memTarget) {
      if (p.pollers > cfg.minPollers) p.copy(pollers = p.pollers - 1)
      else if (p.workers > cfg.minWorkers) p.copy(workers = p.workers - 1)
      else p
    } else if (s.flushQueueUsage >= cfg.flushQueueHigh && healthy && p.workers < cfg.maxWorkers) {
      p.copy(workers = p.workers + 1)
    } else if (s.sourceBufferUsage >= cfg.sourceBufferHigh &&
        s.flushQueueUsage <= cfg.flushQueueLow && healthy && p.pollers < cfg.maxPollers) {
      p.copy(pollers = p.pollers + 1)
    } else if (s.cpuUtil < cfg.idleCpu &&
        s.flushQueueUsage < cfg.idleUsage && s.sourceBufferUsage < cfg.idleUsage) {
      if (p.workers > cfg.minWorkers) p.copy(workers = p.workers - 1)
      else if (p.pollers > cfg.minPollers) p.copy(pollers = p.pollers - 1)
      else p
    } else p
  }

  /** Stateful wrapper enforcing the cooldown between scaling actions. */
  final class Loop(cfg: AdaptiveConfig, initial: Parallelism,
                   nowMs: () => Long = System.currentTimeMillis) {
    @volatile private var current = initial
    @volatile private var lastActionAt = 0L

    def parallelism: Parallelism = current

    /** Returns the (possibly unchanged) parallelism after this sample. */
    def onSample(s: RuntimeSnapshot): Parallelism = {
      val now = nowMs()
      if (now - lastActionAt >= cfg.cooldownMs) {
        val next = decide(s, current, cfg)
        if (next != current) { current = next; lastActionAt = now }
      }
      current
    }
  }
}
