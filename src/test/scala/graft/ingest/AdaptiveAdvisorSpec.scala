package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Decision-ladder scenarios mirroring the reference's adaptive tests
  * (/root/reference/ingestor/adaptive_test.go:29-973 families: severe /
  * moderate pressure, queue-driven scale-up, idle drift, clamps,
  * cooldown).
  */
class AdaptiveAdvisorSpec extends AnyFunSuite {
  private val cfg = AdaptiveConfig()
  private def snap(cpu: Double = 0.3, mem: Double = 0.3,
                   flush: Double = 0.3, source: Double = 0.3) =
    RuntimeSnapshot(cpu, mem, flush, source)

  test("severe cpu pressure sheds a worker first") {
    assert(AdaptiveAdvisor.decide(snap(cpu = 0.95), Parallelism(4, 4), cfg) == Parallelism(3, 4))
  }

  test("severe memory pressure at min workers sheds a poller") {
    assert(AdaptiveAdvisor.decide(snap(mem = 0.95), Parallelism(1, 4), cfg) == Parallelism(1, 3))
  }

  test("severe pressure at both minimums is a no-op") {
    assert(AdaptiveAdvisor.decide(snap(cpu = 0.99), Parallelism(1, 1), cfg) == Parallelism(1, 1))
  }

  test("moderate cpu pressure sheds a poller first") {
    assert(AdaptiveAdvisor.decide(snap(cpu = 0.75), Parallelism(4, 4), cfg) == Parallelism(4, 3))
  }

  test("moderate pressure at min pollers sheds a worker") {
    assert(AdaptiveAdvisor.decide(snap(mem = 0.85), Parallelism(4, 1), cfg) == Parallelism(3, 1))
  }

  test("full flush queue with healthy resources adds a worker") {
    assert(AdaptiveAdvisor.decide(snap(flush = 0.8), Parallelism(2, 2), cfg) == Parallelism(3, 2))
  }

  test("full flush queue under cpu pressure does NOT add a worker") {
    assert(AdaptiveAdvisor.decide(snap(cpu = 0.75, flush = 0.8), Parallelism(2, 2), cfg) == Parallelism(2, 1))
  }

  test("worker scale-up clamps at max") {
    assert(AdaptiveAdvisor.decide(snap(flush = 0.9), Parallelism(cfg.maxWorkers, 2), cfg) == Parallelism(cfg.maxWorkers, 2))
  }

  test("busy source with drained flush queue adds a poller") {
    assert(AdaptiveAdvisor.decide(snap(source = 0.7, flush = 0.2), Parallelism(2, 2), cfg) == Parallelism(2, 3))
  }

  test("busy source with busy flush queue does not add a poller") {
    // flush 0.6 is above flushQueueLow but below flushQueueHigh: no action
    assert(AdaptiveAdvisor.decide(snap(source = 0.7, flush = 0.6), Parallelism(2, 2), cfg) == Parallelism(2, 2))
  }

  test("idle system drifts workers back toward minimum") {
    assert(AdaptiveAdvisor.decide(snap(cpu = 0.05, flush = 0.0, source = 0.0), Parallelism(4, 4), cfg) == Parallelism(3, 4))
  }

  test("idle system at min workers drifts pollers") {
    assert(AdaptiveAdvisor.decide(snap(cpu = 0.05, flush = 0.0, source = 0.0), Parallelism(1, 4), cfg) == Parallelism(1, 3))
  }

  test("steady state is a no-op") {
    assert(AdaptiveAdvisor.decide(snap(), Parallelism(2, 2), cfg) == Parallelism(2, 2))
  }

  test("cooldown allows one action per window") {
    var now = 0L
    val loop = new AdaptiveAdvisor.Loop(cfg, Parallelism(4, 4), () => now)
    now = cfg.cooldownMs
    assert(loop.onSample(snap(cpu = 0.95)) == Parallelism(3, 4))
    now += 1000 // within cooldown: pressure persists but no action
    assert(loop.onSample(snap(cpu = 0.95)) == Parallelism(3, 4))
    now += cfg.cooldownMs // cooldown passed
    assert(loop.onSample(snap(cpu = 0.95)) == Parallelism(2, 4))
  }
}
