package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

class SimpleRetrySpec extends AnyFunSuite {

  private def failNTimes(n: Int): () => String = {
    var left = n
    () => { if (left > 0) { left -= 1; sys.error(s"boom $left") }; "ok" }
  }

  test("succeeds after transient failures") {
    val sleeps = ArrayBuffer[Long]()
    val r = SimpleRetry(attempts = 3, jitter = false, sleep = sleeps += _)
    val op = failNTimes(2)
    assert(r(op()) == "ok")
    assert(sleeps.toSeq == Seq(50L, 100L)) // exponential: base, base*2
  }

  test("exhausted attempts rethrow the last error") {
    val r = SimpleRetry(attempts = 2, jitter = false, sleep = _ => ())
    val op = failNTimes(5)
    val e = intercept[RuntimeException](r(op()))
    assert(e.getMessage.startsWith("boom"))
  }

  test("delay doubles and is capped at maxDelay") {
    val r = SimpleRetry(attempts = 10, baseDelayMs = 50, maxDelayMs = 2000)
    assert((0 to 6).map(r.delayMs) == Seq(50L, 100L, 200L, 400L, 800L, 1600L, 2000L))
  }

  test("jitter stays within ±20%") {
    val sleeps = ArrayBuffer[Long]()
    val r = SimpleRetry(attempts = 2, baseDelayMs = 1000, jitter = true, sleep = sleeps += _)
    intercept[RuntimeException](r(sys.error("x")))
    assert(sleeps.forall(s => s >= 800 && s <= 1200))
  }

  test("interruption aborts immediately without retry") {
    var calls = 0
    val r = SimpleRetry(attempts = 5, sleep = _ => ())
    intercept[InterruptedException](r { calls += 1; throw new InterruptedException })
    assert(calls == 1)
  }

  test("attempts must be positive (fatal config)") {
    intercept[IllegalArgumentException](SimpleRetry(attempts = 0))
  }
}
