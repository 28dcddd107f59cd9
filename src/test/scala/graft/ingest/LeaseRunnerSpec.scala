package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class LeaseRunnerSpec extends AnyFunSuite {

  test("lease extends periodically until closed") {
    val runner = new LeaseRunner(() => true, renewEveryMs = 20)
    try {
      val deadline = System.currentTimeMillis + 5000
      while (runner.extensionCount < 3 && System.currentTimeMillis < deadline)
        Thread.sleep(10)
      assert(runner.extensionCount >= 3)
      assert(!runner.hasFailed)
    } finally runner.close()
  }

  test("lease stops on first failed extension") {
    var calls = 0
    val runner = new LeaseRunner(() => { calls += 1; calls < 3 }, renewEveryMs = 10)
    try {
      val deadline = System.currentTimeMillis + 5000
      while (!runner.hasFailed && System.currentTimeMillis < deadline)
        Thread.sleep(10)
      assert(runner.hasFailed)
      val at = calls
      Thread.sleep(60)
      assert(calls == at, "no extensions after failure")
    } finally runner.close()
  }
}
