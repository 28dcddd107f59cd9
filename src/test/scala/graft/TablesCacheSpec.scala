package graft

import java.lang.ref.WeakReference

/** Pins VERDICT-r8 "What's wrong" #2: the table memo must not outlive
  * its session. The memo is the session's own temp-view catalog, so
  * there is no process-global graft state to leak. Proven in three
  * parts:
  *
  *  1. a dropped child session whose work went through the memo
  *     collects (the memo adds no retention);
  *  2. if a session IS retained after running shuffle/AQE queries, every
  *     retaining reference is one of Spark's own shared stage-pool
  *     thread-locals — never graft state. (Measured on Spark 4.1: the
  *     global `QueryStageCreator`/`shuffle-exchange`/
  *     `ResultQueryStageExecution`/`broadcast-exchange` workers never
  *     die and permanently hold the session that was ACTIVE WHEN THE
  *     THREAD WAS CREATED — `withThreadLocalCaptured` restores the
  *     inherited value after each task, so later sessions never
  *     displace it. Bounded by pool size, mitigated by
  *     [[GraftSession]]'s root-session warm-up, not fixable from
  *     library code.)
  *  3. within a live session the memo really dedups the expensive
  *     footer-read (the stored plan is reused by object identity).
  */
class TablesCacheSpec extends SparkSpec {

  // Builds the child in a method so no local in the test frame keeps a
  // strong reference once it returns (locals live to end-of-frame).
  // Accesses avoid shuffles: a shuffle-free plan never touches the
  // shared AQE pools, so part 1 isolates the memo's own behavior.
  private def touchChildSession(): WeakReference[AnyRef] = {
    val child = spark.newSession()
    val t = Tables(child, sfDir)
    assert(t.region.collect().length == 5)
    assert(t.nation.select("n_name").collect().nonEmpty)
    new WeakReference(child)
  }

  private def gcUntilCleared(ref: WeakReference[AnyRef], rounds: Int): Boolean = {
    var tries = 0
    while (ref.get() != null && tries < rounds) {
      System.gc()
      val ballast = new Array[Byte](8 << 20) // pressure so G1 actually runs
      assert(ballast.length > 0)
      Thread.sleep(50)
      tries += 1
    }
    ref.get() == null
  }

  test("a dropped session (memo entries and all) is collectable") {
    assert(gcUntilCleared(touchChildSession(), 50),
      "child session still strongly reachable — the memo (or something " +
        "below it) pins dropped sessions")
  }

  private val sparkPoolPrefixes = Seq("QueryStageCreator", "shuffle-exchange",
    "ResultQueryStageExecution", "broadcast-exchange", "subquery")

  // All live threads whose (inheritable) thread-locals reference `target`.
  private def threadLocalHolders(target: AnyRef): Seq[String] = {
    val threads = Thread.getAllStackTraces.keySet().toArray(new Array[Thread](0))
    threads.toSeq.flatMap { t =>
      Seq("threadLocals", "inheritableThreadLocals").flatMap { fld =>
        val f = classOf[Thread].getDeclaredField(fld)
        f.setAccessible(true)
        val map = f.get(t)
        val table = if (map == null) null else {
          val tf = map.getClass.getDeclaredField("table")
          tf.setAccessible(true)
          tf.get(map).asInstanceOf[Array[AnyRef]]
        }
        if (table == null) Nil
        else table.toSeq.filter(_ != null).flatMap { e =>
          val vf = e.getClass.getDeclaredField("value")
          vf.setAccessible(true)
          if (vf.get(e) eq target) Some(t.getName) else None
        }
      }
    }
  }

  test("any retention of an AQE-running session is Spark's pools, not graft's") {
    val child = spark.newSession()
    val t = Tables(child, sfDir)
    assert(t.region.count() == 5) // shuffle + AQE: may grow a shared pool
    val ref = new WeakReference[AnyRef](child)
    if (!gcUntilCleared(ref, 10)) {
      val target = ref.get()
      if (target != null) { // still pinned: every holder must be a Spark pool thread
        val holders = threadLocalHolders(target)
        assert(holders.nonEmpty,
          "session is pinned but by NO thread-local — a strong reference " +
            "outside Spark's pools (i.e. plausibly graft state) retains it")
        val foreign = holders.filterNot(h => sparkPoolPrefixes.exists(h.startsWith))
        assert(foreign.isEmpty,
          s"session retained by unexpected threads: $foreign")
        info(s"retained (as measured) by Spark pool threads: ${holders.distinct}")
      }
    } else info("not retained — Spark's pools did not grow during this query")
  }

  test("the memo dedups the footer-read within a live session") {
    val t1 = Tables(spark, sfDir)
    val t2 = Tables(spark, sfDir)
    // Both resolve the view's STORED plan: the leaf LogicalRelation
    // (holding the FileIndex built by the one real read) is the same
    // object — the second access did no file listing or footer read.
    def leaf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectLeaves().head
    assert(leaf(t1.region) eq leaf(t2.region))
  }

  test("memo entries are per-session: a child session resolves its own plan") {
    val child = spark.newSession()
    def leaf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collectLeaves().head
    val a = leaf(Tables(spark, sfDir).customer)
    val b = leaf(Tables(child, sfDir).customer)
    assert(!(a eq b), "temp views are session-scoped; plans must not cross")
  }
}
