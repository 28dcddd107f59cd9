package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "t", "event_type")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"), col("event_type"))

  test("stage order is enforced: events before the previous stage don't count") {
    // user 1: view@10 click@20 purchase@30  → full funnel
    // user 2: click@5 view@10 (click never after view) → stops at view
    // user 3: view@10 click@20 purchase@15 (purchase before click) → stops at click
    // user 4: purchase@1 only → not even stage 1
    val events = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "click"), (2L, 10L, "view"),
      (3L, 10L, "view"), (3L, 20L, "click"), (3L, 15L, "purchase"),
      (4L, 1L, "purchase"))
    val got = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).as[(Long, Long, Long)].head()
    assert(got == ((3L, 2L, 1L)))
  }

  test("strictly-after: same-timestamp next-stage event does not qualify") {
    val events = ev((1L, 10L, "view"), (1L, 10L, "click"))
    val got = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
      Seq("view", "click")).as[(Long, Long)].head()
    assert(got == ((1L, 0L)))
  }

  test("earliest-qualifying time is used, not any qualifying time") {
    // view@10 and view@50; click@20 counts because the EARLIEST view is 10.
    val events = ev((1L, 50L, "view"), (1L, 10L, "view"), (1L, 20L, "click"))
    val got = Funnel.funnelCounts(events, "user_id", "ts", "event_type",
      Seq("view", "click")).as[(Long, Long)].head()
    assert(got == ((1L, 1L)))
  }

  test("real events table: survivor counts are monotone non-increasing") {
    val got = Funnel.funnelCounts(tables.events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).as[(Long, Long, Long)].head()
    assert(got._1 >= got._2 && got._2 >= got._3)
    assert(got._1 > 0)
  }
}
