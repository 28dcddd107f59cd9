package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val ev = Seq(
    // user 1: two sessions (gap of 3h between event 2 and 3 > 1h gap)
    (1L, 1L, ts("2024-01-01 10:00:00"), "view", 10L),
    (1L, 2L, ts("2024-01-01 10:30:00"), "click", 20L),
    (1L, 3L, ts("2024-01-01 13:31:00"), "view", 30L),
    // user 2: one single-event session
    (2L, 4L, ts("2024-01-01 09:00:00"), "signup", 5L))
    .toDF("user_id", "event_id", "ts", "event_type", "vu")

  test("assignSessions splits on gaps > gapSeconds and numbers densely from 1") {
    val got = Sessions.assignSessions(ev, "user_id", "ts", "event_id", gapSeconds = 3600L)
      .select("user_id", "event_id", "session_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }

  test("a gap of exactly gapSeconds stays in the same session (strict >)") {
    val two = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, 2L, ts("2024-01-01 11:00:00"), 1L)) // exactly 3600s later
      .toDF("user_id", "event_id", "ts", "vu")
    val ids = Sessions.assignSessions(two, "user_id", "ts", "event_id", 3600L)
      .select("session_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("sessionStats aggregates bounds, counts and exact unit sums") {
    val s = Sessions.assignSessions(ev, "user_id", "ts", "event_id", 3600L)
    val got = Sessions.sessionStats(s, "user_id", "ts", "vu")
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Timestamp, Timestamp, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), 2L, 30L),
      (1L, 2L, ts("2024-01-01 13:31:00"), ts("2024-01-01 13:31:00"), 1L, 30L),
      (2L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), 1L, 5L)))
  }

  test("assignSessions rejects an input that already has session_id") {
    val bad = ev.withColumn("session_id", lit(1L))
    val e = intercept[IllegalArgumentException] {
      Sessions.assignSessions(bad, "user_id", "ts", "event_id", 3600L)
    }
    assert(e.getMessage.contains("session_id"))
  }

  test("both window functions plan into ONE Window operator (one Exchange)") {
    val plan = Sessions.assignSessions(ev, "user_id", "ts", "event_id", 3600L)
      .queryExecution.executedPlan.toString
    // lag and the running sum share partitioning+ordering; Catalyst must
    // not stack a second Window/Exchange pair.
    assert(plan.split("Window ").length - 1 <= 2, s"window stages exploded:\n$plan")
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one shuffle (the user key), got:\n$plan")
  }

  test("transitions counts consecutive type pairs per user and normalizes per from_type") {
    val got = Sessions.transitions(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // user 1: view->click, click->view; user 2: no pair
    assert(got == Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 1.0)))
  }

  test("transitions probabilities sum to 1 per from_type on real data") {
    val got = Sessions.transitions(tables.events, "user_id", "ts", "event_id", "event_type")
    val sums = got.groupBy("from_type").agg(sum("p").as("s"))
      .select("s").as[Double].collect()
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 0.001, s"p column sums to $s"))
  }

  test("pathTrigrams: hand-checked triples, user boundaries respected") {
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    // u1: a b c d → (a,b,c), (b,c,d); u2: x y → no triple
    val ev = Seq(
      (1L, 1L, ts(1), "a"), (1L, 2L, ts(2), "b"),
      (1L, 3L, ts(3), "c"), (1L, 4L, ts(4), "d"),
      (2L, 5L, ts(1), "x"), (2L, 6L, ts(2), "y"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val got = Sessions.pathTrigrams(ev, "user_id", "ts", "event_id", "event_type")
      .orderBy("t1").as[(String, String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", "c", 1L), ("b", "c", "d", 1L)))
  }

  test("pathTrigrams: both leads share one Window operator") {
    val plan = Sessions.pathTrigrams(
        tables.events, "user_id", "ts", "event_id", "event_type")
      .queryExecution.executedPlan.toString
    assert(plan.split("Window").length - 1 == 1,
      s"expected ONE Window operator:\n$plan")
  }

  test("activityStreaks: hand-checked islands, multi-event days dedup") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // u1: days 1,2,3 then 5,6 (two events on day 2 — one active day);
    // u2: single day.
    val ev = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-02")), (1L, ts("2024-01-02")),
      (1L, ts("2024-01-03")), (1L, ts("2024-01-05")), (1L, ts("2024-01-06")),
      (2L, ts("2024-03-01")))
      .toDF("user_id", "ts")
    val got = Sessions.activityStreaks(ev, "user_id", "ts")
      .orderBy("user_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 2L, 3L), (2L, 1L, 1L, 1L)))
  }

  test("rollingActive: hand-checked WAU window and stickiness") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    // u1 active d1, u2 active d1 and d8, u3 active d8.
    // d1: dau 2, wau 2. d8: dau 2, wau (d2..d8 window) = {u2,u3} = 2;
    // u1's d1 is 7 days before d8 — outside the trailing-7 window.
    val ev = Seq(
      (1L, ts("2024-01-01")), (2L, ts("2024-01-01")),
      (2L, ts("2024-01-08")), (3L, ts("2024-01-08")))
      .toDF("user_id", "ts")
    val got = Sessions.rollingActive(ev, "user_id", "ts", windowDays = 7)
      .orderBy("day")
      .as[(java.sql.Date, Long, Long, Double)].collect().toSeq
      .map { case (d, a, w, s) => (d.toString, a, w, s) }
    assert(got == Seq(
      ("2024-01-01", 2L, 2L, 1.0),
      ("2024-01-08", 2L, 2L, 1.0)))
    // widen the window to 8 days: u1 now counts on d8 → wau 3
    val wide = Sessions.rollingActive(ev, "user_id", "ts", windowDays = 8)
      .orderBy("day").as[(java.sql.Date, Long, Long, Double)].collect()
    assert(wide.last._3 == 3L && wide.last._4 == 2.0 / 3.0)
  }

  test("rollingActive guards: window bounds validated") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    intercept[IllegalArgumentException](Sessions.rollingActive(ev, "user_id", "ts", 0))
    intercept[IllegalArgumentException](Sessions.rollingActive(ev, "user_id", "ts", 400))
  }

  test("rollingActive reconciles with a brute windowed recount on testdata") {
    val got = Sessions.rollingActive(tables.events, "user_id", "ts", 7)
    val ud = tables.events
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val brute = ud.select(col("day")).distinct().as("s")
      .join(ud.as("x"),
        col("x.day") >= date_sub(col("s.day"), 6) && col("x.day") <= col("s.day"))
      .groupBy(col("s.day").as("day"))
      .agg(count_distinct(col("x.user_id")).as("wau"))
    val a = got.select("day", "wau").as[(java.sql.Date, Long)].collect().toSet
    val b = brute.as[(java.sql.Date, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
