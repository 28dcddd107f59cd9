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
}
