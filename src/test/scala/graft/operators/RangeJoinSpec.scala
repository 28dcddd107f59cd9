package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = tables.events

  /** Naive reference: key equi-join + range residual over the whole key
    * group — the semantics the banded plan must reproduce exactly. */
  private def naivePairs(lowerUs: Long, upperUs: Long) = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), unix_micros(col("ts")).as("pt"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("ct"))
    p.join(c, Seq("user_id"))
      .filter(col("ct") >= col("pt") + lowerUs && col("ct") < col("pt") + upperUs)
      .select("pid", "ct")
  }

  test("banded interval join == naive key+range join, pair for pair") {
    val (lower, upper) = (-600000000L, 0L) // [-10 min, 0)
    val banded = RangeJoin.intervalJoin(
        events.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id"), col("ts")),
        events.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts")),
        key = "user_id", leftTs = "ts", rightTs = "cts",
        lowerUs = lower, upperUs = upper)
      .select(col("pid"), unix_micros(col("cts")).as("ct"))
      .as[(Long, Long)].collect().sorted.toSeq
    val naive = naivePairs(lower, upper).as[(Long, Long)].collect().sorted.toSeq
    assert(banded.nonEmpty, "window must produce matches on the testdata")
    assert(banded == naive)
  }

  test("window ending on a bucket boundary over-covers but never over-matches") {
    // lower = -w, upper = 0: left timestamps exactly on a bucket edge
    // span two buckets where one contributes nothing — the residual
    // filter must keep the pair set identical to naive.
    val (lower, upper) = (-300000000L, 300000000L) // [-5 min, +5 min)
    val banded = RangeJoin.intervalJoin(
        events.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("user_id"), col("ts")),
        events.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts")),
        key = "user_id", leftTs = "ts", rightTs = "cts", lower, upper)
      .select(col("pid"), unix_micros(col("cts")).as("ct"))
      .as[(Long, Long)].collect().sorted.toSeq
    val naive = naivePairs(lower, upper).as[(Long, Long)].collect().sorted.toSeq
    assert(banded == naive)
  }

  test("countInRange keeps zero-match left rows with n_matches = 0") {
    val counted = RangeJoin.countInRange(
      events.filter(col("event_type") === "purchase"),
      events.filter(col("event_type") === "click").select("user_id", "ts"),
      key = "user_id", leftId = "event_id", leftTs = "ts", rightTs = "ts",
      lowerUs = -600000000L, upperUs = 0L)
    val nPurchases = events.filter(col("event_type") === "purchase").count()
    assert(counted.count() == nPurchases, "left join: one output row per purchase")
    assert(counted.filter(col("n_matches") === 0).count() > 0,
      "testdata has purchases with no preceding click in-window")
    val totalPairs = counted.agg(sum("n_matches")).as[Long].head()
    val naive = naivePairs(-600000000L, 0L).count()
    assert(totalPairs == naive)
  }

  test("pre-1970 timestamps bucket by floor division — banded == naive") {
    // Negative epoch micros: truncating division would round toward zero
    // (UP for negatives) and mis-bucket rows whose epoch isn't an exact
    // multiple of the window width. Timestamps straddle 1970 so both
    // signs and the zero boundary are exercised.
    val left = Seq(
      (1L, "k", "1969-12-31 23:55:00"), (2L, "k", "1969-06-15 12:34:56"),
      (3L, "k", "1970-01-01 00:03:00"), (4L, "k", "1969-12-31 23:59:59"))
      .toDF("pid", "k", "s").select(col("pid"), col("k"), to_timestamp(col("s")).as("lts"))
    val right = Seq(
      ("k", "1969-12-31 23:50:01"), ("k", "1969-12-31 23:57:30"),
      ("k", "1969-06-15 12:30:00"), ("k", "1969-06-15 12:26:00"),
      ("k", "1970-01-01 00:01:30"), ("k", "1969-12-31 23:59:00"))
      .toDF("k", "s").select(col("k"), to_timestamp(col("s")).as("rts"))
    val (lower, upper) = (-600000000L, 0L) // [-10 min, 0)
    val banded = RangeJoin.intervalJoin(left, right, "k", "lts", "rts", lower, upper)
      .select(col("pid"), unix_micros(col("rts")).as("ct"))
      .as[(Long, Long)].collect().sorted.toSeq
    val naive = left.join(right, Seq("k"))
      .filter(unix_micros(col("rts")) >= unix_micros(col("lts")) + lower &&
        unix_micros(col("rts")) < unix_micros(col("lts")) + upper)
      .select(col("pid"), unix_micros(col("rts")).as("ct"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(naive.nonEmpty, "fixture must produce matches")
    assert(banded == naive)
  }

  test("NTZ input in a non-UTC session fails loudly instead of shifting wall times") {
    // The NTZ→TIMESTAMP normalization reinterprets naive wall time in
    // the session zone; outside fixed-offset UTC (here: a DST zone) the
    // shift would silently produce wrong pairs, so the guard must fire
    // at plan build. With UTC restored the same inputs must join fine.
    val left = Seq((1L, "k", "2024-01-01 00:00:00")).toDF("pid", "k", "s")
      .select(col("pid"), col("k"), to_timestamp_ntz(col("s")).as("lts"))
    val right = Seq(("k", "2024-01-01 00:00:30")).toDF("k", "s")
      .select(col("k"), to_timestamp_ntz(col("s")).as("rts"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val ex = intercept[IllegalArgumentException] {
        RangeJoin.intervalJoin(left, right, "k", "lts", "rts", -60000000L, 60000000L)
      }
      assert(ex.getMessage.contains("timeZone"), ex.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
    val pairs = RangeJoin.intervalJoin(left, right, "k", "lts", "rts",
      -60000000L, 60000000L)
    assert(pairs.count() == 1)
  }

  test("the banded plan joins on (key, bucket) — no per-key cross product") {
    val plan = RangeJoin.intervalJoin(
      events.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      events.filter(col("event_type") === "click").select(col("user_id"), col("ts").as("cts")),
      "user_id", "ts", "cts", -600000000L, 0L).queryExecution.executedPlan.toString
    assert(plan.contains("__bucket"), s"bucket key must reach the join:\n${plan.take(800)}")
  }
}
