package graft.operators

import java.sql.Date

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("gapFillForwardFill fills gaps and carries the last observation") {
    val ev = Seq(
      (1L, "a", d("2024-01-01"), 10L),
      (1L, "a", d("2024-01-01"), 5L), // same day, sums to 15
      (1L, "a", d("2024-01-04"), 7L),
      (2L, "a", d("2024-01-02"), 3L))
      .toDF("user_id", "event_type", "day", "cents")
    val got = TimeSeries.gapFillForwardFill(ev, Seq("user_id", "event_type"), "day", "cents")
      .orderBy("user_id", "day")
      .as[(Long, String, Date, Option[Long], Option[Long])].collect().toSeq

    // spine = 2 keys x 4 days (global range 01-01..01-04)
    assert(got.size == 8)
    val u1 = got.filter(_._1 == 1L).map(r => (r._3.toString, r._4, r._5))
    assert(u1 == Seq(
      ("2024-01-01", Some(15L), Some(15L)),
      ("2024-01-02", None, Some(15L)), // gap: forward-filled
      ("2024-01-03", None, Some(15L)),
      ("2024-01-04", Some(7L), Some(7L))))
    val u2 = got.filter(_._1 == 2L).map(r => (r._3.toString, r._4, r._5))
    assert(u2 == Seq(
      ("2024-01-01", None, None), // before first observation: stays null
      ("2024-01-02", Some(3L), Some(3L)),
      ("2024-01-03", None, Some(3L)),
      ("2024-01-04", None, Some(3L))))
  }

  test("gapFillForwardFill spine is keys x days, independent of event count") {
    val ev = tables.events.select(col("user_id"), col("event_type"),
      to_date(col("ts")).as("day"), lit(1L).as("v"))
    val got = TimeSeries.gapFillForwardFill(ev, Seq("user_id", "event_type"), "day", "v")
    val keys = ev.select("user_id", "event_type").distinct().count()
    val days = ev.agg(
      (datediff(max("day"), min("day")) + 1).as("n")).as[Long].head()
    assert(got.count() == keys * days)
  }

  test("gapFillForwardFill scans the input once — daily is a materialized working set") {
    val ev = tables.events.select(col("user_id"), col("event_type"),
      to_date(col("ts")).as("day"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    // Default (eager) mode: the three branches read the persisted daily
    // aggregate — one raw scan during the build, and the returned plan
    // bottoms out at the checkpointed result, not at the parquet scan.
    // (A lazy daily measures at THREE raw scans: Catalyst collapses the
    // derived distinct/min-max branches into direct scans.)
    val got = TimeSeries.gapFillForwardFill(ev, Seq("user_id", "event_type"), "day", "cents")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan parquet"),
      s"default mode must return the materialized working-set result:\n${plan.take(1500)}")
    // Lazy mode stays pushdown-able (no checkpoint) and row-identical.
    spark.conf.set(TextDedup.MaterializeConf, "none")
    val lazyRows = try {
      val lz = TimeSeries.gapFillForwardFill(ev, Seq("user_id", "event_type"), "day", "cents")
      assert(lz.queryExecution.executedPlan.toString.contains("FileScan parquet"))
      lz.collect().toSet
    } finally spark.conf.unset(TextDedup.MaterializeConf)
    assert(lazyRows == got.collect().toSet)
  }

  test("cohortRetention: day-0 row is the full cohort at retention 1.0") {
    val got = TimeSeries.cohortRetention(tables.events, "user_id", "ts")
    val day0 = got.filter(col("days_since") === 0)
      .select("cohort_day", "n_users", "cohort_size", "retention_pct")
      .as[(Date, Long, Long, Double)].collect()
    assert(day0.nonEmpty)
    assert(day0.forall { case (_, n, size, pct) => n == size && pct == 1.0 })
    // cohort sizes partition the user base: every user is in exactly one cohort
    val totalUsers = tables.events.select("user_id").distinct().count()
    assert(day0.map(_._2).sum == totalUsers)
    // retention never exceeds the cohort
    val bad = got.filter(col("n_users") > col("cohort_size")).count()
    assert(bad == 0)
  }

  test("cohortRetention matches a hand-computed tiny case") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-03 10:00:00"),
      (2L, "2024-01-01 11:00:00"),
      (3L, "2024-01-03 09:00:00"), (3L, "2024-01-03 23:00:00"))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = TimeSeries.cohortRetention(ev, "user_id", "ts")
      .select("cohort_day", "days_since", "n_users", "cohort_size")
      .as[(Date, Int, Long, Long)].collect().toSet
    assert(got == Set(
      (d("2024-01-01"), 0, 2L, 2L),
      (d("2024-01-01"), 2, 1L, 2L), // user 1 returns on day 2
      (d("2024-01-03"), 0, 1L, 1L))) // user 3's two same-day events collapse
  }

  test("downsampleOhlc: one bar per key-hour with deterministic open/close") {
    val ev = Seq(
      // user 1, hour 10: open=5.0 (earliest), close=2.0 (latest), high=9.0, low=2.0
      (1L, "2024-01-01 10:05:00", 100L, 5.0),
      (1L, "2024-01-01 10:20:00", 101L, 9.0),
      (1L, "2024-01-01 10:50:00", 102L, 2.0),
      // user 1, hour 11: single event -> all four values equal
      (1L, "2024-01-01 11:30:00", 103L, 7.5),
      // user 2, hour 10: same-ts tie broken by id (open=id 200, close=id 201)
      (2L, "2024-01-01 10:00:00", 200L, 1.0),
      (2L, "2024-01-01 10:00:00", 201L, 3.0))
      .toDF("user_id", "s", "event_id", "value")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("event_id"), col("value"))
    val got = TimeSeries.downsampleOhlc(ev, "user_id", "ts", "event_id", "value")
      .select(col("user_id"), hour(col("bucket")).as("h"),
        col("open_v"), col("high_v"), col("low_v"), col("close_v"), col("n_events"))
      .as[(Long, Int, Double, Double, Double, Double, Long)].collect().toSet
    assert(got == Set(
      (1L, 10, 5.0, 9.0, 2.0, 2.0, 3L),
      (1L, 11, 7.5, 7.5, 7.5, 7.5, 1L),
      (2L, 10, 1.0, 3.0, 1.0, 3.0, 2L)))
  }

  test("downsampleOhlc plans as one hash aggregation, no window sort") {
    val df = TimeSeries.downsampleOhlc(
      tables.events.select("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value")
    df.collect()
    val plan = graft.PlanSig.finalPlanText(df)
    assert(!plan.contains("Window"), s"OHLC must not window-sort:\n${plan.take(1200)}")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"one shuffle on (key, bucket) expected:\n${plan.take(1200)}")
  }

  test("gapFillForwardFill rejects input columns colliding with generated names") {
    // Same fail-fast discipline as mergeInto/snapshotDiff (ADVICE r13):
    // a keyCol or valueCol named like a stage-internal/output column
    // would otherwise fail late with an ambiguous reference.
    val ev = Seq((1L, Date.valueOf("2024-01-01"), 5L))
      .toDF("day_value", "day", "v")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.gapFillForwardFill(ev, Seq("day_value"), "day", "v")
    }
    assert(e.getMessage.contains("day_value"))
    val ev2 = Seq((1L, Date.valueOf("2024-01-01"), 5L)).toDF("k", "day", "filled_value")
    intercept[IllegalArgumentException] {
      TimeSeries.gapFillForwardFill(ev2, Seq("k"), "day", "filled_value")
    }
  }

  test("decayedSum halves the DAILY total once per whole half-life (step decay)") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-15 10:00:00"), 100L), // age 0 half-lives → 100
      (1L, ts("2024-01-15 23:00:00"), 11L),  // same day: daily total 111 → 111
      (1L, ts("2024-01-08 10:00:00"), 100L), // age exactly 7d = 1 half-life → 50
      (1L, ts("2024-01-01 10:00:00"), 101L), // age 14d = 2 half-lives → 25 (101>>2)
      (2L, ts("2024-01-10 00:00:00"), 7L))   // age 5d → 0 whole half-lives → 7
      .toDF("user_id", "ts", "vu")
    val got = TimeSeries.decayedSum(ev, "user_id", "ts", "vu", halfLifeDays = 7)
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 312L, 111L + 50L + 25L),
      (2L, 1L, 7L, 7L)))
  }

  test("decayedSum shift saturates to zero at >= 63 half-lives") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), Long.MaxValue / 4),
      (1L, ts("2026-01-01 00:00:00"), 10L)) // 731 days later; halfLife 1d → age 731 ≥ 63
      .toDF("user_id", "ts", "vu")
    val got = TimeSeries.decayedSum(ev, "user_id", "ts", "vu", halfLifeDays = 1)
      .select("decayed_units").as[Long].head()
    assert(got == 10L) // the old event contributes exactly 0, no shift wraparound
  }

  test("decayedSum raises on negative units instead of flooring toward -inf") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), -5L))
      .toDF("user_id", "ts", "vu")
    val e = intercept[Exception] {
      TimeSeries.decayedSum(ev, "user_id", "ts", "vu", 7).collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }

  test("decayedSum pre-reduces to the daily working set — one raw scan") {
    val ev = tables.events.select(col("user_id"), col("ts"),
      floor(col("value") * 1000 + 0.5).cast("long").as("vu"))
    val got = TimeSeries.decayedSum(ev, "user_id", "ts", "vu", 7)
    val plan = got.queryExecution.executedPlan.toString
    // The returned plan bottoms out at the checkpointed daily aggregate:
    // no parquet scan may appear downstream of the working set.
    assert(!plan.contains("FileScan parquet"),
      s"decay math must run over the materialized daily working set:\n${plan.take(1200)}")
  }

  test("rollingZscore flags a hand-computed spike, baseline excludes it") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // values 10,12,10,12 then a 30-spike: baseline of the spike is the
    // 4 prior rows only (n=4, s=44, ss=488): dev = 30·4−44 = 76,
    // n²var = 4·488−44² = 16; 76² = 5776 > 2²·16 → flagged,
    // zsq_centi = 5776·100 DIV 16 = 36100. Earlier rows: tiny dev or
    // n < minBaseline → unflagged.
    val ev = Seq(10L, 12L, 10L, 12L, 30L).zipWithIndex.map { case (v, i) =>
      (1L, ts(f"2024-01-01 00:0$i:00"), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "vu")
    val got = TimeSeries.rollingZscore(ev, "user_id", "ts", "event_id", "vu",
      window = 4, minBaseline = 2, threshold = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 30L, 4L, 36100L)))
  }

  test("rollingZscore: zero-variance baselines never flag (no div-by-zero)") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = (0 to 5).map(i => (1L, ts(f"2024-01-01 00:0$i:00"), i.toLong,
      if (i == 5) 1000L else 7L)).toDF("user_id", "ts", "event_id", "vu")
    // constant baseline → n²·var = 0 → excluded by contract, despite
    // the enormous deviation
    val got = TimeSeries.rollingZscore(ev, "user_id", "ts", "event_id", "vu",
      window = 4, minBaseline = 2, threshold = 2).count()
    assert(got == 0L)
  }

  test("rollingZscore: all three moment windows share ONE Window operator") {
    val ev = tables.events.select(col("user_id"), col("ts"), col("event_id"),
      floor(col("value") * 1000 + 0.5).cast("long").as("vu"))
    val plan = TimeSeries.rollingZscore(ev, "user_id", "ts", "event_id", "vu")
      .queryExecution.executedPlan.toString
    assert(plan.split("\\bWindow\\b").length - 1 == 1,
      s"expected one Window operator:\n${plan.take(1500)}")
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected one shuffle (the key partition):\n${plan.take(1500)}")
  }

  test("ewmaMilli folds the hand-computed integer recursion in (ts, id) order") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // α = 2/10, values 100, 200, 50:
    // s1 = 100_000
    // s2 = (2·200·1000 + 8·100_000) DIV 10 = (400_000 + 800_000)/10 = 120_000
    // s3 = (2·50·1000 + 8·120_000) DIV 10 = (100_000 + 960_000)/10 = 106_000
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 0L, 100L),
      (1L, ts("2024-01-01 00:01:00"), 1L, 200L),
      (1L, ts("2024-01-01 00:02:00"), 2L, 50L),
      (2L, ts("2024-01-01 00:00:00"), 3L, 7L)) // single event: s = v·1000
      .toDF("user_id", "ts", "event_id", "vu")
    val got = TimeSeries.ewmaMilli(ev, "user_id", "ts", "event_id", "vu", 2, 10)
      .as[(Long, Long, Long)].collect().toMap2
    assert(got(1L) == ((3L, 106000L)))
    assert(got(2L) == ((1L, 7000L)))
  }

  test("ewmaMilli is partitioning-invariant (ordered fold, not arrival order)") {
    val ev = tables.events.select(col("user_id"), col("ts"), col("event_id"),
      floor(col("value") * 1000 + 0.5).cast("long").as("vu"))
    val a = TimeSeries.ewmaMilli(ev.repartition(1), "user_id", "ts", "event_id", "vu", 2, 10)
      .as[(Long, Long, Long)].collect().toSet
    val b = TimeSeries.ewmaMilli(ev.repartition(16), "user_id", "ts", "event_id", "vu", 2, 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(a.nonEmpty && a == b)
  }

  test("ewmaMilli guards: smoothing factor validated") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 1L))
      .toDF("user_id", "ts", "event_id", "vu")
    intercept[IllegalArgumentException](
      TimeSeries.ewmaMilli(ev, "user_id", "ts", "event_id", "vu", 0, 10))
    intercept[IllegalArgumentException](
      TimeSeries.ewmaMilli(ev, "user_id", "ts", "event_id", "vu", 10, 10))
  }

  private implicit class ToMap2(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("rollingZscore guards: window, minBaseline, threshold validated") {
    val ev = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 1L))
      .toDF("user_id", "ts", "event_id", "vu")
    intercept[IllegalArgumentException](
      TimeSeries.rollingZscore(ev, "user_id", "ts", "event_id", "vu", window = 1))
    intercept[IllegalArgumentException](
      TimeSeries.rollingZscore(ev, "user_id", "ts", "event_id", "vu", minBaseline = 40))
    intercept[IllegalArgumentException](
      TimeSeries.rollingZscore(ev, "user_id", "ts", "event_id", "vu", threshold = 0))
  }

  test("timeWeightedAvgDaily: step-function weighting, by hand") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1, one day: 10 holds 2s, 40 holds 6s, 100 closes (0 weight)
      //   twa = (10*2e6 + 40*6e6) / 8e6 = 32.5
      (1L, t("2024-01-01 00:00:00"), 1L, 10L),
      (1L, t("2024-01-01 00:00:02"), 2L, 40L),
      (1L, t("2024-01-01 00:00:08"), 3L, 100L),
      // user 1, next day: single event -> zero span -> NULL
      (1L, t("2024-01-02 09:00:00"), 4L, 7L),
      // user 2: two events at the SAME instant -> zero span -> NULL
      (2L, t("2024-01-01 05:00:00"), 5L, 1L),
      (2L, t("2024-01-01 05:00:00"), 6L, 9L))
      .toDF("user_id", "ts", "event_id", "vu")
    val got = TimeSeries.timeWeightedAvgDaily(
        ev.repartition(4), "user_id", "ts", "event_id", "vu")
      .select("user_id", "day", "n_events", "twa_milli")
      .as[(Long, Date, Long, Option[Double])].collect()
      .map(r => (r._1, r._2.toString) -> ((r._3, r._4))).toMap
    assert(got == Map(
      (1L, "2024-01-01") -> ((3L, Some(32.5))),
      (1L, "2024-01-02") -> ((1L, None)),
      (2L, "2024-01-01") -> ((2L, None))))
  }

  test("cusumPeak: closed form equals the recursive CUSUM definition") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rnd = new scala.util.Random(23)
    val rows = (1 to 120).map { i =>
      (s"u${i % 4}", t(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
        i.toLong, rnd.nextInt(100).toLong)
    }
    val df = rows.toDF("user_id", "ts", "event_id", "vu").repartition(6)
    val ref = rows.map(_._4).sum / rows.size // exact: non-negative units
    val expected = rows.groupBy(_._1).map { case (u, rs) =>
      var s = 0L; var peak = 0L
      rs.sortBy(r => (r._2.getTime, r._3)).foreach { r =>
        s = math.max(0L, s + (r._4 - ref)); peak = math.max(peak, s)
      }
      u -> ((rs.size.toLong, ref, peak))
    }
    val got = TimeSeries.cusumPeak(df, "user_id", "ts", "event_id", "vu")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
  }

  test("cusumPeak: flat series at the reference never leaves zero") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val df = (1 to 10).map(i => ("a", t(f"2024-01-01 00:00:$i%02d"), i.toLong, 5L))
      .toDF("user_id", "ts", "event_id", "vu")
    val got = TimeSeries.cusumPeak(df, "user_id", "ts", "event_id", "vu")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 10L, 5L, 0L)))
  }

  test("timeWeightedAvgDaily equals plain avg for equally spaced events") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // Equal 5s gaps: twa over [t0, t3) = avg of the three HELD values.
    val ev = Seq(
      (1L, t("2024-03-05 10:00:00"), 1L, 3L),
      (1L, t("2024-03-05 10:00:05"), 2L, 5L),
      (1L, t("2024-03-05 10:00:10"), 3L, 13L),
      (1L, t("2024-03-05 10:00:15"), 4L, 999L))
      .toDF("user_id", "ts", "event_id", "vu")
    val got = TimeSeries.timeWeightedAvgDaily(ev, "user_id", "ts", "event_id", "vu")
      .select("twa_milli").as[Double].collect().toSeq
    assert(got == Seq((3.0 + 5.0 + 13.0) / 3))
  }

  test("cumulativeDistinctDaily: first-seen decomposition equals brute recount") {
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 12:00:00")
    // u1 on d1,d2,d4; u2 on d2 twice; u3 on d4. Day 3 has activity
    // from u1? no — day 3 is absent entirely (no spine row expected).
    val ev = Seq(
      (1L, t("2024-01-01")), (1L, t("2024-01-02")), (2L, t("2024-01-02")),
      (2L, t("2024-01-02")), (1L, t("2024-01-04")), (3L, t("2024-01-04")))
      .toDF("user_id", "ts")
    val got = TimeSeries.cumulativeDistinctDaily(ev, "user_id", "ts")
      .orderBy("day")
      .as[(java.sql.Date, Long, Long, Long, Long)].collect().toSeq
      .map { case (d, a, b, c, e) => (d.toString, a, b, c, e) }
    assert(got == Seq(
      ("2024-01-01", 1L, 1L, 1L, 1L),
      ("2024-01-02", 3L, 2L, 1L, 2L),
      ("2024-01-04", 2L, 2L, 1L, 3L)))
  }

  test("cumulativeDistinctDaily on testdata: final cum equals global distinct") {
    val ev = tables.events
    val rows = TimeSeries.cumulativeDistinctDaily(ev, "user_id", "ts")
      .orderBy("day").collect()
    val globalDistinct = ev.select("user_id").distinct().count()
    assert(rows.last.getAs[Long]("cum_users") == globalDistinct)
    assert(rows.map(_.getAs[Long]("n_new")).sum == globalDistinct)
    // cum is the running sum of n_new and never decreases.
    val cums = rows.map(_.getAs[Long]("cum_users")).toSeq
    assert(cums == rows.map(_.getAs[Long]("n_new")).scanLeft(0L)(_ + _).drop(1).toSeq)
  }

  test("trendingRanks: per-day ranks with deltas vs previous active day") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 09:00:00")
    // day1: a=2, b=1 → a rank1, b rank2. day2: b=3, a=1 → b rank1 (Δ+1), a rank2 (Δ-1).
    // day3: only c (first appearance → null delta), rank1.
    val ev = Seq(
      ("a", ts("2024-01-01")), ("a", ts("2024-01-01")), ("b", ts("2024-01-01")),
      ("b", ts("2024-01-02")), ("b", ts("2024-01-02")), ("b", ts("2024-01-02")),
      ("a", ts("2024-01-02")), ("c", ts("2024-01-03")))
      .toDF("k", "ts")
    val got = TimeSeries.trendingRanks(ev, "k", "ts")
      .orderBy("day", "k")
      .as[(java.sql.Date, String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
      .map { case (d, k, n, r, p, dl) => (d.toString, k, n, r, p, dl) }
    assert(got == Seq(
      ("2024-01-01", "a", 2L, 1L, None, None),
      ("2024-01-01", "b", 1L, 2L, None, None),
      ("2024-01-02", "a", 1L, 2L, Some(1L), Some(-1L)),
      ("2024-01-02", "b", 3L, 1L, Some(2L), Some(1L)),
      ("2024-01-03", "c", 1L, 1L, None, None)))
  }

  test("trendingRanks: tie on count breaks by key asc") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 09:00:00")
    val ev = Seq(("x", ts("2024-02-01")), ("y", ts("2024-02-01")))
      .toDF("k", "ts")
    val got = TimeSeries.trendingRanks(ev, "k", "ts")
      .orderBy("rnk").select("k").as[String].collect().toSeq
    assert(got == Seq("x", "y"))
  }

  test("dateDimension: continuous spine with correct attributes") {
    val rows = Seq(d("2024-02-27"), d("2024-03-02")).toDF("d")
    val got = TimeSeries.dateDimension(rows, "d").orderBy("day").collect()
    assert(got.length == 5) // leap year: 27,28,29 Feb + 1,2 Mar
    val feb29 = got(2)
    assert(feb29.getDate(0).toString == "2024-02-29")
    assert(feb29.getAs[Int]("doy") == 60 && feb29.getAs[Boolean]("month_end"))
    val mar1 = got(3)
    assert(mar1.getAs[Boolean]("month_start") && mar1.getAs[Int]("q") == 1)
    // 2024-03-02 is a Saturday → dow 6, weekend
    assert(got(4).getAs[Int]("dow") == 6 && got(4).getAs[Boolean]("weekend"))
  }

  test("monthOverMonth: hand-checked deltas and ratios, null first month") {
    val rows = Seq(
      (d("2024-01-05"), 10L), (d("2024-01-20"), 20L),
      (d("2024-02-10"), 45L),
      (d("2024-04-01"), 90L)) // March absent: no spine row, April follows Feb
      .toDF("d", "cents")
    val got = TimeSeries.monthOverMonth(rows, "d", "cents")
      .orderBy("month")
      .as[(java.sql.Date, Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect().toSeq
      .map { case (m, n, u, p, dl, r) => (m.toString, n, u, p, dl, r) }
    assert(got == Seq(
      ("2024-01-01", 2L, 30L, None, None, None),
      ("2024-02-01", 1L, 45L, Some(30L), Some(15L), Some(1.5)),
      ("2024-04-01", 1L, 90L, Some(45L), Some(45L), Some(2.0))))
  }

  test("seasonalIndexDow: hand-checked ratio, ISO weekday numbering") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 09:00:00")
    // 2024-01-01 is a Monday. Mon: 30 units over 1 day; Tue: 10+20
    // over 2 days (avg 15). Overall: 60 over 3 days (avg 20).
    val ev = Seq(
      (ts("2024-01-01"), 30L), (ts("2024-01-02"), 10L),
      (ts("2024-01-09"), 14L), (ts("2024-01-09"), 6L))
      .toDF("ts", "vu")
    val got = TimeSeries.seasonalIndexDow(ev, "ts", "vu")
      .orderBy("dow").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 30L, 1.5), (2L, 2L, 30L, 0.75)))
  }

  test("dayVsWeekdayMean: flags only days off their own weekday's mean") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 09:00:00")
    // Mondays: 10, 30 (mean 20) → ratios 0.5 (low) and 1.5 (high);
    // Tuesday: single day → ratio exactly 1.0, never anomalous.
    val ev = Seq(
      (ts("2024-01-01"), 10L), (ts("2024-01-08"), 30L), (ts("2024-01-02"), 99L))
      .toDF("ts", "vu")
    val got = TimeSeries.dayVsWeekdayMean(ev, "ts", "vu", hi = 1.3, lo = 0.7)
      .orderBy("day")
      .as[(java.sql.Date, Long, Long, Double, Boolean)].collect().toSeq
      .map { case (d, w, u, r, a) => (d.toString, w, u, r, a) }
    assert(got == Seq(
      ("2024-01-01", 1L, 10L, 0.5, true),
      ("2024-01-02", 2L, 99L, 1.0, false),
      ("2024-01-08", 1L, 30L, 1.5, true)))
    intercept[IllegalArgumentException](
      TimeSeries.dayVsWeekdayMean(ev, "ts", "vu", hi = 0.5, lo = 0.9))
  }

  test("seasonalIndexDow on testdata: day-weighted mean of indexes is 1") {
    val ev = tables.events.withColumn("vu",
      floor(col("value") * 100 + 0.5).cast("long"))
    val rows = TimeSeries.seasonalIndexDow(ev, "ts", "vu").collect()
    assert(rows.map(_.getAs[Long]("dow")).toSet.subsetOf((1L to 7L).toSet))
    val nDays = rows.map(_.getAs[Long]("n_days")).sum
    val weighted = rows.map(r =>
      r.getAs[Double]("seasonal_index") * r.getAs[Long]("n_days")).sum
    assert(math.abs(weighted / nDays - 1.0) < 1e-9)
  }
}
