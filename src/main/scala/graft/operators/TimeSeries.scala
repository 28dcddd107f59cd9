package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.round4

/** Time-series completion and cohort analytics over an event stream.
  *
  * Both operators follow the engine's scale rules: the only shuffles are
  * keyed aggregations/windows (parallel across keys), the date spine is
  * derived from a 1-row global min/max aggregate broadcast against the
  * key domain, and nothing is collected to the driver.
  */
object TimeSeries {

  /** Dense daily spine per key with forward-filled values.
    *
    * Missing (key, day) combinations are materialized via
    * `sequence(min_day, max_day)` over the distinct key domain, then the
    * last observed aggregate is carried forward with an
    * ignore-nulls `last` window. Spine size is |keys| x days — it grows
    * with the key domain and the time range, never with raw event volume,
    * so a 100 TB event table with 10M keys x 365 days stays a 3.6B-row
    * spine regardless of input row count. The fill window partitions by
    * key (parallel, bounded per-task state); days-per-key is the only
    * per-partition axis.
    *
    * @param events input with `keyCols`, a date column `dayCol` and a
    *               numeric `valueCol` already in integer units (the
    *               caller picks the quantization so sums stay order-free)
    * @return (keyCols*, day, day_value [null on gap days], filled_value
    *         [last non-null at or before day; null before first obs])
    */
  def gapFillForwardFill(
      events: DataFrame,
      keyCols: Seq[String],
      dayCol: String,
      valueCol: String): DataFrame = {
    // Same generated-name collision precondition as mergeInto /
    // snapshotDiff: an input column named like one of the stage-internal
    // or output columns would fail late with an ambiguous-reference
    // error (or silently misbind in the fill join).
    val reserved = Set("day_value", "filled_value", "__d0", "__d1")
    val clash = (keyCols :+ dayCol :+ valueCol).filter(reserved)
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with gapFillForwardFill's " +
        s"generated columns (${reserved.mkString(", ")}) — rename the input column(s)")
    val kc = keyCols.map(col)
    // The daily aggregate feeds THREE branches (the global range, the
    // key domain, and the fill join). Deriving the branches from a lazy
    // `daily` does NOT share the scan: Catalyst collapses
    // distinct-over-aggregate and min/max-over-aggregate into direct
    // (column-pruned) scans of the raw input — three event-table scans
    // (measured). Materializing daily via the working-set discipline
    // pins it to ONE raw scan; daily is |keys| x active-days rows,
    // orders of magnitude smaller than a 100 TB event table.
    // Deriving the range from data (not literals) keeps the operator
    // scale-factor- and backfill-agnostic.
    TextDedup.withWorkingSet(
      events.groupBy(kc :+ col(dayCol): _*).agg(sum(valueCol).as("day_value"))) { daily =>
      val range = daily.agg(min(dayCol).as("__d0"), max(dayCol).as("__d1"))
      val spine = daily.select(kc: _*).distinct()
        .crossJoin(broadcast(range))
        .select(kc :+ explode(sequence(col("__d0"), col("__d1"))).as(dayCol): _*)
      val w = Window.partitionBy(kc: _*).orderBy(col(dayCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, keyCols :+ dayCol, "left")
        .select(kc ++ Seq(col(dayCol), col("day_value"),
          last(col("day_value"), ignoreNulls = true).over(w).as("filled_value")): _*)
    }
  }

  /** OHLC downsampling: per key per time bucket, the open (value at the
    * earliest (ts, id)), high, low, close (value at the latest (ts, id))
    * and event count — the bar-chart primitive behind metric rollups and
    * market-data pipelines.
    *
    * ONE hash aggregation: open/close are `min_by`/`max_by` over the
    * composite (ts, id) order (codegen'd, map-side combinable partial
    * aggregates — no per-key window sort), so the operator is a single
    * shuffle on (key, bucket) and the output is |keys x buckets|
    * whatever the raw event volume. `idCol` breaks ts ties so the
    * selection is deterministic under any partitioning.
    *
    * @return (keyCol, bucket, open_v, high_v, low_v, close_v, n_events)
    */
  def downsampleOhlc(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCol: String,
      bucket: String = "hour"): DataFrame = {
    val ord = struct(col(tsCol), col(idCol))
    events
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(
        min_by(col(valueCol), ord).as("open_v"),
        max(col(valueCol)).as("high_v"),
        min(col(valueCol)).as("low_v"),
        max_by(col(valueCol), ord).as("close_v"),
        count(lit(1)).as("n_events"))
  }

  /** Daily time-weighted average (TWAP-style): the value is a step
    * function that holds from each event until the next event of the
    * same key within the day; the average weights each value by how
    * long it held, over the day's observed span [first event, last
    * event). The honest summary for irregularly-sampled series — a
    * plain AVG over-weights bursts of closely-spaced events.
    *
    * Exactness: with `milliCol` integer-quantized and timestamps in
    * epoch micros, numerator Σ vᵢ·(tᵢ₊₁−tᵢ) and denominator
    * (t_last − t_first) are exact int64 sums under any partitioning
    * (a day bounds Σdt at 86.4e9 µs, so milli-values up to ~10⁸ fit);
    * only the final division is FP, rounded on the round4 path. Days
    * whose span is zero (a single event, or all events at one instant)
    * have no defined average and yield NULL.
    *
    * Shape: one (key, day)-partitioned lead window + one hash
    * aggregation — both parallel across (key, day); equal-instant
    * events order by `idCol` (zero-width segments, so which value
    * "holds" for 0 µs cannot affect the result, but the deterministic
    * order keeps plans replayable).
    *
    * @return (keyCol, day, n_events, twa_milli) — twa in the same
    *         milli-units as `milliCol`, round4, NULL on zero span */
  def timeWeightedAvgDaily(events: DataFrame, keyCol: String, tsCol: String,
                           idCol: String, milliCol: String): DataFrame = {
    val ev = events
      .withColumn("__day", to_date(col(tsCol)))
      .withColumn("__tu", unix_micros(col(tsCol)))
    val w = Window.partitionBy(col(keyCol), col("__day"))
      .orderBy(col("__tu"), col(idCol))
    ev.withColumn("__nt", lead(col("__tu"), 1).over(w))
      .groupBy(col(keyCol), col("__day").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("__nt").isNotNull,
          col(milliCol) * (col("__nt") - col("__tu")))).as("__num"),
        (max(col("__tu")) - min(col("__tu"))).as("__den"))
      .withColumn("twa_milli", when(col("__den") > 0,
        round4(col("__num").cast("double") / col("__den").cast("double"))))
      .drop("__num", "__den")
  }

  /** One-sided (upper) CUSUM drift detection per key: the classic
    * change-point statistic S_i = max(0, S_{i−1} + (x_i − ref)),
    * whose PEAK over the series flags a sustained upward shift away
    * from the reference level — the standard monitor for data drift
    * a rolling z-score misses (many small same-signed deviations, each
    * individually unremarkable).
    *
    * Not a sequential fold here: CUSUM has the closed form
    * S_i = P_i − min(0, min_{j≤i} P_j) with P the prefix sum of
    * (x − ref), so both the trajectory and its peak are two stock
    * window functions over exact int64 arithmetic — identical in any
    * engine, deterministic under any partitioning (ties ordered by
    * `idCol`). The reference level is the global integer mean
    * (Σx DIV n, exact truncating division on non-negative units),
    * computed as a 1-row aggregate broadcast against the events — the
    * decayedSum global-max-day pattern, nothing collected.
    *
    * Shape: one 1-row broadcast + one key-partitioned window pass +
    * one hash aggregation. Output: (keyCol, n_events, ref_units,
    * peak_cusum) — peak in the same units as `unitsCol`.
    */
  def cusumPeak(events: DataFrame, keyCol: String, tsCol: String,
                idCol: String, unitsCol: String): DataFrame = {
    val ref = events.agg(
      expr(s"sum($unitsCol) DIV count(1)").as("ref_units"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.crossJoin(broadcast(ref))
      .withColumn("__p", sum(col(unitsCol) - col("ref_units")).over(w))
      .withColumn("__s", col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("ref_units")).as("ref_units"),
        max(col("__s")).as("peak_cusum"))
  }

  /** Time-decayed aggregate: each (key, day)'s total integer-unit value
    * is halved once per `halfLifeDays` of age (whole half-lives — STEP
    * decay applied to the DAILY TOTAL; that granularity is the
    * definition, not an approximation, and it is what lets the raw
    * volume pre-reduce) and summed per key, giving a recency-weighted
    * score ("decayed popularity") as of the newest day in the data.
    *
    * The decay is an arithmetic right shift on the integer units, so —
    * unlike an exp()/pow() weighting — every engine computes the
    * identical result under any partitioning and summation order: there
    * is no floating point anywhere. The cost is granularity (weights are
    * exact powers of two at whole-half-life boundaries), which is the
    * right trade for a deterministic pipeline score; callers needing
    * smooth decay divide `halfLifeDays` down.
    *
    * Shape: ONE hash aggregation on the key after a broadcast of the
    * 1-row global max-day; output is |keys|. Ages ≥ 63 half-lives decay
    * to exactly 0 (the shift cap — also the int64 bound).
    *
    * @param events input with `keyCol`, a timestamp `tsCol` and a
    *               NON-NEGATIVE integer-unit `unitsCol` (negative units
    *               would floor toward -inf in the shift, diverging from
    *               truncating engines; guarded via raise_error on the
    *               daily total, which a negative input drives negative
    *               whenever it matters)
    * @return (keyCol, n_events, raw_units, decayed_units)
    */
  def decayedSum(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      unitsCol: String,
      halfLifeDays: Int): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    // Decay depends only on the event's DAY, so the raw volume reduces
    // to a per-(key, day) aggregate before any decay math: ONE raw scan,
    // and the materialized working set (the gapFill discipline) is
    // |keys × active days| — orders of magnitude under event volume.
    val daily = events
      .select(col(keyCol), to_date(col(tsCol)).as("__day"),
        col(unitsCol).cast("long").as("__u"))
      .groupBy(col(keyCol), col("__day"))
      .agg(count(lit(1)).as("__n"), sum("__u").as("__u"))
    TextDedup.withWorkingSet(daily) { ev =>
      val ref = ev.agg(max("__day").as("__ref"))
      // DIV (integer) age, raise_error guard riding the value column
      // (the mergeInto discipline — stays inside codegen, costs nothing
      // when clean), arithmetic right shift = exact power-of-two decay.
      val decayed = expr(
        s"""CASE
           |  WHEN __u < 0 THEN raise_error(
           |    concat('decayedSum requires non-negative units, got ', __u))
           |  WHEN datediff(__ref, __day) DIV $halfLifeDays >= 63 THEN 0L
           |  ELSE shiftright(__u, cast(datediff(__ref, __day) DIV $halfLifeDays AS INT))
           |END""".stripMargin)
      ev.crossJoin(broadcast(ref))
        .groupBy(col(keyCol))
        .agg(sum(col("__n")).as("n_events"),
          sum(col("__u")).as("raw_units"),
          sum(decayed).as("decayed_units"))
    }
  }

  /** Rolling z-score anomaly detection over per-key event streams —
    * the monitoring primitive of the time-series family: flag events
    * whose value deviates from their own trailing baseline by more
    * than `threshold` standard deviations.
    *
    * ENTIRELY integer arithmetic (the PageRank/ml01 discipline), which
    * is unusual for a z-score: with exact trailing moments
    * n, s = Σv, ss = Σv² over the baseline frame,
    *
    *   |z| > T  ⇔  (v·n − s)² > T²·(n·ss − s²)
    *
    * — the variance denominators cancel, so the threshold test needs
    * NO division, no sqrt, no doubles, and is bitwise deterministic
    * and exactly oracle-reproducible. The reported magnitude is
    * z² in centi-units ((v·n−s)²·100 DIV (n·ss−s²), exact integer
    * division). The baseline frame EXCLUDES the current row (ROWS
    * w PRECEDING TO 1 PRECEDING — an anomaly must not dilute its own
    * baseline) and an event only qualifies with a full-enough baseline
    * (n ≥ minBaseline) of nonzero variance.
    *
    * One shuffle: all three moment windows share one (key, ts, id)
    * Window operator; the flag predicate is a codegen'd projection.
    * Overflow bound (documented): (v·n − s)²·100 < 2^63 — units up to
    * 10^6 with windows up to ~90 rows are safe; re-quantize coarser
    * beyond.
    *
    * @param events   (keyCol, tsCol, idCol, unitsCol) rows; idCol makes
    *                 the within-ts order deterministic
    * @return anomalous events only: (key, id, units, base_n, zsq_centi)
    */
  def rollingZscore(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      unitsCol: String,
      window: Int = 30,
      minBaseline: Int = 10,
      threshold: Int = 3): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(minBaseline >= 2 && minBaseline <= window,
      s"minBaseline must be in [2, window], got $minBaseline")
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(-window.toLong, -1L)
    val v = col(unitsCol).cast("long")
    val moments = events.select(
      col(keyCol), col(idCol), v.as("__v"),
      count(lit(1)).over(w).as("__n"),
      sum(v).over(w).as("__s"),
      sum(v * v).over(w).as("__ss"))
    val dev = col("__v") * col("__n") - col("__s")             // n·(v − mean)
    val nvar = col("__n") * col("__ss") - col("__s") * col("__s") // n²·var
    moments
      .filter(col("__n") >= minBaseline && nvar > 0 &&
        dev * dev > lit(threshold.toLong * threshold) * nvar)
      .select(col(keyCol), col(idCol), col("__v").as("units"),
        col("__n").as("base_n"),
        expr("((__v * __n - __s) * (__v * __n - __s) * 100) DIV (__n * __ss - __s * __s)")
          .as("zsq_centi"))
  }

  /** Per-key exponentially-weighted moving average (EWMA) with a
    * RATIONAL smoothing factor α = alphaNum/alphaDen, folded in exact
    * integer milli-units:
    *
    *   s₁ = v₁·1000;  sₜ = (alphaNum·vₜ·1000 + (alphaDen−alphaNum)·sₜ₋₁) DIV alphaDen
    *
    * — the smoothing/forecast primitive (level estimate) of the
    * time-series family, bitwise deterministic because every step is
    * integer arithmetic on an explicitly ordered sequence.
    *
    * EWMA is a NON-ASSOCIATIVE recursion, so it cannot ride a window
    * aggregate; the standard exact formulation is an ordered per-key
    * array + a left fold (`aggregate` HOF here, `list_reduce` in the
    * oracle). That means one collected array per key in executor
    * memory — bounded by per-key event cardinality, the documented
    * memory axis (a key with 10^8 events needs pre-aggregation to a
    * coarser grain first, e.g. the [[decayedSum]] daily reduction).
    * One shuffle (the groupBy); the fold is a codegen'd projection.
    *
    * @return (key, n_events, ewma_milli) — the final level per key in
    *         milli-units of the input units column
    */
  def ewmaMilli(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      unitsCol: String,
      alphaNum: Long,
      alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaDen > alphaNum,
      s"smoothing must satisfy 0 < alphaNum < alphaDen, got $alphaNum/$alphaDen")
    val ordered = events
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col(tsCol).as("t"), col(idCol).as("i"),
          col(unitsCol).cast("long").as("v")))).as("__seq"))
      .withColumn("__vs", expr("transform(__seq, x -> x.v)"))
    ordered.select(col(keyCol), col("n_events"),
      expr(
        s"""aggregate(
           |  slice(__vs, 2, greatest(size(__vs) - 1, 0)),
           |  element_at(__vs, 1) * 1000L,
           |  (acc, x) -> ($alphaNum * x * 1000 + ${alphaDen - alphaNum} * acc) DIV $alphaDen)
           |""".stripMargin).as("ewma_milli"))
  }

  /** Cohort retention matrix: users grouped by their first-activity day,
    * counted on each subsequent active day.
    *
    * Two keyed aggregations (first day per user; distinct active days per
    * user) and one equi-join on the user key — all shuffle-parallel on
    * user_id, output bounded by days². `retention_pct` divides by the
    * day-0 cohort size via a cohort-partitioned window (day 0 always
    * exists: every user is active on their own first day).
    *
    * @return (cohort_day, days_since, n_users, cohort_size, retention_pct)
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val act = events
      .select(col(userCol), to_date(col(tsCol)).as("__day"))
      .distinct()
    val firstDay = act.groupBy(userCol).agg(min("__day").as("cohort_day"))
    val matrix = act.join(firstDay, userCol)
      .groupBy(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("days_since"))
      .agg(count(lit(1)).as("n_users"))
    val w = Window.partitionBy("cohort_day").orderBy("days_since")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    matrix.select(col("cohort_day"), col("days_since"), col("n_users"),
        first(col("n_users")).over(w).as("cohort_size"))
      .withColumn("retention_pct",
        round4(col("n_users").cast("double") / col("cohort_size")))
  }

  /** Daily activity with EXACT cumulative distinct users ("total users
    * ever seen up to this day") — the growth dashboard metric that is
    * NOT expressible as `count_distinct` over a running window without
    * either quadratic recount (re-scanning history per day) or
    * unbounded per-day state.
    *
    * The first-seen decomposition makes it two bounded shuffles: the
    * cumulative distinct count up to day D equals the number of users
    * whose FIRST day is <= D, so (1) a user-keyed hash agg finds each
    * user's first day (map-side partial, |users| keys), (2) a day-keyed
    * agg counts first-appearances and activity per day, (3) a running
    * sum over the day axis produces the cumulative series. The final
    * window is unpartitioned BY DESIGN: its input is one row per
    * calendar day — bounded by the time range (365/year), never by
    * event volume, so a single-task window over it is free at any SF.
    *
    * First-days are a subset of activity days by construction (a user's
    * first day IS an active day), hence the left join loses nothing.
    *
    * @return (day, n_events, n_active, n_new, cum_users) — all exact
    *         int64 counts */
  def cumulativeDistinctDaily(events: DataFrame, userCol: String,
                              tsCol: String): DataFrame = {
    val ev = events.select(col(userCol).as("__u"), to_date(col(tsCol)).as("day"))
    val newPerDay = ev.groupBy("__u").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n_new"))
    val actPerDay = ev.groupBy("day").agg(
      count(lit(1)).as("n_events"),
      count_distinct(col("__u")).as("n_active"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    actPerDay.join(newPerDay, Seq("day"), "left")
      .select(col("day"), col("n_events"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_users", sum("n_new").over(w))
  }

  /** Day-over-day trending ranks: per calendar day, rank keys by count
    * (ties broken by key asc — deterministic), then the rank delta vs
    * the key's previous ACTIVE day (positive = climbing). The "what's
    * trending today" primitive of a leaderboard/feed pipeline.
    *
    * Scale shape: the event-volume-sized work is ONE day+key hash
    * aggregate with map-side partial combine; both windows (rank within
    * day, lag within key) run over the aggregated series — days × keys
    * rows, bounded by calendar × key cardinality, never by event count.
    * Both are PARTITIONED windows (by day, by key): no single-task
    * global sort anywhere.
    *
    * @return (day, keyCol, n, rnk, prev_rnk, delta) — prev_rnk/delta
    *         null on a key's first active day */
  def trendingRanks(events: DataFrame, keyCol: String,
                    tsCol: String): DataFrame = {
    val perDay = events
      .groupBy(to_date(col(tsCol)).as("day"), col(keyCol))
      .agg(count(lit(1)).as("n"))
    val byDay = Window.partitionBy("day")
      .orderBy(col("n").desc, col(keyCol))
    val byKey = Window.partitionBy(keyCol).orderBy("day")
    perDay
      .withColumn("rnk", row_number().over(byDay).cast("long"))
      .withColumn("prev_rnk", lag("rnk", 1).over(byKey))
      .withColumn("delta", col("prev_rnk") - col("rnk"))
  }

  /** Seasonal-relative anomaly flags: each day's total compared to its
    * own WEEKDAY's mean — the deseasonalized counterpart of a plain
    * daily-mean threshold, so a naturally-quiet Sunday isn't flagged
    * low and a naturally-busy Monday isn't flagged high
    * ([[seasonalIndexDow]] is the index view of the same
    * decomposition). ratio = units_day · n_days(dow) / units(dow) —
    * one IEEE division of exact integers; flags compare that
    * deterministic double against the literal thresholds.
    *
    * Scale shape: the event-volume work is one day-keyed agg; the dow
    * marginals are |days|-bounded and broadcast back onto the daily
    * series.
    *
    * @return (day, dow, units, ratio, anomalous) */
  def dayVsWeekdayMean(events: DataFrame, tsCol: String, unitsCol: String,
                       hi: Double = 1.3, lo: Double = 0.7): DataFrame = {
    require(lo < hi, s"thresholds inverted: lo=$lo hi=$hi")
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(col(unitsCol)).as("units"))
      .withColumn("dow", (weekday(col("day")) + 1).cast("long"))
    val dw = daily.groupBy("dow")
      .agg(count(lit(1)).as("__nd"), sum("units").as("__ud"))
    daily.join(broadcast(dw), Seq("dow"))
      .withColumn("ratio",
        (col("units") * col("__nd")).cast("double") / col("__ud").cast("double"))
      .select(col("day"), col("dow"), col("units"), col("ratio"),
        (col("ratio") > hi || col("ratio") < lo).as("anomalous"))
  }

  /** Calendar (date) dimension generator — the warehouse date-spine
    * table, derived from the fact table's own min/max date: one row
    * per calendar day with the standard attributes (ISO weekday,
    * quarter, day-of-year, month boundaries, weekend flag). The
    * source scan reduces to a 1-row min/max aggregate; the spine is
    * bounded by the DATE RANGE (365/year) whatever the fact volume.
    *
    * @return (day, y, m, dom, dow 1=Mon..7=Sun, q, doy, month_start,
    *         month_end, weekend) */
  def dateDimension(df: DataFrame, dateCol: String): DataFrame =
    df.agg(min(col(dateCol)).as("lo"), max(col(dateCol)).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      .select(col("day"),
        year(col("day")).as("y"), month(col("day")).as("m"),
        dayofmonth(col("day")).as("dom"),
        (weekday(col("day")) + 1).as("dow"),
        quarter(col("day")).as("q"),
        dayofyear(col("day")).as("doy"),
        (col("day") === trunc(col("day"), "month")).as("month_start"),
        (col("day") === last_day(col("day"))).as("month_end"),
        (weekday(col("day")) >= 5).as("weekend"))

  /** Period-over-period (month) growth table: per calendar month, the
    * row count and exact integer unit total, plus the previous month's
    * total, the absolute delta and the growth ratio — the standard BI
    * "MoM" series. `unitsCol` must be integral (fixed-point upstream)
    * so delta is exact and the ratio is ONE IEEE division of
    * exactly-represented integers.
    *
    * Scale shape: one month-keyed hash agg carries the volume
    * (map-side partial); the lag window is unpartitioned BY DESIGN
    * over the |months| series — bounded by the calendar (the cd01
    * adjudication class).
    *
    * @return (month, n, units, prev_units, delta, ratio) — prev/delta/
    *         ratio null on the first month */
  def monthOverMonth(df: DataFrame, dateCol: String,
                     unitsCol: String): DataFrame = {
    val m = df.groupBy(trunc(col(dateCol), "month").as("month"))
      .agg(count(lit(1)).as("n"), sum(col(unitsCol)).as("units"))
    val w = Window.orderBy("month")
    m.withColumn("prev_units", lag("units", 1).over(w))
      .withColumn("delta", col("units") - col("prev_units"))
      .withColumn("ratio",
        col("units").cast("double") / col("prev_units").cast("double"))
  }

  /** Day-of-week seasonal index — the ratio-to-overall-average
    * decomposition step of classical seasonal analysis: index(dow) =
    * (mean daily total on that weekday) / (mean daily total overall),
    * >1 = that weekday runs hot. `unitsCol` must be integral
    * (fixed-point upstream) so every intermediate sum is exact int64
    * and the index is ONE IEEE division of exactly-represented
    * integers (products stay < 2^53 through ~sf100 at cent
    * quantization; re-quantize coarser beyond).
    *
    * Scale shape: the event-volume work is one day-keyed hash agg
    * (map-side partial, |days| keys); the dow agg runs over ≤
    * |days| rows and the overall total rides as a 1-row broadcast.
    *
    * @return (dow 1=Mon..7=Sun ISO, n_days, units, seasonal_index) */
  def seasonalIndexDow(events: DataFrame, tsCol: String,
                       unitsCol: String): DataFrame = {
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(col(unitsCol)).as("__units"))
    val byDow = daily
      .groupBy((weekday(col("day")) + 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"), sum("__units").as("units"))
    val totals = daily.agg(
      count(lit(1)).as("__days_tot"), sum("__units").as("__units_tot"))
    byDow.crossJoin(broadcast(totals))
      .select(col("dow"), col("n_days"), col("units"),
        ((col("units") * col("__days_tot")).cast("double") /
          (col("__units_tot") * col("n_days")).cast("double"))
          .as("seasonal_index"))
  }
}
