package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.round4

/** Gap-based sessionization and event-sequence analytics — the batch
  * complement to the streaming session windows (q29/st01). Clickstream
  * curation pipelines use these to turn a raw 100 TB event log into
  * per-session training examples and behavioral statistics.
  *
  * Scale shape: everything here is ONE shuffle on the user key. The
  * per-user window sort is bounded by that user's event count (the only
  * skew axis — a bot user with 10^8 events sorts on one task; cap or
  * pre-filter such keys upstream, the same advice as the funnel
  * operator). No driver participation, no global sort.
  */
object Sessions {

  /** Assign a per-user session sequence number: a new session starts when
    * the gap since the user's previous event exceeds `gapSeconds`.
    *
    * The classic lag-then-cumulative-sum formulation, both over the SAME
    * user-keyed window — Catalyst plans one Exchange + one per-key sort
    * and evaluates both window functions in a single Window operator
    * (same partitioning, same ordering). `idCol` breaks timestamp ties so
    * the numbering is deterministic under any physical row order.
    *
    * @return input columns + `session_id` (1-based, dense per user in
    *         (ts, id) order)
    */
  def assignSessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    require(!events.columns.contains("session_id"),
      "input already has a session_id column — rename it (assignSessions generates session_id)")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    // Integer microsecond arithmetic: the gap comparison is exact, no
    // FP-interval semantics to diverge from the oracle.
    val newSession = when(
      prevTs.isNull ||
        unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    events.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session aggregate statistics over [[assignSessions]] output:
    * start/end timestamps, event count and the sum of an integer-unit
    * value column (caller quantizes — order-free exact sums, the house
    * FP discipline). One additional hash aggregation on (user,
    * session_id); output is |sessions|, never raw event volume.
    *
    * @return (userCol, session_id, session_start, session_end, n_events,
    *         sum_units)
    */
  def sessionStats(
      sessioned: DataFrame,
      userCol: String,
      tsCol: String,
      unitsCol: String): DataFrame =
    sessioned
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(unitsCol)).as("sum_units"))

  /** First-order Markov transition counts between consecutive event types
    * per user: (from_type, to_type, n, p) where `p` is the row-normalized
    * transition probability (round4 — the house FP discipline; n and the
    * per-from total are exact longs, so the single division is
    * cross-engine deterministic).
    *
    * One user-keyed window (lead) + one hash aggregation on the type
    * pair + one tiny window over |types|² rows for the normalizer.
    * Output is bounded by |event types|², whatever the event volume —
    * the transition matrix of a 100 TB clickstream is still k×k.
    */
  def transitions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val norm = Window.partitionBy("from_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pairs.withColumn("p",
      round4(col("n").cast("double") / sum(col("n")).over(norm).cast("double")))
  }

  /** Third-order path mining: counts of CONSECUTIVE event-type
    * triples per user in (ts, id) order — one step up from
    * [[transitions]]' first-order pairs, the "view → click → purchase"
    * pattern table. Same plan shape: both `lead`s share ONE user-keyed
    * window (one Exchange, one per-user sort), then a hash agg on the
    * triple; output is bounded by |types|³ whatever the event volume.
    *
    * @return (t1, t2, t3, n) */
  def pathTrigrams(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .select(col(typeCol).as("t1"),
        lead(col(typeCol), 1).over(w).as("t2"),
        lead(col(typeCol), 2).over(w).as("t3"))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).as("n"))
  }

  /** Consecutive-day activity streaks (gaps-and-islands): per user,
    * the number of distinct active-day runs, the longest run, and the
    * active-day total — the retention/engagement primitive behind
    * "7-day streak" features.
    *
    * The classic island id: within a user, day − row_number(day) is
    * CONSTANT across a consecutive run and distinct between runs. One
    * user-keyed shuffle total: the window, the island agg and the
    * user agg all share the user-hash partitioning (the island key
    * only refines it), so Catalyst plans a single Exchange; per-user
    * work is bounded by that user's ACTIVE DAYS (≤ calendar), not
    * event volume — the day dedup happens first.
    *
    * @return (userCol, n_active_days, n_streaks, max_streak) */
  def activityStreaks(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val ud = events
      .select(col(userCol), to_date(col(tsCol)).as("day"))
      .distinct()
    val w = Window.partitionBy(userCol).orderBy("day")
    ud.withColumn("__island", date_sub(col("day"), row_number().over(w)))
      .groupBy(col(userCol), col("__island"))
      .agg(count(lit(1)).as("__len"))
      .groupBy(userCol)
      .agg(sum("__len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("__len").as("max_streak"))
  }

  /** Rolling active-user series: per active day, DAU and the
    * trailing-`windowDays` active-user count (WAU at 7), plus the
    * DAU/WAU stickiness ratio. Distinct-over-sliding-window does not
    * decompose, so the scale-safe exact form EXPLODES each (user, day)
    * into the `windowDays` future days it keeps the user "active" for
    * (a fixed ×window blowup of the user-DAY table — bounded by users
    * × calendar, NOT event volume — then one day-keyed distinct agg).
    * Days are restricted to the observed-day spine via a broadcast
    * semi join. The ratio is one IEEE division over exact counts.
    *
    * @return (day, dau, wau, stickiness) for every active day */
  def rollingActive(events: DataFrame, userCol: String, tsCol: String,
                    windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366,
      s"windowDays=$windowDays out of (0, 366] — the explode factor IS the window")
    // the user-day table feeds THREE consumers (spine, DAU, the
    // rolled expansion) — materialize it once so the raw event scan
    // and the dedup shuffle are paid once, not three times
    TextDedup.withWorkingSet(events
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("day"))
      .distinct()) { ud =>
      val spine = ud.select("day").distinct()
      val dau = ud.groupBy("day").agg(count_distinct(col("__u")).as("dau"))
      val rolled = ud
        .select(col("__u"), explode(sequence(lit(0), lit(windowDays - 1))).as("__i"),
          col("day"))
        .select(col("__u"), date_add(col("day"), col("__i")).as("day"))
        .join(spine.hint("broadcast"), Seq("day"), "left_semi")
        .groupBy("day").agg(count_distinct(col("__u")).as("wau"))
      dau.join(rolled, Seq("day"))
        .withColumn("stickiness",
          col("dau").cast("double") / col("wau").cast("double"))
    }
  }
}
