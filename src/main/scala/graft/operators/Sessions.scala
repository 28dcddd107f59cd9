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
}
