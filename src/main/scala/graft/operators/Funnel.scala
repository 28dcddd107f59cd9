package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many users reached
  * stage k having passed stages 1..k-1 *in time order* (each stage's
  * event must be strictly later than the user's earliest qualifying
  * event for the previous stage).
  *
  * Shape: one `groupBy(user)` min-aggregation per stage plus an
  * equi-join back to the (already user-keyed) previous stage — every
  * join and aggregation hashes on the same user key, so at cluster
  * scale the chain is one shuffle per stage over an always-shrinking
  * survivor set, never a sort of the whole stream. Per-user event
  * blowup (the skew risk of collect_list-style sequence scans) never
  * materializes: nothing here builds a per-user array.
  */
object Funnel {

  /** Per-stage earliest-completion times. Element k of the result is a
    * DataFrame (userCol, __t) of users who completed stages 0..k in
    * order, with __t = the earliest time stage k was completed after
    * the user's stage-(k-1) completion time.
    */
  def stageTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(tsCol).as("__t"))
    stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .join(prev.select(col(userCol), col("__t").as("__prev")), Seq(userCol))
        .filter(col(tsCol) > col("__prev"))
        .groupBy(userCol).agg(min(tsCol).as("__t"))
    }
  }

  /** One row of per-stage survivor counts, columns `n_<stage>`. The
    * final crossJoins combine single-row aggregates (broadcast-trivial).
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame =
    stageTimes(events, userCol, tsCol, typeCol, stages).zip(stages)
      .map { case (df, st) => df.agg(count(lit(1)).as(s"n_$st")) }
      .reduce(_.crossJoin(_))
}
