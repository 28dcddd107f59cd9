package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch marketing attribution over an event stream — the
  * credit-assignment step between raw touchpoints and revenue
  * reporting. Last-touch lives in the at01 entry (composed from
  * [[AsOfJoin.backward]]); this module adds LINEAR attribution: a
  * conversion's revenue is split equally across every touch inside
  * the lookback window, in exact integer milli-units — credit =
  * rev div n per touch with the remainder assigned to the LAST touch
  * (deterministic, and the invariant Σcredits = Σrev holds exactly,
  * spec-gated).
  *
  * Scale shape: one user-keyed equi-join between conversions and
  * touches with the window predicate riding it (volume bounded by
  * touches-per-user × conversions-per-user inside the lookback — the
  * funnel/sessions skew axis: cap bot users upstream), two
  * conversion-keyed windows (count + last-touch rank) over the joined
  * rows, one anti join for unattributed conversions, and a final
  * type-keyed aggregate. Nothing collects.
  */
object Attribution {

  /** @param conv    (user_id, event_id, ts, rev_milli) conversions —
    *                event_id must be unique (the credit partition key)
    * @param touches (user_id, touch_ts, touch_type), deduped so
    *                (user_id, touch_ts) is unique (tie-free ordering)
    * @param windowUs lookback in microseconds (touch_ts <= ts, age <=
    *                windowUs)
    * @return (attr_type, n_credits, rev_milli) with unattributed
    *         conversions under 'direct' */
  def linearTouch(conv: DataFrame, touches: DataFrame,
                  windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    // ONE user-keyed left join; the window predicate becomes a 0/1
    // flag so both the credited rows and the no-touch conversions
    // fall out of the same joined frame.
    val inWindow = col("touch_ts").isNotNull && col("touch_ts") <= col("ts") &&
      unix_micros(col("ts")) - unix_micros(col("touch_ts")) <= windowUs
    val byConv = Window.partitionBy("user_id", "event_id")
    val joined = conv.join(touches, Seq("user_id"), "left")
      .withColumn("__in", when(inWindow, 1L).otherwise(0L))
      .withColumn("__n", sum("__in").over(byConv))
    val credited = joined.filter(col("__in") === 1)
      .withColumn("__rk", row_number().over(byConv.orderBy(col("touch_ts").desc)))
      .select(col("touch_type").as("attr_type"),
        when(col("__rk") === 1,
          col("rev_milli") - (col("__n") - 1) * expr("rev_milli div __n"))
          .otherwise(expr("rev_milli div __n")).as("credit"))
    val direct = joined.filter(col("__n") === 0)
      .groupBy("user_id", "event_id", "rev_milli").agg(count(lit(1)).as("__drop"))
      .select(lit("direct").as("attr_type"), col("rev_milli").as("credit"))
    credited.unionAll(direct)
      .groupBy("attr_type")
      .agg(count(lit(1)).as("n_credits"), sum("credit").as("rev_milli"))
  }
}
