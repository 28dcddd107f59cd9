package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval concurrency: for half-open intervals [start, end) grouped
  * by a key, the peak number of simultaneously open intervals and the
  * earliest instant it is reached — the classic capacity question
  * (concurrent sessions, open connections, simultaneous jobs).
  *
  * Sweep-line as relational algebra: each interval contributes a +1
  * boundary at `start` and a −1 at `end`; the peak is the max running
  * sum of boundary deltas in time order. Half-open semantics fall out
  * of the per-instant PRE-AGGREGATION (an end and a start at the same
  * instant net to 0 before the scan ever sees them), so no fragile
  * sort-tiebreak between +1/−1 rows is needed — and the running max /
  * argmin outputs are order-independent across equal instants, making
  * the result deterministic under any partitioning.
  *
  * Scale shape: the groupBy collapse is the scalable step — map-side
  * combine reduces 2·|intervals| boundary rows to at most |distinct
  * instants| per key BEFORE the shuffle, so the per-key running-sum
  * window's input is bounded by the time span's granularity (e.g.
  * seconds in a day), not by data volume. For keys whose distinct
  * instants are themselves at scan scale, swap the window for
  * [[GlobalRank.withGlobalCumSum]] per key — same algebra, two-phase
  * scan. A plain per-row window without the collapse would funnel
  * every raw event of a hot key through one task.
  */
object Intervals {

  /** @param df       one row per interval
    * @param keyCol   grouping key (concurrency is per key)
    * @param startCol inclusive start, integral (e.g. epoch micros)
    * @param endCol   exclusive end, integral, must be > start
    * @return (keyCol, peak, peak_at): max simultaneously open interval
    *         count and the earliest boundary instant where it holds */
  def maxConcurrency(df: DataFrame, keyCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val boundaries = df.select(col(keyCol), col(startCol).as("t"), lit(1L).as("d"))
      .unionAll(df.select(col(keyCol), col(endCol).as("t"), lit(-1L).as("d")))
      .groupBy(col(keyCol), col("t")).agg(sum(col("d")).as("d"))
    val running = boundaries.withColumn("run",
      sum(col("d")).over(Window.partitionBy(keyCol).orderBy("t")))
    val peaked = running.withColumn("peak",
      max(col("run")).over(Window.partitionBy(keyCol)))
    peaked.filter(col("run") === col("peak"))
      .groupBy(col(keyCol))
      .agg(max(col("peak")).as("peak"), min(col("t")).as("peak_at"))
  }
}
