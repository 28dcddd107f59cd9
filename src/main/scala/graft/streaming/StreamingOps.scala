package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time streaming operators (SURVEY.md §2-B Q29) — extension
  * surface beyond the reference, which has no event-time semantics (its
  * only window is the processing-time flush interval). These are the
  * same expressions the batch queries use, applied under `readStream`
  * with a watermark; verified by MemoryStream late-data tests.
  */
object StreamingOps {

  /** Tumbling event-time window aggregate with watermark; late rows
    * beyond `watermark` are dropped. */
  def tumblingCounts(events: DataFrame, tsCol: String, windowLen: String,
                     watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("window.start").as("w"), col("n"), col("sv"))

  /** Sliding event-time window aggregate with watermark. */
  def slidingCounts(events: DataFrame, tsCol: String, windowLen: String,
                    slide: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))

  /** Session windows (gap-based) per key with watermark. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("session_window.start").as("session_start"), col("n"))

  /** Streaming dedup bounded by the watermark (state is GC'd once the
    * watermark passes — the scale-safe form of streaming distinct). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           watermark: String, keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream inner equi-join with a bounded event-time band:
    * rows join when `|leftTs - rightTs| <= band`. BOTH sides carry a
    * watermark and the join condition bounds the time difference, so
    * each side's buffered state is GC'd once the other side's watermark
    * passes — without the band, stream-stream join state grows forever
    * (the canonical streaming-join scale bug).
    *
    * Column requirements: `key` exists on both sides; timestamp columns
    * are distinct names.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   band: String, watermark: String,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark).withColumnRenamed(key, s"__r_$key")
    l.join(r,
      col(key) === col(s"__r_$key") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $band") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $band"),
      joinType) // "leftOuter": unmatched left rows emit null-padded once the watermark closes their band
      .drop(s"__r_$key")
  }
}
