package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state over streams via mapGroupsWithState /
  * flatMapGroupsWithState — the escape hatch for semantics the built-in
  * windowed aggregations can't express. State lives in the state store
  * (checkpointed, partitioned by key), so these scale with the key
  * cardinality across executors, not with stream length.
  */
object StatefulOps {

  /** Running per-key event count, maintained across micro-batches
    * (Update mode). */
  def runningCounts(events: Dataset[(Long, Double)]): Dataset[(Long, Long)] = {
    implicit val outEnc: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + it.size
          state.update(n)
          (key, n)
      }
  }

  /** Per-key admission limit across the whole stream: at most
    * `maxPerKey` events per key pass; the rest are dropped, however many
    * batches they span (Append mode, flatMap = 0..N outputs per group).
    */
  def rateLimit(events: Dataset[(Long, Double)], maxPerKey: Long): Dataset[(Long, Double)] = {
    implicit val outEnc: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Double)], state: GroupState[Long]) =>
          val used = state.getOption.getOrElse(0L)
          val admitted = it.take(math.max(0L, maxPerKey - used).toInt).toSeq
          state.update(used + admitted.size)
          admitted.iterator
      }
  }
}
