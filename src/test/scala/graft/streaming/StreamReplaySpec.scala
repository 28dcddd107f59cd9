package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamReplaySpec extends SparkSpec {
  import spark.implicits._

  private def batchSessions = tables.events
    .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
    .agg(count(lit(1)).as("n"))
    .select(col("user_id"), col("session_window.start").as("session_start"), col("n"))

  test("micro-batch replay with bounded late arrivals converges to the batch result") {
    val streamed = StreamReplay.sessionReplay(
        spark, tables.events.select("user_id", "event_id", "ts"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toSeq
    val batch = batchSessions
      .orderBy("user_id", "session_start")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"streamed ${streamed.size} sessions != batch ${batch.size}")
  }

  test("the late subset is genuinely displaced (the replay is not a trivial ordered feed)") {
    // The displacement predicate (event_id % 13 == 0) must select a
    // non-empty subset of the testdata, or the late-data path is
    // untested vacuously.
    val lateRows = tables.events.filter(col("event_id") % 13 === 0).count()
    assert(lateRows > 0, "testdata must contain displaced-late event ids")
  }
}
