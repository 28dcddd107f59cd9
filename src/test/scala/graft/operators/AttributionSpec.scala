package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

  test("linearTouch: equal split with remainder to the LAST touch") {
    // conversion rev=10 with 3 touches in window → 3,3,4 (last gets 4)
    val conv = Seq((1L, 100L, ts(10), 10L))
      .toDF("user_id", "event_id", "ts", "rev_milli")
    val touches = Seq((1L, ts(1), "ad"), (1L, ts(2), "email"), (1L, ts(3), "search"))
      .toDF("user_id", "touch_ts", "touch_type")
    val got = Attribution.linearTouch(conv, touches, windowUs = 3600L * 1000000)
      .orderBy("attr_type").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("ad", 1L, 3L), ("email", 1L, 3L), ("search", 1L, 4L)))
  }

  test("linearTouch: out-of-window and touchless conversions go direct") {
    val conv = Seq(
      (1L, 100L, ts(1000), 7L), // touch exists but 990 min earlier > 1h window
      (2L, 101L, ts(5), 9L))    // no touches at all
      .toDF("user_id", "event_id", "ts", "rev_milli")
    val touches = Seq((1L, ts(10), "ad")).toDF("user_id", "touch_ts", "touch_type")
    val got = Attribution.linearTouch(conv, touches, windowUs = 3600L * 1000000)
      .orderBy("attr_type").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("direct", 2L, 16L)))
  }

  test("linearTouch conserves revenue exactly on testdata") {
    val ev = tables.events.select("user_id", "event_id", "event_type", "ts", "value")
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 1000 + 0.5).cast("long").as("rev_milli"))
    val tw = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "ts").orderBy(col("event_id").desc)
    val touches = ev.filter(col("event_type") =!= "purchase")
      .withColumn("__rn", row_number().over(tw)).filter(col("__rn") === 1)
      .select(col("user_id"), col("ts").as("touch_ts"),
        col("event_type").as("touch_type"))
    val got = Attribution.linearTouch(conv, touches, windowUs = 604800000000L)
    val credited = got.agg(sum("rev_milli")).as[Long].collect().head
    val total = conv.agg(sum("rev_milli")).as[Long].collect().head
    assert(credited == total && total > 0)
  }

  test("linearTouch guards: window validated") {
    val conv = Seq((1L, 1L, ts(1), 1L)).toDF("user_id", "event_id", "ts", "rev_milli")
    val touches = Seq((1L, ts(0), "x")).toDF("user_id", "touch_ts", "touch_type")
    intercept[IllegalArgumentException](Attribution.linearTouch(conv, touches, 0L))
  }
}
