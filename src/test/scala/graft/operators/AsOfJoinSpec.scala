package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join attaches the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:20"), "t2"),
      (2L, ts("2024-01-01 10:00:10"), "t3"))
      .toDF("sym", "t_ts", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (2L, ts("2024-01-01 10:00:10"), 50.0), // equal ts: inclusive
      (2L, ts("2024-01-01 10:00:30"), 51.0))
      .toDF("sym", "q_ts", "price")

    val got = AsOfJoin.backward(trades, quotes, "sym", "t_ts", "q_ts", Seq("price"))
      .select("trade_id", "price").as[(String, Option[Double])].collect().toMap
    assert(got == Map("t1" -> Some(100.0), "t2" -> Some(101.0), "t3" -> Some(50.0)))
  }

  test("left rows before any right row get null") {
    val l = Seq((1L, ts("2024-01-01 09:00:00"), "early")).toDF("k", "lts", "name")
    val r = Seq((1L, ts("2024-01-01 10:00:00"), 5.0)).toDF("k", "rts", "v")
    val got = AsOfJoin.backward(l, r, "k", "lts", "rts", Seq("v"))
      .select("name", "v").as[(String, Option[Double])].head()
    assert(got == (("early", None)))
  }

  test("matches a brute-force range-join formulation on testdata events") {
    val e = tables.events
    val viaWindow = SparkEntry_asof(e)
    // brute force: max purchase event_id with (ts, event_id) <= current
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
    val brute = e.join(purchases,
        $"user_id" === $"p_user" &&
          ($"p_ts" < $"ts" || ($"p_ts" === $"ts" && $"p_id" <= $"event_id")), "left")
      .groupBy("event_id")
      .agg(org.apache.spark.sql.functions.max("p_id").as("last_purchase_id"))
    val a = viaWindow.as[(Long, Option[Long])].collect().toMap
    val b = brute.as[(Long, Option[Long])].collect().toMap
    assert(a == b)
  }

  private def SparkEntry_asof(ev: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("event_id"),
      last(when(col("event_type") === "purchase", col("event_id")), ignoreNulls = true)
        .over(w).as("last_purchase_id"))
  }
}
