package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("latestByKey keeps exactly the newest row per key, deterministically") {
    val changes = Seq(
      (1L, "k1", 10L, 1.0), (2L, "k1", 20L, 2.0), (3L, "k1", 20L, 3.0), // ts tie -> max id wins
      (4L, "k2", 5L, 4.0),
      (5L, "k3", 9L, 5.0), (6L, "k3", 8L, 6.0))
      .toDF("event_id", "key", "tsv", "value")
    val got = Upsert.latestByKey(changes, Seq("key"),
        Seq(col("tsv").desc, col("event_id").desc))
      .orderBy("key").as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq((3L, "k1", 20L, 3.0), (4L, "k2", 5L, 4.0), (5L, "k3", 9L, 5.0)))
  }

  test("latestByKey output has one row per distinct key on the events table") {
    val ev = tables.events
    val out = Upsert.latestByKey(ev, Seq("user_id", "event_type"),
      Seq(col("ts").desc, col("event_id").desc))
    val nKeys = ev.select("user_id", "event_type").distinct().count()
    assert(out.count() == nKeys)
    // the plan must be a PARTITIONED window: no single-partition exchange
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), "per-key window must not plan a global sort")
  }
}
