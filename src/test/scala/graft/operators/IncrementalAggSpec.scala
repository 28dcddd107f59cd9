package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("maintained aggregate equals full recompute under mixed insert/delete deltas") {
    val ev = tables.events.select(col("user_id"), col("event_id"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    // base = first 80% by id; delta = inserts of the rest + deletes of a base slice
    val base = ev.filter(col("event_id") % 10 < 8)
    val inserts = ev.filter(col("event_id") % 10 >= 8).withColumn("__sign", lit(1L))
    val deletes = ev.filter(col("event_id") % 10 === 3).withColumn("__sign", lit(-1L))
    val baseAgg = base.groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n"), sum("cents").cast("long").as("s"))
    val maintained = IncrementalAgg.applyDelta(
        baseAgg,
        IncrementalAgg.signedAgg(inserts.unionByName(deletes), Seq("user_id"), "cents", "__sign"),
        Seq("user_id"), "n", "s")
      .as[(Long, Long, Long)].collect().toSet
    val recomputed = ev.filter(col("event_id") % 10 =!= 3).groupBy("user_id")
      .agg(count(lit(1)).cast("long").as("n"), sum("cents").cast("long").as("s"))
      .as[(Long, Long, Long)].collect().toSet
    assert(maintained == recomputed)
  }

  test("a fully-retracted key disappears instead of lingering as a zero row") {
    val base = Seq((1L, 5L), (2L, 7L)).toDF("k", "v")
    val baseAgg = base.groupBy("k")
      .agg(count(lit(1)).cast("long").as("n"), sum("v").cast("long").as("s"))
    // retract user 1's only row
    val delta = Seq((1L, 5L, -1L)).toDF("k", "v", "sign")
    val got = IncrementalAgg.applyDelta(baseAgg,
        IncrementalAgg.signedAgg(delta, Seq("k"), "v", "sign"), Seq("k"), "n", "s")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L, 7L)), s"key 1 must vanish, got $got")
  }

  test("delta-only keys appear; maintenance cost is keyed on the aggregate, not the base rows") {
    val baseAgg = Seq((1L, 2L, 10L)).toDF("k", "n", "s")
    val delta = Seq((9L, 4L, 1L), (9L, 6L, 1L)).toDF("k", "v", "sign")
    val got = IncrementalAgg.applyDelta(baseAgg,
        IncrementalAgg.signedAgg(delta, Seq("k"), "v", "sign"), Seq("k"), "n", "s")
      .orderBy("k").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 10L), (9L, 2L, 10L)))
  }
}
