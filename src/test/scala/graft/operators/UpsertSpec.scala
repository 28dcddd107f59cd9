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

  test("scd2 suppresses no-change runs null-safely and interval-izes the survivors") {
    val log = Seq(
      // k1: a -> a (suppressed) -> b -> b (suppressed) -> a
      (1L, "k1", 10L, Some("a")), (2L, "k1", 20L, Some("a")),
      (3L, "k1", 30L, Some("b")), (4L, "k1", 40L, Some("b")),
      (5L, "k1", 50L, Some("a")),
      // k2: null -> a -> null (both transitions are changes; the leading
      // null row IS the first version)
      (6L, "k2", 10L, None), (7L, "k2", 20L, Some("a")), (8L, "k2", 30L, None),
      // k3: single row -> current
      (9L, "k3", 10L, Some("z")))
      .toDF("id", "key", "tsv", "attr")
    val got = Upsert.scd2(log, Seq("key"), "tsv", "attr", Seq(col("id")))
      .select("key", "tsv", "attr", "valid_to", "is_current")
      .orderBy("key", "tsv")
      .as[(String, Long, Option[String], Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      ("k1", 10L, Some("a"), Some(30L), false),
      ("k1", 30L, Some("b"), Some(50L), false),
      ("k1", 50L, Some("a"), None, true),
      ("k2", 10L, None, Some(20L), false),
      ("k2", 20L, Some("a"), Some(30L), false),
      ("k2", 30L, None, None, true),
      ("k3", 10L, Some("z"), None, true)))
  }

  test("scd2 plans ONE shuffle and one sort for both windows") {
    // lag (change detection) and lead (interval-ization) partition and
    // order identically, and the second window consumes a filter of the
    // first — Catalyst must satisfy it from the existing distribution
    // and ordering instead of re-exchanging.
    val out = Upsert.scd2(
      tables.orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"),
      Seq("o_custkey"), "o_orderdate", "o_orderpriority", Seq(col("o_orderkey")))
    out.collect()
    // AQE's string form echoes the pre-adaptive plan under
    // "== Initial Plan ==" — count nodes in the final plan only
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"scd2 must shuffle exactly once, got $exchanges:\n${plan.take(1200)}")
    assert(!plan.contains("SinglePartition"), "per-key windows must not plan a global sort")
    val sorts = "Sort \\[".r.findAllIn(plan).size
    assert(sorts <= 1, s"scd2 must sort at most once, got $sorts:\n${plan.take(1200)}")
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

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    import spark.implicits._
    val old = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None: Option[Long]), (4L, Some(40L)))
      .toDF("k", "v")
    val neu = Seq((2L, Some(21L)), (3L, None: Option[Long]), (4L, Some(40L)), (5L, Some(50L)))
      .toDF("k", "v")
    val got = Upsert.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .orderBy("k")
      .as[(Long, Option[Long], Option[Long], String)].collect().toSeq
    assert(got == Seq(
      (1L, Some(10L), None, "removed"),
      (2L, Some(20L), Some(21L), "changed"),
      (5L, None, Some(50L), "added")))
    // key 3 (null <=> null) and key 4 (equal) are dropped as unchanged
    assert(!got.exists(r => r._1 == 3L || r._1 == 4L))
    val plan = Upsert.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"))
  }

  test("mergeInto applies U/D/insert and passes untouched rows through") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val changes = Seq((2L, 21L, "U"), (3L, 0L, "D"), (4L, 40L, "U"), (9L, 0L, "D"))
      .toDF("k", "v", "op")
    val got = Upsert.mergeInto(base, changes, Seq("k"), Seq("v"), "op")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    // 1 untouched, 2 updated, 3 deleted, 4 inserted, 9 delete-of-absent no-op
    assert(got == Seq((1L, 10L), (2L, 21L), (4L, 40L)))
  }

  test("mergeInto fails loudly on an unknown op or duplicate change keys") {
    import spark.implicits._
    val base = Seq((1L, 10L)).toDF("k", "v")
    val badOp = Seq((1L, 11L, "X")).toDF("k", "v", "op")
    val ex1 = intercept[Exception] {
      Upsert.mergeInto(base, badOp, Seq("k"), Seq("v"), "op").collect()
    }
    assert(ex1.getMessage.contains("op must be 'U' or 'D'") ||
      ex1.getCause != null && ex1.getCause.getMessage.contains("op must be 'U' or 'D'"))
    val dup = Seq((1L, 11L, "U"), (1L, 12L, "U")).toDF("k", "v", "op")
    val ex2 = intercept[Exception] {
      Upsert.mergeInto(base, dup, Seq("k"), Seq("v"), "op").collect()
    }
    assert(ex2.getMessage.contains("duplicate key") ||
      ex2.getCause != null && ex2.getCause.getMessage.contains("duplicate key"))
  }

  test("mergeInto: null op raises with a readable message; collisions fail fast") {
    import spark.implicits._
    val base = Seq((1L, 10L)).toDF("k", "v")
    val nullOp = Seq((1L, 11L, null.asInstanceOf[String])).toDF("k", "v", "op")
    val ex = intercept[Exception] {
      Upsert.mergeInto(base, nullOp, Seq("k"), Seq("v"), "op").collect()
    }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("got NULL"), s"null op must keep the diagnostic, got: $msg")
    // a base column colliding with a generated name dies with a clear
    // precondition, not a late ambiguous-reference AnalysisException
    val collide = base.withColumn("__op", org.apache.spark.sql.functions.lit("x"))
    intercept[IllegalArgumentException] {
      Upsert.mergeInto(collide, Seq((1L, 1L, "U")).toDF("k", "v", "op"),
        Seq("k"), Seq("v"), "op")
    }
  }

  test("mergeInto plan: one FullOuter join, two key exchanges (window reuses the change side)") {
    import spark.implicits._
    val base = (1L to 200L).map(i => (i, i * 10)).toDF("k", "v")
    val changes = (1L to 50L).map(i => (i * 4, i, if (i % 5 == 0) "D" else "U"))
      .toDF("k", "v", "op")
    val out = Upsert.mergeInto(base, changes, Seq("k"), Seq("v"), "op")
    out.collect() // finalize AQE
    val plan = graft.PlanSig.finalPlanText(out)
    assert(plan.contains("FullOuter"), s"must stay a full outer join:\n${plan.take(1200)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2,
      s"one exchange per side (dup-check window must reuse the change side's), got $exchanges:\n${plan.take(1500)}")
  }

  test("snapshotDiff rejects empty key or compare lists") {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("k", "v")
    intercept[IllegalArgumentException] { Upsert.snapshotDiff(df, df, Seq(), Seq("v")) }
    intercept[IllegalArgumentException] { Upsert.snapshotDiff(df, df, Seq("k"), Seq()) }
  }
}
