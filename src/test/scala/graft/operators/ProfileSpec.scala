package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, exact distincts and string min/max per column") {
    val df = Seq(
      (Some(1L), Some("b")),
      (Some(2L), None),
      (Some(2L), Some("a")),
      (None, Some("a")))
      .toDF("k", "s")
    val got = Profile.profile(df, Seq("k", "s"))
      .as[(String, Long, Long, Long, String, String)].collect().toSet
    assert(got == Set(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("profile plans as per-column hash-agg branches: no joins, no Expand fallback") {
    // The wide single-agg form plans K exact DISTINCTs as an
    // Expand x(K+1) whose rewrite falls back to SortAggregate (measured
    // 5x slower); the union-of-branches form must keep plain two-phase
    // hash aggregates, one single-column scan branch each.
    val df = Profile.profile(tables.lineitem,
      Seq("l_orderkey", "l_returnflag", "l_shipdate"))
    df.collect()
    val plan = graft.PlanSig.finalPlanText(df)
    assert(!plan.contains("Join"), s"profile must not join:\n${plan.take(1000)}")
    assert(!plan.contains("Expand"), s"no Expand row multiplication:\n${plan.take(1000)}")
    assert(plan.contains("Union"), s"one branch per column:\n${plan.take(1000)}")
    // numeric/date branches must hash-aggregate; string branches are
    // allowed to sort-aggregate (string min/max has no fixed-size hash
    // buffer) — so assert the orderkey branch specifically
    assert("HashAggregate\\(keys=\\[\\], functions=\\[count\\(1\\), [^\\n]*l_orderkey".r
      .findFirstIn(plan).isDefined,
      s"numeric branch must hash-aggregate:\n${plan.take(1500)}")
  }

  test("profile rejects unknown columns loudly") {
    val e = intercept[IllegalArgumentException] {
      Profile.profile(tables.lineitem, Seq("l_orderkey", "nope"))
    }
    assert(e.getMessage.contains("nope"))
    intercept[IllegalArgumentException](Profile.profile(tables.lineitem, Seq.empty))
  }

  test("an all-null column profiles with null min/max and zero distincts") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "s")
    val got = Profile.profile(df, Seq("s")).collect().head
    assert(got.getLong(1) == 2L && got.getLong(2) == 2L && got.getLong(3) == 0L)
    assert(got.isNullAt(4) && got.isNullAt(5))
  }
}
