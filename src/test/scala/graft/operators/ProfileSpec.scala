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

  test("profile is one pass: no joins, multi-distinct rides one Expand") {
    val df = Profile.profile(tables.lineitem,
      Seq("l_orderkey", "l_returnflag", "l_shipdate"))
    df.collect()
    val plan = graft.PlanSig.finalPlanText(df)
    assert(plan.contains("Expand"), s"multi-distinct must plan as Expand:\n${plan.take(1000)}")
    assert(!plan.contains("Join"), s"profile must not join:\n${plan.take(1000)}")
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
