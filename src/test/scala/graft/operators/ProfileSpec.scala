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

  test("correlationMatrix: hand-checked pairs, one aggregate node") {
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, 1.0))
      .toDF("a", "b", "c")
    val got = Profile.correlationMatrix(df, Seq("a", "b", "c"))
      .orderBy("col_x", "col_y").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    // a,b perfectly linear → 1.0; a,c and b,c share the same corr.
    assert(got.map(t => (t._1, t._2)) ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got.head._3 == 1.0)
    assert(got(1)._3 == got(2)._3)
    // all pairs ride ONE aggregate: exactly one scan of the input
    val plan = Profile.correlationMatrix(tables.lineitem,
      Seq("l_quantity", "l_discount", "l_tax"))
      .queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length == 2,
      s"expected a single scan:\n${plan.take(1500)}")
  }

  test("madOutliers: hand-checked median/MAD and k-band counts") {
    // group g: values 0,10,10,10,100 → med=10, ad=10,0,0,0,90 → mad=0
    //   → any nonzero deviation is an outlier at every k: n_outliers=2
    val df = Seq(("g", 0L), ("g", 10L), ("g", 10L), ("g", 10L), ("g", 100L),
      ("h", 1L), ("h", 3L)) // med=2, ad=1,1 → mad=1; k=1.5 → none beyond 1.5
      .toDF("grp", "v")
    val got = Profile.madOutliers(df, "grp", "v", k = 1.5)
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(("g", 10.0, 0.0, 2L, 5L), ("h", 2.0, 1.0, 0L, 2L)))
  }

  test("madOutliers rejects non-integral values (exactness contract)") {
    val df = Seq(("g", 1.5)).toDF("grp", "v")
    val e = intercept[IllegalArgumentException] {
      Profile.madOutliers(df, "grp", "v")
    }
    assert(e.getMessage.contains("fixed-point"))
  }
}
