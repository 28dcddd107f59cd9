package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecisionStumpSpec extends SparkSpec {
  import spark.implicits._

  test("splitTable: hand-checked counts and cost on a separable feature") {
    // x=1: 2 neg; x=2: 1 pos 1 neg; x=3: 2 pos → perfect-ish split at 2
    val df = Seq((1L, false), (1L, false), (2L, true), (2L, false),
      (3L, true), (3L, true)).toDF("x", "y")
    val got = DecisionStump.splitTable(df, "x", "y")
      .orderBy("threshold")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // t=1: L(2n,0p) R(4n,3p) → 0 + 3*1/4 = 0.75
    // t=2: L(4n,1p) R(2n,2p) → 1*3/4 + 0 = 0.75
    assert(got == Seq(
      (1L, 2L, 0L, 4L, 3L, 0.75),
      (2L, 4L, 1L, 2L, 2L, 0.75)))
    // no t=3 row: empty right side is not a split
  }

  test("splitTable: best threshold separates a clean step function") {
    val rows = (1L to 100L).map(v => (v, v > 60L))
    val got = DecisionStump.splitTable(rows.toDF("x", "y"), "x", "y")
      .orderBy("cost", "threshold").as[(Long, Long, Long, Long, Long, Double)]
      .collect()
    assert(got.head._1 == 60L && got.head._6 == 0.0)
  }

  test("splitTable rejects non-integral features (histogram contract)") {
    val df = Seq((1.5, true)).toDF("x", "y")
    val e = intercept[IllegalArgumentException](DecisionStump.splitTable(df, "x", "y"))
    assert(e.getMessage.contains("integer"))
  }

  test("splitTable raises loudly on an unbinned (over-wide) domain") {
    // the r18-verdict guard: an unbinned int64 feature used to funnel
    // |domain| rows into the unpartitioned cumulative window on
    // contract alone — now it dies named before the window sorts
    val wide = (1L to 10L).map(v => (v, v % 2 == 0)).toDF("x", "y")
    val e = intercept[Exception](
      DecisionStump.splitTable(wide, "x", "y", maxDomain = 5).collect())
    assert(e.getMessage.contains("maxDomain"), e.getMessage)
    // at the cap it still runs (10 distinct values, maxDomain = 10)
    assert(DecisionStump.splitTable(wide, "x", "y", maxDomain = 10)
      .collect().length == 9)
  }

  test("splitTable on testdata: left+right always reconcile to totals") {
    val df = tables.lineitem.select(
      floor(col("l_quantity") + 0.5).cast("long").as("qty"),
      (col("l_returnflag") === "R").as("returned"))
    val n = df.count()
    val p = df.filter(col("returned")).count()
    val rows = DecisionStump.splitTable(df, "qty", "returned").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == n)
      assert(r.getAs[Long]("pos_left") + r.getAs[Long]("pos_right") == p)
      assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
    }
  }
}
