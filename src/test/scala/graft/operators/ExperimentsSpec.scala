package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentsSpec extends SparkSpec {
  import spark.implicits._

  private def perUser(rows: (String, Int, Boolean)*) =
    rows.zipWithIndex.map { case ((e, v, c), i) => (e, i.toLong, v, c) }
      .toDF("experiment", "user", "variant", "converted")

  test("matches the hand-computed pooled z² (2/10 vs 8/10 → z² = 7.2)") {
    val rows =
      (1 to 10).map(i => ("e1", 0, i <= 2)) ++ // control: 2 of 10 convert
        (1 to 10).map(i => ("e1", 1, i <= 8))  // treatment: 8 of 10
    // diff = 2·10 − 8·10 = −60; num = 3600·20 = 72000;
    // den = 10·10·10·10 = 10000; z² = 7.2 > 3.841459 → significant
    val got = Experiments.twoProportionZ(perUser(rows: _*))
      .as[(String, Long, Long, Long, Long, Option[Double], Option[Boolean])]
      .collect().head
    assert(got == (("e1", 10L, 2L, 10L, 8L, Some(7.2), Some(true))))
  }

  test("a balanced experiment is not significant") {
    val rows = (1 to 20).map(i => ("e", i % 2, i % 4 < 2))
    val got = Experiments.twoProportionZ(perUser(rows: _*))
      .select("zsq", "significant").as[(Option[Double], Option[Boolean])]
      .collect().head
    assert(got._1.exists(_ < 3.841459) && got._2.contains(false))
  }

  test("degenerate experiments yield null, never division garbage") {
    // missing variant; zero conversions; universal conversion
    val cases = Seq(
      Seq(("only_control", 0, true), ("only_control", 0, false)),
      Seq(("no_conv", 0, false), ("no_conv", 1, false)),
      Seq(("all_conv", 0, true), ("all_conv", 1, true)))
    cases.foreach { rows =>
      val got = Experiments.twoProportionZ(perUser(rows: _*))
        .select("zsq", "significant").as[(Option[Double], Option[Boolean])]
        .collect().head
      assert(got == ((None, None)), s"${rows.head._1}: $got")
    }
  }

  test("variants outside {0,1} fail loudly per row") {
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val e = intercept[Exception](
      Experiments.twoProportionZ(perUser(("e", 2, true))).collect())
    assert(msgs(e).contains("variant must be 0 or 1"), msgs(e))
  }

  test("null converted fails loudly per row (no silent not-converted)") {
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val df = Seq(("e", 0, Some(true)), ("e", 1, Option.empty[Boolean]))
      .toDF("experiment", "variant", "converted")
    val e = intercept[Exception](Experiments.twoProportionZ(df).collect())
    assert(msgs(e).contains("converted is null"), msgs(e))
  }

  test("ONE hash aggregation over the per-user frame (single shuffle)") {
    val df = perUser((1 to 40).map(i => ("e" + (i % 3), i % 2, i % 5 == 0)): _*)
    val plan = Experiments.twoProportionZ(df)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected one shuffle (the experiment groupBy), got:\n$plan")
  }

  test("chiSquareCells: hand-checked 2x2 contingency") {
    // | r\c | a  | b  |   rows: x=30, y=30; cols: a=30, b=30; N=60
    // |  x  | 20 | 10 |   e(x,a) = 30*30/60 = 15, o-e = 5
    // |  y  | 10 | 20 |   contrib = 25/15 per cell (symmetric)
    import spark.implicits._
    val rows =
      Seq.fill(20)(("x", "a")) ++ Seq.fill(10)(("x", "b")) ++
      Seq.fill(10)(("y", "a")) ++ Seq.fill(20)(("y", "b"))
    val got = Experiments.chiSquareCells(rows.toDF("r", "c"), "r", "c")
      .orderBy("r", "c")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(got.map(x => (x._1, x._2, x._3)) ==
      Seq(("x", "a", 20L), ("x", "b", 10L), ("y", "a", 10L), ("y", "b", 20L)))
    got.foreach { cell =>
      assert(cell._4 == 15.0)
      assert(cell._5 == 25.0 / 15.0)
    }
    // χ² = 4 · 25/15 = 20/3 (> 3.84: dependence detected, as built)
    assert(math.abs(got.map(_._5).sum - 20.0 / 3.0) < 1e-12)
  }

  test("chiSquareCells: expected totals reconcile with observed totals") {
    import spark.implicits._
    val df = tables.events.select(col("event_type"),
      (weekday(to_date(col("ts"))) + 1).cast("long").as("dow"))
    val cells = Experiments.chiSquareCells(df, "event_type", "dow").collect()
    val obs = cells.map(_.getAs[Long]("observed")).sum
    val exp = cells.map(_.getAs[Double]("expected")).sum
    assert(obs == df.count())
    // Σ expected = N exactly in exact arithmetic; FP sum is near-exact
    assert(math.abs(exp - obs) < 1e-6 * obs)
  }
}
