package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("fitPerGroup recovers an exact linear relation (slope 2, intercept 3, r2 1)") {
    val df = (1L to 100L).map(x => ("g", x, 2 * x + 3)).toDF("grp", "x", "y")
    val got = Regression.fitPerGroup(df, Seq("grp"), "x", "y")
      .as[(String, Long, Double, Double, Double)].head()
    assert(got == (("g", 100L, 2.0, 3.0, 1.0)))
  }

  test("fitPerGroup matches the closed form on noisy integer data, per group") {
    // Deterministic pseudo-noise; verify against a driver-side reference.
    val rows = for (g <- Seq("a", "b"); i <- 1 to 500) yield {
      val x = i.toLong
      val noise = ((i * 2654435761L) % 41) - 20 // [-20, 20]
      val y = (if (g == "a") 5 * x else -3 * x + 1000) + noise
      (g, x, y)
    }
    val got = Regression.fitPerGroup(rows.toDF("grp", "x", "y"), Seq("grp"), "x", "y")
      .orderBy("grp")
      .as[(String, Long, Double, Double, Double)].collect()

    def reference(pts: Seq[(Long, Long)]): (Double, Double, Double) = {
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
      val sxx = pts.map(p => p._1 * p._1).sum.toDouble
      val sxy = pts.map(p => p._1 * p._2).sum.toDouble
      val syy = pts.map(p => p._2 * p._2).sum.toDouble
      val cov = n * sxy - sx * sy; val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
      def r6(v: Double) = math.round(v * 1e6) / 1e6 + 0.0
      (r6(cov / vx), r6((sy - cov / vx * sx) / n), r6(cov * cov / (vx * vy)))
    }
    for ((g, n, slope, intercept, r2) <- got) {
      val ref = reference(rows.filter(_._1 == g).map(r => (r._2, r._3)))
      assert(n == 500L)
      assert((slope, intercept, r2) == ref, s"group $g diverged from closed form")
    }
    // slopes carry the per-group sign
    assert(got.find(_._1 == "a").get._3 > 0 && got.find(_._1 == "b").get._3 < 0)
  }

  test("fitPerGroup yields null slope/intercept/r2 for constant x") {
    val df = Seq(("g", 5L, 1L), ("g", 5L, 2L), ("g", 5L, 3L)).toDF("grp", "x", "y")
    val row = Regression.fitPerGroup(df, Seq("grp"), "x", "y").head()
    assert(row.isNullAt(row.fieldIndex("slope")))
    assert(row.isNullAt(row.fieldIndex("intercept")))
    assert(row.isNullAt(row.fieldIndex("r2")))
  }

  test("fitPerGroup is ONE hash aggregate pass (no extra shuffles)") {
    val li = tables.lineitem.select(col("l_returnflag").as("grp"),
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("x"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
    val plan = Regression.fitPerGroup(li, Seq("grp"), "x", "y")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one shuffle (the groupBy), got:\n$plan")
  }

  test("fitOls solves multi-feature normal equations (exact planted coefficients)") {
    // y = 2*x1 - 4*x2 + 7 exactly; Gram solve must recover the plant.
    val df = (1 to 200).map { i =>
      val x1 = (i % 17).toDouble; val x2 = (i % 5).toDouble
      (x1, x2, 2 * x1 - 4 * x2 + 7)
    }.toDF("x1", "x2", "y")
    val beta = Regression.fitOls(df, Seq("x1", "x2"), "y")
    assert(beta.length == 3)
    assert(math.abs(beta(0) - 2.0) < 1e-9)
    assert(math.abs(beta(1) + 4.0) < 1e-9)
    assert(math.abs(beta(2) - 7.0) < 1e-9) // intercept last
  }

  test("fitOlsExactPerGroup recovers planted coefficients per group") {
    // group a: y = 3*x1 + 5*x2 + 11; group b: y = -2*x1 + x2 + 40
    val df = (1 to 300).flatMap { i =>
      val x1 = (i % 13).toLong; val x2 = (i % 7).toLong
      Seq(("a", x1, x2, 3 * x1 + 5 * x2 + 11),
        ("b", x1, x2, -2 * x1 + x2 + 40))
    }.toDF("grp", "x1", "x2", "y")
    val got = Regression.fitOlsExactPerGroup(df, Seq("grp"), "x1", "x2", "y")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got("a") == ((3.0, 5.0, 11.0)))
    assert(got("b") == ((-2.0, 1.0, 40.0)))
  }

  test("fitOlsExactPerGroup yields null betas on a singular Gram matrix") {
    // x2 = 2*x1 exactly → collinear → det = 0 → nulls, not garbage
    val df = (1 to 50).map(i => ("g", i.toLong, 2L * i, 3L * i)).toDF("grp", "x1", "x2", "y")
    val row = Regression.fitOlsExactPerGroup(df, Seq("grp"), "x1", "x2", "y").collect().head
    assert(row.isNullAt(2) && row.isNullAt(3) && row.isNullAt(4))
  }

  test("fitOlsExactPerGroup agrees with the float fitOls path on real data") {
    // The exact Cramer solve and the double Gaussian elimination are
    // the same normal equations — they must agree to ~1e-9 relative on
    // a well-conditioned real fit (this is the link that lets ml02's
    // driver oracle stand in for the general-k float path too).
    val li = tables.lineitem.select(
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("x1"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("x2"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
      .withColumn("grp", lit("all"))
    val exact = Regression.fitOlsExactPerGroup(li, Seq("grp"), "x1", "x2", "y", scale = 9)
      .as[(String, Long, Double, Double, Double)].collect().head
    val float = Regression.fitOls(
      li.select(col("x1").cast("double"), col("x2").cast("double"), col("y")),
      Seq("x1", "x2"), "y")
    assert(math.abs(float(0) - exact._3) <= 1e-6 * math.max(1.0, math.abs(exact._3)))
    assert(math.abs(float(1) - exact._4) <= 1e-6 * math.max(1.0, math.abs(exact._4)))
    assert(math.abs(float(2) - exact._5) <= 1e-6 * math.max(1.0, math.abs(exact._5)))
  }

  test("fitOlsExactPerGroup is ONE hash aggregate pass (no extra shuffles)") {
    val df = (1 to 40).map(i => ("g", i.toLong, (i % 5).toLong, 3L * i)).toDF("grp", "x1", "x2", "y")
    val plan = Regression.fitOlsExactPerGroup(df, Seq("grp"), "x1", "x2", "y")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"expected exactly one shuffle (the groupBy), got:\n$plan")
  }

  test("fitOls rejects collinear features") {
    val df = (1 to 50).map { i => (i.toDouble, 2.0 * i, 3.0 * i) }.toDF("x1", "x2", "y")
    val e = intercept[IllegalArgumentException] {
      Regression.fitOls(df, Seq("x1", "x2"), "y")
    }
    assert(e.getMessage.contains("singular"))
  }

  test("fitRidgeExactPerGroup shrinks betas toward zero; λ→0 recovers OLS") {
    val df = (1 to 60)
      .map { i => ("g", i.toLong, (i % 7).toLong, 5L * i + 3 * (i % 7) + (i % 11)) }
      .toDF("grp", "x1", "x2", "y")
    val ols = Regression.fitOlsExactPerGroup(df, Seq("grp"), "x1", "x2", "y")
      .collect().head
    val mild = Regression.fitRidgeExactPerGroup(df, Seq("grp"), "x1", "x2", "y",
      lambda = 1L).collect().head
    val heavy = Regression.fitRidgeExactPerGroup(df, Seq("grp"), "x1", "x2", "y",
      lambda = 100000000L).collect().head
    // λ=1 on Gram entries in the 1e4+ range ≈ OLS at 6 dp
    assert(math.abs(mild.getDouble(2) - ols.getDouble(2)) < 1e-3)
    // heavy regularization shrinks the slope magnitudes
    assert(math.abs(heavy.getDouble(2)) < math.abs(ols.getDouble(2)))
    assert(math.abs(heavy.getDouble(3)) < math.abs(ols.getDouble(3)) + 1e-9)
  }

  test("fitRidgeExactPerGroup solves a singular system that OLS cannot") {
    // x2 = 2·x1 exactly: OLS det = 0 → null betas; ridge is regular
    val df = (1 to 40).map { i => ("g", i.toLong, 2L * i, 7L * i) }
      .toDF("grp", "x1", "x2", "y")
    val ols = Regression.fitOlsExactPerGroup(df, Seq("grp"), "x1", "x2", "y")
      .collect().head
    assert(ols.isNullAt(2))
    val ridge = Regression.fitRidgeExactPerGroup(df, Seq("grp"), "x1", "x2", "y",
      lambda = 1000L).collect().head
    assert(!ridge.isNullAt(2) && ridge.getDouble(2) != 0.0)
    intercept[IllegalArgumentException] {
      Regression.fitRidgeExactPerGroup(df, Seq("grp"), "x1", "x2", "y", lambda = 0L)
    }
  }
}
