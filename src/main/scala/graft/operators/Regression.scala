package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.roundFp

/** Distributed least-squares fitting by sufficient statistics — the
  * "aggregate the moments, solve the tiny system on the driver" pattern
  * that turns regression over a 100 TB fact table into ONE hash
  * aggregation. No gradient iterations, no per-row driver traffic: the
  * scan computes exact integer moment sums (map-side combinable), the
  * closed form runs on the aggregated row(s).
  */
object Regression {

  /** Per-group simple linear regression y = slope·x + intercept via the
    * classic closed form over exact integer moment sums.
    *
    * Inputs are integer-unit columns (the caller quantizes — the house
    * FP discipline), so (n, Σx, Σy, Σxx, Σxy, Σyy) are EXACT longs and
    * every engine computes them identically; the closed form then runs
    * in double on those exact sums (bigint→double conversion is
    * correctly rounded everywhere), so slope/intercept/r² are
    * cross-engine deterministic up to the final rounding.
    *
    * Overflow bound (documented, not checked per row): Σ(x·y) must stay
    * under 2^63 — with x ≤ 10^4 and y ≤ 10^8 units that allows ~10^10
    * rows per group; re-quantize coarser for bigger groups.
    *
    * One shuffle (the groupBy); output is |groups| rows.
    *
    * @return (groupCols*, n, slope, intercept, r2) — r2 is null when x
    *         or y has zero variance (degenerate fit), slope/intercept
    *         null when x is constant; all three rounded to `scale`
    *         decimals.
    */
  def fitPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      xUnitsCol: String,
      yUnitsCol: String,
      scale: Int = 6): DataFrame = {
    val x = col(xUnitsCol).cast("long")
    val y = col(yUnitsCol).cast("long")
    val moments = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * x).as("sxx"), sum(x * y).as("sxy"), sum(y * y).as("syy"))
    val nD = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    // covXY/varX/varY are n²-scaled (co)variances — the shared
    // subexpressions of slope, intercept and r². Keeping the formula in
    // this exact shape (and mirroring it in oracle SQL) is what makes
    // the doubles reproducible cross-engine.
    val covXY = nD * d("sxy") - d("sx") * d("sy")
    val varX = nD * d("sxx") - d("sx") * d("sx")
    val varY = nD * d("syy") - d("sy") * d("sy")
    val slope = when(varX =!= 0.0, covXY / varX)
    val intercept = when(varX =!= 0.0, (d("sy") - covXY / varX * d("sx")) / nD)
    val r2 = when(varX =!= 0.0 && varY =!= 0.0, covXY * covXY / (varX * varY))
    moments.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        roundFp(slope, scale).as("slope"),
        roundFp(intercept, scale).as("intercept"),
        roundFp(r2, scale).as("r2")): _*)
  }

  /** Per-group TWO-feature OLS (y = β1·x1 + β2·x2 + β0) with an EXACTLY
    * cross-engine-reproducible solve — the oracle-gateable instance of
    * the normal-equations family ([[fitOls]] is the general-k float
    * twin, spec-pinned against this one).
    *
    * Why it is exact: inputs are integer units (caller quantizes), so
    * the 9 moment sums are EXACT longs; the 3×3 normal system is then
    * solved by CRAMER'S RULE with the four determinants computed in
    * decimal(38,0) — exact integer arithmetic, where ANY operation
    * order yields the same value (no FP-order discipline needed at
    * all, unlike every double-path formula in this repo). The only FP
    * steps are the final det ratio (one conversion + one divide, both
    * correctly rounded) and the output rounding.
    *
    * Overflow bound (documented, not checked per row): each determinant
    * is ≤ 6·max|entry|³ and must stay under 10^38 — with x1 ≤ 10^2,
    * x2 ≤ 10^2, y ≤ 10^8 units that allows ~10^9 rows per group
    * (entries ≤ 10^13, dets ≤ 10^35); re-quantize coarser beyond that.
    *
    * Fully distributed: ONE hash aggregation (map-side combinable),
    * the Cramer projection runs per aggregated row — no driver
    * collect, output is |groups| rows.
    *
    * @return (groupCols*, n, beta1, beta2, beta0) — null betas when the
    *         Gram matrix is singular (collinear/constant features).
    */
  def fitOlsExactPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      x1UnitsCol: String,
      x2UnitsCol: String,
      yUnitsCol: String,
      scale: Int = 6): DataFrame =
    solveNormalExact(df, groupCols, x1UnitsCol, x2UnitsCol, yUnitsCol,
      lambda = 0L, scale)

  /** Ridge (L2-regularized) variant of [[fitOlsExactPerGroup]]: the
    * SAME exact decimal Cramer solve with `lambda` added to the
    * feature diagonal of the Gram matrix (s11+λ, s22+λ; the intercept
    * row is NOT regularized — the standard convention). λ is in the
    * same SQUARED-unit scale as the Gram entries (caller quantizes),
    * so the arithmetic stays exact-integer end to end and the
    * exactness story of the OLS solve carries over verbatim. The
    * OVERFLOW bound does NOT: λ inflates the Gram diagonal, so a λ
    * far above a feature's natural Σx² scale inflates every
    * determinant by the same factor (measured: λ=1e12 against an
    * Σx²≈6e8 feature blew the decimal(38,0) cap at sf1 where the
    * unregularized solve fit). Keep λ within ~10× the smallest
    * feature's Σx² at the target scale.
    * λ > 0 also guarantees the system is non-singular whenever the
    * data is non-degenerate — the practical reason ridge exists.
    */
  def fitRidgeExactPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      x1UnitsCol: String,
      x2UnitsCol: String,
      yUnitsCol: String,
      lambda: Long,
      scale: Int = 6): DataFrame = {
    require(lambda > 0, s"lambda must be positive (got $lambda); use " +
      "fitOlsExactPerGroup for the unregularized fit")
    solveNormalExact(df, groupCols, x1UnitsCol, x2UnitsCol, yUnitsCol,
      lambda, scale)
  }

  private def solveNormalExact(
      df: DataFrame,
      groupCols: Seq[String],
      x1UnitsCol: String,
      x2UnitsCol: String,
      yUnitsCol: String,
      lambda: Long,
      scale: Int): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val x1 = col(x1UnitsCol).cast("long")
    val x2 = col(x2UnitsCol).cast("long")
    val y = col(yUnitsCol).cast("long")
    val moments = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(x1).as("s1"), sum(x2).as("s2"), sum(y).as("sy"),
      sum(x1 * x1).as("s11"), sum(x1 * x2).as("s12"), sum(x2 * x2).as("s22"),
      sum(x1 * y).as("s1y"), sum(x2 * y).as("s2y"))
    def D(c: String) = col(c).cast(dec)
    // |[r1; r2; r3]| by cofactor expansion along the first row — exact
    // decimal arithmetic, so the expansion choice is arbitrary.
    def det3(a: Column, b: Column, c: Column,
             d: Column, e: Column, f: Column,
             g: Column, h: Column, i: Column): Column =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val (g11, g12, g1) = (D("s11") + lit(lambda).cast(dec), D("s12"), D("s1"))
    val (g22, g2, nn) = (D("s22") + lit(lambda).cast(dec), D("s2"), col("n").cast(dec))
    val (b1, b2, b0) = (D("s1y"), D("s2y"), D("sy"))
    // A = [[g11,g12,g1],[g12,g22,g2],[g1,g2,n]], b = [b1,b2,b0];
    // detJ = |A with column J replaced by b|
    val det = det3(g11, g12, g1, g12, g22, g2, g1, g2, nn)
    val det1 = det3(b1, g12, g1, b2, g22, g2, b0, g2, nn)
    val det2 = det3(g11, b1, g1, g12, b2, g2, g1, b0, nn)
    val det0 = det3(g11, g12, b1, g12, g22, b2, g1, g2, b0)
    def beta(dj: Column): Column =
      when(det =!= 0, dj.cast("double") / det.cast("double"))
    moments.select(
      groupCols.map(col) ++ Seq(
        col("n"),
        roundFp(beta(det1), scale).as("beta1"),
        roundFp(beta(det2), scale).as("beta2"),
        roundFp(beta(det0), scale).as("beta0")): _*)
  }

  /** Multi-feature OLS: fit y = β·x over k features by aggregating the
    * Gram matrix X'X and moment vector X'y in ONE pass
    * (`treeAggregate`-shaped: a single hash aggregate over the k(k+1)/2 +
    * k summed products), then solving the k×k normal equations on the
    * driver by Gaussian elimination with partial pivoting. k is tiny
    * (feature count), the data is arbitrary — the driver work is O(k³)
    * on ONE row of sums.
    *
    * Features arrive as double columns; an intercept column of 1.0 is
    * appended automatically. Returns the coefficient vector (intercept
    * last). Throws on a singular Gram matrix (collinear features).
    */
  def fitOls(df: DataFrame, featureCols: Seq[String], yCol: String): Array[Double] = {
    require(featureCols.nonEmpty, "need at least one feature")
    val k = featureCols.size + 1 // + intercept
    val feats = featureCols.map(c => col(c).cast("double")) :+ lit(1.0)
    val gramAggs =
      (for (i <- 0 until k; j <- i until k)
        yield sum(feats(i) * feats(j)).as(s"g_${i}_$j")) ++
        (0 until k).map(i => sum(feats(i) * col(yCol).cast("double")).as(s"b_$i"))
    val row = df.agg(gramAggs.head, gramAggs.tail: _*).head()
    val a = Array.ofDim[Double](k, k + 1)
    for (i <- 0 until k; j <- i until k) {
      val v = row.getAs[Double](s"g_${i}_$j")
      a(i)(j) = v; a(j)(i) = v
    }
    for (i <- 0 until k) a(i)(k) = row.getAs[Double](s"b_$i")
    // Gaussian elimination with partial pivoting on the k x (k+1) system.
    for (p <- 0 until k) {
      val piv = (p until k).maxBy(r => math.abs(a(r)(p)))
      require(math.abs(a(piv)(p)) > 1e-12,
        "singular Gram matrix — collinear features (drop or combine them)")
      val tmp = a(p); a(p) = a(piv); a(piv) = tmp
      for (r <- p + 1 until k) {
        val f = a(r)(p) / a(p)(p)
        for (c2 <- p to k) a(r)(c2) -= f * a(p)(c2)
      }
    }
    val beta = new Array[Double](k)
    for (i <- (k - 1) to 0 by -1) {
      var s = a(i)(k)
      for (j <- i + 1 until k) s -= a(i)(j) * beta(j)
      beta(i) = s / a(i)(i)
    }
    beta
  }
}
