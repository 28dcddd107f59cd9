package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.roundFp

/** Experiment (A/B test) analysis — the two-proportion pooled z-test
  * over conversion counts, done in the engine's exact-arithmetic
  * style: for variants with (n₁, x₁) and (n₂, x₂) users/conversions,
  * pooled x = x₁+x₂, n = n₁+n₂,
  *
  *   z² = (x₁·n₂ − x₂·n₁)² · n / (n₁ · n₂ · x · (n − x))
  *
  * — the square of the classic z statistic, but as a RATIO OF EXACT
  * INTEGERS (the ml02 Cramer discipline): numerator and denominator
  * are computed in decimal(38,0), so the only FP steps are the final
  * correctly-rounded conversion + divide. No erf/p-value is emitted —
  * cross-engine erf implementations differ in ulps, so the DECISION
  * surface is z² against a squared critical value (3.841459 for
  * α = 0.05, the χ²₁ 95 % quantile), which both engines evaluate
  * identically on the exact ratio.
  *
  * Degenerate experiments (a variant with no users, zero conversions
  * overall, or universal conversion) have an undefined z — null, not
  * division garbage.
  *
  * Overflow bound (documented): (x₁·n₂ − x₂·n₁)²·n < 10^38 — fine to
  * ~10^9 users per experiment.
  *
  * ONE hash aggregation over the per-user frame (map-side
  * combinable), output |experiments| rows; nothing collects.
  *
  * @param perUser one row per (experiment, user): `experiment`,
  *                `variant` (0 = control, 1 = treatment), `converted`
  *                (boolean)
  * @return (experiment, n_control, x_control, n_treatment,
  *         x_treatment, zsq, significant) — zsq rounded to 6;
  *         significant = zsq > 3.841459 (α = 0.05), null when zsq is
  */
object Experiments {

  private val CriticalZsq95 = 3.841459

  def twoProportionZ(perUser: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val variantGuard = when(col("variant").isNull || !col("variant").isin(0, 1),
      raise_error(concat(lit("twoProportionZ: variant must be 0 or 1, got "),
        col("variant").cast("string")))).otherwise(col("variant"))
    // null converted is as loud as null variant: silently counting it
    // as not-converted would bias the test — callers must encode
    // non-conversion as an explicit false
    val convertedGuard = when(col("converted").isNull,
      raise_error(lit("twoProportionZ: converted is null — encode " +
        "non-conversion as explicit false, nulls would silently bias the test")))
      .otherwise(col("converted").cast("boolean"))
    val agg = perUser
      .select(col("experiment"), variantGuard.as("variant"),
        convertedGuard.as("converted"))
      .groupBy("experiment")
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_control"),
        sum(when(col("variant") === 0 && col("converted"), 1L).otherwise(0L))
          .as("x_control"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_treatment"),
        sum(when(col("variant") === 1 && col("converted"), 1L).otherwise(0L))
          .as("x_treatment"))
    def D(c: String) = col(c).cast(dec)
    val (n1, x1, n2, x2) = (D("n_control"), D("x_control"),
      D("n_treatment"), D("x_treatment"))
    val x = x1 + x2
    val n = n1 + n2
    val diff = x1 * n2 - x2 * n1
    val num = diff * diff * n
    val den = n1 * n2 * x * (n - x)
    val zsq = when(den > 0, roundFp(num.cast("double") / den.cast("double"), 6))
    agg.select(col("experiment"),
      col("n_control"), col("x_control"), col("n_treatment"), col("x_treatment"),
      zsq.as("zsq"),
      when(zsq.isNotNull, zsq > CriticalZsq95).as("significant"))
  }

  /** Chi-square independence test, emitted as the per-cell
    * contingency table (observed, expected, cell contribution) — the
    * r×c generalization of [[twoProportionZ]]'s 2×2. The global χ²
    * statistic is the sum of `contrib`, left to the consumer: a
    * cross-cell FP sum is accumulation-order-dependent, while every
    * per-cell value here is engine-deterministic (exact int64 counts;
    * expected = one IEEE division; contrib = x·x/rc/N with
    * x = o·N − r·c exact — products stay < 2^53 through ~sf10 at this
    * cell structure, re-bin coarser beyond).
    *
    * Scale shape: one cell-keyed hash agg over the data (map-side
    * partial, |r×c| keys), then broadcast-joined marginals — the
    * output and every join side is bounded by category cardinality,
    * never row count.
    *
    * @return (rowCol, colCol, observed, expected, contrib) */
  def chiSquareCells(df: DataFrame, rowCol: String, colCol: String): DataFrame = {
    val cells = df.groupBy(rowCol, colCol).agg(count(lit(1)).as("observed"))
    val rows = cells.groupBy(rowCol).agg(sum("observed").as("__r"))
    val cols = cells.groupBy(colCol).agg(sum("observed").as("__c"))
    val tot = cells.agg(sum("observed").as("__n"))
    val x = (col("observed") * col("__n") - col("__r") * col("__c")).cast("double")
    cells
      .join(broadcast(rows), Seq(rowCol))
      .join(broadcast(cols), Seq(colCol))
      .crossJoin(broadcast(tot))
      .select(col(rowCol), col(colCol), col("observed"),
        ((col("__r") * col("__c")).cast("double") / col("__n").cast("double"))
          .as("expected"),
        (x * x / (col("__r") * col("__c")).cast("double") / col("__n").cast("double"))
          .as("contrib"))
  }
}
