package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality primitive run before any corpus
  * lands in a training pipeline: per column, row count, null count,
  * exact distinct count, and min/max (as strings, so heterogeneous
  * column types share one output schema).
  *
  * Shape: a UNION of one single-column aggregate branch per profiled
  * column. On columnar storage this reads each column's bytes exactly
  * once — the same total I/O as a single wide pass — while each branch
  * stays a plain two-phase aggregate (hash for fixed-width types;
  * string branches sort-aggregate their usually-low-cardinality
  * distinct keys, since string min/max has no fixed-size hash buffer).
  * The tempting alternative
  * (all columns in ONE `agg` with K exact DISTINCTs) plans as an
  * Expand x(K+1) row multiplication whose distinct rewrite falls back
  * to SortAggregate: measured 4.6 s vs 0.9 s for 4 columns over sf0.1
  * lineitem — the union-of-branches form is 5x faster AND simpler.
  * No joins, no collect; swap `count_distinct` for
  * `approx_count_distinct` per branch when a 2 % estimate is
  * acceptable (the exact form here is what the oracle can verify).
  */
object Profile {

  /** @return one row per profiled column:
    *         (column_name, n_rows, n_null, n_distinct, min_s, max_s) */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"column(s) not in input: ${missing.mkString(", ")}")
    cols.map { c =>
      df.select(col(c)).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_s"),
        max(col(c)).cast("string").as("max_s"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_.unionAll(_))
  }

  /** Pairwise Pearson correlation matrix (upper triangle) over numeric
    * columns, in ONE aggregate pass: all k·(k-1)/2 `corr` aggregates
    * ride a single two-phase agg (each keeps a constant-size moment
    * buffer), so a 100 TB scan happens once regardless of k; the
    * 1-row result is then unpivoted to (col_x, col_y, c) rows with
    * `stack` — driver-free, shuffle-free after the agg's single
    * reduce. Correlations are rounded to 4 dp (graft.functions.round4,
    * the FP-path rounding the DuckDB oracle mirrors).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "correlationMatrix needs at least two columns")
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size }
      yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      graft.functions.round4(corr(col(a), col(b))).as(s"${a}__$b") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs
      .map { case (a, b) => s"'$a', '$b', `${a}__$b`" }.mkString(", ")
    wide.selectExpr(s"stack(${pairs.size}, $stackArgs) AS (col_x, col_y, c)")
  }

  /** Robust outlier profile per group: median / MAD (median absolute
    * deviation) and the count of rows beyond `k` MADs — the
    * skew-immune alternative to mean±k·stddev (ts04's z-score path),
    * since median and MAD have a 50 % breakdown point vs 0 % for
    * moments.
    *
    * Exactness at scale: `valueCol` must be integral (fixed-point the
    * data first — cents, micros); Spark's exact `percentile` then
    * interpolates halves only, so med/MAD are exact binary doubles and
    * the DuckDB comparison is bit-stable with NO rounding step. The
    * percentile buffer is bounded by the group's DISTINCT-VALUE domain
    * (price grids, not row counts) — the reason this stays exact where
    * a row-sized sort would not. Two passes over the input (median,
    * then deviations), one small med/MAD table joined back (AQE
    * broadcasts it — group cardinality, not data-sized).
    *
    * @return (groupCol, med, mad, n_outliers, n) */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 1.5): DataFrame = {
    val vt = df.schema(valueCol).dataType
    require(vt == org.apache.spark.sql.types.LongType ||
        vt == org.apache.spark.sql.types.IntegerType,
      s"$valueCol is $vt — fixed-point the value to an integer grid first " +
        "(exactness contract; see scaladoc)")
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
    val withAd = df.join(med, Seq(groupCol))
      .withColumn("__ad", abs(col(valueCol) - col("med")))
    val mad = withAd.groupBy(groupCol)
      .agg(expr("percentile(__ad, 0.5)").as("mad"))
    withAd.join(mad, Seq(groupCol))
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(
        sum(when(col("__ad") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"),
        count(lit(1)).as("n"))
  }
}
