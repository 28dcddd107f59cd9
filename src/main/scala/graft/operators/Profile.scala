package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality primitive run before any corpus
  * lands in a training pipeline: per column, row count, null count,
  * exact distinct count, and min/max (as strings, so heterogeneous
  * column types share one output schema).
  *
  * ONE pass over the data: all per-column aggregates ride a single
  * `agg` (multiple exact DISTINCTs plan as one Expand — the
  * q11_multi_distinct shape: rows x |cols| map-side expansion with
  * partial aggregation, no joins, one shuffle). The 1-row aggregate is
  * then unpivoted into |cols| rows with an explode — no collect. At
  * 100 TB the Expand multiplier is the knob: profile the columns you
  * need, or swap `count_distinct` for `approx_count_distinct` when a
  * 2 % estimate is acceptable (the exact form here is what the oracle
  * can verify).
  */
object Profile {

  /** @return one row per profiled column:
    *         (column_name, n_rows, n_null, n_distinct, min_s, max_s) */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"column(s) not in input: ${missing.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
