package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): the rows not dominated by any other
  * row, where q dominates p iff q is no worse on both criteria and
  * strictly better on at least one. The classic "best tradeoff" OLAP
  * query (cheapest-vs-largest part, fastest-vs-freshest replica,
  * shortest-vs-highest-quality document).
  *
  * Semantics for (minimize `minCol`, maximize `maxCol`), both integral:
  * p is dominated iff
  *   - ∃q with q.min <  p.min and q.max >= p.max, or
  *   - ∃q with q.min == p.min and q.max >  p.max.
  *
  * The naive plan is a quadratic NOT EXISTS self-join (the oracle runs
  * exactly that, fine at oracle scale); a single-partition
  * `max().over(Window.orderBy(min))` would funnel the whole table
  * through one task. This implementation is scale-first:
  *   1. reduce to one row per distinct `minCol` value — groupBy(min)
  *     → max(max): a map-side-combinable aggregation that collapses
  *     the table to |distinct mins| rows before any ordering work;
  *   2. [[GlobalRank.withGlobalCumMax]] over that group table ordered
  *     by `minCol` — the two-phase distributed prefix max (range
  *     shuffle + broadcast offsets, no single-task window);
  *   3. join the (groupMax, prefixMax) pair back on `minCol` and keep
  *     rows with `maxCol == groupMax && maxCol > prefixMax`. The group
  *     table has one row per distinct min value — no broadcast hint,
  *     because that cardinality can approach |input| when mins are
  *     near-unique; AQE upgrades the exchange to a broadcast join at
  *     runtime whenever the group table is actually small.
  *
  * Survivor rule derivation: a row survives iff it carries its
  * min-group's max (otherwise a same-min row strictly beats it) and
  * that value strictly exceeds the running max over all strictly
  * smaller mins (otherwise some cheaper row is at least as good).
  * Duplicate (min, max) points on the frontier all survive — they tie,
  * and ties do not dominate.
  */
object Skyline {

  /** @param df     input; `minCol`/`maxCol` must be integral and
    *               non-null (quantize doubles upstream — cents, micros)
    * @param minCol criterion to minimize
    * @param maxCol criterion to maximize
    * @return the input rows on the Pareto frontier, schema unchanged */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    require(df.columns.contains(minCol) && df.columns.contains(maxCol),
      s"input must have '$minCol' and '$maxCol' columns")
    require(!df.columns.contains("__gmax") && !df.columns.contains("__pmax"),
      "input must not already have '__gmax'/'__pmax' columns")
    val groups = df.groupBy(col(minCol)).agg(max(col(maxCol)).as("__gmax"))
    val scanned = GlobalRank.withGlobalCumMax(
      groups, Seq(col(minCol)), col("__gmax"), outCol = "__pmax")
    df.join(scanned, Seq(minCol))
      .filter(col(maxCol) === col("__gmax") && col(maxCol) > col("__pmax"))
      .drop("__gmax", "__pmax")
  }
}
