package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe global ranking: distributed row_number / percent_rank /
  * cume_dist / ntile over a TOTAL ordering, without the
  * single-partition WindowExec that `Window.orderBy(...)` (no
  * partitionBy) plans — where every row of a 100 TB table would funnel
  * through one task.
  *
  * Two-phase scheme:
  *   1. range-repartition on the sort keys + sort within partitions —
  *     a global sort whose partitions are ordered AND internally
  *     ordered (Spark's own ORDER BY shape, minus the final
  *     single-stream collect);
  *   2. per-partition row counts (one cheap job over the shuffle
  *     output) → prefix-sum offsets broadcast to every task → each
  *     task assigns `offset(p) + local index` in one pass.
  *
  * The ordering must be tie-free (include a unique key, as any
  * deterministic ORDER BY should): with ties, rank-family semantics
  * would additionally need a per-key min/max join. percent_rank,
  * cume_dist and ntile then derive from (row_number, n) with the exact
  * SQL-standard arithmetic, so results are bit-identical to the window
  * functions — asserted by the oracle-checked query that runs BOTH
  * implementations.
  */
object GlobalRank {

  /** `df` plus a 1-based global `outCol` row number under `sortCols`.
    * Wall-clock: one shuffle (the range exchange) + two map passes.
    */
  def withGlobalRowNumber(df: DataFrame, sortCols: Seq[Column],
                          outCol: String = "rn",
                          numPartitions: Option[Int] = None): DataFrame =
    withGlobalRowNumberAndCount(df, sortCols, outCol, numPartitions)._1

  /** [[withGlobalRowNumber]] plus the total row count, which phase 1
    * already materialized on the driver (`offsets.last`). Callers that
    * need n — [[distributions]] — take it from here instead of
    * re-executing the ranked lineage through an `agg(max)` job.
    */
  def withGlobalRowNumberAndCount(df: DataFrame, sortCols: Seq[Column],
                          outCol: String = "rn",
                          numPartitions: Option[Int] = None): (DataFrame, Long) = {
    require(!df.columns.contains(outCol),
      s"input must not already have a '$outCol' column (schema.add would duplicate it)")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val parted = df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)

    // Phase 1: per-partition counts. Re-reads the range shuffle's output
    // (map-side files persist), so this job is a count over local data.
    val rdd = parted.rdd
    val counts = rdd.mapPartitionsWithIndex((i, it) => Iterator((i, it.size)))
      .collect().sortBy(_._1).map(_._2.toLong)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i

    // Phase 2: per-partition assignment with the broadcast offsets.
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val schema = df.schema.add(outCol, LongType, nullable = false)
    val zipped = rdd.mapPartitionsWithIndex { (i, it) =>
      val base = bOffsets.value(i)
      it.zipWithIndex.map { case (r, j) => Row.fromSeq(r.toSeq :+ (base + j + 1L)) }
    }
    (spark.createDataFrame(zipped, schema), offsets.last)
  }

  /** `df` plus the EXCLUSIVE global prefix sum of `valueCol` under
    * `sortCols` (`outCol` = sum of `valueCol` over all rows strictly
    * before this one in the total order) — the distributed cumulative
    * sum, same two-phase scheme as [[withGlobalRowNumber]]: phase 1
    * computes per-partition sums of the range-shuffled data (cheap local
    * job), phase 2 broadcasts the prefix offsets and adds a local
    * running sum. No single-partition WindowExec anywhere: the plan a
    * plain `sum().over(Window.orderBy(...))` would need funnels the
    * whole table through one task.
    *
    * `valueCol` must be integral (LongType after cast) so the sum is
    * exact and order-stable; a null value counts as 0. As with
    * [[withGlobalRowNumber]], `sortCols` must be tie-free (include a
    * unique key) — tied rows have shuffle-dependent relative order, so
    * their prefix sums would differ run to run.
    */
  def withGlobalCumSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                       outCol: String = "cum_before",
                       numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.contains("__v") && !df.columns.contains(outCol),
      s"input must not already have columns '__v' or '$outCol'")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val withV = df.withColumn("__v", coalesce(valueCol.cast(LongType), lit(0L)))
    val parted = withV.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)

    val rdd = parted.rdd
    val vIdx = parted.schema.fieldIndex("__v")
    val sums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)

    val bOffsets = spark.sparkContext.broadcast(offsets)
    val schema = withV.schema.add(outCol, LongType, nullable = false)
    val zipped = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bOffsets.value(i)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ run)
        run += r.getLong(vIdx)
        out
      }
    }
    spark.createDataFrame(zipped, schema).drop("__v")
  }

  /** `df` plus the EXCLUSIVE global prefix MAX of `valueCol` under
    * `sortCols` (`outCol` = max of `valueCol` over all rows strictly
    * before this one in the total order; `Long.MinValue` for the first
    * row — the max-monoid identity). Same two-phase scheme as
    * [[withGlobalCumSum]]: range shuffle + per-partition maxes (cheap
    * local job) → broadcast prefix maxes → one local scan. This is the
    * distributed prefix scan a `max().over(Window.orderBy(...))` would
    * funnel through a single task.
    *
    * `valueCol` must be integral; nulls count as `Long.MinValue`
    * (never the max unless the prefix is empty). `sortCols` must be
    * tie-free for a deterministic result, same as the other scans.
    */
  def withGlobalCumMax(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                       outCol: String = "max_before",
                       numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.contains("__v") && !df.columns.contains(outCol),
      s"input must not already have columns '__v' or '$outCol'")
    val spark = df.sparkSession
    val n = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val withV = df.withColumn("__v",
      coalesce(valueCol.cast(LongType), lit(Long.MinValue)))
    val parted = withV.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)

    val rdd = parted.rdd
    val vIdx = parted.schema.fieldIndex("__v")
    val maxes = rdd.mapPartitionsWithIndex { (i, it) =>
      var m = Long.MinValue; it.foreach(r => m = math.max(m, r.getLong(vIdx)))
      Iterator((i, m))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = maxes.scanLeft(Long.MinValue)(math.max)

    val bOffsets = spark.sparkContext.broadcast(offsets)
    val schema = withV.schema.add(outCol, LongType, nullable = false)
    val zipped = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bOffsets.value(i)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ run)
        run = math.max(run, r.getLong(vIdx))
        out
      }
    }
    spark.createDataFrame(zipped, schema).drop("__v")
  }

  /** Global percent_rank / cume_dist / ntile(k) in one pass, derived
    * from the two-phase row number:
    *   percent_rank = (rn-1)/(n-1)   (0.0 when n == 1)
    *   cume_dist    = rn/n
    *   ntile(k)     = SQL-standard uneven buckets, larger buckets first.
    */
  def distributions(df: DataFrame, sortCols: Seq[Column], ntileK: Int,
                    numPartitions: Option[Int] = None): DataFrame = {
    require(ntileK >= 1, s"ntile bucket count must be >= 1, got $ntileK")
    // n is phase 1's offsets.last, already on the driver — no extra job.
    val (ranked, n) = withGlobalRowNumberAndCount(df, sortCols, "rn", numPartitions)
    val N = lit(n)
    val rn = col("rn")
    // NTILE with uneven division: q = n/k, r = n%k; the first r buckets
    // get q+1 rows. bucket = (rn-1)/(q+1)+1 inside the large region,
    // else r + (rn - r*(q+1) - 1)/q + 1.
    val q = n / ntileK
    val r = n % ntileK
    val tile: Column =
      if (q == 0) rn.cast("int") // fewer rows than buckets: one row each
      else when(rn <= lit(r * (q + 1)), ((rn - 1) / lit(q + 1) + 1))
        .otherwise(lit(r) + (rn - lit(r * (q + 1)) - 1) / lit(q) + 1)
        .cast("int")
    ranked
      .withColumn("pr", when(N === 1L, 0.0).otherwise((rn - 1).cast("double") / (N - 1).cast("double")))
      .withColumn("cd", rn.cast("double") / N.cast("double"))
      .withColumn("tile", tile)
  }
}
