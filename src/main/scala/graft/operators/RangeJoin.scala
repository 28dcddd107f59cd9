package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded interval (range) join: pair each left row with the right rows
  * that share its key and whose timestamp falls in
  * `[leftTs + lowerUs, leftTs + upperUs)` (left-closed, right-open,
  * microsecond offsets).
  *
  * The naive plan for a key + range join is an equi-join on the key with
  * the range as a residual filter — correct, but every (key, leftTs,
  * rightTs) combination under one key materializes as a join candidate,
  * so a hot key with n left and m right rows costs n·m comparisons even
  * when almost no pairs fall inside the window. The banded plan bounds
  * candidates by TIME, not just key:
  *
  *   - right rows land in time buckets of width w = upperUs - lowerUs
  *     (each right row in exactly ONE bucket: floor(ts / w)),
  *   - each left row's window spans at most TWO consecutive buckets
  *     (the window's length is exactly w), so the left side replicates
  *     to ≤ 2 (key, bucket) rows,
  *   - the join is a plain equi-join on (key, bucket) + the exact range
  *     as a residual filter.
  *
  * Every true pair is found exactly once (the right row's single bucket
  * is inside the left row's spanned range iff the timestamps can match),
  * and the candidate set per left row is bounded by the key's rows in a
  * 2w time slice — at 100 TB this is the difference between a skew-prone
  * per-key cross product and a uniformly banded shuffle. This is the
  * standard interval-banding rewrite (cf. Spark's own range-join hints
  * in Databricks runtime and Flink's interval join, which bucket state
  * by time the same way).
  *
  * Reference parity: the reference engine has no range join; this is
  * part of the beyond-reference analytics surface (SURVEY.md §2-B).
  */
object RangeJoin {

  /** Matched pairs `leftAlias.* ++ rightAlias.*` for
    * `right.ts ∈ [left.ts + lowerUs, left.ts + upperUs)`.
    *
    * @param leftTs / rightTs timestamp column names (TIMESTAMP type)
    * @param lowerUs,upperUs  window bounds in MICROseconds relative to
    *                         the left timestamp; `lowerUs < upperUs`
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   lowerUs: Long, upperUs: Long): DataFrame = {
    require(lowerUs < upperUs, s"empty window: [$lowerUs, $upperUs)")
    val w = upperUs - lowerUs
    // Bucketing needs FLOOR division: `div` truncates toward zero, so a
    // negative epoch (pre-1970 timestamp) with a nonzero remainder would
    // round UP and land one bucket too high, breaking the "right row's
    // bucket is within the left row's spanned range" invariant. floorDiv
    // = div minus 1 exactly when the remainder is negative (Spark's `%`
    // takes the dividend's sign), which is Math.floorDiv in integer ops.
    def floorDiv(x: String): String =
      s"(($x) div ${w}L + (CASE WHEN ($x) % ${w}L < 0 THEN -1 ELSE 0 END))"
    // NTZ-only cast for input robustness: callers may hold TIMESTAMP_NTZ
    // columns (e.g. pandas-written parquet, which Spark 4 reads as NTZ),
    // and unix_micros requires TIMESTAMP. NTZ→TIMESTAMP reinterprets the
    // naive wall time in the session zone — lossless under the library's
    // pinned-UTC sessions. The cast is gated on the actual NTZ type so
    // any OTHER non-timestamp column still fails analysis loudly at
    // unix_micros (an unconditional cast would quietly read a numeric
    // column as epoch SECONDS and a malformed string as null).
    // Type lookup goes through the analyzer (`df.select`) rather than
    // `df.schema(name)`: the latter is an exact case-sensitive string
    // match, which would reject a casing the session's resolver accepts
    // everywhere else in the join.
    // The cast is guarded by the same UTC-session precondition as
    // Tables.events: in an externally-built non-UTC (or DST) session a
    // join mixing an NTZ side with a TIMESTAMP side would silently shift
    // the NTZ side's wall times and return wrong pairs with no error.
    def ts(df: DataFrame, name: String) =
      if (df.select(col(name)).schema.head.dataType ==
          org.apache.spark.sql.types.TimestampNTZType) {
        graft.functions.requireUtcSession(df.sparkSession,
          s"intervalJoin: column '$name' is TIMESTAMP_NTZ; normalizing it")
        col(name).cast("timestamp")
      } else col(name)
    // Right side: one bucket per row.
    val r = right.withColumn("__rt", unix_micros(ts(right, rightTs)))
      .withColumn("__bucket", expr(floorDiv("__rt")))
    // Left side: replicate to the (≤2) buckets the window overlaps.
    // sequence() is inclusive on both ends; b1 may over-cover by one
    // bucket when the window ends exactly on a boundary — the residual
    // filter removes those candidates.
    val l = left.withColumn("__lt", unix_micros(ts(left, leftTs)))
      .withColumn("__bucket",
        explode(sequence(expr(floorDiv(s"__lt + ${lowerUs}L")),
          expr(floorDiv(s"__lt + ${upperUs}L")))))
    l.join(r, Seq(key, "__bucket"))
      .filter(col("__rt") >= col("__lt") + lowerUs &&
        col("__rt") < col("__lt") + upperUs)
      .drop("__bucket", "__lt", "__rt")
  }

  /** Left-join-count form: every left row with the NUMBER of right rows
    * in its window (0 for no matches) — the common "activity in the N
    * minutes around X" aggregation. Output: left columns + `n_matches`.
    *
    * Built as inner banded pairs → count per left id → left join back,
    * so the left side is never replicated into the aggregate (a left
    * outer banded join would emit 2 rows per unmatched left row — one
    * per covered bucket — and need a dedup).
    *
    * PRECONDITION: `leftId` must be unique per left row. The counts are
    * grouped by `leftId` alone, so a duplicated id would emit duplicate
    * output rows each carrying the MERGED count of all rows sharing the
    * id — silently wrong relative to a per-row count. Uniqueness is the
    * caller's contract (it is what makes "one output row per left row"
    * well-defined); the rj01 oracle entry leans on `event_id` being the
    * events table's key.
    *
    * @param leftId unique left row id to group the counts by
    */
  def countInRange(left: DataFrame, right: DataFrame, key: String,
                   leftId: String, leftTs: String, rightTs: String,
                   lowerUs: Long, upperUs: Long): DataFrame = {
    val pairs = intervalJoin(
      left.select(col(leftId), col(key), col(leftTs)),
      right.select(col(key), col(rightTs).as("__rts")),
      key, leftTs, "__rts", lowerUs, upperUs)
    val counts = pairs.groupBy(leftId).agg(count(lit(1)).as("n_matches"))
    left.join(counts, Seq(leftId), "left")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
  }
}
