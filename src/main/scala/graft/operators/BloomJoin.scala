package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Broadcast-Bloom semi-join reduction: build a Bloom filter over the
  * small side's join key, prune the big side with it BEFORE the exact
  * semi join removes the false positives. The result is exactly
  * `big SEMI JOIN small` — the Bloom pass changes where rows die, not
  * which rows survive.
  *
  * Why it matters at 100 TB: a plain shuffled semi join hashes EVERY
  * big-side row across the network before the join can drop it. The
  * Bloom filter (a few MB even at fpp 1% over millions of keys) rides
  * the task closure to the scan side, so only rows that *might* match
  * — true matches plus the fpp tail — pay the shuffle. This is the
  * explicit, caller-controlled form of the same row-level runtime
  * filtering Spark's optimizer injects adaptively
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`); materializing
  * it as an operator makes the reduction available when the optimizer
  * declines (non-equi compound predicates, reused filters across
  * several queries, a pre-staged filter from a previous pipeline step).
  *
  * The filter build is one aggregation over the SMALL side collected to
  * the driver (`DataFrameStatFunctions.bloomFilter` — size bounded by
  * `expectedItems`/`fpp`, independent of the big side), then broadcast.
  * The membership probe is a scalar UDF: Spark exposes no public
  * `might_contain` function, and a codegen'd Expression would have to
  * re-implement the sketch — the UDF evaluates against the broadcast
  * bits at ~hash cost and sits behind the parquet scan's pushed
  * filters, so it never widens the scan.
  */
object BloomJoin {

  /** Exact semi join of `big` on `small`, Bloom-pruned before the
    * shuffle. Key columns must be integral or string (the sketch's
    * supported put/probe types).
    */
  def bloomSemiJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val keyType = big.schema(bigKey).dataType
    keyType match {
      case LongType | IntegerType | StringType => ()
      case other =>
        // checked BEFORE the sketch build: stat.bloomFilter's own
        // rejection (an AnalysisException about the agg) is far less
        // readable than naming the operator's contract
        throw new IllegalArgumentException(
          s"bloomSemiJoin key must be integral or string, got $other")
    }
    // BOTH sides must probe/put the same hash family: a string-keyed
    // sketch probed with mightContainLong (or vice versa) yields Bloom
    // FALSE NEGATIVES — rows the exact semi join can never restore —
    // i.e. silently wrong results rather than an error (review r13).
    val smallType = small.schema(smallKey).dataType
    val integral = Set[org.apache.spark.sql.types.DataType](LongType, IntegerType)
    require(
      (integral(keyType) && integral(smallType)) ||
        (keyType == StringType && smallType == StringType),
      s"bloomSemiJoin key types must share a sketch family: big $keyType vs small $smallType")
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val probe: Column = keyType match {
      case LongType | IntegerType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
          .apply(col(bigKey).cast("long"))
      case _ =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
          .apply(col(bigKey))
    }
    // No .distinct() on the build side: semi-join semantics already
    // deduplicate it — an explicit distinct is a wasted hash aggregate
    // on exactly the operator meant to shave work (review r13).
    big.filter(probe)
      .join(small.select(col(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** Diagnostic: fraction of big-side rows surviving the Bloom pass
    * alone (exact matches + false positives). Used by specs/probes to
    * show the pre-shuffle reduction, not part of the join result.
    */
  def bloomSelectivity(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): Double = {
    big.schema(bigKey).dataType match {
      case LongType | IntegerType => ()
      case other => throw new IllegalArgumentException(
        s"bloomSelectivity probes the long sketch path; key must be integral, got $other")
    }
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val probe = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    val total = big.count().toDouble
    val kept = big.filter(probe(col(bigKey).cast("long"))).count().toDouble
    if (total == 0) 0.0 else kept / total
  }
}
