package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Frequency estimation with a count-min sketch.
  *
  * The sketch is built distributed (`DataFrameStatFunctions
  * .countMinSketch` runs a map-side sketch per partition and merges the
  * fixed-size tables — one treeAggregate, no key shuffle at all), so at
  * 100 TB the cost is a single scan producing depth x width counters per
  * partition regardless of key cardinality. That is the point of the
  * sketch: the exact groupBy this module's verification runs needs a
  * shuffle keyed on every distinct value; the sketch needs none.
  */
object Frequency {

  /** Exact top-k keys with the count-min estimate verified against the
    * CMS guarantee: `exact <= estimate <= exact + eps * N` (the upper
    * bound holds with probability >= confidence; estimates never
    * undercount). Output is one row per top-k key:
    * (keyCol, n_exact, within_band).
    *
    * The exact top-k side exists to make the sketch's accuracy claim
    * oracle-checkable — it is the verification harness, not the scale
    * path (same pattern as the HLL entry hl01: sketch result
    * self-checked against the exact computation inside the declared
    * band). The only driver-side work is the k-row collect of the
    * verified candidates and the sketch itself (depth x width longs,
    * ~1 MB at eps=1e-4).
    */
  def heavyHittersVerified(
      df: DataFrame,
      keyCol: String,
      k: Int,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(k > 0 && k <= 1000, s"k=$k must be in (0, 1000] — top-k rows are collected")
    // The driver-side estimate/collect path below is LongType-specific
    // (getLong + the long-hash probe); any other key type would run both
    // jobs and then throw an opaque ClassCastException.
    val keyType = df.schema(keyCol).dataType
    require(keyType == LongType,
      s"$keyCol is $keyType — heavyHittersVerified probes the sketch with " +
        "the long hash; cast the key to LONG first")
    val spark = df.sparkSession
    // The CMS ignores null keys but the exact groupBy would keep a
    // null-key group; if that group reached the top-k, getLong(0) below
    // would NPE. Null keys are dropped from BOTH paths so the exact and
    // sketched counts agree on the same (non-null) key domain.
    val keyed = df.select(col(keyCol)).filter(col(keyCol).isNotNull)
    val sketch = keyed.stat.countMinSketch(keyCol, eps, confidence, seed)
    val total = sketch.totalCount() // N rides the sketch — no extra count job
    // Verify at 2x the sketch's declared eps band: the 1-eps-band bound
    // holds only with per-key probability >= confidence (depth-7 Markov:
    // ~(1/2)^7 per key, ~8% union over 10 keys — a realistic false-red
    // on a testdata regeneration). Doubling the band squares away the
    // tail (P[row extra > 2 eps N] <= 1/4, min over 7 rows ~6e-5/key)
    // while still asserting the sketch is doing its job.
    val slack = 2L * math.ceil(eps * total).toLong
    // Deterministic top-k: count desc, key asc — ties are totally ordered.
    val top = keyed.groupBy(keyCol)
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col(keyCol))
      .limit(k)
      .collect()
    val verified = top.map { r =>
      val key = r.getLong(0)
      val exact = r.getLong(1)
      val est = sketch.estimateCount(key)
      Row(key, exact, est >= exact && est <= exact + slack)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(verified.toSeq, 1),
      StructType(Seq(
        StructField(keyCol, LongType),
        StructField("n_exact", LongType),
        StructField("within_band", BooleanType))))
  }

  /** EXACT per-group distinct count via roaring-style bitmaps — the
    * high-cardinality alternative to `count_distinct`. A plain distinct
    * agg shuffles one row per (group, key) PAIR; here each partition
    * first folds its keys into fixed-size bitmaps (Spark's
    * `bitmap_construct_agg` over `bitmap_bit_position`, one ≤4 KB
    * bitmap per (group, 32768-key bucket)), so the shuffle moves
    * `groups × occupied-buckets` bitmaps instead of every distinct
    * key occurrence — at 100 TB with dense integer keys that is a
    * ~32768:1 reduction in shuffled rows, with exact results (every
    * key sets exactly one bit; `bitmap_count` sums set bits, and
    * bucket counts add because buckets partition the key space).
    *
    * Key must be integral and non-null (the bitmap position is the
    * key's residue; nulls would silently vanish from one path of any
    * verification — filter first).
    *
    * @return (groupCols*, n_distinct) — exact int64, equal to
    *         `count_distinct(keyCol)` per group */
  def bitmapDistinct(df: DataFrame, groupCols: Seq[String],
                     keyCol: String): DataFrame = {
    val g = groupCols.map(col)
    df.filter(col(keyCol).isNotNull)
      .groupBy(g :+ expr(s"bitmap_bucket_number($keyCol)").as("__bucket"): _*)
      .agg(expr(s"bitmap_construct_agg(bitmap_bit_position($keyCol))").as("__bm"))
      .groupBy(g: _*)
      .agg(sum(expr("bitmap_count(__bm)")).as("n_distinct"))
  }
}
