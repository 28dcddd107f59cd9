import graft.GraftSession
import graft.operators.Frequency

import org.apache.spark.sql.functions._

/** Round-15 bitmap-distinct probe: measures bm01's claim ("the shuffle
  * moves groups × occupied-buckets bitmaps instead of every distinct
  * key occurrence") where it actually matters — dense HIGH-cardinality
  * keys, where count_distinct's partial-dedup buys nothing because
  * nearly every (group, key) pair is unique.
  *
  * Synthetic: 50M rows, key = id % 10M (10M dense distinct keys),
  * 4 groups → exact distinct = 10M per group. Two timings, floors of
  * 2 passes: the plain count_distinct aggregate vs
  * Frequency.bitmapDistinct (306 buckets/group × ≤4 KB bitmaps =
  * ~1.2 MB shuffled per group vs ~40M shuffled key rows).
  * Results → NOTES.md. `Test/runMain Round15BitmapProbe`.
  */
object Round15BitmapProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-bitmap-probe15")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    val df = spark.range(50L * 1000 * 1000)
      .select((col("id") % 4).as("g"), (col("id") % 10000000L).as("k"))
      .persist()
    df.count()

    def time[A](what: String)(f: => A): Double = {
      val floor = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PROBE15BM $what%-32s $floor%8.2f s (floor of 2)")
      floor
    }

    val exact = time("count_distinct (pair shuffle)") {
      df.groupBy("g").agg(count_distinct(col("k"))).collect()
    }
    val bitmap = time("bitmapDistinct (bitmap shuffle)") {
      Frequency.bitmapDistinct(df, Seq("g"), "k").collect()
    }
    // same answers, by construction of the bucket partition
    val a = df.groupBy("g").agg(count_distinct(col("k")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Frequency.bitmapDistinct(df, Seq("g"), "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(a == b, s"exactness violated: $a vs $b")
    println(f"PROBE15BM speedup = ${exact / bitmap}%.1fx (results identical)")
    spark.stop()
  }
}
