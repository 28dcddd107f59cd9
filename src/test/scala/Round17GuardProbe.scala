import graft.GraftSession
import graft.operators.{FuzzyJoin, Similarity}

import org.apache.spark.sql.functions._

/** Round-17 adversarial-skew probe: the fuzzy-join / embedding-bucket
  * block caps firing BEFORE the quadratic pair explosion — the r16
  * verdict's `weak` scenario made impossible. One part name cloned
  * 200,000 times shares every prefix token, so a single (gram, occ)
  * join key would emit C(200k, 2) ≈ 2·10^10 candidate pairs; the
  * guard's window count rides the join's own (gram, occ) shuffle, so
  * the job dies with the token named before any pair row materializes.
  * Same check for [[Similarity.nearDupPairs]]'s sign-bucket axis with
  * 200k vectors in one bucket.
  *
  * Printed: time-to-error with each guard (expected: seconds) and the
  * pair volume prevented. `Test/runMain Round17GuardProbe`.
  */
object Round17GuardProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-guard-probe17")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    val w = 200000
    def msgOf(e: Throwable): String =
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

    // --- fuzzy join: one verbatim name cloned w times -------------
    val clones = spark.range(w)
      .select(col("id"), lit("promo burnished copper kettle").as("s"))
    val t0 = System.nanoTime()
    val fzFailed =
      try { FuzzyJoin.qgramJoin(clones, "id", "s").count(); false }
      catch { case e: Exception =>
        val m = msgOf(e)
        assert(m.contains("maxBlockSize"), s"wrong failure: $m")
        true
      }
    val tFz = (System.nanoTime() - t0) / 1e9
    assert(fzFailed, "block guard must fire on a 200k-clone block")
    println(f"PROBE17G qgramJoin block guard fired in $tFz%.1f s on a " +
      f"$w%,d-clone block (prevented ~${w.toLong * (w - 1) / 2}%,d candidate " +
      "pairs from one key)")

    // --- embedding near-dup: one sign bucket holding everything ----
    val vecs = spark.range(w).select(col("id").as("vec_id"),
      array((0 until 8).map(i => (rand(i + 7) + lit(0.001)).cast("float")): _*)
        .as("embedding")) // all components positive → one bucket at any bits
    val t1 = System.nanoTime()
    val ndFailed =
      try { Similarity.nearDupPairs(vecs, threshold = 0.99, bits = 4,
        maxBucketSize = 100000).count(); false }
      catch { case e: Exception =>
        val m = msgOf(e)
        assert(m.contains("maxBucketSize"), s"wrong failure: $m")
        true
      }
    val tNd = (System.nanoTime() - t1) / 1e9
    assert(ndFailed, "bucket guard must fire on a 200k-wide bucket")
    println(f"PROBE17G nearDupPairs bucket guard fired in $tNd%.1f s on a " +
      f"$w%,d-wide bucket")
    spark.stop()
  }
}
