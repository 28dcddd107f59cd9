import graft.GraftSession
import graft.operators.Baskets

import org.apache.spark.sql.functions._

/** Round-16 adversarial-skew probe: demonstrates that the basket
  * width guard fires BEFORE the quadratic pair explosion, in seconds —
  * not after hours of straggler work. One bot basket of 200,000
  * frequent items would emit C(200k, 2) ≈ 2·10^10 pair rows from a
  * single join key (the r15 `weak` scenario); the guard's window count
  * evaluates while the join INPUT is scanned, so the job dies with the
  * named basket before any pair row materializes.
  *
  * Printed: time-to-error with the guard (expected: seconds) and the
  * pair volume the guard prevented. `Test/runMain Round16GuardProbe`.
  */
object Round16GuardProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-guard-probe16")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    import spark.implicits._

    val w = 200000
    // every item also appears in one other basket → all frequent at
    // minSupport=2; basket 0 is the bot basket holding all of them
    val bot = spark.range(w).select(lit(0L).as("basket_id"), col("id").as("item"))
      .unionAll(spark.range(w).select((col("id") + 1000000L).as("basket_id"),
        col("id").as("item")))

    val t0 = System.nanoTime()
    val failed =
      try { Baskets.frequentPairs(bot, minSupport = 2).count(); false }
      catch { case e: Exception =>
        val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
        assert(msg.contains("maxBasketWidth"), s"wrong failure: $msg")
        true
      }
    val t = (System.nanoTime() - t0) / 1e9
    assert(failed, "guard must fire on a 200k-wide basket")
    println(f"PROBE16G width guard fired in $t%.1f s on a $w%,d-wide basket " +
      f"(prevented ${w.toLong * (w - 1) / 2}%,d pair rows from one key)")
    spark.stop()
  }
}
