import graft.GraftSession
import graft.operators.Baskets

import org.apache.spark.sql.functions._

/** Round-16 basket probe: measures the width-guard's cost on the
  * rec01/ar01 path at sf0.1 after the nested-working-set fix (the
  * guard window initially re-ran on BOTH sides of the pair self-join —
  * the r16 record showed rec01's floor 4.12 → 5.20 s; materializing
  * the guarded frame runs prune + width check once). Floors of 2
  * passes, noop sink. `Test/runMain Round16BasketProbe`.
  */
object Round16BasketProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "graft-basket-probe16")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)

    val baskets = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_orderkey").as("basket_id"), col("l_partkey").as("item"))

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE16 $label%-24s floor ${ts.min}%6.2f s (passes ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    time("rec01_item_neighbors")(Baskets.itemNeighbors(baskets, minSupport = 2, k = 3))
    time("ar01_assoc_rules")(Baskets.associationRules(baskets, minSupport = 2))
    time("fp01_frequent_pairs")(Baskets.frequentPairs(baskets, minSupport = 2))
    spark.stop()
  }
}
