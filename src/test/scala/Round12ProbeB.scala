import graft.GraftSession
import org.apache.spark.sql.functions._

/** Round-12 probe B: decompose qr01_global_ranks' 0.80 s isolated floor
  * (vs 0.52 recorded) into its phases. Run `Test/runMain Round12ProbeB`.
  */
object Round12ProbeB {
  private def timed(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"PROBE $label%-44s $s%8.2f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.builder("local[32]", "graft-round12probeB")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    val customer = graft.Tables(spark, sfDir).customer
    customer.count() // warm file index

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    for (i <- 1 to 3) {
      timed(s"[$i] plain sort only (repartitionByRange)") {
        noop(customer.repartitionByRange(32, col("c_acctbal"), col("c_custkey"))
          .sortWithinPartitions(col("c_acctbal"), col("c_custkey")))
      }
      timed(s"[$i] distributions, no final orderBy") {
        noop(graft.operators.GlobalRank.distributions(
          customer, Seq(col("c_acctbal"), col("c_custkey")), ntileK = 4))
      }
      timed(s"[$i] distributions + orderBy (entry shape)") {
        noop(graft.operators.GlobalRank.distributions(
          customer, Seq(col("c_acctbal"), col("c_custkey")), ntileK = 4)
          .orderBy("c_custkey"))
      }
      timed(s"[$i] distributions localCkpt + orderBy") {
        noop(graft.operators.GlobalRank.distributions(
          customer, Seq(col("c_acctbal"), col("c_custkey")), ntileK = 4)
          .localCheckpoint(true).orderBy("c_custkey"))
      }
      timed(s"[$i] distributions PRUNED (2 cols) + orderBy") {
        noop(graft.operators.GlobalRank.distributions(
          customer.select("c_acctbal", "c_custkey"),
          Seq(col("c_acctbal"), col("c_custkey")), ntileK = 4)
          .orderBy("c_custkey"))
      }
    }
    spark.stop()
  }
}
