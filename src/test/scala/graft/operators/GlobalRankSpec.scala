package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase global ranking: equality with Spark's window functions
  * (the semantics oracle) and the scale property that motivated it — no
  * single-partition exchange in the physical plan.
  */
class GlobalRankSpec extends SparkSpec {

  private lazy val customer = tables.customer

  test("global row number equals row_number() over the same total order") {
    val keys = Seq(col("c_acctbal"), col("c_custkey"))
    val got = GlobalRank.withGlobalRowNumber(customer, keys)
      .select(col("c_custkey"), col("rn"))
    val want = customer.select(col("c_custkey"),
      row_number().over(Window.orderBy(keys: _*)).cast("long").as("rn"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("percent_rank/cume_dist/ntile match the window-function semantics exactly") {
    val keys = Seq(col("c_acctbal"), col("c_custkey"))
    val got = GlobalRank.distributions(customer, keys, ntileK = 7)
      .select(col("c_custkey"), col("pr"), col("cd"), col("tile"))
    val w = Window.orderBy(keys: _*)
    val want = customer.select(col("c_custkey"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"),
      ntile(7).over(w).as("tile"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("ntile with fewer rows than buckets gives one row per bucket") {
    val five = customer.orderBy("c_custkey").limit(5)
    val got = GlobalRank.distributions(five, Seq(col("c_custkey")), ntileK = 100)
      .select(col("c_custkey"), col("tile"))
    val want = five.select(col("c_custkey"),
      ntile(100).over(Window.orderBy(col("c_custkey"))).as("tile"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("scale path: the plan has no single-partition window exchange") {
    val ranked = GlobalRank.withGlobalRowNumber(customer,
      Seq(col("c_acctbal"), col("c_custkey")), numPartitions = Some(8))
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no WindowExec expected:\n${plan.take(800)}")
    assert(!plan.contains("SinglePartition"),
      s"no single-partition exchange expected:\n${plan.take(800)}")
    // and the data really is spread across the requested partitions
    assert(ranked.rdd.getNumPartitions == 8)
  }

  test("distributions launches no extra job to rediscover n (VERDICT r7 #3)") {
    // n must come from phase 1's driver-side offsets, not an agg(max)
    // over the ranked lineage — at 100 TB that agg re-executed the range
    // shuffle's read side for a number already on the driver. Absolute
    // job counts are AQE-dependent, so assert the DELTA: distributions
    // must cost exactly the jobs of the underlying row-number pipeline,
    // not one more (the derived pr/cd/tile columns are per-row
    // expressions on the same lineage).
    def jobsFor(f: => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        f
        // The listener bus is async; the action returned, so all starts
        // are posted or queued — stable for 300ms means drained.
        val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
        var last = -1
        while (jobs.get() != last && System.nanoTime() < deadline) {
          last = jobs.get(); Thread.sleep(300)
        }
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val keys = Seq(col("c_acctbal"), col("c_custkey"))
    val base = jobsFor(GlobalRank.withGlobalRowNumber(customer, keys).collect())
    val dist = jobsFor(GlobalRank.distributions(customer, keys, ntileK = 4).collect())
    assert(dist == base,
      s"distributions ran $dist jobs vs $base for the bare row-number pipeline")
  }

  test("empty input yields an empty ranked frame (no div-by-zero)") {
    val empty = customer.filter(lit(false))
    assert(GlobalRank.distributions(empty, Seq(col("c_custkey")), ntileK = 4).count() == 0)
  }
}
