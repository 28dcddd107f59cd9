package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequencySpec extends SparkSpec {
  import spark.implicits._

  test("heavyHittersVerified returns the exact top-k inside the CMS band") {
    val got = Frequency.heavyHittersVerified(tables.lineitem, "l_partkey", k = 10)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.size == 10)
    assert(got.forall(_._3), "every estimate must satisfy exact <= est <= exact + eps*N")
    val want = tables.lineitem.groupBy("l_partkey").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_partkey"))
      .limit(10).as[(Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)).sortBy(r => (-r._2, r._1)) == want)
  }

  test("a genuinely skewed key dominates the top-k") {
    val df = (Seq.fill(500)(7L) ++ (1L to 100L)).toDF("k")
    val got = Frequency.heavyHittersVerified(df, "k", k = 1)
      .as[(Long, Long, Boolean)].collect()
    assert(got.head == ((7L, 501L, true)))
  }

  test("unbounded k is rejected — top-k rows are collected") {
    intercept[IllegalArgumentException] {
      Frequency.heavyHittersVerified(tables.lineitem, "l_partkey", k = 100000)
    }
  }
}
