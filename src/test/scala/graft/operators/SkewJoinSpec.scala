package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = tables.events
  private lazy val customer = tables.customer.select("c_custkey", "c_mktsegment")

  test("salted join == plain join, row multiset for row multiset") {
    val salted = SkewJoin.saltedJoin(events, customer,
        bigKey = "user_id", smallKey = "c_custkey",
        discriminator = "event_id", factor = 8)
      .select(col("event_id"), col("c_mktsegment"))
      .as[(Long, String)].collect().sorted.toSeq
    val plain = events.join(customer, col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(salted.nonEmpty && salted == plain)
  }

  test("factor = 1 degenerates to the plain join") {
    val n1 = SkewJoin.saltedJoin(events, customer,
      "user_id", "c_custkey", "event_id", factor = 1).count()
    val n = events.join(customer, col("user_id") === col("c_custkey")).count()
    assert(n1 == n)
  }

  test("salt is deterministic: two runs select identical rows") {
    def run() = SkewJoin.saltedJoin(events, customer,
        "user_id", "c_custkey", "event_id", factor = 4)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(run() == run())
  }

  test("big side spreads each hot key over the salt space") {
    // All rows of the hottest key must NOT land on a single salt value —
    // that spread is the entire point of the operator.
    val salts = events.withColumn("__salt",
        pmod(xxhash64(col("event_id")), lit(8L)))
      .filter(col("user_id") === 0L)
      .select(countDistinct("__salt")).as[Long].head()
    assert(salts > 4, s"hot key rows spread over $salts of 8 salts")
  }
}
