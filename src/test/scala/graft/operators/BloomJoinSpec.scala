package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem = tables.lineitem
  private lazy val urgent = tables.orders.filter(col("o_orderpriority") === "1-URGENT")

  test("bloomSemiJoin equals the plain semi join exactly") {
    val got = BloomJoin.bloomSemiJoin(lineitem, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 10000L, fpp = 0.01)
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Long)].collect().toSet
    val want = lineitem
      .join(urgent.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
      .select("l_orderkey", "l_linenumber")
      .as[(Long, Long)].collect().toSet
    assert(got == want, "Bloom pre-filter must not change the semi-join result")
    assert(got.nonEmpty)
  }

  test("string keys probe the string sketch path") {
    val big = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "a")).toDF("id", "k")
    val small = Seq("a", "c").toDF("k")
    val got = BloomJoin.bloomSemiJoin(big, small, "k", "k", 100L, 0.01)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L))
  }

  test("unsupported key type fails loudly") {
    val big = Seq((1.5, 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(big, big, "k", "k")
    }
  }

  test("mismatched sketch families fail loudly instead of losing rows") {
    // long-keyed big vs string-keyed small: the sketch would be built
    // over UTF-8 bytes and probed with the long hash — Bloom false
    // NEGATIVES, i.e. silently dropped matches. Must throw.
    val big = Seq((1L, "x")).toDF("k", "v")
    val small = Seq(("1", 1L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      BloomJoin.bloomSemiJoin(big, small, "k", "k")
    }
    assert(e.getMessage.contains("sketch family"))
  }

  test("Bloom pass alone already removes most non-matching rows") {
    val sel = BloomJoin.bloomSelectivity(lineitem, urgent, "l_orderkey", "o_orderkey",
      expectedItems = 10000L, fpp = 0.01)
    val exact = lineitem
      .join(urgent.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_semi")
      .count().toDouble / lineitem.count().toDouble
    // keeps everything the exact join keeps...
    assert(sel >= exact)
    // ...and not much more: fpp 1% on the ~80% non-matching tail
    assert(sel <= exact + 0.05,
      s"bloom pass kept $sel vs exact fraction $exact — filter not selective")
  }
}
