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

  test("null keys are dropped from both the exact and sketched paths — no NPE") {
    // A null-key group big enough to reach the top-k: the CMS ignores
    // nulls, and an exact groupBy that kept them would NPE at the
    // getLong probe (ADVICE r13).
    val df = (Seq.fill(50)(Option.empty[Long]) ++ Seq.fill(20)(Some(7L)) ++
      (1L to 5L).map(Some(_))).toDF("k")
    val got = Frequency.heavyHittersVerified(df, "k", k = 3)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._1) == Seq(7L, 1L, 2L), s"null group must not appear: $got")
    assert(got.head._2 == 20L)
    assert(got.forall(_._3))
  }

  test("bitmapDistinct equals count_distinct per group, incl. cross-bucket keys") {
    // Keys straddle several 32768-key bitmap buckets and repeat across
    // groups; the bucketed bitmap counts must still add up exactly.
    val rnd = new scala.util.Random(23)
    val rows = (1 to 5000).map { _ =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(200000).toLong)
    }
    val df = rows.toDF("g", "k")
    val got = Frequency.bitmapDistinct(df, Seq("g"), "k")
      .as[(String, Long)].collect().toMap
    val want = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).distinct.size.toLong }
    assert(got == want)
  }

  test("bitmapDistinct drops null keys (matching count_distinct semantics)") {
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(1L)), ("b", None))
      .toDF("g", "k")
    val got = Frequency.bitmapDistinct(df, Seq("g"), "k")
      .as[(String, Long)].collect().toMap
    // count_distinct ignores nulls: a→1; b has only nulls → no bitmap row.
    assert(got == Map("a" -> 1L))
  }
}
