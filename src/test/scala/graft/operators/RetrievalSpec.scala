package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse matches the hand-computed fusion, absent docs contribute 0") {
    // list A ranks: 10 (0.9 → 1), 20 (0.5 → 2), 30 (0.1 → 3)
    // list B ranks: 20 (0.8 → 1), 40 (0.2 → 2)
    val a = Seq((10L, 0.9), (20L, 0.5), (30L, 0.1)).toDF("doc_id", "score")
    val b = Seq((20L, 0.8), (40L, 0.2)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 60)
      .as[(Long, Option[Long], Option[Long], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got(10L) == ((Some(1L), None, r6(1.0 / 61))))
    assert(got(20L) == ((Some(2L), Some(1L), r6(1.0 / 62 + 1.0 / 61))))
    assert(got(30L) == ((Some(3L), None, r6(1.0 / 63))))
    assert(got(40L) == ((None, Some(2L), r6(1.0 / 62))))
  }

  test("score ties rank deterministically by doc_id") {
    val a = Seq((5L, 1.0), (3L, 1.0), (9L, 1.0)).toDF("doc_id", "score")
    val b = Seq((3L, 2.0), (5L, 1.0), (9L, 0.5)).toDF("doc_id", "score")
    val got = Retrieval.rrfFuse(Seq(a, b))
      .select("doc_id", "rank_0").as[(Long, Long)].collect().toMap
    assert(got == Map(3L -> 1L, 5L -> 2L, 9L -> 3L))
  }

  test("fusion order is fixed, not shuffle-dependent (3 lists, wide partitioning)") {
    val lists = Seq(0, 1, 2).map { i =>
      (1L to 200L).map(d => (d, ((d * (i + 7)) % 101).toDouble))
        .toDF("doc_id", "score").repartition(16)
    }
    val once = Retrieval.rrfFuse(lists).orderBy("doc_id").collect().map(_.toString)
    val again = Retrieval.rrfFuse(lists.map(_.repartition(5)))
      .orderBy("doc_id").collect().map(_.toString)
    assert(once.nonEmpty && once.sameElements(again))
  }

  test("guards: list count and k validated") {
    val a = Seq((1L, 1.0)).toDF("doc_id", "score")
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(a)))
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(a, a), k = 0))
  }

  test("phraseSearch: consecutive positions only, overlaps counted") {
    val docs = Seq(
      (1L, "the red fox and the red fox again"), // "red fox" twice
      (2L, "red and fox"),                       // terms present, not adjacent
      (3L, "a a a"),                             // overlapping "a a" twice
      (4L, "RED FOX"))                           // tokens() lowercases
      .toDF("doc_id", "text")
    val rf = Retrieval.phraseSearch(docs, Seq("red", "fox"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(rf == Seq((1L, 2L), (4L, 1L)))
    val aa = Retrieval.phraseSearch(docs, Seq("a", "a"))
      .as[(Long, Long)].collect().toSeq
    assert(aa == Seq((3L, 2L)))
  }

  test("phraseSearch: 3-term phrase chains the position joins") {
    val docs = Seq((1L, "x y z x y"), (2L, "x z y")).toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, Seq("x", "y", "z"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L)))
  }

  test("phraseSearch guards: arity and normal form") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Retrieval.phraseSearch(docs, Seq("a")))
    intercept[IllegalArgumentException](Retrieval.phraseSearch(docs, Seq("A", "b")))
    intercept[IllegalArgumentException](Retrieval.phraseSearch(docs, Seq("", "b")))
  }
}
