package graft.operators

import graft.SparkSpec

/** Intervals.maxConcurrency (iv01) — sweep-line peak vs a brute-force
  * per-instant count, including the half-open touching-interval rule. */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: concurrency at instant t = #intervals with s <= t < e;
    * peak/argmin evaluated at every boundary instant. */
  private def brute(ivs: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    ivs.groupBy(_._1).map { case (k, group) =>
      val instants = group.flatMap(i => Seq(i._2, i._3)).distinct.sorted
      val counts = instants.map(t => t -> group.count(i => i._2 <= t && t < i._3).toLong)
      val peak = counts.map(_._2).max
      k -> (peak, counts.find(_._2 == peak).get._1)
    }

  private def run(ivs: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    Intervals.maxConcurrency(
      ivs.toDF("k", "s", "e").repartition(5), "k", "s", "e")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

  test("matches brute-force boundary evaluation on a seeded fuzz") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(50)
      // Tiny time range forces shared instants and touching intervals.
      val ivs = (1 to n).map { _ =>
        val s = rnd.nextInt(10).toLong
        (s"k${rnd.nextInt(3)}", s, s + 1 + rnd.nextInt(6))
      }
      assert(run(ivs) == brute(ivs), s"trial $trial: $ivs")
    }
  }

  test("touching intervals do not overlap (half-open)") {
    // [0,5) and [5,10) never coexist: peak 1 at t=0.
    assert(run(Seq(("a", 0L, 5L), ("a", 5L, 10L))) == Map("a" -> (1L, 0L)))
    // [0,5) and [4,10) do: peak 2 at t=4.
    assert(run(Seq(("a", 0L, 5L), ("a", 4L, 10L))) == Map("a" -> (2L, 4L)))
  }

  test("peak_at is the earliest instant among equal peaks") {
    // Peak 2 holds on [2,4) and again on [6,8): report t=2.
    val ivs = Seq(("a", 0L, 4L), ("a", 2L, 4L), ("a", 6L, 8L), ("a", 6L, 8L))
    assert(run(ivs) == Map("a" -> (2L, 2L)))
  }
}
