package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skyline.skyline2d (sk01) — the distributed plan must match the
  * quadratic dominance definition exactly, including ties. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force frontier per the dominance definition. */
  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filterNot { case (id, mn, mx) =>
      pts.exists { case (_, qmn, qmx) =>
        (qmn < mn && qmx >= mx) || (qmn == mn && qmx > mx)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Long, Long)]): Set[Long] =
    Skyline.skyline2d(
      pts.toDF("id", "mn", "mx").repartition(5), "mn", "mx")
      .select("id").as[Long].collect().toSet

  test("matches the quadratic dominance definition on a seeded fuzz") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      // Small value ranges force heavy min-group and (min,max) ties.
      val n = 1 + rnd.nextInt(60)
      val pts = (1L to n).map(id =>
        (id, rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
      assert(run(pts) == brute(pts), s"trial $trial: $pts")
    }
  }

  test("duplicate frontier points all survive; dominated ties drop") {
    // (min=1,max=5) twice -> both survive; (1,4) loses to same-min (1,5);
    // (2,5) loses to (1,5) on equal max; (2,6) survives; (0,1) survives.
    val pts = Seq((1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 4L),
      (4L, 2L, 5L), (5L, 2L, 6L), (6L, 0L, 1L))
    assert(run(pts) == Set(1L, 2L, 5L, 6L))
  }

  test("single row and empty input") {
    assert(run(Seq((1L, 3L, 3L))) == Set(1L))
    assert(run(Seq.empty) == Set.empty)
  }

  test("withGlobalCumMax is the exclusive prefix max under the sort") {
    val df = Seq((1L, 10L), (2L, 3L), (3L, 7L), (4L, 12L), (5L, 1L))
      .toDF("k", "v").repartition(4)
    val got = GlobalRank.withGlobalCumMax(df, Seq(col("k")), col("v"))
      .select("k", "max_before").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> Long.MinValue, 2L -> 10L, 3L -> 10L,
      4L -> 10L, 5L -> 12L))
  }
}
