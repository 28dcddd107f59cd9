package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // a -> b, a -> c, b -> a; c is dangling (its inbound mass leaks —
  // the documented no-redistribution variant)
  private def tinyGraph = Seq((1L, 2L), (1L, 3L), (2L, 1L))
    .toDF("src", "dst")

  test("pagerankMicro matches the hand-computed integer iterations") {
    // r0 = 1_000_000 each; base = 150_000
    // iter1: a->b (1M*85)//200 = 425_000 (and a->c); b->a (1M*85)//100 = 850_000
    //   r1: a = 1_000_000, b = 575_000, c = 575_000
    // iter2: a contributes 425_000 to b and c; b contributes
    //   (575_000*85)//100 = 488_750 to a
    //   r2: a = 638_750, b = 575_000, c = 575_000
    val r1 = PageRank.pagerankMicro(tinyGraph, iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 1000000L, 2L -> 575000L, 3L -> 575000L))
    val r2 = PageRank.pagerankMicro(tinyGraph, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 638750L, 2L -> 575000L, 3L -> 575000L))
  }

  test("integer arithmetic is partitioning-invariant") {
    // The determinism claim, exercised: the same graph shuffled through
    // 1 vs 16 partitions must produce identical micro-unit ranks (a
    // floating-point formulation would differ in the last ulps).
    val base = PageRank.pagerankMicro(tinyGraph.repartition(1), iterations = 3)
      .as[(Long, Long)].collect().toMap
    val wide = PageRank.pagerankMicro(tinyGraph.repartition(16), iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(base == wide)
  }

  test("a symmetric 2-cycle is a fixed point at full rank") {
    // a <-> b, outdeg 1 each: contrib = (1M*85)//100 = 850_000,
    // rank = 150_000 + 850_000 = 1M forever.
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = PageRank.pagerankMicro(cyc, iterations = 4)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("guards: iterations and damping are validated") {
    intercept[IllegalArgumentException](PageRank.pagerankMicro(tinyGraph, 0))
    intercept[IllegalArgumentException](
      PageRank.pagerankMicro(tinyGraph, 1, dampNum = 100, dampDen = 100))
  }
}
