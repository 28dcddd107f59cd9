package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // a -> b, a -> c, b -> a; c is dangling (its inbound mass leaks —
  // the documented no-redistribution variant)
  private def tinyGraph = Seq((1L, 2L), (1L, 3L), (2L, 1L))
    .toDF("src", "dst")

  test("plan gate: iterations are src-keyed equi-joins + dst aggregates only") {
    // lazy roundCheckpoint (materialize=none) exposes the per-round
    // plan: no Cartesian blowup, no single-partition stage — the
    // shuffle-parallel claim of the scaladoc as an assertion.
    spark.conf.set(TextDedup.MaterializeConf, "none")
    try {
      val df = PageRank.pagerankMicro(tinyGraph, iterations = 2)
      df.collect()
      val plan = graft.PlanSig.finalPlanText(df)
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"rank flow must be equi-joins:\n${plan.take(1500)}")
      assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
    } finally spark.conf.set(TextDedup.MaterializeConf, "local")
  }

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

  test("uniform personalization over all nodes degenerates to pagerankMicro EXACTLY") {
    // The docstring's degeneracy claim: restart = every node with p=1
    // and w=1 edges must reproduce the unweighted uniform ranks
    // bit-for-bit (base and r0 reduce to the same integers).
    val weighted = tinyGraph.withColumn("w", lit(1L))
    val allNodes = tinyGraph.select(col("src").as("node"))
      .union(tinyGraph.select(col("dst").as("node"))).distinct()
      .withColumn("p", lit(1L))
    val ppr = PageRank.personalizedPagerankMicro(weighted, allNodes, iterations = 3)
      .as[(Long, Long)].collect().toMap
    val pr = PageRank.pagerankMicro(tinyGraph, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(ppr == pr)
  }

  test("personalizedPagerankMicro matches hand-computed weighted iterations") {
    // a -(3)-> b, a -(1)-> c, b -(1)-> a; restart {a}, p=1.
    // |S|=1, P=1: base(a) = (1*1M*15*1)//(100*1) = 150_000; base(b,c)=0.
    // r0: a=1M, b=0, c=0.
    // iter1: W(a)=4: a->b (1M*85*3)//(100*4) = 637_500,
    //        a->c (1M*85*1)//400 = 212_500; b,c rank 0 contribute 0.
    //   r1: a = 150_000, b = 637_500, c = 212_500
    // iter2: a contributes (150_000*85*3)//400 = 95_625 to b,
    //        (150_000*85)//400 = 31_875 to c;
    //        b -> a: (637_500*85*1)//(100*1) = 541_875; c dangling.
    //   r2: a = 150_000 + 541_875 = 691_875, b = 95_625, c = 31_875
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 1L)).toDF("src", "dst", "w")
    val rs = Seq((1L, 1L)).toDF("node", "p")
    val r1 = PageRank.personalizedPagerankMicro(e, rs, iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 150000L, 2L -> 637500L, 3L -> 212500L))
    val r2 = PageRank.personalizedPagerankMicro(e, rs, iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 691875L, 2L -> 95625L, 3L -> 31875L))
  }

  test("restart nodes outside the edge set still hold rank; duplicates sum") {
    // node 9 has no edges but is in S: it keeps exactly base+0 forever.
    // restart rows for node 1 appear twice (p = 1 + 2 = 3).
    val e = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    val rs = Seq((1L, 1L), (1L, 2L), (9L, 1L)).toDF("node", "p")
    // |S|=2, P=4: base(1) = (2*1M*15*3)//(100*4) = 225_000,
    //             base(9) = (2*1M*15*1)//400 = 75_000
    // r0: 1 -> (2*1M*3)//4 = 1_500_000; 9 -> 500_000; 2 -> 0
    // iter1: 1->2: (1_500_000*85*1)//(100*1) = 1_275_000
    //   r1: 1 = 225_000, 2 = 1_275_000, 9 = 75_000
    val r1 = PageRank.personalizedPagerankMicro(e, rs, iterations = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 225000L, 2L -> 1275000L, 9L -> 75000L))
  }

  test("non-positive weights and personalizations fail loudly per row") {
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val badW = Seq((1L, 2L, 0L)).toDF("src", "dst", "w")
    val rs = Seq((1L, 1L)).toDF("node", "p")
    val e1 = intercept[Exception](
      PageRank.personalizedPagerankMicro(badW, rs, iterations = 1))
    assert(msgs(e1).contains("non-positive edge weight"), msgs(e1))
    val e2 = intercept[Exception](PageRank.personalizedPagerankMicro(
      Seq((1L, 2L, 1L)).toDF("src", "dst", "w"),
      Seq((1L, -1L)).toDF("node", "p"), iterations = 1))
    assert(msgs(e2).contains("non-positive personalization"), msgs(e2))
  }
}
