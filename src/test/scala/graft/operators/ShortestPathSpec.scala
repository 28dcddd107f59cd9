package graft.operators

import graft.SparkSpec

/** ShortestPath.bfsHops (pg03) — frontier BFS vs brute-force
  * shortest-path distances on random directed graphs. */
class ShortestPathSpec extends SparkSpec {
  import spark.implicits._

  /** Brute force: hop-bounded BFS by set expansion. */
  private def brute(edges: Seq[(Long, Long)], sources: Set[Long],
                    maxHops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    var dist = sources.map(_ -> 0L).toMap
    var frontier = sources
    for (h <- 1 to maxHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty)) -- dist.keySet
      dist = dist ++ frontier.map(_ -> h.toLong)
    }
    dist
  }

  private def run(edges: Seq[(Long, Long)], sources: Set[Long],
                  maxHops: Int): Map[Long, Long] =
    ShortestPath.bfsHops(
      edges.toDF("src", "dst").repartition(4),
      sources.toSeq.toDF("node"), maxHops)
      .as[(Long, Long)].collect().toMap

  test("plan gate: rounds are frontier equi-joins, never Cartesian or single-partition") {
    // r15 verdict #6 (pg03/wd01): the round loop's scale claims as plan
    // assertions, inspectable because roundCheckpoint goes lazy under
    // materialize=none — every hop must plan as an equi-join on the
    // node key (+ the anti join for BFS's visited subtraction), with no
    // Cartesian blowup and no single-partition stage anywhere.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val wedges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L))
      .toDF("src", "dst", "w")
    val srcs = Seq(1L).toDF("node")
    spark.conf.set(TextDedup.MaterializeConf, "none")
    try {
      val bfs = ShortestPath.bfsHops(edges, srcs, maxHops = 2)
      bfs.collect()
      val p1 = graft.PlanSig.finalPlanText(bfs)
      assert(p1.contains("LeftAnti"), s"visited subtraction:\n${p1.take(1500)}")
      assert(!p1.contains("CartesianProduct") && !p1.contains("BroadcastNestedLoopJoin"),
        s"hops must be equi-joins:\n${p1.take(1500)}")
      assert(!p1.contains("Exchange SinglePartition"), p1.take(1500))
      val wh = ShortestPath.weightedHops(wedges, srcs, maxEdges = 2)
      wh.collect()
      val p2 = graft.PlanSig.finalPlanText(wh)
      assert(!p2.contains("CartesianProduct") && !p2.contains("BroadcastNestedLoopJoin"),
        s"relaxations must be equi-joins:\n${p2.take(1500)}")
      assert(!p2.contains("Exchange SinglePartition"), p2.take(1500))
    } finally spark.conf.set(TextDedup.MaterializeConf, "local")
  }

  test("matches brute-force BFS on seeded random directed graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 15) {
      val n = 2 + rnd.nextInt(20)
      val edges = (1 to n * 2).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val sources = Set(rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      val k = rnd.nextInt(4)
      assert(run(edges, sources, k) == brute(edges, sources, k),
        s"trial $trial: edges=$edges sources=$sources k=$k")
    }
  }

  test("multi-source takes the minimum hop; unreached nodes are absent") {
    // 1→2→3→4 and source 3: node 3 is hop 0 (not 2 via the chain).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (9L, 9L))
    assert(run(edges, Set(1L, 3L), 2) ==
      Map(1L -> 0L, 3L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("maxHops 0 returns exactly the deduplicated sources") {
    assert(run(Seq((1L, 2L)), Set(1L), 0) == Map(1L -> 0L))
  }

  test("rounds past exhaustion are no-ops") {
    assert(run(Seq((1L, 2L)), Set(1L), 5) == Map(1L -> 0L, 2L -> 1L))
  }

  // ---- weightedHops (wd01) ----

  /** Brute force: bounded Bellman–Ford over the label table. */
  private def bruteW(edges: Seq[(Long, Long, Long)], sources: Set[Long],
                     maxEdges: Int): Map[Long, Long] = {
    var dist = sources.map(_ -> 0L).toMap
    for (_ <- 1 to maxEdges) {
      val relaxed = edges.flatMap { case (s, d, w) =>
        dist.get(s).map(ds => d -> (ds + w))
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    dist
  }

  private def runW(edges: Seq[(Long, Long, Long)], sources: Set[Long],
                   maxEdges: Int): Map[Long, Long] =
    ShortestPath.weightedHops(
      edges.toDF("src", "dst", "w").repartition(4),
      sources.toSeq.toDF("node"), maxEdges)
      .as[(Long, Long)].collect().toMap

  test("weightedHops matches brute Bellman–Ford on seeded random graphs") {
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 15) {
      val n = 2 + rnd.nextInt(15)
      val edges = (1 to n * 3).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, rnd.nextInt(100).toLong))
      val sources = Set(rnd.nextInt(n).toLong)
      val k = rnd.nextInt(4)
      assert(runW(edges, sources, k) == bruteW(edges, sources, k),
        s"trial $trial: edges=$edges sources=$sources k=$k")
    }
  }

  test("weightedHops prefers a longer-but-cheaper path within the edge bound") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5 but needs 2 edges.
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(runW(edges, Set(1L), 1) == Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
    assert(runW(edges, Set(1L), 2) == Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("weightedHops multi-source takes the overall minimum") {
    val edges = Seq((1L, 2L, 5L), (3L, 2L, 1L))
    assert(runW(edges, Set(1L, 3L), 2) == Map(1L -> 0L, 3L -> 0L, 2L -> 1L))
  }

  test("weightedHops with maxEdges 0 returns the deduplicated sources") {
    assert(runW(Seq((1L, 2L, 1L)), Set(1L), 0) == Map(1L -> 0L))
  }
}
