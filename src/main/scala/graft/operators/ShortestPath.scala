package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop BFS over an edge list: unweighted shortest-path
  * distance (in hops) from a SET of source nodes — multi-source BFS,
  * the reachability primitive behind "within k degrees" audience
  * queries, contamination blast-radius checks, and graph feature
  * engineering. Completes the graph family next to PageRank (pg01/02),
  * connected components (dd08) and triangles (tc01).
  *
  * Frontier algorithm, all relational: the hop-h frontier is the
  * neighbors of the hop-(h−1) frontier minus every node already
  * visited (left anti join). Each round is one src-keyed equi-join +
  * distinct + anti join — shuffle-parallel on the node key, no driver
  * participation, and the join input is the FRONTIER (shrinking), not
  * the full visited set. Distances are exact integers, so results are
  * deterministic under any partitioning; rounds are materialized
  * ([[TextDedup.roundCheckpoint]]: reliable checkpoint when a
  * checkpoint dir is set, localCheckpoint otherwise, lazy under
  * materialize=none for plan gates) so the plan does not grow with
  * the hop count — the dd08/PageRank round discipline.
  *
  * The hop bound is part of the CONTRACT (k is a query parameter, not
  * a convergence heuristic): unreached nodes are simply absent. Runs
  * all `maxHops` rounds without an emptiness probe — each probe would
  * be an extra job, and post-exhaustion rounds join an empty frontier
  * (near-free). Callers on diameter-unknown graphs who expect
  * exhaustion much earlier than `maxHops` can check emptiness
  * themselves between calls.
  */
object ShortestPath {

  /** @param edges   directed (src, dst) rows; pass both directions for
    *                an undirected graph
    * @param sources (node) rows, hop-0 seeds (deduplicated here)
    * @return (node, hop) — min hops from any source, nodes within
    *         `maxHops` only */
  def bfsHops(edges: DataFrame, sources: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val e = edges.select(col("src"), col("dst")).transform(TextDedup.roundCheckpoint)
    var visited = sources.select(col("node")).distinct()
      .withColumn("hop", lit(0L)).transform(TextDedup.roundCheckpoint)
    var frontier = visited
    for (h <- 1 to maxHops) {
      frontier = e
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(h.toLong))
        .transform(TextDedup.roundCheckpoint)
      // visited stays a LAZY union of the per-round checkpointed
      // frontiers: every leaf is already materialized and the union
      // plan is flat (maxHops leaves), so re-checkpointing the union
      // — an O(|visited|) rewrite EVERY round, r20's shape — bought
      // nothing (guide §1.2: don't compute things you throw away).
      visited = visited.unionAll(frontier)
    }
    visited
  }

  /** WEIGHTED single/multi-source shortest paths with a bounded edge
    * count — Bellman–Ford, the weighted sibling of [[bfsHops]]
    * ("cheapest route within k links": logistics cost, min-latency
    * routing, cheapest supply chains).
    *
    * Delta relaxation, all relational: round h joins only the FRONTIER
    * (nodes whose tentative distance improved in round h−1) against
    * the edges, unions the candidates into the label set, and takes the
    * per-node min — so candidate volume per round is bounded by |edges|
    * (each edge relaxes at most once per round), never by path count.
    * That bound is the whole point at scale: the equivalent path
    * ENUMERATION (what a recursive CTE does) grows multiplicatively
    * with degree^hops, while relaxation stays linear in edges. Exact
    * int64 weight sums ⇒ deterministic under any partitioning; rounds
    * materialize via localCheckpoint (dd08/PageRank discipline) so the
    * plan stays flat across iterations.
    *
    * `maxEdges` is part of the contract (paths of at most that many
    * edges are considered), matching the oracle's bounded recursion —
    * with maxEdges >= |V|−1 and non-negative weights this IS the full
    * shortest-path fixpoint.
    *
    * @param edges   directed (src, dst, w) rows, int64 non-negative
    *                weights; pass both directions for undirected graphs
    * @param sources (node) rows, distance-0 seeds (deduplicated here)
    * @return (node, dist) — min total weight over paths from any
    *         source using <= maxEdges edges; unreachable nodes absent */
  def weightedHops(edges: DataFrame, sources: DataFrame, maxEdges: Int): DataFrame = {
    require(maxEdges >= 0, s"maxEdges must be >= 0, got $maxEdges")
    val e = edges.select(col("src"), col("dst"), col("w")).transform(TextDedup.roundCheckpoint)
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).transform(TextDedup.roundCheckpoint)
    var frontier = dist
    for (_ <- 1 to maxEdges) {
      val candidates = e
        .join(frontier.select(col("node").as("src"), col("dist")), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val merged = dist.unionAll(candidates)
        .groupBy("node").agg(min("dist").as("dist"))
        .transform(TextDedup.roundCheckpoint)
      // Next frontier = nodes whose label improved this round (new
      // nodes, or a strictly smaller distance) — only they can improve
      // a neighbor next round. NOT checkpointed (r21): it is consumed
      // exactly once (next round's relaxation join) and both of its
      // inputs are already-materialized round leaves, so the old
      // per-round materialization rewrote O(|V|) rows to save a single
      // lazy join evaluation.
      frontier = merged.join(
          dist.select(col("node"), col("dist").as("__old")), Seq("node"), "left")
        .filter(col("__old").isNull || col("dist") < col("__old"))
        .select("node", "dist")
      dist = merged
    }
    dist
  }
}
