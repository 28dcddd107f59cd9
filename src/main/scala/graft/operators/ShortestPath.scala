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
  * (localCheckpoint) so the plan does not grow with the hop count —
  * the dd08/PageRank round discipline (set a checkpoint dir for
  * reliable checkpoints at cluster scale).
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
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    var visited = sources.select(col("node")).distinct()
      .withColumn("hop", lit(0L)).localCheckpoint(true)
    var frontier = visited
    for (h <- 1 to maxHops) {
      frontier = e
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hop", lit(h.toLong))
        .localCheckpoint(true)
      visited = visited.unionAll(frontier).localCheckpoint(true)
    }
    visited
  }
}
