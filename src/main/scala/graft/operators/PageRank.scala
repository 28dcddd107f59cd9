package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the second graph
  * operator next to [[TextDedup]]'s connected components (dd08):
  * influence/centrality scoring for entity graphs (link graphs, user
  * interaction graphs, citation webs).
  *
  * All arithmetic is INTEGER (ranks in micro-units, contributions via
  * integer division), so the result is bitwise deterministic under any
  * partitioning and aggregation order — the same discipline as ta07's
  * micro-nat log scores — and exactly reproducible by the DuckDB
  * oracle. Semantics per iteration (the standard no-redistribution
  * variant — mass reaching a dangling node leaks; document or add a
  * sink self-loop upstream if conservation matters):
  *
  *   contrib(u→v) = (r_k(u) * dampNum) div (dampDen * outdeg(u))
  *   r_{k+1}(v)   = base + Σ_{u→v} contrib(u→v)
  *   base         = (unit * (dampDen - dampNum)) div dampDen
  *
  * Each iteration is one equi-join (edges ⋈ ranks on src — shuffle on
  * the src key; the degree table rides the same key) + one dst-keyed
  * aggregation: shuffle-parallel, no driver participation. Iteration
  * results are materialized per round (localCheckpoint) so the plan
  * does not grow with the iteration count — the dd08 round discipline;
  * at cluster scale set a checkpoint dir for reliable checkpoints.
  */
object PageRank {

  private val Unit6: Long = 1000000L // 1.0 in micro-units

  /** @param edges (src, dst) rows, assumed DISTINCT (dedup upstream if
    *              multi-edges should not double-weight)
    * @return (node, rank_u) — rank in micro-units, one row per node
    *         appearing as a source or destination */
  def pagerankMicro(edges: DataFrame, iterations: Int,
                    dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum > 0 && dampDen > dampNum,
      s"damping must satisfy 0 < dampNum < dampDen, got $dampNum/$dampDen")
    // The edge list feeds every iteration's join (plus the node and
    // degree builds): materialize it ONCE — an edge derivation that is
    // itself a join (e.g. the pg01 entry's lineitem x orders distinct)
    // must not be re-evaluated per round.
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val base = Unit6 * (dampDen - dampNum) / dampDen
    var ranks = nodes.withColumn("rank_u", lit(Unit6))
    for (_ <- 1 to iterations) {
      val inflow = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          expr(s"(rank_u * $dampNum) DIV ($dampDen * outdeg)").as("c"))
        .groupBy("node")
        .agg(sum("c").as("inflow"))
      // Per-round materialization truncates the lineage (the dd08
      // discipline): without it the plan doubles per iteration and the
      // optimizer re-plans the whole history each round.
      ranks = nodes
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank_u"))
        .localCheckpoint(true)
    }
    ranks
  }
}
