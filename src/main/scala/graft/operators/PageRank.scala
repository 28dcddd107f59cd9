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
  * results are materialized per round ([[TextDedup.roundCheckpoint]]:
  * reliable checkpoint when the session has a checkpoint dir,
  * localCheckpoint otherwise, lazy under materialize=none for plan
  * gates) so the plan does not grow with the iteration count — the
  * dd08 round discipline.
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
    val e = edges.select(col("src"), col("dst")).transform(TextDedup.roundCheckpoint)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .transform(TextDedup.roundCheckpoint)
    // Fold the (static) out-degree into the edge table ONCE, as the
    // ready-made contribution denominator: the r20 loop re-joined
    // `outdeg` to the edges every round — a per-iteration join (and its
    // exchanges) for a value that never changes (guide §2.4: remove
    // shuffles outright). One extra long per edge row buys
    // one-join-per-round iterations.
    val e2 = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .select(col("src"), col("dst"),
        (lit(dampDen) * col("outdeg")).as("den"))
      .transform(TextDedup.roundCheckpoint)
    val base = Unit6 * (dampDen - dampNum) / dampDen
    // Iterate on the SPARSE inflow table instead of the full rank
    // vector: rank_k(v) = base + inflow_k(v) with inflow absent ≡ 0
    // (exact integer identity), so the per-round `nodes LEFT JOIN
    // inflow` materialization of r20 is deferred to the single final
    // projection. Per round: ONE src-keyed left join + one dst-keyed
    // aggregation — half the r20 round's joins.
    var inflow: Option[DataFrame] = None
    for (_ <- 1 to iterations) {
      val contribs = inflow match {
        case None => // round 1: every rank is exactly Unit6
          // The product is computed in Scala as a Long BEFORE the SQL is
          // built: interpolating both factors as int literals would
          // overflow 32-bit for dampNum > 2147 (r21 advisory).
          e2.select(col("dst").as("node"),
            expr(s"${Unit6 * dampNum}L DIV den").as("c"))
        case Some(inf) =>
          e2.join(inf.withColumnRenamed("node", "src"), Seq("src"), "left")
            .withColumn("rank_u", lit(base) + coalesce(col("inflow"), lit(0L)))
            .select(col("dst").as("node"),
              expr(s"(rank_u * $dampNum) DIV den").as("c"))
      }
      inflow = Some(contribs.groupBy("node").agg(sum("c").as("inflow"))
        .transform(TextDedup.roundCheckpoint))
    }
    nodes
      .join(inflow.get, Seq("node"), "left")
      .select(col("node"),
        (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank_u"))
  }

  /** WEIGHTED, PERSONALIZED PageRank (random walk with restart) — the
    * recommendation/trust-propagation variant of [[pagerankMicro]]:
    * edges carry a positive integer weight (interaction count, spend
    * units), and the (1−d) restart mass returns to a RESTART SET with
    * integer personalization weights instead of spreading uniformly.
    * Same integer micro-unit discipline, so bitwise deterministic
    * under any partitioning and exactly oracle-reproducible.
    *
    * Per iteration, with W(u) = Σ_v w(u,v) and P = Σ p, S = restart set:
    *
    *   contrib(u→v) = (r_k(u) * dampNum * w(u,v)) div (dampDen * W(u))
    *   r_{k+1}(v)   = base(v) + Σ_{u→v} contrib(u→v)
    *   base(v)      = (|S| * unit * (dampDen-dampNum) * p_v) div (dampDen * P)
    *                  for v ∈ S, else 0
    *   r_0(v)       = (|S| * unit * p_v) div P for v ∈ S, else 0
    *
    * (total mass ≈ |S|·unit, so uniform p degenerates to exactly
    * [[pagerankMicro]]'s base/r0 per restart node — spec-pinned).
    * Dangling and non-restart leakage is the standard no-redistribution
    * variant, as in [[pagerankMicro]].
    *
    * Overflow bounds (documented, not checked per row):
    * r·dampNum·w < 2^63 (w ≤ 10^4 allows r up to ~10^13 micro-units)
    * and |S|·unit·dampDiff·p < 2^63 (p ≤ 10^2 allows |S| up to ~10^9);
    * re-scale weights coarser beyond that.
    *
    * Scale shape: identical to [[pagerankMicro]] — one src-keyed
    * equi-join + one dst-keyed aggregation per iteration, per-round
    * localCheckpoint, no driver participation (the restart total is a
    * 1-row broadcast, never collected).
    *
    * @param edges   (src, dst, w) rows, w > 0 (fails loudly per row)
    * @param restart (node, p) rows, p > 0 (fails loudly per row);
    *                duplicate nodes have their weights summed
    * @return (node, rank_u) over src ∪ dst ∪ restart nodes
    */
  def personalizedPagerankMicro(edges: DataFrame, restart: DataFrame,
                                iterations: Int,
                                dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum > 0 && dampDen > dampNum,
      s"damping must satisfy 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val e = edges.select(col("src"), col("dst"),
      when(col("w") <= 0 || col("w").isNull,
        raise_error(concat(lit("personalizedPagerankMicro: non-positive edge weight "),
          col("w").cast("string")))).otherwise(col("w").cast("long")).as("w"))
      .transform(TextDedup.roundCheckpoint)
    val rs = restart.select(col("node"),
      when(col("p") <= 0 || col("p").isNull,
        raise_error(concat(lit("personalizedPagerankMicro: non-positive personalization "),
          col("p").cast("string")))).otherwise(col("p").cast("long")).as("p"))
      .groupBy("node").agg(sum("p").as("p"))
      .transform(TextDedup.roundCheckpoint)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(rs.select(col("node"))).distinct()
      .transform(TextDedup.roundCheckpoint)
    // Weighted-degree folded into the edge table once, as the ready
    // denominator — the same remove-the-static-join move as
    // [[pagerankMicro]] (guide §2.4).
    val e2 = e.join(e.groupBy("src").agg(sum("w").as("wdeg")), "src")
      .select(col("src"), col("dst"), col("w"),
        (lit(dampDen) * col("wdeg")).as("den"))
      .transform(TextDedup.roundCheckpoint)
    // 1-row (|S|, ΣP) broadcast — the Quality/TimeSeries totals pattern
    val tot = rs.agg(count(lit(1)).as("ns"), sum("p").as("pp"))
    val dampDiff = dampDen - dampNum
    val baseDf = rs.crossJoin(broadcast(tot))
      .select(col("node"),
        expr(s"(ns * $Unit6 * $dampDiff * p) DIV ($dampDen * pp)").as("base_u"))
      .transform(TextDedup.roundCheckpoint)
    // The rank state stays SPARSE: a node absent from `rankS` has rank
    // exactly 0 and 0 contributes exactly 0 through the integer
    // division, so the full-node-set left joins of the r20 loop (nodes
    // ⋈ base ⋈ inflow every round) collapse to one sparse full-outer
    // join per round plus a single final projection over `nodes`.
    var rankS = rs.crossJoin(broadcast(tot))
      .select(col("node"), expr(s"(ns * $Unit6 * p) DIV pp").as("rank_u"))
      .transform(TextDedup.roundCheckpoint)
    for (_ <- 1 to iterations) {
      val inflow = e2
        .join(rankS.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"(rank_u * $dampNum * w) DIV den").as("c"))
        .groupBy("node")
        .agg(sum("c").as("inflow"))
      rankS = baseDf
        .join(inflow, Seq("node"), "full")
        .select(col("node"),
          (coalesce(col("base_u"), lit(0L)) +
            coalesce(col("inflow"), lit(0L))).as("rank_u"))
        .transform(TextDedup.roundCheckpoint)
    }
    nodes
      .join(rankS, Seq("node"), "left")
      .select(col("node"), coalesce(col("rank_u"), lit(0L)).as("rank_u"))
  }
}
