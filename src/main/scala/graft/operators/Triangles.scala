package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.roundFp

/** Exact triangle counting + global clustering coefficient over an
  * undirected edge list — the third graph operator next to connected
  * components (dd08) and PageRank (pg01/pg02): cohesion analytics for
  * interaction graphs (co-purchase, co-authorship, shared-supplier).
  *
  * The classic degree-ordered orientation bounds the work: every
  * undirected edge is directed from its lower-(degree, id) endpoint to
  * the higher one, so each triangle is generated EXACTLY ONCE (at its
  * lowest corner) and the wedge stage pairs only OUT-neighbors —
  * Σ C(outdeg, 2) candidate wedges, O(m^1.5) total whatever the skew
  * (a hub of degree d receives its edges instead of fanning them out).
  * The triangle check is a semi join of wedges against oriented edges.
  * All stages are plain equi-joins + hash aggregates; nothing
  * collects.
  *
  * Input edges are normalized defensively (canonical a<b form,
  * self-loops dropped, duplicates and reverse orientations merged by
  * the distinct) — the distinct doubles as the dedup the algorithm
  * needs anyway.
  *
  * @param edges (a, b) rows, any orientation, multi-edges tolerated
  * @return ONE row: (n_nodes, n_edges, n_wedges, n_triangles, gcc)
  *         where n_wedges = Σ C(deg, 2) over the undirected graph and
  *         gcc = 3·triangles / wedges (null when wedge-free), rounded
  *         to 6 — the standard global clustering coefficient
  */
object Triangles {

  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    TextDedup.withWorkingSet(und) { e =>
      // The degree table feeds BOTH orientation joins and the node/wedge
      // stats — its own working set evaluates the union+aggregate once
      // instead of once per consumer (r21; was 3-4 passes over e).
      TextDedup.withWorkingSet(
        e.select(col("a").as("n"))
          .unionAll(e.select(col("b").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))) { deg =>
        // orient lower-(deg, id) → higher; carry the head's (deg, id) so
        // the wedge stage can order out-neighbors without another join
        val da = deg.select(col("n").as("a"), col("deg").as("da"))
        val db = deg.select(col("n").as("b"), col("deg").as("db"))
        val aFirst = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val oriented = e.join(da, "a").join(db, "b")
          .select(
            when(aFirst, col("a")).otherwise(col("b")).as("u"),
            when(aFirst, col("b")).otherwise(col("a")).as("v"),
            when(aFirst, col("db")).otherwise(col("da")).as("dv"))
        TextDedup.withWorkingSet(oriented) { o =>
          // Wedge generation stays a self-join: the in-row array form
          // (the Baskets r21 move) was MEASURED 3-4x SLOWER here —
          // slice-per-position over O(√m)-wide hub neighbor arrays
          // copies O(outdeg²) elements per tail, where basket arrays
          // are a few items wide. Kept shape, documented measurement.
          val wedges = o.select(col("u"), col("v"), col("dv"))
            .join(o.select(col("u"), col("v").as("w"), col("dv").as("dw")), "u")
            .filter(col("dv") < col("dw") ||
              (col("dv") === col("dw") && col("v") < col("w")))
            .select(col("v"), col("w"))
          val triangles = wedges.join(
            o.select(col("u").as("v"), col("v").as("w")),
            Seq("v", "w"), "left_semi")
          // 1-row stats frames, combined by broadcast cross joins; the
          // node and wedge counts ride ONE aggregate over deg.
          val nodeWedge = deg.agg(count(lit(1)).as("n_nodes"),
            coalesce(sum(expr("(deg * (deg - 1)) DIV 2")), lit(0L)).as("n_wedges"))
          val nEdges = e.agg(count(lit(1)).as("n_edges"))
          val nTris = triangles.agg(count(lit(1)).as("n_triangles"))
          nodeWedge.crossJoin(broadcast(nEdges))
            .crossJoin(broadcast(nTris))
            .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
              col("n_triangles"),
              roundFp(when(col("n_wedges") > 0,
                (col("n_triangles") * 3).cast("double") / col("n_wedges").cast("double")),
                6).as("gcc"))
        }
      }
    }
  }

  /** Per-node triangle counts + local clustering coefficient — the
    * node-resolved companion to [[triangleStats]]: lcc(n) =
    * 2·tri(n) / (deg(n)·(deg(n)−1)), the fraction of a node's
    * neighbor pairs that are themselves adjacent (community-membership
    * and spam/bot signals in interaction graphs).
    *
    * Same degree-ordered orientation as [[triangleStats]] — each
    * triangle materializes EXACTLY ONCE as a (u,v,w) row, so
    * attributing it to its three corners is one explode + one
    * node-keyed count, still O(m^1.5) wedge work whatever the skew.
    * The lcc ratio is one IEEE division over exact integer counts,
    * fixed at 6 dp (the gcc discipline).
    *
    * @return (node, deg, n_tri, lcc) for nodes with deg >= 2 (deg-1
    *         nodes have no neighbor pairs — lcc undefined) */
  def localClustering(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    TextDedup.withWorkingSet(und) { e =>
      // Nested deg working set, as in [[triangleStats]] (deg feeds the
      // orientation joins AND the final deg>=2 projection). Wedges keep
      // the o ⋈ o self-join: the in-row sorted-neighbor-array form was
      // MEASURED 3-4x slower on hub-wide arrays (r21) — do not re-try.
      TextDedup.withWorkingSet(
        e.select(col("a").as("n"))
          .unionAll(e.select(col("b").as("n")))
          .groupBy("n").agg(count(lit(1)).as("deg"))) { deg =>
        val da = deg.select(col("n").as("a"), col("deg").as("da"))
        val db = deg.select(col("n").as("b"), col("deg").as("db"))
        val aFirst = col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b"))
        val oriented = e.join(da, "a").join(db, "b")
          .select(
            when(aFirst, col("a")).otherwise(col("b")).as("u"),
            when(aFirst, col("b")).otherwise(col("a")).as("v"),
            when(aFirst, col("db")).otherwise(col("da")).as("dv"))
        TextDedup.withWorkingSet(oriented) { o =>
          // Self-join wedges, as in [[triangleStats]] (the in-row array
          // form measured 3-4x slower on hub-width neighbor arrays).
          val wedges = o.select(col("u"), col("v"), col("dv"))
            .join(o.select(col("u"), col("v").as("w"), col("dv").as("dw")), "u")
            .filter(col("dv") < col("dw") ||
              (col("dv") === col("dw") && col("v") < col("w")))
            .select(col("u"), col("v"), col("w"))
          // oriented edges are already distinct (und is distinct, the
          // orientation is a bijection) — a plain inner join attributes
          // each wedge-closure exactly once
          val triangles = wedges.join(
            o.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
          val perNode = triangles
            .select(explode(array(col("u"), col("v"), col("w"))).as("n"))
            .groupBy("n").agg(count(lit(1)).as("n_tri"))
          deg.filter(col("deg") >= 2)
            .join(perNode, Seq("n"), "left")
            .select(col("n").as("node"), col("deg"),
              coalesce(col("n_tri"), lit(0L)).as("n_tri"))
            .withColumn("lcc", roundFp(
              (col("n_tri") * 2).cast("double") /
                (col("deg") * (col("deg") - 1)).cast("double"), 6))
        }
      }
    }
  }
}
