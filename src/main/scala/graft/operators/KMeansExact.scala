package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration Lloyd k-means over embedding columns with EXACT
  * integer arithmetic — the clustering operator underneath IVF-style
  * partitioned ANN ([[IvfIndex]] uses MLlib's float k-means, whose
  * result depends on aggregation order; THIS variant is the
  * bitwise-deterministic, oracle-reproducible form for pipelines that
  * need stable cluster assignments across reruns/engines, e.g.
  * embedding-space corpus bucketing whose downstream sampling must be
  * replayable).
  *
  * The [[PageRank]] integer discipline applied to clustering:
  * components quantize to micro-units (caller sees `unitScale`),
  * distances are exact integer Σ(x−c)², centroid updates are exact
  * integer mean (sum DIV count — truncation toward zero in BOTH Spark
  * `DIV` and DuckDB `//`, probed), argmin ties break on the lower
  * cluster id. Every step is order-free, so the result is identical
  * under any partitioning.
  *
  * Initialization: the vectors of the k SMALLEST ids (deterministic
  * and oracle-trivial; callers wanting k-means++ should seed ids
  * upstream). A cluster that loses all members keeps its previous
  * centroid (documented Lloyd convention).
  *
  * Scale shape, per iteration: the quantized ARRAY frame (id, xs[d])
  * — built in-row, materialized ONCE for all iterations — crosses the
  * 1-row broadcast of all k centroid arrays; the assignment is a pure
  * projection (argmin in-row over the k arrays), and the only
  * exchange is the (cluster, dim) centroid-update aggregate, which is
  * partial-aggregated map-side to ≤ k·d rows per task. Cost is the
  * unavoidable N·d·k products of brute-force Lloyd; no driver
  * participation, no collect. Overflow bounds: |x| ≤ unitScale, so per-dim squares stay
  * under 4·unitScale² and row sums under d·4·unitScale² (d=64 at
  * unitScale=10^6 → 2.6·10^14, safe); centroid sums need
  * unitScale·N_cluster < 2^63.
  *
  * @param vectors (id, vec) rows — id numeric, vec Array[Float/Double]
  * @param d       vector dimensionality (uniform, caller-asserted)
  * @return (id, cluster, dist_u) — cluster in [0, k), dist_u the exact
  *         integer squared distance to the assigned centroid
  */
object KMeansExact {

  def assignMicro(vectors: DataFrame, d: Int, k: Int, iterations: Int,
                  unitScale: Long = 1000000L): DataFrame =
    fitMicro(vectors, d, k, iterations, unitScale)._1

  /** [[assignMicro]] plus the (cluster, dim, c) centroid table the
    * FINAL assignment was computed against (i.e. after iterations−1
    * updates — NOT the post-loop update, which no returned assignment
    * reflects). This is the model artifact an incremental consumer
    * must persist so that later batches assign under exactly the same
    * geometry as the corpus ([[Similarity.saveSemanticIndex]]). */
  def fitMicro(vectors: DataFrame, d: Int, k: Int, iterations: Int,
               unitScale: Long = 1000000L): (DataFrame, DataFrame) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(d >= 1, s"d must be >= 1, got $d")
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(unitScale >= 1, s"unitScale must be >= 1, got $unitScale")
    var usedCentroids: DataFrame = null
    // Quantized ARRAY form (id, xs[d]), built IN-ROW from the vector
    // column — no posexplode, no shuffle (r22; the long form shuffled
    // N·d rows through a ×k broadcast-join blowup and TWO hash
    // aggregates per iteration). Feeds every iteration's assignment
    // AND the update explode — materialize once.
    val assigned = TextDedup.withWorkingSet(
      vectors.select(col("id"), expr(
        s"transform(vec, __v -> CAST(FLOOR(CAST(__v AS DOUBLE) * $unitScale + 0.5) AS BIGINT))")
        .as("xs"))
    ) { v =>
      // init: the k smallest ids, re-labeled 0..k-1 in id order. The
      // single-partition window runs on the k-row LIMIT result only —
      // the IvfIndex centroid budget, not a corpus sort.
      val smallK = vectors.select(col("id")).orderBy("id").limit(k)
        .withColumn("cluster",
          (row_number().over(org.apache.spark.sql.expressions.Window.orderBy("id")) - 1)
            .cast("int"))
      require(smallK.count() == k,
        s"k-means needs at least k=$k vectors")
      // centroids stay LONG-FORM (cluster, dim, c) between rounds — the
      // returned model artifact; the loop derives the k-row broadcast
      // array form from it per round (two aggregates over k·d rows).
      var centroids = v
        .join(broadcast(smallK), "id")
        .select(col("cluster"), posexplode(col("xs")).as(Seq("dim", "c")))
        .localCheckpoint(true)
      var assign: DataFrame = null
      for (i <- 1 to iterations) {
        usedCentroids = centroids
        // 1-row (cents: array<struct<cluster, cs[d]>>) broadcast; the
        // assignment is then a pure projection over the persisted
        // array frame: per row, Σ(x−c)² per centroid via zip_with +
        // aggregate, argmin via array_min over (dist, cluster) structs
        // — EXACTLY min(struct(dist_u, cluster))'s lexicographic
        // tie-break (lowest dist, then lowest cluster id). No row
        // blowup, no per-iteration exchange (guide §2.4).
        val cents0 = centroids.groupBy("cluster")
          .agg(array_sort(collect_list(struct(col("dim"), col("c")))).as("__dc"))
          .select(struct(col("cluster"),
            expr("transform(__dc, p -> p.c)").as("cs")).as("cen"))
          .agg(collect_list(col("cen")).as("cents"))
        // The global collect_list is a k-row model reduce with an
        // Exchange SinglePartition. In eager mode it executes inside
        // this round's materialization and never leaks (no extra job).
        // In LAZY mode the returned lineage would carry it into every
        // downstream plan — and the sd01/sd02 plan gate rightly forbids
        // single-partition stages there (corpus-sized ones are
        // stuck-reducer bugs; this one is k rows) — so it is pinned
        // eagerly HERE, the same conf-independent discipline as the
        // per-round centroid checkpoints above.
        val cents = if (TextDedup.eagerMode(centroids.sparkSession)) cents0
                    else cents0.localCheckpoint(true)
        assign = v.crossJoin(broadcast(cents))
          .select(col("id"), col("xs"), expr(
            """array_min(transform(cents, cen -> named_struct(
              |  'dist_u', aggregate(zip_with(xs, cen.cs, (x, c) -> (x - c) * (x - c)),
              |                      0L, (a, b) -> a + b),
              |  'cluster', cen.cluster)))""".stripMargin).as("m"))
          .select(col("id"), col("xs"), col("m.cluster").as("cluster"),
            col("m.dist_u").as("dist_u"))
        // The fit returns (last assignment, centroids USED for it): the
        // final round's centroid update was computed — and eagerly
        // checkpointed — only to be discarded. Skip it (r21; one full
        // join + aggregate + checkpoint saved per fit). The assignment
        // itself stays LAZY: it is a map-only projection consumed once
        // (by the update below, or by the working set's final
        // materialization), so the per-round localCheckpoint of the r21
        // shape bought nothing.
        if (i < iterations) {
          // exact integer mean per surviving cluster; empty clusters
          // keep their previous centroid (left join + coalesce). The
          // assignment carries xs, so the update needs NO join back to
          // the vector frame (the r21 shape paid an (id)-keyed join of
          // two corpus-sized frames per round).
          val updated = assign
            .select(col("cluster"), posexplode(col("xs")).as(Seq("dim", "x")))
            .groupBy("cluster", "dim")
            .agg(expr("sum(x) DIV count(1)").as("c_new"))
          centroids = centroids
            .join(updated, Seq("cluster", "dim"), "left")
            .select(col("cluster"), col("dim"),
              coalesce(col("c_new"), col("c")).as("c"))
            .localCheckpoint(true)
        }
      }
      assign.select(col("id"), col("cluster").cast("int").as("cluster"),
        col("dist_u"))
    }
    (assigned, usedCentroids)
  }
}
