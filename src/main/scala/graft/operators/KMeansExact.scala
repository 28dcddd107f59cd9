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
  * Scale shape, per iteration: the quantized long-form (id, dim, x)
  * frame — materialized ONCE for all iterations — joins the k·d
  * centroid rows (broadcast: tiny) and reduces through one
  * (id, cluster) hash aggregate + one id-keyed argmin + one
  * (cluster, dim) centroid aggregate. Cost is the unavoidable N·d·k
  * products of brute-force Lloyd; no driver participation, no
  * collect. Overflow bounds: |x| ≤ unitScale, so per-dim squares stay
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
    // Quantized long form (id, dim, x): feeds every iteration's
    // assignment AND the final distance projection — materialize once.
    val assigned = TextDedup.withWorkingSet(
      vectors.select(col("id"), posexplode(col("vec")).as(Seq("dim", "__v")))
        .select(col("id"), col("dim"),
          floor(col("__v").cast("double") * unitScale + 0.5).cast("long").as("x"))
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
      var centroids = v
        .join(broadcast(smallK), "id")
        .select(col("cluster"), col("dim"), col("x").as("c"))
        .localCheckpoint(true)
      var assign: DataFrame = null
      for (i <- 1 to iterations) {
        usedCentroids = centroids
        val dists = v.join(broadcast(centroids), "dim")
          .groupBy(col("id"), col("cluster"))
          .agg(sum((col("x") - col("c")) * (col("x") - col("c"))).as("dist_u"))
        assign = dists
          .groupBy("id")
          .agg(min(struct(col("dist_u"), col("cluster"))).as("m"))
          .select(col("id"), col("m.cluster").as("cluster"),
            col("m.dist_u").as("dist_u"))
          .localCheckpoint(true)
        // The fit returns (last assignment, centroids USED for it): the
        // final round's centroid update was computed — and eagerly
        // checkpointed — only to be discarded. Skip it (r21; one full
        // join + aggregate + checkpoint saved per fit).
        if (i < iterations) {
          // exact integer mean per surviving cluster; empty clusters
          // keep their previous centroid (left join + coalesce)
          val updated = v.join(assign.select("id", "cluster"), "id")
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
