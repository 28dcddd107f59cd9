package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{cosine_similarity, round4}

/** Persistable IVF (inverted-file) ANN index: the codebook build —
  * KMeans fit + corpus assignment, the expensive part — happens ONCE
  * ([[IvfIndex.build]]) and is written as two tables
  * ([[IvfIndex#save]]); probe-time search ([[IvfIndex#search]]) loads
  * nothing but the centroid table (nLists rows) plus the `nProbe`
  * nearest inverted lists. The corpus table is written PARTITIONED BY
  * list_id, so "search touches only nProbe lists" is enforced by
  * parquet partition pruning at the storage layer, not just by a
  * filter: a probe against a 100 TB index reads nProbe/nLists of the
  * bytes.
  *
  * [[Similarity.ivfTopK]] remains the one-shot convenience that fits
  * per call; this class is what production uses so the KMeans fit isn't
  * re-paid per query.
  */
final class IvfIndex private (val centroids: Array[(Int, Array[Double])],
                              val corpus: DataFrame) {

  /** Writes `path/centroids` (nLists tiny rows) and `path/corpus`
    * partitioned by list_id. */
  def save(path: String): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    centroids.toSeq.toDF("list_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    corpus.write.mode("overwrite").partitionBy("list_id").parquet(s"$path/corpus")
  }

  /** `nProbe` nearest lists to `probe` by centroid distance — a
    * driver-side ranking of nLists rows, the only non-distributed step. */
  private def nearestLists(probe: Array[Double], nProbe: Int): Seq[Int] =
    centroids.map { case (id, c) =>
      var d = 0.0
      var i = 0
      while (i < c.length) { val t = c(i) - probe(i); d += t * t; i += 1 }
      (id, d)
    }.sortBy(_._2).take(nProbe).map(_._1).toSeq

  /** Top-k by cosine among the `nProbe` nearest lists. Output:
    * (vec_id, score[round4]) descending, vec_id tie-break. */
  def search(probe: Array[Double], k: Int, nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val lists = nearestLists(probe, nProbe)
    val pe = typedLit(probe)
    corpus
      .filter(col("list_id").isin(lists: _*)) // -> parquet PartitionFilters
      .select(col("vec_id"),
        cosine_similarity(col("embedding").cast("array<double>"), pe).as("score0"))
      .orderBy(col("score0").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round4(col("score0")).as("score"))
  }

  /** Search with an indexed vector as the probe (excluded from results). */
  def searchById(probeId: Long, k: Int, nProbe: Int): DataFrame = {
    val probe = corpus.filter(col("vec_id") === probeId)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    search(probe, k + 1, nProbe).filter(col("vec_id") =!= probeId).limit(k)
  }
}

object IvfIndex {

  /** One KMeans fit (seeded, deterministic) + one assignment pass over
    * the corpus. `emb` needs (vec_id, embedding array<float|double>). */
  def build(emb: DataFrame, nLists: Int = 16, seed: Long = 42L): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val withVec = emb.select(col("vec_id"), col("embedding"))
      .withColumn("features", array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nLists).setSeed(seed).setFeaturesCol("features").fit(withVec)
    val corpus = model.transform(withVec)
      .select(col("vec_id"), col("embedding"), col("prediction").as("list_id"))
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) }
    new IvfIndex(centroids, corpus)
  }

  /** Loads an index written by [[IvfIndex#save]]; the corpus DataFrame
    * is the partitioned table, lazily read — only probed lists are
    * scanned. */
  def load(spark: SparkSession, path: String): IvfIndex = {
    val centroids = spark.read.parquet(s"$path/centroids")
      .select("list_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    new IvfIndex(centroids, spark.read.parquet(s"$path/corpus"))
  }
}
