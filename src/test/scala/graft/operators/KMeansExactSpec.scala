package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansExactSpec extends SparkSpec {
  import spark.implicits._

  private def oneD(vals: (Long, Double)*) =
    vals.map { case (id, x) => (id, Seq(x.toFloat)) }.toDF("id", "vec")

  test("matches hand-computed integer Lloyd iterations in 1-d") {
    // x (micro): 0, 10_000_000, 100_000, 9_900_000, 5_040_000
    // init: c0 = 0 (id 0), c1 = 10_000_000 (id 1)
    // iter1 assign: {0,2}->c0, {1,3,4}->c1 (id4: 5.04e6^2 > 4.96e6^2)
    //   update: c0 = 100_000 DIV 2 = 50_000; c1 = 24_940_000 DIV 3 = 8_313_333
    // iter2 assign unchanged; dist_u(id0) = 50_000^2 = 2_500_000_000
    val df = oneD(0L -> 0.0, 1L -> 10.0, 2L -> 0.1, 3L -> 9.9, 4L -> 5.04)
    val got = KMeansExact.assignMicro(df, d = 1, k = 2, iterations = 2)
      .as[(Long, Int, Long)].collect().toMap2
    assert(got.map { case (id, (c, _)) => id -> c } ==
      Map(0L -> 0, 2L -> 0, 1L -> 1, 3L -> 1, 4L -> 1))
    assert(got(0L)._2 == 2500000000L)
    assert(got(1L)._2 == (10000000L - 8313333L) * (10000000L - 8313333L))
  }

  test("integer arithmetic is partitioning-invariant on real embeddings") {
    val vecs = tables.embeddings.select(col("vec_id").as("id"),
      col("embedding").as("vec"))
    val narrow = KMeansExact.assignMicro(vecs.repartition(1), d = 64, k = 4, iterations = 2)
      .as[(Long, Int, Long)].collect().toSet
    val wide = KMeansExact.assignMicro(vecs.repartition(16), d = 64, k = 4, iterations = 2)
      .as[(Long, Int, Long)].collect().toSet
    assert(narrow.nonEmpty && narrow == wide)
    // and it actually clusters: more than one cluster in use
    assert(narrow.map(_._2).size > 1)
  }

  test("equidistant points break ties toward the lower cluster id") {
    // centroids 0 and 2; the point at exactly 1.0 is 1.0 from both
    val df = oneD(0L -> 0.0, 1L -> 2.0, 2L -> 1.0)
    val got = KMeansExact.assignMicro(df, d = 1, k = 2, iterations = 1)
      .as[(Long, Int, Long)].collect().toMap2
    assert(got(2L)._1 == 0)
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // identical vectors: both init centroids coincide, everything
    // tie-breaks into cluster 0, cluster 1 must survive empty (no
    // crash, no null centroid) across iterations
    val df = oneD(0L -> 3.0, 1L -> 3.0, 2L -> 3.0)
    val got = KMeansExact.assignMicro(df, d = 1, k = 2, iterations = 3)
      .as[(Long, Int, Long)].collect()
    assert(got.forall(_._2 == 0) && got.forall(_._3 == 0L))
  }

  test("guards: k, d, iterations, unitScale, and vector count validated") {
    val df = oneD(0L -> 1.0)
    intercept[IllegalArgumentException](KMeansExact.assignMicro(df, 1, 0, 1))
    intercept[IllegalArgumentException](KMeansExact.assignMicro(df, 0, 1, 1))
    intercept[IllegalArgumentException](KMeansExact.assignMicro(df, 1, 1, 0))
    intercept[IllegalArgumentException](KMeansExact.assignMicro(df, 1, 1, 1, 0L))
    intercept[IllegalArgumentException](KMeansExact.assignMicro(df, 1, 2, 1))
  }

  private implicit class ToMap2(rows: Array[(Long, Int, Long)]) {
    def toMap2: Map[Long, (Int, Long)] =
      rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
