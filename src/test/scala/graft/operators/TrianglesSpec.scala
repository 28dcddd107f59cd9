package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    Triangles.triangleStats(edges.toDF("a", "b"))
      .as[(Long, Long, Long, Long, Option[Double])].collect().head

  test("counts a known graph exactly") {
    // K4 on {1,2,3,4} plus a pendant 5—1:
    // edges 7, wedges: deg(1)=4,deg(2..4)=3,deg(5)=1 → 6+3+3+3+0 = 15,
    // triangles: C(4,3) = 4, gcc = 12/15 = 0.8
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 1L))
    assert(stats(k4) == ((5L, 7L, 15L, 4L, Some(0.8))))
  }

  test("normalizes input: reversed duplicates, self-loops, multi-edges") {
    // the same K4 triangle listed messily: both orientations, repeats,
    // a self-loop — must normalize to the clean 3-cycle
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 3L), (2L, 2L))
    assert(stats(messy) == ((3L, 3L, 3L, 1L, Some(1.0))))
  }

  test("triangle-free graphs report zero with a defined gcc") {
    // star graph: wedges but no triangles → gcc 0.0
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    assert(stats(star) == ((4L, 3L, 3L, 0L, Some(0.0))))
    // single edge: no wedges → gcc null, not division garbage
    assert(stats(Seq((1L, 2L))) == ((2L, 1L, 0L, 0L, None)))
  }

  test("matches a brute-force count on the real shared-supplier graph") {
    val ps = tables.partsupp.filter(col("ps_availqty") < 100)
      .select(col("ps_suppkey").as("sk"), col("ps_partkey").as("pk"))
    val e = ps.as("x").join(ps.as("y"), col("x.sk") === col("y.sk") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
    val got = Triangles.triangleStats(e)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    // brute force: canonical-edge 3-join (each triangle once, a<b<c)
    val c = e.select(col("a"), col("b"))
    val brute = c.as("e1")
      .join(c.as("e2"), col("e2.a") === col("e1.b"))
      .join(c.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    assert(got._4 == brute && brute > 0)
  }

  test("localClustering: hand-checked on a kite graph") {
    // K4 minus one edge on {1,2,3,4} (missing 3-4), plus pendant 5-1:
    // triangles: (1,2,3) and (1,2,4).
    val kite = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (5L, 1L))
    val got = Triangles.localClustering(kite.toDF("a", "b"))
      .orderBy("node")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // node 1: deg 4, tri 2 → 2*2/12; node 2: deg 3, tri 2 → 4/6;
    // nodes 3,4: deg 2, tri 1 → 1.0; node 5: deg 1 → excluded.
    assert(got == Seq(
      (1L, 4L, 2L, 0.333333),
      (2L, 3L, 2L, 0.666667),
      (3L, 2L, 1L, 1.0),
      (4L, 2L, 1L, 1.0)))
  }

  test("localClustering totals reconcile with triangleStats") {
    val ps = tables.partsupp.filter(col("ps_availqty") < 100)
      .select(col("ps_suppkey").as("sk"), col("ps_partkey").as("pk"))
    val e = ps.as("x").join(ps.as("y"), col("x.sk") === col("y.sk") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("a"), col("y.pk").as("b"))
    val global = Triangles.triangleStats(e)
      .as[(Long, Long, Long, Long, Option[Double])].collect().head
    val local = Triangles.localClustering(e)
    // every triangle is attributed to exactly 3 corners
    val triSum = local.agg(sum("n_tri")).as[Long].collect().head
    assert(triSum == 3 * global._4 && global._4 > 0)
  }
}
