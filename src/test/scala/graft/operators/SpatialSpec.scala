package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def L(rows: (Long, Long, Long)*) = rows.toDF("left_id", "lat_u", "lon_u")
  private def R(rows: (Long, Long, Long)*) = rows.toDF("right_id", "lat_u", "lon_u")

  test("finds exactly the in-radius pairs, including across cell borders") {
    // cell = radius = 10: points 9 and 11 sit in different cells but
    // 2 apart — the 3x3 fan-out must still pair them
    val got = Spatial.radiusJoin(
      L((1L, 9L, 0L), (2L, 100L, 100L), (3L, -5L, -5L)),
      R((10L, 11L, 0L), (20L, 104L, 103L), (30L, 500L, 500L)),
      radiusMicro = 10L, cellMicro = 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 4L), (2L, 20L, 25L)))
  }

  test("negative coordinates tile correctly (floor division, not truncation)") {
    // truncating division folds cells -1 and 0 together; floor keeps
    // -1 and 1 in cells -1 and 0, and they are 2 apart → one pair
    val got = Spatial.radiusJoin(
      L((1L, -1L, -1L)), R((10L, 1L, 1L)),
      radiusMicro = 10L, cellMicro = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L, 8L)))
  }

  test("each qualifying pair is emitted exactly once") {
    // co-located points: all 9 left fan-out cells exist, but only the
    // right point's own cell joins — no duplicate pair
    val got = Spatial.radiusJoin(
      L((1L, 5L, 5L)), R((10L, 5L, 5L)),
      radiusMicro = 10L, cellMicro = 10L).collect()
    assert(got.length == 1 && got.head.getLong(2) == 0L)
  }

  test("matches brute force on the synthetic key-hashed coordinates") {
    val c = tables.customer.select(col("c_custkey").as("left_id"),
      (col("c_custkey") * 2654435761L % 180000000L - 90000000L).as("lat_u"),
      (col("c_custkey") * 2246822519L % 360000000L - 180000000L).as("lon_u"))
    val s = tables.supplier.select(col("s_suppkey").as("right_id"),
      (col("s_suppkey") * 2654435761L % 180000000L - 90000000L).as("lat_u"),
      (col("s_suppkey") * 2246822519L % 360000000L - 180000000L).as("lon_u"))
    val got = Spatial.radiusJoin(c, s, radiusMicro = 2000000L, cellMicro = 2000000L)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    val brute = c.select(col("left_id"), col("lat_u").as("la"), col("lon_u").as("lo"))
      .crossJoin(s.select(col("right_id"), col("lat_u").as("lb"), col("lon_u").as("lb2")))
      .filter((col("la") - col("lb")) * (col("la") - col("lb")) +
        (col("lo") - col("lb2")) * (col("lo") - col("lb2")) <= 2000000L * 2000000L)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("guards: radius and cell validated") {
    intercept[IllegalArgumentException](
      Spatial.radiusJoin(L((1L, 0L, 0L)), R((2L, 0L, 0L)), 0L, 10L))
    intercept[IllegalArgumentException](
      Spatial.radiusJoin(L((1L, 0L, 0L)), R((2L, 0L, 0L)), 10L, 5L))
  }
}
