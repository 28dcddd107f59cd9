package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial radius join — the geospatial member of the
  * blocked-join family (RangeJoin's banding, FuzzyJoin's prefixes,
  * TextDedup's LSH buckets — same shape, 2-d key): find every
  * (left, right) pair within `radiusMicro` micro-degrees, without an
  * all-pairs stage.
  *
  * Coordinates are INTEGER MICRO-DEGREES and the metric is planar
  * squared euclidean distance in that space — exact long arithmetic
  * end to end (the house discipline; geodesic haversine is
  * deliberately NOT used: cross-engine sin/cos differ in ulps, so a
  * threshold compare could flip — planar micro-degrees keep the gate
  * bit-exact, and at city-scale radii the planar approximation is the
  * standard trade).
  *
  * Blocking: space is tiled into `cellMicro`-sized cells by FLOOR
  * division (spelled (x − ((x mod c)+c) mod c)/c so negative
  * coordinates tile correctly in both Spark and SQL — bare integer
  * division truncates toward zero and would fold cells −1 and 0
  * together). With cell >= radius, any qualifying pair sits within one
  * cell of each other in both axes, so the LEFT side fans out to its
  * 3×3 neighbor cells (9 rows — bounded, the RangeJoin ≤2-buckets
  * discipline) and the RIGHT side keys by its exact cell: one
  * equi-join on (cx, cy), candidates bounded by true spatial density,
  * each pair generated at most once (the right cell is unique). The
  * exact distance verify runs post-join.
  *
  * Documented limitation: longitude does not wrap at ±180° (planar
  * grid); production near the antimeridian would add wrapped duplicate
  * cells. Overflow bound: coordinate deltas up to 3.6·10^8 square to
  * 1.3·10^17 — safe in longs.
  *
  * @param left  (left_id, lat_u, lon_u) in micro-degrees
  * @param right (right_id, lat_u, lon_u) in micro-degrees
  * @return (left_id, right_id, dist_sq_u) for every pair with
  *         (Δlat² + Δlon²) <= radiusMicro²
  */
object Spatial {

  private def floorDivCell(x: Column, cell: Long): Column =
    (x - ((x % cell + cell) % cell)) / cell

  def radiusJoin(left: DataFrame, right: DataFrame,
                 radiusMicro: Long, cellMicro: Long): DataFrame = {
    require(radiusMicro > 0, s"radiusMicro must be positive, got $radiusMicro")
    require(cellMicro >= radiusMicro,
      s"cellMicro ($cellMicro) must be >= radiusMicro ($radiusMicro) — " +
        "the 3x3 neighborhood only covers one cell of reach")
    val offsets = for (dx <- -1 to 1; dy <- -1 to 1) yield (dx, dy)
    val l = left.select(col("left_id"),
        col("lat_u").cast("long").as("__lat_a"),
        col("lon_u").cast("long").as("__lon_a"))
      .withColumn("__o", explode(lit(offsets.map { case (dx, dy) => s"$dx,$dy" }.toArray)))
      .withColumn("cx",
        floorDivCell(col("__lat_a"), cellMicro) + split(col("__o"), ",").getItem(0).cast("long"))
      .withColumn("cy",
        floorDivCell(col("__lon_a"), cellMicro) + split(col("__o"), ",").getItem(1).cast("long"))
      .drop("__o")
    val r = right.select(col("right_id"),
        col("lat_u").cast("long").as("__lat_b"),
        col("lon_u").cast("long").as("__lon_b"))
      .withColumn("cx", floorDivCell(col("__lat_b"), cellMicro))
      .withColumn("cy", floorDivCell(col("__lon_b"), cellMicro))
    val dlat = col("__lat_a") - col("__lat_b")
    val dlon = col("__lon_a") - col("__lon_b")
    val distSq = dlat * dlat + dlon * dlon
    l.join(r, Seq("cx", "cy"))
      .filter(distSq <= radiusMicro * radiusMicro)
      .select(col("left_id"), col("right_id"), distSq.as("dist_sq_u"))
  }
}
