package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable aggregation buffer for [[GeometricMean]]. */
case class GeoMeanBuf(var logSum: Double, var n: Long)

/** Typed UDAF (SURVEY.md §2-B Q30): geometric mean via sum-of-logs, the
  * numerically stable form — partial aggregation (`merge`) makes it a
  * proper distributed two-phase aggregate. Equivalent SQL rewrite for
  * the oracle: EXP(AVG(LN(x))).
  */
object GeometricMean extends Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf = {
    b.logSum += math.log(x); b.n += 1; b
  }
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf =
    GeoMeanBuf(a.logSum + b.logSum, a.n + b.n)
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
