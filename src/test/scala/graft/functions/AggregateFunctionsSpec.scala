package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct unit coverage for the typed UDAF and the native rolling-hash
  * expression (both also exercised end-to-end by the q30_udaf / ta05
  * oracle entries — these tests pin the algebra and the codegen/interp
  * agreement at the unit level).
  */
class AggregateFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("GeometricMean: algebra laws (zero, reduce/merge associativity, finish)") {
    // merge(partial(A), partial(B)) == partial(A ++ B): the property
    // that makes the aggregate distributable over any partitioning.
    val a = Seq(1.0, 4.0, 16.0)
    val b = Seq(2.0, 8.0)
    def partial(xs: Seq[Double]) = xs.foldLeft(GeometricMean.zero)(GeometricMean.reduce)
    val merged = GeometricMean.merge(partial(a), partial(b))
    val whole = partial(a ++ b)
    assert(math.abs(merged.logSum - whole.logSum) < 1e-12)
    assert(merged.n == whole.n)
    // finish: exp(mean(log)) — exact on powers of two
    assert(math.abs(GeometricMean.finish(partial(Seq(2.0, 8.0))) - 4.0) < 1e-12)
    assert(GeometricMean.finish(GeometricMean.zero).isNaN, "empty group -> NaN")
    // distributed result equals the SQL rewrite the oracle uses
    val gm = udaf(GeometricMean)
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "x").repartition(8)
    val viaUdaf = df.groupBy("g").agg(gm(col("x"))).as[(String, Double)].head()._2
    val viaSql = df.groupBy("g").agg(exp(avg(log(col("x"))))).as[(String, Double)].head()._2
    assert(math.abs(viaUdaf - viaSql) < 1e-9)
  }

  test("RollingHash: interpreted and codegen paths agree, nulls propagate") {
    val df = Seq(Some("the quick brown fox"), Some(""), None)
      .toDF("s")
      .select(col("s"), rolling_hash(col("s")).as("h"))
    val rows = df.collect()
    // independent reimplementation of the declared algorithm:
    // h = (h * 31 + codePoint) mod 1e9+7 over code points
    def ref(s: String): Long = {
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      h
    }
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = RollingHash(Literal("the quick brown fox")).eval(null)
    assert(rows(0).getLong(1) == interp.asInstanceOf[Long],
      "codegen result must equal the interpreted eval")
    assert(rows(0).getLong(1) == ref("the quick brown fox"))
    assert(rows(1).getLong(1) == RollingHash(Literal("")).eval(null).asInstanceOf[Long])
    assert(rows(2).isNullAt(1), "null input -> null output")
  }
}
