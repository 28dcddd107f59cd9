package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("sortedNeighborhood finds in-window near matches and only those") {
    val df = Seq((1L, "apple"), (2L, "apply"), (3L, "banana"), (4L, "bananas"))
      .toDF("id", "name")
    val got = FuzzyJoin.sortedNeighborhood(df, "id", "name", window = 2, maxDistance = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 1), (3L, 4L, 1)))
  }

  test("equals the single-window reference on the real part table") {
    // Reference: one driver-side window row_number (fine at spec scale;
    // the operator's point is avoiding exactly this at corpus scale).
    val part = tables.part.select("p_partkey", "p_name")
    val w = Window.orderBy(col("p_name"), col("p_partkey"))
    val r = part.withColumn("rn", row_number().over(w))
    val want = r.as("a").join(r.as("b"),
        col("b.rn") > col("a.rn") && col("b.rn") <= col("a.rn") + 3)
      .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= 2)
      .select(col("a.p_partkey").as("ia"), col("b.p_partkey").as("ib"))
      .as[(Long, Long)].collect().toSet
    val got = FuzzyJoin.sortedNeighborhood(part, "p_partkey", "p_name",
        window = 3, maxDistance = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "expected near pairs in testdata part names")
    assert(got == want)
  }

  test("the neighbor join is an equi-join on the rank bucket — no cartesian") {
    // materialize=none: the default eager mode checkpoints the ranked
    // working set, which would hide the join shape behind an RDD scan
    spark.conf.set(TextDedup.MaterializeConf, "none")
    val df = try FuzzyJoin.sortedNeighborhood(
        tables.part.select("p_partkey", "p_name"), "p_partkey", "p_name")
      finally spark.conf.unset(TextDedup.MaterializeConf)
    df.collect()
    val plan = graft.PlanSig.finalPlanText(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"blocking must keep the join equi:\n${plan.take(1200)}")
    assert(plan.contains("Join"), s"expected a real join in the lazy plan:\n${plan.take(600)}")
  }

  test("guards: window and maxDistance validated") {
    val df = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException](
      FuzzyJoin.sortedNeighborhood(df, "id", "name", window = 0))
    intercept[IllegalArgumentException](
      FuzzyJoin.sortedNeighborhood(df, "id", "name", maxDistance = -1))
  }
}
