package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioning-invariance laws for the session-3 operators: every
  * result must be a pure function of the DATA, not of its physical
  * layout — the property that makes the oracle gate meaningful on a
  * cluster, where partitioning is whatever the shuffle produced.
  * Each law re-runs the operator on a skewed repartition (7 parts,
  * then 1 part) and asserts set-equality of collected rows.
  */
class Session3LawsSpec extends SparkSpec {
  import spark.implicits._

  private def invariant(build: DataFrame => DataFrame, input: DataFrame,
                        label: String): Unit = {
    val base = build(input).collect().map(_.toString).toSet
    val seven = build(input.repartition(7)).collect().map(_.toString).toSet
    val one = build(input.coalesce(1)).collect().map(_.toString).toSet
    assert(base == seven && base == one, s"$label varies with partitioning")
    assert(base.nonEmpty, s"$label law ran on an empty result")
  }

  test("NaiveBayes predictions are partitioning-invariant") {
    invariant(NaiveBayes.trainAndClassify(_, "text", "lang"),
      tables.documents.limit(120), "nb01")
  }

  test("trendingRanks is partitioning-invariant (tie-broken ranks)") {
    invariant(TimeSeries.trendingRanks(_, "event_type", "ts"),
      tables.events.limit(2000), "tr01")
  }

  test("madOutliers histogram medians are partitioning-invariant") {
    invariant(
      df => Profile.madOutliers(df.select(col("l_returnflag").as("g"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c")), "g", "c"),
      tables.lineitem.limit(5000), "rs01")
  }

  test("itemNeighbors top-k is partitioning-invariant (rounded-sim ties)") {
    invariant(
      df => Baskets.itemNeighbors(df.select(col("l_orderkey").as("basket_id"),
        col("l_partkey").as("item")), minSupport = 2, k = 3),
      tables.lineitem.limit(8000), "rec01")
  }

  test("linearTouch credit assignment is partitioning-invariant") {
    val ev = tables.events.select("user_id", "event_id", "event_type", "ts", "value")
    def build(e: DataFrame): DataFrame = {
      val conv = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * 1000 + 0.5).cast("long").as("rev_milli"))
      val tw = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id", "ts").orderBy(col("event_id").desc)
      val touches = e.filter(col("event_type") =!= "purchase")
        .withColumn("__rn", row_number().over(tw)).filter(col("__rn") === 1)
        .select(col("user_id"), col("ts").as("touch_ts"),
          col("event_type").as("touch_type"))
      Attribution.linearTouch(conv, touches, windowUs = 604800000000L)
    }
    invariant(build, ev.limit(3000), "at02")
  }

  test("splitTable is partitioning-invariant") {
    invariant(
      df => DecisionStump.splitTable(df.select(
        floor(col("l_quantity") + 0.5).cast("long").as("q"),
        (col("l_returnflag") === "R").as("y")), "q", "y"),
      tables.lineitem.limit(5000), "dt01")
  }

  // ------------------------------------------- round-16 additions

  test("semanticDedup survivors are partitioning-invariant") {
    invariant(
      Similarity.semanticDedup(_, d = 64, k = 4, iterations = 2,
        threshold = 0.3),
      tables.embeddings, "sd01")
  }

  test("PQ ADC top-k is partitioning-invariant") {
    invariant(
      ProductQuantizer.adcTopK(_, probeId = 0L, topK = 10,
        d = 64, m = 4, k = 4, iterations = 2),
      tables.embeddings, "pq01")
  }

  test("IVF-PQ top-k is partitioning-invariant (composition preserves it)") {
    invariant(
      ProductQuantizer.ivfPqTopK(_, probeId = 0L, topK = 10, d = 64, m = 4,
        kCoarse = 4, coarseIterations = 2, kPq = 4, pqIterations = 1,
        nProbe = 2),
      tables.embeddings, "pq03")
  }
}
