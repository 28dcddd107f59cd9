package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

class FoldConstantCosineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = tables.embeddings

  test("constant-probe cosine is rewritten to the folded expression in the plan") {
    val probe = Array.tabulate(64)(i => (i % 5 - 2).toDouble / 7.0)
    val df = emb.select(
      graft.functions.cosine_similarity(
        col("embedding").cast("array<double>"), typedLit(probe)).as("s"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("cosine_similarity_const"),
      s"rule must fire on a literal probe:\n${plan.take(600)}")
    // symmetric: literal on the left folds too
    val swapped = emb.select(graft.functions.cosine_similarity(
      typedLit(probe), col("embedding").cast("array<double>")).as("s"))
    assert(swapped.queryExecution.optimizedPlan.toString.contains("cosine_similarity_const"))
  }

  test("folded results are bit-identical to the general expression") {
    val probe = emb.filter(col("vec_id") === 5L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
    val folded = emb.select(col("vec_id"),
        graft.functions.cosine_similarity(
          col("embedding").cast("array<double>"), typedLit(probe)).as("s"))
      .as[(Long, Double)].collect().toMap
    // general form: probe as a broadcast COLUMN (not foldable — no rewrite)
    val pe = emb.filter(col("vec_id") === 5L)
      .select(col("embedding").cast("array<double>").as("pe"))
    val general = emb.crossJoin(broadcast(pe))
      .select(col("vec_id"),
        graft.functions.cosine_similarity(col("embedding").cast("array<double>"), col("pe")).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(folded == general, "same doubles bit-for-bit, not merely close")
  }

  test("zero-norm literal probe is left to the general expression (null semantics)") {
    val zero = Array.fill(64)(0.0)
    val df = emb.limit(3).select(graft.functions.cosine_similarity(
      col("embedding").cast("array<double>"), typedLit(zero)).as("s"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("cosine_similarity_const"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("IvfIndex probes (typedLit path) still equal brute force under the rule") {
    val path = tmpDir("fold-ivf")
    IvfIndex.build(emb, nLists = 4).save(path)
    val got = IvfIndex.load(spark, path).searchById(2L, k = 5, nProbe = 4)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    val want = Similarity.bruteForceTopK(emb, 2L, 5)
      .select("vec_id", "score").as[(Long, Double)].collect().toSeq
    assert(got == want)
  }
}
