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

  test("ragged rows: shorter/longer than the probe stay bit-identical, zero prefix norm NULLs") {
    // probe with leading zeros: prefix norms [0, 0, 0, 3, 5] — a row of
    // length 2 overlaps only the zero prefix and must yield NULL, rows of
    // length 3 divide by the partial norm 3, rows longer than the probe
    // truncate to the probe length and divide by the full norm 5.
    val probe = Array(0.0, 0.0, 3.0, 4.0)
    // parquet-backed input: a purely local relation with a literal probe
    // constant-folds into a LocalRelation at plan time and the rule never
    // sees a live expression tree
    val raggedPath = tmpDir("fold-ragged")
    Seq(
      (1L, Seq(1.0, 2.0)),                      // overlap n=2, prefix norm 0 -> NULL
      (2L, Seq(1.0, 2.0, 3.0)),                 // shorter than probe: n=3
      (3L, Seq(1.0, 2.0, 3.0, 4.0)),            // equal length
      (4L, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)),  // longer than probe: n=4
      (5L, Seq.empty[Double]),                  // n=0 -> NULL (na=0 too)
      (6L, Seq(0.0, 0.0, 0.0)))                 // row norm 0 -> NULL
      .toDF("id", "v").write.mode("overwrite").parquet(raggedPath)
    val rows = spark.read.parquet(raggedPath)

    val foldedDf = rows.select(col("id"),
      graft.functions.cosine_similarity(col("v"), typedLit(probe)).as("s"))
    assert(foldedDf.queryExecution.optimizedPlan.toString.contains("cosine_similarity_const"),
      "rule must fire for the ragged fixture or this test checks nothing")
    val folded = foldedDf.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    // general form: probe as a column from a one-row relation (not a
    // literal in the expression tree, so no rewrite)
    val pe = Seq(Tuple1(probe.toSeq)).toDF("pe")
    val generalDf = rows.crossJoin(broadcast(pe))
      .select(col("id"), graft.functions.cosine_similarity(col("v"), col("pe")).as("s"))
    assert(!generalDf.queryExecution.optimizedPlan.toString.contains("cosine_similarity_const"))
    val general = generalDf.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(folded == general, "ragged-prefix results must match the general expression bit-for-bit")
    assert(folded(1L).isEmpty, "zero prefix norm must be NULL")
    assert(folded(5L).isEmpty && folded(6L).isEmpty)
    assert(folded(2L).nonEmpty && folded(3L).nonEmpty && folded(4L).nonEmpty)
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
