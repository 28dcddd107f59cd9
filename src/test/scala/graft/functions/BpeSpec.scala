package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.queries.TokenQueries

class BpeSpec extends SparkSpec {

  private val vocab = TokenQueries.PinnedVocab

  // Seeded generator sampling (SkewJoinSpec pattern; no scalatestplus
  // bridge in the offline cache).
  private def samples[A](g: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    (0 until n).flatMap(i => g.apply(params, Seed(0xb9e5L + i)))
  }

  test("greedy apply follows rank order, not text order") {
    // (t,h) rank 0 must fire before the textually-earlier (e,s) rank 7
    assert(vocab.tokenizeWord("esther").toSeq == Seq("es", "the", "r"))
    // cascading ranks build multi-char symbols
    assert(vocab.tokenizeWord("lowest").toSeq == Seq("low", "est"))
    // dead merge: (tok,en) can never fire without an (e,n) merge
    assert(vocab.tokenizeWord("token").toSeq == Seq("tok", "e", "n"))
  }

  test("law: concatenating a word's tokens restores the word (100 seeded words)") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    samples(word, 100).foreach { w =>
      assert(vocab.tokenizeWord(w).mkString == w, s"word '$w'")
    }
  }

  test("law: token count over text = sum of word token counts (60 seeded texts)") {
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    samples(Gen.listOf(word), 60).foreach { ws =>
      val text = ws.mkString(" ")
      assert(vocab.count(text) == ws.map(w => vocab.tokenizeWord(w).length).sum,
        s"text '$text'")
    }
  }

  test("expressions agree with the Scala tokenizer and stay codegen'd") {
    // A file scan (not a LocalRelation, which the optimizer folds by
    // EVALUATING the expressions at plan time) so the projection runs
    // inside WholeStageCodegen — this exercises doGenCode for real.
    val df = tables.documents.limit(50)
      .select(col("text"), bpe_tokens(col("text"), vocab).as("toks"),
        bpe_count(col("text"), vocab).as("n"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = vocab.tokenize(r.getString(0))
      assert(r.getSeq[String](1) == expected.toSeq)
      assert(r.getInt(2) == expected.length)
    }
    // the expression pair must not break whole-stage codegen
    val hasWsc = df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(hasWsc, df.queryExecution.executedPlan.toString)
  }

  test("distributed training is deterministic and learns real frequencies") {
    val docs = tables.documents
    val v1 = Bpe.train(docs, "text", nMerges = 8)
    val v2 = Bpe.train(docs, "text", nMerges = 8)
    assert(v1.merges == v2.merges, "same corpus + params must learn the same merges")
    assert(v1.merges.size == 8)
    // every learned merge pair actually co-occurs in the corpus
    assert(v1.merges.forall { case (a, b) => (a + b).nonEmpty })
    // applying the learned vocab shortens text vs character count
    import spark.implicits._
    val sample = docs.select("text").as[String].take(20).filter(_.nonEmpty)
    sample.foreach { t =>
      val n = v1.count(t)
      val chars = t.count(!_.isWhitespace)
      assert(n <= chars && n > 0, s"count $n vs chars $chars")
    }
  }

  test("save/load round-trips a trained vocab bit-identically") {
    val dir = tmpDir("bpe-vocab")
    val trained = Bpe.train(tables.documents, "text", nMerges = 8)
    trained.save(spark, dir)
    val loaded = BpeVocab.load(spark, dir)
    assert(loaded.merges == trained.merges)
    assert(loaded.encoded == trained.encoded)
    // bit-identical tokenization through BOTH the Scala path and the
    // codegen'd expressions (tok01's surface) on real documents
    import spark.implicits._
    tables.documents.select("text").as[String].take(30).foreach { t =>
      assert(loaded.tokenize(t) == trained.tokenize(t))
    }
    val viaTrained = tables.documents.limit(50)
      .select(col("doc_id"), bpe_tokens(col("text"), trained).as("toks"))
      .orderBy("doc_id").collect().toSeq
    val viaLoaded = tables.documents.limit(50)
      .select(col("doc_id"), bpe_tokens(col("text"), loaded).as("toks"))
      .orderBy("doc_id").collect().toSeq
    assert(viaTrained == viaLoaded)
    // the pinned vocab round-trips too (save is not train-only)
    PinnedVocabRoundTrip()
  }

  private def PinnedVocabRoundTrip(): Unit = {
    val dir = tmpDir("bpe-vocab-pinned")
    vocab.save(spark, dir)
    assert(BpeVocab.load(spark, dir).merges == vocab.merges)
  }

  test("packShards budgets by a LOADED vocab (production path: load, don't retrain)") {
    val dir = tmpDir("bpe-vocab-pack")
    vocab.save(spark, dir)
    val loaded = BpeVocab.load(spark, dir)
    val packed = graft.operators.TrainingPipeline.packShards(
      tables.documents, budgetTokens = 2048L,
      tokenCount = c => bpe_count(c, loaded).cast("long"))
    val viaPinned = graft.operators.TrainingPipeline.packShards(
      tables.documents, budgetTokens = 2048L,
      tokenCount = c => bpe_count(c, vocab).cast("long"))
    assert(packed.orderBy("doc_id").collect().toSeq ==
      viaPinned.orderBy("doc_id").collect().toSeq)
  }

  test("packShards accepts a subword counter and budgets by it") {
    val docs = tables.documents
    val packed = graft.operators.TrainingPipeline.packShards(
      docs, budgetTokens = 2048L,
      tokenCount = c => bpe_count(c, vocab).cast("long"))
    val byShard = packed.groupBy("shard_id").agg(sum("n_tokens").as("tok")).collect()
    assert(byShard.nonEmpty)
    // n_tokens column is the BPE count, not the whitespace count
    import spark.implicits._
    val one = docs.select(col("doc_id"), col("text")).as[(Long, String)].head()
    val n = packed.filter(col("doc_id") === one._1)
      .select("n_tokens").as[Long].head()
    assert(n == vocab.count(one._2))
  }
}
