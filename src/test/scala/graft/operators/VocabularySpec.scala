package graft.operators

import graft.SparkSpec

class VocabularySpec extends SparkSpec {
  import spark.implicits._

  test("build ranks by (count desc, term asc) and caps at k") {
    val docs = Seq(
      (1L, "b a a c"),
      (2L, "a b d"),
      (3L, "b"))
      .toDF("doc_id", "text")
    // counts: a=3, b=3, c=1, d=1 → tie-breaks: a before b, c before d
    assert(Vocabulary.build(docs, "text", k = 10).toSeq == Seq("a", "b", "c", "d"))
    assert(Vocabulary.build(docs, "text", k = 3).toSeq == Seq("a", "b", "c"))
  }

  test("encode maps ids in document order with OOV → 0") {
    val docs = Seq((1L, "b a a c"), (2L, "a b d"), (3L, "b")).toDF("doc_id", "text")
    val vocab = Vocabulary.build(docs, "text", k = 3) // a=1, b=2, c=3; d OOV
    val got = Vocabulary.encode(docs, "doc_id", "text", vocab)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0L, "2,1,1,3"),
      (2L, 3L, 1L, "1,2,0"),
      (3L, 1L, 0L, "2")))
  }

  test("empty tokens (double spaces, empty text) never enter vocab or counts") {
    val docs = Seq((1L, "a  b"), (2L, ""), (3L, " a ")).toDF("doc_id", "text")
    // raw split would yield '' tokens: "a  b" → [a,'',b], "" → [''],
    // " a " → ['',a,''] — all must be filtered, '' never ranked
    assert(Vocabulary.build(docs, "text", k = 10).toSeq == Seq("a", "b"))
    val got = Vocabulary.encode(docs, "doc_id", "text",
        Vocabulary.build(docs, "text", k = 10))
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L, "1,2"), (2L, 0L, 0L, ""), (3L, 1L, 0L, "1")))
  }

  test("encode plan is shuffle-free (broadcast map literal, no join)") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = Vocabulary.encode(docs, "doc_id", "text", Array("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }

  test("on testdata: token totals conserved and OOV real at k < |vocab|") {
    val docs = tables.documents
    val vocab = Vocabulary.build(docs, "text", k = 24)
    assert(vocab.length == 24)
    val enc = Vocabulary.encode(docs, "doc_id", "text", vocab)
    val Array(totTok, totOov) = enc
      .agg(org.apache.spark.sql.functions.sum("n_tokens"),
        org.apache.spark.sql.functions.sum("n_oov"))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    // whitespace token count is independent of the vocabulary
    val direct = docs.selectExpr("size(split(text, ' ')) AS n")
      .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
    assert(totTok == direct)
    assert(totOov > 0 && totOov < totTok) // k=24 < 31 observed terms
  }
}
