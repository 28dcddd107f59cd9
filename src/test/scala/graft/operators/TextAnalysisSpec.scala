package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts on a crafted doc") {
    val d = Seq((1L, "Hello world 42 ok")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenCounts(d).as[(Long, Int, Int, Int)].head()
    assert(got == ((1L, 4, 4, math.ceil(17 / 4.0).toInt)))
  }

  test("fingerprint is order- and duplicate-insensitive") {
    val d = Seq((1L, "b a c a"), (2L, "c b a"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(d).as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("quality score favors longer, stopword-light docs") {
    val d = Seq(
      (1L, Seq.fill(50)("the").mkString(" ")),          // all stopwords
      (2L, (1 to 120).map(i => s"w$i").mkString(" ")))  // long, no stopwords
      .toDF("doc_id", "text")
    val q = TextAnalysis.qualityScore(d)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q(1L) == 0.0)
    assert(q(2L) == 1.0)
  }

  test("language id is deterministic and total on testdata") {
    val got = TextAnalysis.languageId(tables.documents).collect()
    assert(got.length == tables.documents.count())
    assert(got.forall(r => Set("en", "es", "de", "fr", "zh").contains(r.getString(1))))
  }
}
