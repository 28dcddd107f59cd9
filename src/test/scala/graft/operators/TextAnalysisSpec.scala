package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts on a crafted doc") {
    val d = Seq((1L, "Hello world 42 ok")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenCounts(d).as[(Long, Int, Int, Int)].head()
    assert(got == ((1L, 4, 4, math.ceil(17 / 4.0).toInt)))
  }

  test("native rolling hash equals the HOF formulation on testdata + crafted edge cases") {
    // full documents table: the codegen'd expression must be
    // value-identical to the interpreted HOF it replaces
    val docs = tables.documents
    val native = TextAnalysis.rollingHash(docs).orderBy("doc_id").collect().toSeq
    val hof = TextAnalysis.rollingHashHof(docs).orderBy("doc_id").collect().toSeq
    assert(native == hof)

    // edges: empty string (hash 0), single char, order sensitivity,
    // non-ASCII code points (é = U+00E9, 緑 = U+7DE1, 😀 = U+1F600 —
    // surrogate pair, must hash as ONE code point like split('') does)
    val edge = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "ba"),
      (5L, "café"), (6L, "緡"), (7L, new String(Character.toChars(0x1F600))))
      .toDF("doc_id", "text")
    val en = TextAnalysis.rollingHash(edge).orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val eh = TextAnalysis.rollingHashHof(edge).orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(en == eh, s"native=$en hof=$eh")
    assert(en.head._2 == 0L, "empty text hashes to 0")
    assert(en(1)._2 == 'a'.toLong, "single char hashes to its code point")
    assert(en(2)._2 != en(3)._2, "order sensitivity")

    // null flows through as null (nullIntolerant)
    val withNull = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val rows = TextAnalysis.rollingHash(withNull).orderBy("doc_id").collect()
    assert(!rows(0).isNullAt(1) && rows(1).isNullAt(1))
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

  test("redactPii masks emails and phone runs, leaves prose alone") {
    val d = Seq(
      (1L, "reach me at jane.doe+spam@sub.mail.example thanks"),
      (2L, "call +1-555-0001 or 555-123-4567 today"),
      (3L, "edge: a@b.co and 1234567 back to back"),
      (4L, "no pii here, just words and the number 42"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(d, "text")
      .select("doc_id", "redacted").as[(Long, String)].collect().toMap
    assert(r(1L) == "reach me at [EMAIL] thanks")
    assert(r(2L) == "call [PHONE] or [PHONE] today")
    assert(r(3L) == "edge: [EMAIL] and [PHONE] back to back")
    assert(r(4L) == "no pii here, just words and the number 42")
  }

  test("language id is deterministic and total on testdata") {
    val got = TextAnalysis.languageId(tables.documents).collect()
    assert(got.length == tables.documents.count())
    assert(got.forall(r => Set("en", "es", "de", "fr", "zh").contains(r.getString(1))))
  }

  test("bigram NLL matches an independent in-memory LM on a crafted corpus") {
    // corpus: "a b a b", "a b c", "c" (c: no pairs -> absent from output)
    val d = Seq((1L, "a b A b"), (2L, "a b c"), (3L, "c")).toDF("doc_id", "text")

    // independent reimplementation: counts by hand over the same corpus
    val toks = Seq(Seq("a", "b", "a", "b"), Seq("a", "b", "c"), Seq("c"))
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val pairsOf = (t: Seq[String]) => t.zip(t.tail)
    val big = toks.flatMap(pairsOf).groupBy(identity).view.mapValues(_.size).toMap
    val vocab = uni.size // 3
    def micro(p: (String, String)): Long =
      math.floor(math.log((big(p) + 1.0) / (uni(p._1) + vocab)) * 1e6 + 0.5).toLong
    def nll(t: Seq[String]): Double = {
      val ms = pairsOf(t).map(micro)
      val raw = -ms.sum.toDouble / 1e6 / ms.size
      math.round(raw * 1e4) / 1e4.toDouble
    }

    val got = TextAnalysis.bigramNll(d).orderBy("doc_id")
      .as[(Long, Int, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L), "pairless doc 3 is absent")
    assert(got.map(_._2) == Seq(3, 2), "pair counts")
    assert(got(0)._3 == nll(toks(0)) && got(1)._3 == nll(toks(1)),
      s"got $got, want ${nll(toks(0))}, ${nll(toks(1))}")
    // the doc made of the corpus's dominant bigrams scores LOWER nll
    assert(got(0)._3 < got(1)._3, "frequent-pattern doc is less surprising")
  }

  test("normalize: lowercases, strips punctuation, collapses whitespace") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      (1L, "Hello, World!!  Foo-bar?"),
      (2L, "  already clean text  "),
      (3L, "...")) // all-punctuation → empty
      .toDF("doc_id", "text")
    val got = TextAnalysis.normalize(d).orderBy("doc_id")
      .select(col("doc_id"), col("norm_text"), col("n_norm_tokens"))
      .collect()
    assert(got(0).getString(1) == "hello world foo bar" && got(0).getInt(2) == 4)
    assert(got(1).getString(1) == "already clean text" && got(1).getInt(2) == 3)
    assert(got(2).getString(1) == "" && got(2).getInt(2) == 0)
  }

  test("repetitionScore: hand-checked fractions and threshold bit") {
    import org.apache.spark.sql.functions.col
    val d = Seq(
      // "a b a b a b": bigrams a-b ×3, b-a ×2 → top 3/5 = 0.6;
      // trigrams "a b a" ×2, "b a b" ×2 → all duplicated → 1.0
      (1L, "a b a b a b"),
      // all-distinct tokens: every bigram/trigram unique → 1/4 top, 0 dup
      (2L, "v w x y z"),
      // two tokens: one bigram, no trigrams → NULL trigram stats
      (3L, "p q"),
      // one token: no bigrams → absent from output
      (4L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScore(d).orderBy("doc_id")
      .select(col("doc_id"), col("top_bigram_frac"), col("dup_trigram_frac"),
        col("pass_repetition"))
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "1-token doc absent")
    assert(got(0).getDouble(1) == 0.6 && got(0).getDouble(2) == 1.0)
    assert(!got(0).getBoolean(3), "looping doc fails both thresholds")
    assert(got(1).getDouble(1) == 0.25 && got(1).getDouble(2) == 0.0)
    assert(got(1).getBoolean(3) === false || got(1).getDouble(1) <= 0.25)
    // 0.25 > 0.20 → fails top-bigram threshold even with zero duplication
    assert(!got(1).getBoolean(3))
    // no trigrams → NULL dup fraction; the pass bit is still FALSE (not
    // NULL) because its sole bigram has fraction 1.0 and SQL's
    // three-valued AND short-circuits FALSE AND NULL to FALSE — the same
    // in DuckDB, which is what the oracle hash compares.
    assert(got(2).isNullAt(2))
    assert(!got(2).isNullAt(3) && !got(2).getBoolean(3))
  }

  test("repetitionScore: real corpus passes thresholds and plan has no join") {
    val res = TextAnalysis.repetitionScore(tables.documents)
    val rows = res.collect()
    assert(rows.length == tables.documents.count())
    // synthetic docs are word-soup: overwhelmingly pass
    val passing = rows.count(r => !r.isNullAt(3) && r.getBoolean(3))
    assert(passing > rows.length / 2)
    // single exploded stream + conditional aggs — no self-join of branches
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "bigram and trigram stats must come from ONE tagged stream, not a join")
  }

  test("tfidfTopTerms: hand-computed tiny corpus, integer scores, k per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry durian")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, k = 2)
      .orderBy("doc_id", "term")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // N=3; idf_micro(df) = round(1e6 * ln(4/(df+1)))
    def idf(df: Long): Long = math.floor(math.log(4.0 / (df + 1)) * 1e6 + 0.5).toLong
    // doc 1: apple tf=2 df=1, banana tf=1 df=2 — both kept (k=2)
    assert(got.filter(_._1 == 1L) == Seq(
      (1L, "apple", 2L, 1L, 2 * idf(1)),
      (1L, "banana", 1L, 2L, idf(2))))
    // doc 3: cherry tf=2 df=2, durian tf=1 df=1; durian idf > cherry score?
    // cherry 2*ln(4/3)e6 = 575364*... keep assertion structural: 2 rows,
    // scores match the formula
    val d3 = got.filter(_._1 == 3L)
    assert(d3.map(_._2).sorted == Seq("cherry", "durian"))
    assert(d3.forall { case (_, _, tf, df, sc) => sc == tf * idf(df) })
    assert(got.size == 6, "k=2 terms for every doc")
  }

  test("bm25: hand-computed tiny corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"), // dl=3
      (2L, "banana cherry"),      // dl=2
      (3L, "cherry cherry")).toDF("doc_id", "text") // dl=2, no query term
    val got = TextAnalysis.bm25(docs, Seq("apple", "banana"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // N=3, sumdl=7, avgdl=7/3; idf_micro(df) = round(1e6*ln((3-df+0.5)/(df+0.5)+1))
    def idfM(df: Long): Long =
      math.floor(math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 0.5).toLong
    def s(tf: Long, df: Long, dl: Long): Double =
      (idfM(df) / 1e6) * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (7.0 / 3)))
    def r4(x: Double): Double = math.round(x * 10000) / 10000.0
    assert(got.map(_._1) == Seq(1L, 2L), "doc 3 matches no query term")
    assert(got(0) == ((1L, 2L, r4(s(2, 1, 3) + s(1, 2, 3))))) // apple tf=2 df=1; banana tf=1 df=2
    assert(got(1) == ((2L, 1L, r4(s(1, 2, 2)))))
    // rare term outweighs common at equal tf/dl: idf monotone in df
    assert(idfM(1) > idfM(2))
  }

  test("bm25: rejects an unbounded term list") {
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25(tables.documents, (1 to 20).map(i => s"t$i"))
    }
  }

  test("featureHash: deterministic buckets, cancelling signs, bounded range") {
    import spark.implicits._
    val docs = Seq((1L, "apple apple banana"), (2L, "apple cherry")).toDF("doc_id", "text")
    val got = TextAnalysis.featureHash(docs, numBuckets = 16)
      .orderBy("doc_id", "bucket").as[(Long, Long, Long)].collect().toSeq
    assert(got.forall(r => r._2 >= 0 && r._2 < 16), "buckets must be in [0, numBuckets)")
    // same token -> same (bucket, sign) in every doc: apple's weight in
    // doc 1 is exactly 2x its weight in doc 2's apple bucket
    def bucketOf(w: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 8), 16) % 16
    }
    val appleB = bucketOf("apple")
    val w1 = got.find(r => r._1 == 1L && r._2 == appleB).map(_._3)
    val w2 = got.find(r => r._1 == 2L && r._2 == appleB).map(_._3)
    // (assumes no collision of banana/cherry into apple's bucket at 16
    // buckets for these words — verified by the exact equality below)
    if (bucketOf("banana") != appleB && bucketOf("cherry") != appleB)
      assert(w1.get == 2 * w2.get, s"apple tf=2 vs tf=1: $w1 vs $w2")
    // a zero-weight row (colliding tokens with opposite signs) is LEGAL
    // output — the cancelling is the point — so no nonzero assertion.
  }

  test("featureHash rejects a non-positive bucket count") {
    intercept[IllegalArgumentException] {
      TextAnalysis.featureHash(tables.documents, numBuckets = 0)
    }
  }

  test("tfidfTopTerms: every doc gets at most k rows on the real corpus") {
    val got = TextAnalysis.tfidfTopTerms(tables.documents, k = 3)
    val worst = got.groupBy("doc_id").count().agg(org.apache.spark.sql.functions.max("count"))
      .head().getLong(0)
    assert(worst <= 3)
    assert(got.count() > 0)
  }

  test("chunkDocuments: overlapping windows cover every word, last chunk short") {
    import org.apache.spark.sql.functions._
    // 95 words -> ceil(95/40) = 3 chunks: [1..50], [41..90], [81..95]
    val text = (1 to 95).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, "just three words"), (4L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Int, String)].collect().toSeq
    val doc1 = got.filter(_._1 == 1L)
    assert(doc1.map(c => (c._2, c._3)) == Seq((0L, 50), (1L, 50), (2L, 15)))
    // identical docs chunk identically (hash pins content)
    assert(got.filter(_._1 == 2L).map(c => (c._2, c._3, c._4)) ==
      doc1.map(c => (c._2, c._3, c._4)))
    // a doc shorter than the stride is one whole chunk; empty docs drop
    assert(got.filter(_._1 == 3L).map(c => (c._2, c._3)) == Seq((0L, 3)))
    assert(!got.exists(_._1 == 4L))
    // overlap: chunk 1 starts at word 41 — its hash must equal the md5
    // of exactly words 41..90
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest((41 to 90).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(doc1(1)._4 == expect)
  }

  test("chunkDocuments plans with zero shuffles (pure scan + explode)") {
    import org.apache.spark.sql.functions._
    val df = TextAnalysis.chunkDocuments(tables.documents)
    df.collect()
    val plan = graft.PlanSig.finalPlanText(df)
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n${plan.take(1000)}")
  }

  test("chunkDocuments validates chunkSize/stride") {
    intercept[IllegalArgumentException](
      TextAnalysis.chunkDocuments(tables.documents, chunkSize = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.chunkDocuments(tables.documents, chunkSize = 10, stride = 11))
  }
}
