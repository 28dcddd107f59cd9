package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrainingPipelineSpec extends SparkSpec {

  test("packShards: exclusive prefix sum cuts deterministic fixed-boundary shards") {
    import spark.implicits._
    // token counts: 3, 4, 5, 2, 6 — budget 8
    // cum_before:   0, 3, 7, 12, 14 → shards 0, 0, 0, 1, 1
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i j k l"),
      (4L, "m n"), (5L, "o p q r s t"))
      .toDF("doc_id", "text")
    val got = graft.operators.TrainingPipeline.packShards(docs, budgetTokens = 8L,
        numPartitions = Some(3))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 0L), (2L, 4L, 0L), (3L, 5L, 0L), (4L, 2L, 1L), (5L, 6L, 1L)))

    // distributed prefix sum == single-partition window cumulative sum
    // on the real corpus, any partition count
    val real = tables.documents
    val twoPhase = graft.operators.TrainingPipeline.packShards(real, 512L,
        numPartitions = Some(7))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val window = real.select(col("doc_id"),
        size(graft.functions.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("shard_id", expr("(sum(n_tokens) over (order by doc_id rows between unbounded preceding and current row) - n_tokens) div 512"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(twoPhase == window, "two-phase prefix sum must equal the window formulation")
    assert(twoPhase.map(_._3).distinct.size > 1, "corpus spans multiple shards")
  }
  import spark.implicits._

  private lazy val docs = tables.documents

  test("curate dedups first: identical texts contribute one survivor") {
    val doubled = docs.union(docs.withColumn("doc_id", col("doc_id") + 1000000L))
    val once = TrainingPipeline.curate(docs, Seq("en", "de", "fr"), 0.5, 20L)
    val twice = TrainingPipeline.curate(doubled, Seq("en", "de", "fr"), 0.5, 20L)
    assert(once.count() == twice.count(), "exact copies must collapse before scoring")
  }

  test("filters are monotone: tighter gates keep a subset") {
    val loose = TrainingPipeline.curate(docs, Seq("en", "de", "fr"), 0.3, 10L)
      .select("doc_id").as[Long].collect().toSet
    val tight = TrainingPipeline.curate(docs, Seq("en", "de"), 0.6, 30L)
      .select("doc_id").as[Long].collect().toSet
    assert(tight.subsetOf(loose))
    assert(tight.nonEmpty && tight.size < loose.size)
  }

  test("curated rows satisfy every declared gate") {
    val rows = TrainingPipeline.curate(docs, Seq("en", "de"), 0.5, 20L)
      .select("pred_lang", "quality", "n_tokens")
      .as[(String, Double, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (l, q, n) => Set("en", "de")(l) && q >= 0.5 && n >= 20 })
  }

  test("deterministicSample is reproducible, key-consistent and roughly proportional") {
    val a = TrainingPipeline.deterministicSample(docs, "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    val b = TrainingPipeline.deterministicSample(docs.repartition(17), "doc_id", 20)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "same keys selected regardless of partitioning")
    val n = docs.count().toDouble
    assert(a.size > n * 0.10 && a.size < n * 0.30, s"~20% expected, got ${a.size}/$n")
    // monotone: a larger pct strictly contains a smaller one
    val wider = TrainingPipeline.deterministicSample(docs, "doc_id", 50)
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(wider))
    assert(TrainingPipeline.deterministicSample(docs, "doc_id", 0).count() == 0)
    assert(TrainingPipeline.deterministicSample(docs, "doc_id", 100).count() == n.toLong)
  }

  test("stratifiedSample takes exactly min(quota, stratum size) per stratum, reproducibly") {
    val quota = 10
    val sampled = TrainingPipeline.stratifiedSample(docs, "lang", "doc_id", quota)
    val perLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.keySet == sizes.keySet, "every stratum represented")
    perLang.foreach { case (l, n) => assert(n == math.min(quota.toLong, sizes(l))) }
    // partitioning-independent selection
    val a = sampled.select("doc_id").as[Long].collect().toSet
    val b = TrainingPipeline.stratifiedSample(docs.repartition(17), "lang", "doc_id", quota)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // quota monotonicity: a bigger quota strictly extends the selection
    val wider = TrainingPipeline.stratifiedSample(docs, "lang", "doc_id", quota * 3)
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(wider))
  }

  test("languageBudget aggregates per language with positive budgets") {
    val b = TrainingPipeline.languageBudget(
      TrainingPipeline.curate(docs, Seq("en", "de", "fr"), 0.5, 20L))
      .as[(String, Long, Long, Double)].collect()
    assert(b.map(_._1).sorted.toSeq == b.map(_._1).toSeq, "ordered by language")
    assert(b.forall { case (_, n, toks, q) => n > 0 && toks >= n * 20 && q >= 0.5 })
  }

  test("contaminationCheck counts shared n-grams per train doc, zero-filled") {
    import org.apache.spark.sql.functions._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // shares 4-grams with holdout
      (2L, "entirely different words in this document here"),
      (3L, "quick brown fox jumps")) // exactly one 4-gram, shared
      .toDF("doc_id", "text")
    val holdout = Seq((100L, "a quick brown fox jumps over fences daily"))
      .toDF("doc_id", "text")
    val got = TrainingPipeline.contaminationCheck(train, holdout, n = 4)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    // holdout 4-grams include "quick brown fox jumps", "brown fox jumps over"
    assert(got == Seq((1L, 2L, true), (2L, 0L, false), (3L, 1L, true)))
    // every train row appears exactly once, even when clean
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    // the holdout side reduces to distinct shingles before the join
    val plan = TrainingPipeline.contaminationCheck(train, holdout, n = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "containment must stay an equi-join")
  }

  test("mixtureSample: per-stratum counts hit floor(share * binding ntot) exactly") {
    val shares = Map("en" -> 0.40, "de" -> 0.15, "es" -> 0.15,
      "fr" -> 0.15, "zh" -> 0.15)
    val got = TrainingPipeline.mixtureSample(docs, "lang", "doc_id", shares)
    val byLang = got.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // independent quota computation
    val counts = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val ntot = shares.collect { case (l, s) if counts.contains(l) => counts(l) / s }.min
    shares.foreach { case (l, s) =>
      val want = math.floor(s * ntot).toLong
      assert(byLang.getOrElse(l, 0L) == want, s"lang $l: ${byLang.get(l)} vs $want")
    }
    // the binding stratum is taken (nearly) whole; every quota is feasible
    shares.foreach { case (l, s) =>
      assert(byLang.getOrElse(l, 0L) <= counts.getOrElse(l, 0L))
    }
  }

  test("mixtureSample: deterministic draw, and a prefix of the stratified order") {
    val shares = Map("en" -> 0.5, "zh" -> 0.5)
    val a = TrainingPipeline.mixtureSample(docs, "lang", "doc_id", shares)
      .select("doc_id").as[Long].collect().toSet
    val b = TrainingPipeline.mixtureSample(docs.repartition(13), "lang", "doc_id", shares)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "selection must not depend on partitioning")
    // same md5 order as stratifiedSample: the mixture draw per stratum is
    // a prefix of a big-enough fixed-quota stratified draw
    val strat = TrainingPipeline.stratifiedSample(
        docs.filter(col("lang").isin("en", "zh")), "lang", "doc_id", quota = 10000)
      .select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(strat))
  }

  test("weightedSample: deterministic, exactly k, partitioning-independent") {
    val a = TrainingPipeline.weightedSample(docs, "doc_id", "n_chars", k = 40)
      .select("doc_id").as[Long].collect().toSet
    val b = TrainingPipeline.weightedSample(docs.repartition(17), "doc_id", "n_chars", k = 40)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.size == 40)
  }

  test("weightedSample: heavy weights dominate the draw") {
    val rows = (1L to 100L).map(i => (i, 10000L)) ++ (101L to 200L).map(i => (i, 1L))
    val df = rows.toDF("doc_id", "w")
    val got = TrainingPipeline.weightedSample(df, "doc_id", "w", k = 50)
      .select("doc_id").as[Long].collect()
    val heavy = got.count(_ <= 100L)
    // weight ratio 10^4: a light row wins only on an extreme uniform draw
    assert(heavy >= 45, s"only $heavy of 50 came from the heavy stratum")
  }

  test("weightedSample: non-positive weights fail loudly, not skew the draw") {
    val df = Seq((1L, 10L), (2L, -1L), (3L, 5L)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      TrainingPipeline.weightedSample(df, "doc_id", "w", k = 2).collect()
    }
    assert(e.toString.contains("non-positive") ||
      Option(e.getCause).exists(_.toString.contains("non-positive")),
      s"expected the raise_error message, got $e")
  }

  test("mixtureSample: strata without a target share are dropped") {
    val got = TrainingPipeline.mixtureSample(docs, "lang", "doc_id", Map("en" -> 1.0))
    assert(got.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
    // share 1.0 with only en targeted → the entire en stratum survives
    assert(got.count() == docs.filter(col("lang") === "en").count())
  }

  test("negativeSample: k per anchor, no self-draws, partitioning-invariant") {
    val corpus = (1L to 200L).toDF("doc_id")
    val anchors = corpus.filter(col("doc_id") % 20 === 0)
    def draw(parts: Int) = TrainingPipeline.negativeSample(
        corpus.repartition(parts), "doc_id", anchors, k = 4, buckets = 4)
      .select("anchor_id", "neg_id", "neg_rank")
      .as[(Long, Long, Int)].collect().toSet
    val got = draw(7)
    // 10 anchors × 4 negatives, a fresh rank 1..4 per anchor, never self.
    assert(got.size == 40)
    assert(got.groupBy(_._1).forall { case (_, s) => s.map(_._3).toSet == Set(1, 2, 3, 4) })
    assert(got.forall { case (a, n, _) => a != n })
    // Bit-identical under a different partitioning (md5 discipline).
    assert(draw(2) == got)
    // All draws come from the anchor's single target bucket.
    val bucketOf = (id: Long) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16) % 4
    }
    assert(got.groupBy(_._1).forall { case (_, s) =>
      s.map(x => bucketOf(x._2)).size == 1 })
  }

  test("groupSplit: every group lands in exactly one split") {
    val ev = tables.events
    val labeled = TrainingPipeline.groupSplit(ev, "user_id", 80, 10)
    // no user straddles splits
    val perUser = labeled.select("user_id", "split").distinct()
      .groupBy("user_id").count()
    assert(perUser.filter(col("count") > 1).count() == 0)
    // rows conserved; only valid labels; train populated (the sf0.01
    // oracle entry gs01 covers the fully-populated 3-way case — at
    // this spec's tiny SF the 10 %-wide val bucket can be empty)
    val bySplit = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.contains("train"))
    assert(bySplit.values.sum == ev.count())
  }

  test("groupSplit: assignment is a pure function of the key (no shuffle)") {
    val ev = tables.events
    val plan = TrainingPipeline.groupSplit(ev, "user_id", 80, 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"groupSplit must not shuffle:\n$plan")
    // same key ⇒ same split under a different partitioning
    val a = TrainingPipeline.groupSplit(ev, "user_id", 80, 10)
      .select("user_id", "split").distinct().collect().toSet
    val b = TrainingPipeline.groupSplit(ev.repartition(7), "user_id", 80, 10)
      .select("user_id", "split").distinct().collect().toSet
    assert(a == b)
  }

  test("groupSplit guards: percentage bounds") {
    val df = Seq((1L, "x")).toDF("user_id", "v")
    intercept[IllegalArgumentException](TrainingPipeline.groupSplit(df, "user_id", 90, 20))
    intercept[IllegalArgumentException](TrainingPipeline.groupSplit(df, "user_id", -1, 5))
  }
}
