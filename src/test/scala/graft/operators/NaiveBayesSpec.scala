package graft.operators

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("trainAndClassify separates a trivially separable corpus") {
    // two classes with disjoint vocabularies → resubstitution is perfect
    val docs = Seq(
      (1L, "cat cat dog", "pets"), (2L, "dog cat", "pets"),
      (3L, "tax ledger audit", "fin"), (4L, "audit tax", "fin"))
      .toDF("doc_id", "text", "lang")
    val got = NaiveBayes.trainAndClassify(docs, "text", "lang")
      .orderBy("doc_id")
      .as[(Long, String, Long, String, Boolean)].collect().toSeq
    assert(got.map(_._2) == Seq("pets", "pets", "fin", "fin"))
    assert(got.forall(_._5))
    assert(got.forall(_._3 < 0)) // log-probs: micro-nat scores are negative
  }

  test("hand-checked micro-nat score of a one-token doc") {
    // corpus: class a = "x x", class b = "y". V=2.
    // score(doc1='x x', class a) = 2*floor(1e6*ln((2+1)/(2+2))+.5) + prior
    val docs = Seq((1L, "x x", "a"), (2L, "y", "b")).toDF("doc_id", "text", "lang")
    val got = NaiveBayes.trainAndClassify(docs, "text", "lang")
      .orderBy("doc_id").as[(Long, String, Long, String, Boolean)].collect()
    def mn(x: Double) = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val expected1 = 2 * mn(3.0 / 4.0) + mn(1.0 / 2.0)
    assert(got(0)._3 == expected1)
    val expected2 = mn(2.0 / 3.0) + mn(1.0 / 2.0) // y in b: (1+1)/(1+2)
    assert(got(1)._3 == expected2)
    assert(got.forall(_._5))
  }

  test("argmax tie breaks by class asc (deterministic)") {
    // symmetric corpus: doc 'z' unseen in both classes → equal scores
    val docs = Seq((1L, "x", "b"), (2L, "x", "a"), (3L, "z q", "b"), (4L, "z q", "a"))
      .toDF("doc_id", "text", "lang")
    val got = NaiveBayes.trainAndClassify(docs, "text", "lang")
      .orderBy("doc_id").as[(Long, String, Long, String, Boolean)].collect()
    // docs 1/2 identical text, symmetric counts → both predict class "a"
    assert(got(0)._2 == got(1)._2)
  }

  test("every doc with tokens gets exactly one prediction on testdata") {
    val docs = tables.documents
    val got = NaiveBayes.trainAndClassify(docs, "text", "lang")
    assert(got.count() == docs.count())
    assert(got.select("doc_id").distinct().count() == docs.count())
  }

  test("plan gate: scoring tables broadcast, no single-partition stage") {
    // r15 verdict #6: the scaladoc's scale claims as plan assertions —
    // classes ride a broadcast nested-loop cross (bounded |classes|),
    // classTot + priors are EXPLICIT broadcasts, and nothing collapses
    // to one partition (the argmax window is doc-keyed). Lazy mode so
    // the working set does not hide the upstream operators.
    spark.conf.set(TextDedup.MaterializeConf, "none")
    try {
      val df = NaiveBayes.trainAndClassify(tables.documents, "text", "lang")
      df.collect()
      val plan = graft.PlanSig.finalPlanText(df)
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"classes must broadcast into the token cross:\n${plan.take(1500)}")
      assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
        s"classTot and priors must stay broadcast:\n${plan.take(1500)}")
      assert(!plan.contains("Exchange SinglePartition"),
        s"no single-partition stage:\n${plan.take(1500)}")
      assert(!plan.contains("CartesianProduct"),
        s"no unbounded Cartesian:\n${plan.take(1500)}")
    } finally spark.conf.set(TextDedup.MaterializeConf, "local")
  }
}
