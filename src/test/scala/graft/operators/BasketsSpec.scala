package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BasketsSpec extends SparkSpec {
  import spark.implicits._

  test("counts pair support with set semantics, hand-computed") {
    val b = Seq(
      (1L, "milk"), (1L, "bread"), (1L, "milk"), // dup collapses
      (2L, "milk"), (2L, "bread"), (2L, "eggs"),
      (3L, "milk"), (3L, "eggs"),
      (4L, "bread")).toDF("basket_id", "item")
    val got = Baskets.frequentPairs(b, minSupport = 2)
      .as[(String, String, Long)].collect().toSet
    // (bread,milk) in baskets 1,2 → 2; (eggs,milk) in 2,3 → 2;
    // (bread,eggs) only in 2 → pruned
    assert(got == Set(("bread", "milk", 2L), ("eggs", "milk", 2L)))
  }

  test("Apriori prune: infrequent items never reach the pairing join") {
    // item 'rare' appears once; with minSupport=2 it must be dropped
    // before pairing — verified via the plan (the semi join) AND output
    val b = Seq((1L, "a"), (1L, "rare"), (2L, "a"), (2L, "b"), (3L, "a"), (3L, "b"))
      .toDF("basket_id", "item")
    val df = Baskets.frequentPairs(b, minSupport = 2)
    assert(df.as[(String, String, Long)].collect().toSet == Set(("a", "b", 2L)))
    // the plan gate needs lazy mode: eager working sets materialize to
    // an RDD scan and hide the upstream operators
    spark.conf.set("spark.graft.dedup.materialize", "none")
    try {
      val plan = Baskets.frequentPairs(b, minSupport = 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"),
        s"expected the item-support semi join in the plan:\n$plan")
    } finally spark.conf.set("spark.graft.dedup.materialize", "local")
  }

  test("matches brute force on the real lineitem baskets") {
    val baskets = tables.lineitem.select(
      col("l_orderkey").as("basket_id"), col("l_partkey").as("item"))
    val got = Baskets.frequentPairs(baskets, minSupport = 2)
      .as[(Long, Long, Long)].collect().toSet
    val b = baskets.distinct()
    val brute = b.select(col("basket_id"), col("item").as("ia"))
      .join(b.select(col("basket_id"), col("item").as("ib")), "basket_id")
      .filter(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("s"))
      .filter(col("s") >= 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute && brute.nonEmpty)
  }

  test("guards: minSupport and maxBasketWidth validated") {
    val b = Seq((1L, "a")).toDF("basket_id", "item")
    intercept[IllegalArgumentException](Baskets.frequentPairs(b, 0))
    intercept[IllegalArgumentException](Baskets.associationRules(b, 0))
    intercept[IllegalArgumentException](
      Baskets.frequentPairs(b, 2, maxBasketWidth = 1))
  }

  test("width cap: a giant basket raise_errors, names the basket") {
    // basket 99 holds 6 frequent items (all frequent at minSupport=1);
    // a cap of 5 must fail LOUDLY — the pair self-join is quadratic in
    // basket width and a silent giant basket is the one
    // adversarial-data scale-killer in this family.
    val giant = ((1 to 6).map(i => (99L, s"i$i")) :+ ((1L, "i1")))
      .toDF("basket_id", "item")
    val e = intercept[Exception](
      Baskets.frequentPairs(giant, minSupport = 1, maxBasketWidth = 5).count())
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("maxBasketWidth=5") && msg.contains("99"),
      s"expected a loud width-cap error naming basket 99, got: $msg")
    // all three entry points share the guard
    intercept[Exception](
      Baskets.associationRules(giant, 1, maxBasketWidth = 5).count())
    intercept[Exception](
      Baskets.itemNeighbors(giant, 1, k = 3, maxBasketWidth = 5).count())
    // at cap >= width the same input passes and C(6,2)=15 pairs survive
    assert(Baskets.frequentPairs(giant, 1, maxBasketWidth = 6).count() == 15L)
  }

  test("width cap measures the POST-PRUNE basket, not the raw one") {
    // basket 50 holds 10 raw items but only 2 frequent ones — a cap of
    // 2 must pass because infrequent items are pruned before pairing
    val b = ((1 to 10).map(i => (50L, s"x$i")) ++
      Seq((50L, "a"), (50L, "b"), (2L, "a"), (2L, "b")))
      .toDF("basket_id", "item")
    val got = Baskets.frequentPairs(b, minSupport = 2, maxBasketWidth = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L)))
  }

  test("associationRules: hand-checked confidence and lift, both directions") {
    // 4 baskets: {a,b}, {a,b}, {a}, {c} → pair (a,b): n_pair=2,
    // n_a=3, n_b=2, n_baskets=4.
    val b = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"), (4L, "c"))
      .toDF("basket_id", "item")
    val got = Baskets.associationRules(b, minSupport = 2)
      .orderBy("antecedent")
      .as[(String, String, Long, Long, Long, Double, Double)].collect().toSeq
    // conf(a→b) = 2/3, conf(b→a) = 1.0; lift = 2*4/(3*2) = 4/3 both ways
    assert(got == Seq(
      ("a", "b", 2L, 3L, 2L, 0.666667, 1.333333),
      ("b", "a", 2L, 2L, 3L, 1.0, 1.333333)))
  }

  test("itemNeighbors: hand-checked cosine and top-k cut") {
    // baskets: {a,b} x2, {a,c}, {a}: n_a=4, n_b=2, n_c=1 (c pruned at
    // minSupport 2). pair (a,b): n_ab=2 → sim = 2/sqrt(8)
    val b = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a"),
      (3L, "c"), (4L, "a")).toDF("basket_id", "item")
    val got = Baskets.itemNeighbors(b, minSupport = 2, k = 3)
      .orderBy("item", "rk")
      .as[(String, String, Long, Double, Long)].collect().toSeq
    val sim = math.floor(2.0 / math.sqrt(8.0) * 1e6 + 0.5) / 1e6
    assert(got == Seq(("a", "b", 2L, sim, 1L), ("b", "a", 2L, sim, 1L)))
  }

  test("itemNeighbors: k caps the neighbor list per item") {
    val baskets = tables.lineitem.select(
      col("l_orderkey").as("basket_id"), col("l_partkey").as("item"))
    val got = Baskets.itemNeighbors(baskets, minSupport = 2, k = 2)
    assert(got.groupBy("item").count()
      .filter(col("count") > 2).count() == 0)
    assert(got.filter(col("rk") > 2).count() == 0 && got.count() > 0)
  }

  test("plan gate: support tables broadcast; no Cartesian or single-partition stage") {
    // r15 verdict #6: ar01/rec01's scaladoc claims as plan assertions —
    // the item-support side broadcasts into BOTH scoring joins, the
    // pair stage is a real basket-keyed equi-join, and neither the
    // width-guard window (basket-keyed) nor the top-k window
    // (item-keyed) collapses to a single partition.
    val baskets = tables.lineitem.select(
      col("l_orderkey").as("basket_id"), col("l_partkey").as("item"))
    spark.conf.set(TextDedup.MaterializeConf, "none")
    try {
      for (df <- Seq(Baskets.associationRules(baskets, minSupport = 2),
                     Baskets.itemNeighbors(baskets, minSupport = 2, k = 3))) {
        df.collect()
        val plan = graft.PlanSig.finalPlanText(df)
        assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
          s"item-support joins must broadcast:\n${plan.take(1500)}")
        assert(!plan.contains("CartesianProduct"),
          s"no unbounded Cartesian:\n${plan.take(1500)}")
        assert(!plan.contains("Exchange SinglePartition"),
          s"no single-partition stage:\n${plan.take(1500)}")
      }
    } finally spark.conf.set(TextDedup.MaterializeConf, "local")
  }

  test("associationRules: rule count is exactly 2x the frequent pairs") {
    val baskets = tables.lineitem.select(
      col("l_orderkey").as("basket_id"), col("l_partkey").as("item"))
    val nPairs = Baskets.frequentPairs(baskets, minSupport = 2).count()
    val rules = Baskets.associationRules(baskets, minSupport = 2)
    assert(rules.count() == 2 * nPairs && nPairs > 0)
    // lift is direction-symmetric; confidence generally is not
    val sym = rules.filter(col("antecedent") < col("consequent"))
      .select(col("antecedent"), col("consequent"), col("lift")).as[(Long, Long, Double)]
      .collect().toSet
    val rev = rules.filter(col("antecedent") > col("consequent"))
      .select(col("consequent"), col("antecedent"), col("lift")).as[(Long, Long, Double)]
      .collect().toSet
    assert(sym == rev)
  }
}
