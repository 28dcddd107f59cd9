package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — frequent item PAIRS with
  * support pruning (the 2-itemset level of Apriori, which is where
  * almost all practical basket analysis stops: "customers who bought X
  * also bought Y" tables, co-view graphs, complement detection).
  *
  * Scale shape, in pruning order:
  *  1. basket de-dup (an item twice in a basket is one occurrence —
  *     set semantics, the standard support definition);
  *  2. ITEM support first, and items below `minSupport` are dropped
  *     BEFORE any pairing — the Apriori monotonicity lever (a pair's
  *     support cannot exceed either item's), which is what keeps the
  *     within-basket self-join sized by frequent items only;
  *  3. the pairing is a basket-keyed self-join (C(k,2) pairs per
  *     basket of k frequent items — quadratic in basket WIDTH, the
  *     skew axis: one pathological giant basket of 10^6 frequent
  *     items would emit ~5*10^11 pair rows from a single join key.
  *     That axis is ENFORCED, not just documented: every entry point
  *     takes `maxBasketWidth` and raise_errors per offending basket
  *     (the qgramJoin loud-precondition discipline,
  *     FuzzyJoin.qgramJoin) — the check is a count over a
  *     basket-partitioned window, so it rides the exact same
  *     hashpartitioning(basket_id) exchange the self-join needs
  *     anyway (no extra scan, no extra shuffle);
  *  4. one (item_a, item_b) hash aggregate + the support filter.
  *
  * Everything is exact integer counting; nothing collects.
  */
object Baskets {

  /** Default width cap: C(4096,2) ~ 8.4M pairs from one basket — large
    * enough for any organic basket, small enough that one bad key
    * cannot become a straggler. Callers with genuinely wider baskets
    * must truncate upstream (e.g. top-w items by support) and say so. */
  val DefaultMaxBasketWidth: Int = 4096

  /** Shared pruned-pair stage: set-semantics baskets -> item-support
    * prune -> width guard -> basket-keyed self-join -> pair support.
    * Returns (itemSupp, pairSupp) under a shared working set so the
    * basket scan happens once per caller. */
  private def withPrunedPairs(baskets: DataFrame, minSupport: Long,
                              maxBasketWidth: Int)(
      f: (DataFrame, DataFrame, DataFrame) => DataFrame): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxBasketWidth >= 2,
      s"maxBasketWidth must be >= 2 (a pair needs two items), got $maxBasketWidth")
    val b = baskets.select(col("basket_id"), col("item")).distinct()
    TextDedup.withWorkingSet(b) { bs =>
      val itemSupp = bs.groupBy("item").agg(count(lit(1)).as("n_item"))
      val keptRaw = bs.join(
        itemSupp.filter(col("n_item") >= minSupport).select("item"),
        Seq("item"), "left_semi")
      // Width guard on the POST-PRUNE basket (the width that actually
      // drives C(k,2)): a count over the basket-partitioned window,
      // which hash-partitions on basket_id — the very partitioning the
      // self-join below consumes, so the guard costs a sort within the
      // shuffle the join pays for regardless. raise_error names the
      // offending basket so the fix (truncate upstream) is actionable.
      val wB = Window.partitionBy("basket_id")
      val guarded = keptRaw
        .withColumn("__w", count(lit(1)).over(wB))
        .withColumn("item",
          when(col("__w") > maxBasketWidth, raise_error(concat(
            lit(s"Baskets: basket '"), col("basket_id").cast("string"),
            lit(s"' has "), col("__w").cast("string"),
            lit(s" frequent items, over maxBasketWidth=$maxBasketWidth; " +
              "the pair self-join is quadratic in basket width — " +
              "truncate giant baskets upstream (e.g. top-w by support) " +
              "or raise the cap deliberately"))))
            .otherwise(col("item")))
        .select("basket_id", "item")
      // Nested working set: the guarded frame feeds BOTH sides of the
      // self-join — materializing it runs the prune + width check once
      // instead of once per side (measured: the unmaterialized form
      // cost rec01 ~1.26x at sf0.1).
      TextDedup.withWorkingSet(guarded) { kept =>
        val pairSupp = kept.select(col("basket_id"), col("item").as("item_a"))
          .join(kept.select(col("basket_id"), col("item").as("item_b")), "basket_id")
          .filter(col("item_a") < col("item_b"))
          .groupBy("item_a", "item_b")
          .agg(count(lit(1)).as("n_pair"))
          .filter(col("n_pair") >= minSupport)
        f(bs, itemSupp, pairSupp)
      }
    }
  }

  /** @param baskets (basket_id, item) rows, duplicates tolerated
    * @return (item_a, item_b, support) with item_a < item_b and
    *         support >= minSupport */
  def frequentPairs(baskets: DataFrame, minSupport: Long,
                    maxBasketWidth: Int = DefaultMaxBasketWidth): DataFrame =
    withPrunedPairs(baskets, minSupport, maxBasketWidth) { (_, _, pairSupp) =>
      pairSupp.select(col("item_a"), col("item_b"), col("n_pair").as("support"))
    }

  /** Association rules from the frequent pairs: both directions of
    * every surviving pair, scored with the three standard measures —
    * confidence = P(consequent | antecedent), lift =
    * P(both) / (P(ant)·P(cons)) — plus the raw counts so thresholds
    * stay re-derivable downstream.
    *
    * Scale shape: [[frequentPairs]]' pruning does the heavy lifting;
    * the scoring adds two item-keyed joins against the item-support
    * table (bounded by frequent-item cardinality — AQE broadcasts it)
    * and a 1-row basket total that rides along as a literal. Both
    * ratios are a SINGLE IEEE division over exact integer counts
    * (products < 2^53 by the support bounds), then 6-dp fixed — the
    * deterministic-double discipline of tc01's gcc.
    *
    * @return (antecedent, consequent, n_pair, n_ant, n_cons,
    *         confidence, lift) for pairs at `minSupport`, both
    *         directions */
  def associationRules(baskets: DataFrame, minSupport: Long,
                       maxBasketWidth: Int = DefaultMaxBasketWidth): DataFrame =
    withPrunedPairs(baskets, minSupport, maxBasketWidth) { (bs, itemSupp, pairSupp) =>
      val nBaskets = bs.select("basket_id").distinct().count() // 1 scalar
      val rules = pairSupp
        .select(col("item_a").as("antecedent"), col("item_b").as("consequent"),
          col("n_pair"))
        .unionAll(pairSupp.select(col("item_b"), col("item_a"), col("n_pair")))
      rules
        .join(itemSupp.select(col("item").as("antecedent"),
          col("n_item").as("n_ant")), Seq("antecedent"))
        .join(itemSupp.select(col("item").as("consequent"),
          col("n_item").as("n_cons")), Seq("consequent"))
        .select(col("antecedent"), col("consequent"), col("n_pair"),
          col("n_ant"), col("n_cons"),
          graft.functions.roundFp(
            col("n_pair").cast("double") / col("n_ant").cast("double"), 6)
            .as("confidence"),
          graft.functions.roundFp(
            (col("n_pair") * lit(nBaskets)).cast("double") /
              (col("n_ant") * col("n_cons")).cast("double"), 6)
            .as("lift"))
    }

  /** Item-item collaborative filtering ("customers who bought X also
    * bought Y"): per item, the top-`k` most similar items by the
    * cosine of their binary basket vectors,
    * sim(a,b) = n_ab / √(n_a·n_b). Exactness across engines: the
    * integer product is exact (< 2^53 by the support bounds), IEEE
    * `sqrt` is CORRECTLY ROUNDED by the standard — unlike ln/exp it
    * needs no micro-flooring — and the one division after it is too,
    * so the similarity is bit-identical everywhere; 6-dp fixed for
    * the house style, rank ties broken by neighbor id.
    *
    * Scale shape: [[frequentPairs]]' Apriori-pruned pair aggregate
    * does the heavy lifting; top-k is a window PARTITIONED per item
    * (rows per item bounded by that item's co-occurrence degree).
    *
    * @return (item, neighbor, n_pair, sim, rk) with rk <= k */
  def itemNeighbors(baskets: DataFrame, minSupport: Long, k: Int,
                    maxBasketWidth: Int = DefaultMaxBasketWidth): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    withPrunedPairs(baskets, minSupport, maxBasketWidth) { (_, itemSupp, pairSupp) =>
      val directed = pairSupp
        .select(col("item_a").as("item"), col("item_b").as("neighbor"), col("n_pair"))
        .unionAll(pairSupp.select(col("item_b"), col("item_a"), col("n_pair")))
      val scored = directed
        .join(itemSupp.select(col("item"), col("n_item").as("n_a")), Seq("item"))
        .join(itemSupp.select(col("item").as("neighbor"), col("n_item").as("n_b")),
          Seq("neighbor"))
        .select(col("item"), col("neighbor"), col("n_pair"),
          graft.functions.roundFp(
            col("n_pair").cast("double") / sqrt((col("n_a") * col("n_b")).cast("double")),
            6).as("sim"))
      val w = Window.partitionBy("item").orderBy(col("sim").desc, col("neighbor"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
    }
  }
}
