package graft.operators

import org.apache.spark.sql.DataFrame
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
  *     basket of k frequent items — bounded by basket width, the
  *     documented skew axis: a pathological giant basket contributes
  *     quadratically, cap upstream if baskets are unbounded);
  *  4. one (item_a, item_b) hash aggregate + the support filter.
  *
  * Everything is exact integer counting; nothing collects.
  *
  * @param baskets (basket_id, item) rows, duplicates tolerated
  * @return (item_a, item_b, support) with item_a < item_b and
  *         support >= minSupport
  */
object Baskets {

  def frequentPairs(baskets: DataFrame, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val b = baskets.select(col("basket_id"), col("item")).distinct()
    TextDedup.withWorkingSet(b) { bs =>
      val frequentItems = bs.groupBy("item")
        .agg(count(lit(1)).as("__s"))
        .filter(col("__s") >= minSupport)
        .select("item")
      val kept = bs.join(frequentItems, Seq("item"), "left_semi")
      kept.select(col("basket_id"), col("item").as("item_a"))
        .join(kept.select(col("basket_id"), col("item").as("item_b")), "basket_id")
        .filter(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
    }
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
  def associationRules(baskets: DataFrame, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val b = baskets.select(col("basket_id"), col("item")).distinct()
    TextDedup.withWorkingSet(b) { bs =>
      val nBaskets = bs.select("basket_id").distinct().count() // 1 scalar
      val itemSupp = bs.groupBy("item").agg(count(lit(1)).as("n_item"))
      val kept = bs.join(
        itemSupp.filter(col("n_item") >= minSupport).select("item"),
        Seq("item"), "left_semi")
      val pairSupp = kept.select(col("basket_id"), col("item").as("item_a"))
        .join(kept.select(col("basket_id"), col("item").as("item_b")), "basket_id")
        .filter(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= minSupport)
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
  def itemNeighbors(baskets: DataFrame, minSupport: Long, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val b = baskets.select(col("basket_id"), col("item")).distinct()
    TextDedup.withWorkingSet(b) { bs =>
      val itemSupp = bs.groupBy("item").agg(count(lit(1)).as("n_item"))
      val kept = bs.join(
        itemSupp.filter(col("n_item") >= minSupport).select("item"),
        Seq("item"), "left_semi")
      val pairSupp = kept.select(col("basket_id"), col("item").as("item_a"))
        .join(kept.select(col("basket_id"), col("item").as("item_b")), "basket_id")
        .filter(col("item_a") < col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= minSupport)
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
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("item").orderBy(col("sim").desc, col("neighbor"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
    }
  }
}
