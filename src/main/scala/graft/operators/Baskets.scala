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
}
