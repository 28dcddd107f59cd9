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
  *  3. pairing rides ONE basket-keyed aggregate: each basket's pruned
  *     items are collected into a sorted array and the C(k,2) ordered
  *     pairs are emitted IN-ROW (posexplode + strict-suffix slice) —
  *     quadratic in basket WIDTH, the skew axis: one pathological
  *     giant basket of 10^6 frequent items would emit ~5*10^11 pair
  *     rows. That axis is ENFORCED, not just documented: every entry
  *     point takes `maxBasketWidth` and raise_errors per offending
  *     basket (the qgramJoin loud-precondition discipline,
  *     FuzzyJoin.qgramJoin) — the check is a size() guard on the
  *     assembled array, riding the same hashpartitioning(basket_id)
  *     exchange the collect needs anyway (no extra scan or shuffle);
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
      // Pair generation rides ONE basket-keyed shuffle: collect each
      // basket's (distinct, pruned) items into a sorted array, then
      // emit C(k,2) ordered pairs IN-ROW with generators — item_a <
      // item_b by the sort, exactly the rows the former self-join
      // produced. vs the r20 shape (width-guard window + basket-keyed
      // self-join): one Exchange instead of a window sort + join that
      // re-shuffled the kept set per side, no nested working-set
      // persist, and the width guard is a size() check on the
      // assembled array instead of a windowed count (r21 measured:
      // ar01/rec01/fp01 job count drops ~25 -> ~17). At scale the
      // quadratic axis is unchanged — C(k,2) pairs per basket, capped
      // by the same loud maxBasketWidth refusal.
      val arrs = keptRaw.groupBy("basket_id")
        .agg(sort_array(collect_list(col("item"))).as("__items"))
      val guarded = arrs.withColumn("__items",
        when(size(col("__items")) > maxBasketWidth, raise_error(concat(
          lit(s"Baskets: basket '"), col("basket_id").cast("string"),
          lit(s"' has "), size(col("__items")).cast("string"),
          lit(s" frequent items, over maxBasketWidth=$maxBasketWidth; " +
            "the pair stage is quadratic in basket width — " +
            "truncate giant baskets upstream (e.g. top-w by support) " +
            "or raise the cap deliberately"))))
          .otherwise(col("__items")))
      val pairSupp = guarded
        .select(col("__items"), posexplode(col("__items")).as(Seq("__i", "item_a")))
        // slice is 1-based: partners strictly after position __i (0-based)
        // keep item_a < item_b without a filter.
        .select(col("item_a"),
          explode(expr("slice(__items, __i + 2, size(__items) - __i - 1)")).as("item_b"))
        .groupBy("item_a", "item_b")
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= minSupport)
      f(bs, itemSupp, pairSupp)
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
      // Join the item supports BEFORE mirroring, then emit both rule
      // directions with ONE generator: the r20 unionAll-of-two-selects
      // shape evaluated the whole pairSupp subtree (the quadratic pair
      // stage) once per branch — explode over the joined row reuses a
      // single evaluation and halves the item-support joins (2, not 4).
      val rules = pairSupp
        .join(itemSupp.select(col("item").as("item_a"), col("n_item").as("na")),
          Seq("item_a"))
        .join(itemSupp.select(col("item").as("item_b"), col("n_item").as("nb")),
          Seq("item_b"))
        .select(col("n_pair"), explode(array(
          struct(col("item_a").as("antecedent"), col("item_b").as("consequent"),
            col("na").as("n_ant"), col("nb").as("n_cons")),
          struct(col("item_b").as("antecedent"), col("item_a").as("consequent"),
            col("nb").as("n_ant"), col("na").as("n_cons")))).as("__r"))
        .select(col("__r.antecedent").as("antecedent"),
          col("__r.consequent").as("consequent"), col("n_pair"),
          col("__r.n_ant").as("n_ant"), col("__r.n_cons").as("n_cons"))
      rules
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
      // Same single-evaluation mirroring as [[associationRules]]: join
      // supports once, explode both directions (sim is symmetric, so
      // it is computed BEFORE the mirror — one division per pair, not
      // two, and the quadratic pair stage is evaluated once).
      val scored = pairSupp
        .join(itemSupp.select(col("item").as("item_a"), col("n_item").as("n_a")),
          Seq("item_a"))
        .join(itemSupp.select(col("item").as("item_b"), col("n_item").as("n_b")),
          Seq("item_b"))
        .select(col("n_pair"),
          graft.functions.roundFp(
            col("n_pair").cast("double") / sqrt((col("n_a") * col("n_b")).cast("double")),
            6).as("sim"),
          explode(array(
            struct(col("item_a").as("item"), col("item_b").as("neighbor")),
            struct(col("item_b").as("item"), col("item_a").as("neighbor")))).as("__d"))
        .select(col("__d.item").as("item"), col("__d.neighbor").as("neighbor"),
          col("n_pair"), col("sim"))
      val w = Window.partitionBy("item").orderBy(col("sim").desc, col("neighbor"))
      scored.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
    }
  }
}
