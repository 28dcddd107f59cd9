package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-string (fuzzy) self-join via the sorted-neighborhood
  * method: rows are globally ordered by the string, and only pairs
  * within `window` positions of each other are compared — the classic
  * entity-resolution blocking that turns an O(N²) all-pairs edit
  * distance into O(N·window) comparisons.
  *
  * Composed entirely from the engine's existing scale primitives:
  * [[GlobalRank.withGlobalRowNumber]] assigns the global order in two
  * phases (no single-partition window), and the neighbor join is the
  * [[RangeJoin]] banding trick — each left row lands in 2 rank-buckets
  * of width `window`, the join is a plain EQUI-join on the bucket, and
  * the exact `0 < rn_b - rn_a <= window` band plus the levenshtein
  * verify run as post-join filters. No all-pairs stage exists at any
  * scale; cost is N·window candidate pairs, shuffle-parallel on the
  * bucket key.
  *
  * Like all sorted-neighborhood blocking this trades recall for
  * scale: only near-neighbors IN SORT ORDER are compared. Measured on
  * the sf0.01 part names (round 14, NOTES.md): the full all-pairs
  * truth at distance <= 2 holds 53,011 pairs, the window-3 single pass
  * finds 5,616 (10.6 %) and a reverse-key second pass adds only 96 —
  * on a domain where edit-similar strings are NOT prefix-similar,
  * no small number of sort keys recovers sort-distant pairs. The
  * operator's verifiable contract is therefore exactly "pairs within
  * `window` sort positions" (what the oracle checks); corpora whose
  * similarity is not sort-local belong on the q-gram/LSH blocking
  * family instead ([[TextDedup]] dd02/dd03 — shared-token equi-joins
  * whose candidates don't depend on a global order).
  */
object FuzzyJoin {

  /** @return (id_a, id_b, s_a, s_b, dist) for pairs within `window`
    *         sort positions and edit distance <= maxDistance;
    *         id_a sorts strictly before id_b in (str, id) order */
  def sortedNeighborhood(df: DataFrame, idCol: String, strCol: String,
                         window: Int = 3, maxDistance: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    // The ranked frame feeds both join sides; materialize it once (the
    // two-phase rank involves a driver offset collect — paying it twice
    // would double the dominant cost).
    TextDedup.withWorkingSet(
      GlobalRank.withGlobalRowNumber(
        df.select(col(idCol), col(strCol)),
        Seq(col(strCol), col(idCol)), outCol = "__rn")) { ranked =>
      val a = ranked.select(
        col(idCol).as("id_a"), col(strCol).as("s_a"), col("__rn").as("__rn_a"),
        explode(array(floor(col("__rn") / window),
          floor(col("__rn") / window) + 1)).as("__g"))
      val b = ranked.select(
        col(idCol).as("id_b"), col(strCol).as("s_b"), col("__rn").as("__rn_b"),
        floor(col("__rn") / window).as("__g"))
      a.join(b, "__g")
        .filter(col("__rn_b") > col("__rn_a") &&
          col("__rn_b") <= col("__rn_a") + window)
        .filter(levenshtein(col("s_a"), col("s_b")) <= maxDistance)
        .select(col("id_a"), col("id_b"), col("s_a"), col("s_b"),
          levenshtein(col("s_a"), col("s_b")).as("dist"))
    }
  }
}
