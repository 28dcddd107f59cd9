package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.roundFp

/** Rank-fusion layer over the retrieval family — the glue between the
  * lexical rankers ([[InvertedIndex.searchIndexedBm25]], ir01/ir04) and
  * the vector rankers ([[Similarity]]/[[IvfIndex]], q26): hybrid search
  * as every RAG stack runs it.
  */
object Retrieval {

  /** Reciprocal-rank fusion (RRF): fuse N ranked lists of the same
    * document space into one score,
    * `rrf(d) = Σ_lists 1/(k + rank_i(d))`, contributions summed in
    * LIST ORDER (never an order-dependent aggregate — the house FP
    * discipline) and absent-from-list contributing 0 (the standard
    * formulation; k=60 the published default). RRF needs only ranks,
    * so incomparable score scales (BM25 vs cosine) fuse without
    * calibration — which is exactly why it is the hybrid-search
    * default.
    *
    * Ranks are dense 1-based positions by (score DESC, doc_id) —
    * the doc_id tiebreak plus bit-reproducible upstream scores (the
    * oracle-parity invariants) make ranks, and therefore the fusion,
    * cross-engine deterministic.
    *
    * Scale shape: each list ranks via the two-phase [[GlobalRank]]
    * (range repartition + per-partition offsets — no single-partition
    * window), then N-1 doc-keyed full-outer joins sized by the UNION
    * of the lists (candidate lists, not the corpus). Nothing collects.
    *
    * @param rankings 2..8 frames of (doc_id, score); a doc may appear
    *                 in any subset of them
    * @return (doc_id, rank_0..rank_{n-1}, rrf) — ranks null where the
    *         doc is absent from that list, rrf rounded to 6
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(rankings.size >= 2 && rankings.size <= 8,
      s"rrfFuse fuses 2..8 rankings, got ${rankings.size}")
    require(k >= 1, s"k must be >= 1, got $k")
    val ranked = rankings.zipWithIndex.map { case (df, i) =>
      GlobalRank.withGlobalRowNumber(
        df.select(col("doc_id"), col("score")),
        Seq(col("score").desc, col("doc_id")), outCol = s"rank_$i")
        .select(col("doc_id"), col(s"rank_$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
    val contrib = rankings.indices.map(i =>
      coalesce(lit(1.0) / (lit(k.toLong) + col(s"rank_$i")), lit(0.0)))
    joined.select(
      (col("doc_id") +: rankings.indices.map(i => col(s"rank_$i"))) :+
        roundFp(contrib.reduce(_ + _), 6).as("rrf"): _*)
  }

  /** Exact phrase search: documents containing the phrase terms at
    * CONSECUTIVE token positions, with the occurrence count (counting
    * overlapping matches — "a a a" contains "a a" twice). The
    * positional-intersection algorithm of an IR phrase query, run as
    * per-term position-list equi-joins.
    *
    * Scale shape: positions come from one tokenize pass (the
    * [[graft.functions.tokens]] convention — same term universe as
    * the inverted index family); each phrase term's position list is
    * filtered out BEFORE its join (the n-1 joins are sized by posting
    * lists, never the corpus), and every join is a (doc_id, pos)
    * equi-join after shifting the k-th term's positions by −k — the
    * standard consecutive-position alignment.
    *
    * @param phrase 2+ lowercase terms (the tokens() normal form)
    * @return (doc_id, n_matches) for documents with >= 1 occurrence */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2,
      "phrase needs >= 2 terms (a single term is a plain posting lookup)")
    require(phrase.forall(t => t.nonEmpty && t == t.toLowerCase),
      "phrase terms must be non-empty lowercase (the tokens() normal form)")
    val pos = docs.select(col("doc_id"),
      posexplode(graft.functions.tokens(col("text"))).as(Seq("pos", "term")))
    val first = pos.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos"))
    val aligned = phrase.tail.zipWithIndex.foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(
          pos.filter(col("term") === t)
            .select(col("doc_id"), (col("pos") - (i + 1)).as("pos")),
          Seq("doc_id", "pos"))
    }
    aligned.groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
  }
}
