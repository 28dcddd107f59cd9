package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vocabulary construction and integer encoding — the first step of any
  * text→tensor training pipeline (word-level analog of the BPE path in
  * graft.functions.BpeTokens; see reference test coverage of tokenize /
  * encode stages).
  *
  * Scale shape: the vocabulary BUILD is a term-keyed hash aggregate
  * (map-side partial combine, |vocab-candidates| keys — bounded by
  * observed vocabulary, not corpus size) followed by a top-k that
  * collects exactly k rows to the driver. The ENCODE is a pure map
  * stage: the k-entry vocab rides to every task as a broadcast map
  * literal, so at 100 TB the encode does zero shuffles — each document
  * is tokenized and id-mapped in place inside whole-stage codegen.
  */
object Vocabulary {

  /** Top-k vocabulary over whitespace-tokenized `textCol`, ranked by
    * (frequency desc, term asc) — the tie-break makes the vocabulary
    * deterministic across runs and engines. Index i in the returned
    * array is term id i+1 (id 0 is reserved for OOV).
    *
    * The k-row collect is the intended driver-side step: a vocabulary
    * is a broadcast-sized model artifact (k <= 1e6), never data-scale.
    */
  def build(docs: DataFrame, textCol: String, k: Int): Array[String] = {
    require(k > 0 && k <= 1000000,
      s"k=$k must be in (0, 1e6] — the vocabulary is collected and broadcast")
    // empties filtered (consecutive spaces / empty text): '' must never
    // enter the vocabulary or the token count — same normal form as
    // graft.functions.tokens, minus its lowercasing (ids are
    // case-sensitive here by contract, oracle-pinned)
    docs.select(explode(filter(split(col(textCol), " "), t => t =!= ""))
        .as("__term"))
      .groupBy("__term").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__term"))
      .limit(k)
      .collect().map(_.getString(0))
  }

  /** Encode `textCol` as term ids under `vocab` (id = 1-based position
    * in `vocab`, OOV → 0), entirely map-side: the vocab becomes a
    * broadcast map literal and the per-token lookup runs inside a
    * higher-order `transform` — no UDF, no shuffle, no join.
    *
    * @return (idCol, n_tokens, n_oov, encoded) where `encoded` is the
    *         comma-joined id sequence in document order */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: Array[String]): DataFrame = {
    val vmap = typedLit(vocab.zipWithIndex.map { case (t, i) => t -> (i + 1L) }.toMap)
    docs
      .select(col(idCol),
        transform(filter(split(col(textCol), " "), t => t =!= ""),
          t => coalesce(element_at(vmap, t), lit(0L))).as("__ids"))
      .select(col(idCol),
        size(col("__ids")).cast("long").as("n_tokens"),
        size(filter(col("__ids"), (i: Column) => i === 0L)).cast("long").as("n_oov"),
        array_join(col("__ids"), ",").as("encoded"))
  }
}
