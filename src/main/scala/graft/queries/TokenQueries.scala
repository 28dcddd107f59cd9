package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.{bpe_count, bpe_tokens, BpeVocab}

/** tok01 — subword (BPE) tokenization under the oracle hash gate
  * (VERDICT r8 "Next round" #6, the mm01 closed-form-fixture pattern):
  * a PINNED 12-merge vocabulary applied to fixture sentences, checked
  * token-for-token against a VALUES oracle computed by an independent
  * reimplementation of greedy BPE apply (lowest rank first, all
  * non-overlapping occurrences per round).
  *
  * The fixtures are chosen to exercise the algorithm, not just happy
  * paths: rank priority beating left-to-right order ("esther" must
  * merge (t,h) before the earlier (e,s)), dead merges (the (tok,en)
  * rank-11 merge can never fire because no (e,n) merge exists to form
  * "en"), cascading ranks (t→th→the, l→lo→low, e→es→est), and words
  * with no applicable merge at all.
  *
  * Training on the documents corpus is [[graft.functions.Bpe.train]]
  * (distributed pair counting; BpeSpec pins determinism and the
  * round-trip law) — the gate pins the APPLY side, where a vocabulary
  * can be fixed in both engines.
  */
object TokenQueries {

  /** Pinned vocab: rank = position. */
  private[graft] val PinnedMerges = IndexedSeq(
    "t" -> "h", "th" -> "e", "e" -> "r", "l" -> "o", "lo" -> "w",
    "n" -> "e", "ne" -> "w", "e" -> "s", "es" -> "t", "o" -> "k",
    "t" -> "ok", "tok" -> "en")
  private[graft] val PinnedVocab = BpeVocab(PinnedMerges)

  private val fixtures = Seq(
    1 -> "the theme of the thesis",
    2 -> "in the beginning there was the word",
    3 -> "tokenizers tokenize the token stream",
    4 -> "low lower lowest",
    5 -> "new newer newest",
    6 -> "the quick brown fox jumps over the lazy dog",
    7 -> "tokens lower the newest threshold",
    8 -> "esther tests the tokenizer")

  /** Expected rows, computed OFFLINE by the independent Python BPE
    * (round-9 notes) — the oracle VALUES and this comment are the same
    * artifact. */
  private val oracle =
    """SELECT * FROM (VALUES
      |  (1, 11, 'the|the|m|e|o|f|the|the|s|i|s'),
      |  (2, 23, 'i|n|the|b|e|g|i|n|n|i|n|g|the|r|e|w|a|s|the|w|o|r|d'),
      |  (3, 23, 'tok|e|n|i|z|er|s|tok|e|n|i|z|e|the|tok|e|n|s|t|r|e|a|m'),
      |  (4, 5, 'low|low|er|low|est'),
      |  (5, 5, 'new|new|er|new|est'),
      |  (6, 30, 'the|q|u|i|c|k|b|r|o|w|n|f|o|x|j|u|m|p|s|o|v|er|the|l|a|z|y|d|o|g'),
      |  (7, 16, 'tok|e|n|s|low|er|the|new|est|th|r|es|h|o|l|d'),
      |  (8, 13, 'es|the|r|t|est|s|the|tok|e|n|i|z|er')
      |) AS t(id, n_tokens, toks)
      |ORDER BY id""".stripMargin

  def all: Seq[GraftQuery] = Seq(
    GraftQuery("tok01_bpe_tokenize", Some(oracle), (s, _) => {
      import s.implicits._
      fixtures.toDF("id", "text")
        .select(col("id"),
          bpe_count(col("text"), PinnedVocab).as("n_tokens"),
          array_join(bpe_tokens(col("text"), PinnedVocab), "|").as("toks"))
        .orderBy("id")
    })
  )
}
