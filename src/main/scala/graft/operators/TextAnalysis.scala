package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{tokens, round4}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column arithmetic — deterministic, codegen-friendly, and mirrored
  * 1:1 by the DuckDB oracle SQL.
  */
object TextAnalysis {

  /** (doc_id, w) exploded token stream. */
  def tokenStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))

  /** Stopword-ratio language heuristic (n-gram/stopword scoring family).
    * Deterministic CASE over per-doc token ratios; output
    * (doc_id, pred_lang).
    */
  def languageId(docs: DataFrame): DataFrame =
    tokenStream(docs)
      .groupBy("doc_id")
      .agg(
        (sum(when(col("w") === "the", 1).otherwise(0)) / count(lit(1))).as("r_the"),
        (sum(when(col("w") === "a", 1).otherwise(0)) / count(lit(1))).as("r_a"))
      .select(col("doc_id"),
        when(col("r_the") >= 0.05, "en")
          .when(col("r_a") >= 0.05, "es")
          .when(col("r_the") >= 0.02, "de")
          .when(col("r_a") >= 0.02, "fr")
          .otherwise("zh").as("pred_lang"))

  /** Per-doc quality features + composite score:
    * (doc_id, n_tokens, avg_token_len, stop_ratio, quality) with
    * quality = min(1, n_tokens/100) * (1 - stop_ratio).
    */
  def qualityScore(docs: DataFrame): DataFrame =
    tokenStream(docs)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(length(col("w"))).as("avg_len0"),
        (sum(when(col("w") === "the" || col("w") === "a", 1).otherwise(0)) / count(lit(1))).as("stop0"))
      .select(
        col("doc_id"),
        col("n_tokens"),
        round4(col("avg_len0")).as("avg_token_len"),
        round4(col("stop0")).as("stop_ratio"),
        round4(least(lit(1.0), col("n_tokens") / lit(100.0)) * (lit(1.0) - col("stop0"))).as("quality"))

  /** Per-ROW twin of the [[languageId]] + [[qualityScore]] gate
    * arithmetic (st18): the batch forms aggregate an exploded token
    * stream, but a document's gates are pure functions of its OWN text,
    * so on a stream they run as stateless column arithmetic — a pure
    * projection, the bandRows discipline applied to text gates — ahead
    * of any keyed state. Same integer token counts (size/filter over
    * the shared [[graft.functions.tokens]] split), same IEEE divisions
    * in the same order, so the values are bit-identical to the batch
    * aggregates (tp09's oracle gates the composition through st18).
    * Returns struct(n_tokens LONG, pred_lang STRING, quality DOUBLE).
    */
  def rowGates(text: Column): Column = {
    val tk = tokens(text)
    val n = size(tk)
    val rThe = size(filter(tk, w => w === "the")).cast("double") / n.cast("double")
    val rA = size(filter(tk, w => w === "a")).cast("double") / n.cast("double")
    val stop0 = size(filter(tk, w => w === "the" || w === "a")).cast("double") /
      n.cast("double")
    struct(
      n.cast("long").as("n_tokens"),
      when(rThe >= 0.05, "en").when(rA >= 0.05, "es")
        .when(rThe >= 0.02, "de").when(rA >= 0.02, "fr")
        .otherwise("zh").as("pred_lang"),
      round4(least(lit(1.0), n.cast("double") / lit(100.0)) * (lit(1.0) - stop0))
        .as("quality"))
  }

  /** Top-k terms per document by TF-IDF.
    *
    * Plan shape: one token explode → (doc, term) count → term
    * document-frequency aggregate → equi-join tf × df on the term key →
    * per-doc top-k window. Every stage is a keyed shuffle (parallel in
    * the doc/term domain); the corpus size N rides a broadcast 1-row
    * aggregate. At 100 TB the df table is |vocab| rows — it shuffles
    * with the term-keyed join, it is never collected.
    *
    * Scoring is integer micro-nats (the ta07 discipline): score_micro =
    * tf * round(1e6 * ln((N+1)/(df+1))) — the output carries no raw
    * doubles, so cross-engine comparison is exact, and ties rank
    * deterministically by term. Output
    * (doc_id, term, tf, df, score_micro), k rows per doc.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k=$k — a non-positive k would run the full explode " +
      "and shuffles only to filter every row out")
    import org.apache.spark.sql.expressions.Window
    // The (doc, term) count feeds BOTH the tf side and the df aggregate;
    // without a materialization point Catalyst re-executes the token
    // explode + doc/term shuffle — the two most expensive stages — once
    // per branch. Same working-set discipline (and the same
    // spark.graft.dedup.materialize escape hatch) as the dedup suite.
    TextDedup.withWorkingSet(
      tokenStream(docs).groupBy(col("doc_id"), col("w").as("term"))
        .agg(count(lit(1)).as("tf"))) { tf =>
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val scored = tf.join(df, "term")
        .crossJoin(broadcast(n))
        .withColumn("score_micro",
          col("tf") * floor(log((col("__n") + lit(1.0)) / (col("df") + lit(1.0)))
            * 1000000 + 0.5).cast("long"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score_micro").desc, col("term"))
      scored.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .select("doc_id", "term", "tf", "df", "score_micro")
    }
  }

  /** BM25 relevance scores for a fixed keyword query over the corpus.
    *
    * Returns every document matching at least one query term:
    * (doc_id, n_terms_matched, score). Okapi BM25 with the +0.5
    * idf smoothing; idf is micro-nat quantized (the one non-IEEE-exact
    * op — ln — crosses engines as an integer, everything after is
    * exactly-rounded IEEE arithmetic written in one fixed evaluation
    * order), and per-term scores combine via fixed-order conditional
    * aggregates, not an order-dependent SUM, so the cross-engine hash
    * is stable.
    *
    * Plan shape: ONE token explode → ONE doc-keyed grouped pass with a
    * wide conditional aggregate per query term (the minhash wide-agg
    * discipline — |terms| CASE columns beat a second explode + a
    * (doc, term) shuffle + a df join) → a 1-row corpus aggregate
    * (N, Σdl, df per term) broadcast back. At 100 TB the only large
    * shuffle is the doc-keyed aggregate; nothing scales with |vocab| or
    * |terms|².
    */
  def bm25(docs: DataFrame, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms.size <= 16,
      s"${terms.size} query terms — bm25 builds a fixed-order score column per term")
    // Silent-wrong-result guards: a duplicate term double-counts its
    // score; an uppercase or multi-word term can never match the
    // lowercased space-split token stream and silently scores nothing.
    require(terms.distinct == terms, s"duplicate query terms in $terms")
    terms.foreach { t =>
      require(t.nonEmpty && t == t.toLowerCase && !t.exists(_.isWhitespace),
        s"query term '$t' must be a non-empty lowercase single token " +
          "(match the tokenizer: lowercased, whitespace-split)")
    }
    // The per-doc (dl, tf_i) frame feeds BOTH the corpus aggregate and
    // the scoring projection; materialize it (withWorkingSet) or the
    // token explode — the expensive stage — runs once per branch.
    TextDedup.withWorkingSet(
      tokenStream(docs).groupBy("doc_id").agg(
        count(lit(1)).as("dl"),
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(col("w") === t, 1L).otherwise(0L)).as(s"__tf$i")
        }: _*)) { perDoc =>
      // 1-row (N, Σdl, df_i): explicit SUM/COUNT division later — both
      // engines divide the same exact integers, where avg()
      // implementations may accumulate differently.
      val corpusAggs = sum("dl").as("__sumdl") +: terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
      val corpus = perDoc.agg(count(lit(1)).as("__n"), corpusAggs: _*)
      // Every composite constant stays a column-space op on the raw
      // literals (k1+1, 1-b) so the oracle can spell the identical
      // addition — a Scala-folded k1+1.0 and a SQL-parsed literal are
      // not guaranteed the same double.
      def termScore(i: Int): Column = {
        val tf = col(s"__tf$i"); val df = col(s"__df$i")
        val idfMicro = floor(log((col("__n") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
          * 1000000 + 0.5).cast("long")
        when(tf > 0,
          (idfMicro / lit(1000000.0)) * (tf * (lit(k1) + lit(1.0))) /
            (tf + lit(k1) * ((lit(1.0) - lit(b)) +
              lit(b) * col("dl") / (col("__sumdl").cast("double") / col("__n")))))
          .otherwise(lit(0.0))
      }
      // Fixed-order combination in query order — never a SUM whose
      // addend order the shuffle picks.
      val combined = terms.indices.map(termScore).reduce(_ + _)
      val matched = terms.indices
        .map(i => when(col(s"__tf$i") > 0, 1L).otherwise(0L))
        .reduce(_ + _)
      perDoc.crossJoin(broadcast(corpus))
        .select(col("doc_id"), matched.as("n_terms_matched"),
          round4(combined).as("score"))
        .filter(col("n_terms_matched") > 0)
    }
  }

  /** Signed feature hashing (the "hashing trick"): tokens map to a
    * fixed bucket space via md5, with a ±1 sign from an independent
    * hash digit so collisions cancel in expectation — the
    * vocabulary-free text→sparse-vector step of a scalable featurizer
    * (no vocab table to build, broadcast, or keep consistent across
    * runs). One explode + one (doc, bucket) hash aggregate; the output
    * is bounded by |docs| × min(numBuckets, distinct tokens per doc),
    * never by vocabulary size. md5-derived buckets/signs are the usual
    * cross-engine discipline (NOTES invariant #3). Output:
    * (doc_id, bucket, weight).
    */
  def featureHash(docs: DataFrame, numBuckets: Int = 1024): DataFrame = {
    require(numBuckets > 0, s"numBuckets=$numBuckets must be positive")
    tokenStream(docs)
      .withColumn("bucket",
        pmod(expr("CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"), lit(numBuckets.toLong)))
      .withColumn("__sign",
        when(expr("CAST(conv(substring(md5(w), 9, 1), 16, 10) AS BIGINT)") % 2 === 0, 1L)
          .otherwise(-1L))
      .groupBy("doc_id", "bucket")
      .agg(sum("__sign").as("weight"))
  }

  /** Token counts per doc: whitespace tokens, regex word-ish tokens, and
    * a chars/4 BPE-token estimate. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_ws_tokens"),
      expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))").as("n_re_tokens"),
      ceil(length(col("text")) / lit(4.0)).cast("int").as("n_bpe_est"))

  /** Canonical text normalization — the pass that precedes every dedup
    * / fingerprint stage in a curation pipeline (unnormalized near-dups
    * defeat exact hashing): lowercase, non-alphanumerics → space,
    * whitespace runs collapsed, trimmed. Pure codegen'd
    * `regexp_replace` chain restricted (like [[redactPii]]) to the
    * syntax subset Java regex and RE2 interpret identically. Output
    * (doc_id, norm_text, n_norm_tokens).
    */
  def normalize(docs: DataFrame): DataFrame = {
    // ONE regex pass: a run of anything non-alphanumeric — punctuation,
    // spaces, or a mix — becomes a single space, which is exactly
    // punct→space followed by whitespace-collapse, at half the regex
    // cost (normalization is pure per-byte CPU; the corpus scan is the
    // whole bill at scale).
    val collapsed = trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " "))
    docs.select(col("doc_id"), collapsed.as("norm_text"),
      size(tokens(collapsed)).as("n_norm_tokens"))
  }

  /** Gopher-style repetition signals per document (Rae et al. 2021
    * §A1.1 repetition filters, adapted to word n-grams since this
    * corpus has no line structure):
    *
    *   - `top_bigram_frac`: occurrences of the single most frequent
    *     word bigram / total bigram occurrences (high = the document
    *     loops on one phrase);
    *   - `dup_trigram_frac`: fraction of trigram occurrences whose
    *     trigram appears more than once in the document;
    *   - `pass_repetition`: both under the Gopher-ish thresholds
    *     (0.20 / 0.30) — the keep/drop bit a curation pipeline filters
    *     on.
    *
    * Plan shape: one explode of the (tagged) bigram+trigram stream,
    * then two same-key groupBys — (doc, n, gram) counts, reduced per
    * doc with conditional aggregates. No join between the bigram and
    * trigram branches and no second corpus scan; the n-gram blowup is
    * linear in tokens (2 tags), and both shuffles hash on doc_id-led
    * keys so at cluster scale this behaves like any other per-document
    * aggregation. Docs with no trigrams (< 3 tokens) get NULL
    * trigram stats; docs with < 2 tokens produce no rows (no bigrams).
    */
  def repetitionScore(docs: DataFrame): DataFrame = {
    import graft.functions.shingles
    val grams = docs.select(col("doc_id"),
      explode(concat(
        transform(shingles(col("text"), 2), g => struct(lit(2).as("n"), g.as("gram"))),
        transform(shingles(col("text"), 3), g => struct(lit(3).as("n"), g.as("gram")))))
        .as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"))
    val counts = grams.groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("c"))
    val top2 = max(when(col("n") === 2, col("c"))) // most frequent bigram
    counts.groupBy("doc_id").agg(
      top2.as("mx2"),
      sum(when(col("n") === 2, col("c"))).as("tot2"),
      sum(when(col("n") === 3 && col("c") > 1, col("c"))).as("dup3"),
      sum(when(col("n") === 3, col("c"))).as("tot3"))
      .select(
        col("doc_id"),
        round4(col("mx2") / col("tot2")).as("top_bigram_frac"),
        round4(coalesce(col("dup3"), lit(0L)) / col("tot3")).as("dup_trigram_frac"),
        (col("mx2") / col("tot2") <= 0.20 &&
          coalesce(col("dup3"), lit(0L)) / col("tot3") <= 0.30).as("pass_repetition"))
  }

  /** Polynomial rolling-hash fingerprint (Rabin–Karp family):
    * fold over the character stream, h = (h*31 + codepoint) mod 1e9+7 —
    * order sensitive (unlike [[fingerprint]]), so byte-level edits
    * change it. Uses the native codegen'd
    * [[graft.functions.RollingHash]] expression: one loop per row, no
    * per-character array, no interpreted HOF lambda (see
    * [[rollingHashHof]] for the measured difference).
    */
  def rollingHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), graft.functions.rolling_hash(col("text")).as("rh"))

  /** The pre-codegen higher-order-function formulation of
    * [[rollingHash]], kept as the cross-checkable reference: HOF
    * lambdas evaluate interpreted and `split(text, '')` materializes a
    * per-character array per row. Value-identical to the native
    * expression (asserted by spec).
    */
  def rollingHashHof(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      aggregate(
        transform(split(col("text"), ""), c => ascii(c).cast("long")),
        lit(0L),
        (acc, c) => (acc * 31 + c) % 1000000007L).as("rh"))

  /** PII redaction over a text column: emails → `[EMAIL]`, then
    * phone-like digit runs (7+ digits with optional dashes, optional
    * leading +) → `[PHONE]`. Pure `regexp_replace` chain — codegen'd,
    * no UDF — with patterns restricted to the syntax subset that Java
    * regex (Spark) and RE2 (DuckDB, the oracle) interpret identically:
    * character classes, `+`/bounded repetition, no backrefs or
    * lookaround. Order matters: emails first, so their digit-bearing
    * local parts can't be half-eaten by the phone pass.
    */
  def redactPii(df: DataFrame, textCol: String, outCol: String = "redacted"): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
    val phone = "[+]?[0-9][0-9-]{5,}[0-9]"
    df.withColumn(outCol,
      regexp_replace(regexp_replace(col(textCol), email, "[EMAIL]"),
        phone, "[PHONE]"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set (the
    * "fingerprint keying" method — whitespace/order/duplicate
    * insensitive). Output (doc_id, fp).
    */
  def fingerprint(docs: DataFrame): DataFrame =
    tokenStream(docs)
      .groupBy("doc_id")
      .agg(md5(concat_ws(" ", array_sort(collect_set(col("w"))))).as("fp"))

  /** Self-trained bigram LM average negative log-likelihood per document
    * — the statistical quality signal behind perplexity filtering in
    * LLM curation pipelines, with the LM trained on the corpus itself in
    * one distributed pass (add-one smoothing over the corpus
    * vocabulary). Docs with < 2 tokens produce no pairs and are absent.
    * Output (doc_id, n_pairs, avg_nll); high avg_nll = statistically
    * unusual word sequences (the filter-or-inspect candidates).
    *
    * Cross-engine determinism: each pair's ln P is converted to integer
    * MICRO-NATS via `floor(x*1e6 + 0.5)` — multiply/add/floor are
    * IEEE-exact in both engines — so the per-doc accumulation is an
    * exact BIGINT sum (order-free, unlike a double sum whose value
    * depends on Spark's partial-aggregate order), and only the final
    * average is FP-rounded. `ln` itself has no bitwise cross-engine
    * guarantee; the micro-nat floor then the 4-decimal average round
    * compound a last-ulp ln difference into ~1e-9 gate risk.
    *
    * Scale: two groupBys over the exploded pair stream plus two joins
    * against count tables bounded by observed vocabulary; the only
    * driver-side value is the vocab-size scalar (the supplier.count()
    * precedent). At 100 TB the count tables are the compact side and
    * broadcast under AQE.
    *
    * The unigram table, the bigram table, and the scoring join all
    * derive from the tokenized corpus, so a fully lazy plan would scan
    * and tokenize the corpus three times — and at the stated scale the
    * corpus scan is the dominant cost (ADVICE r9). The tokenized corpus
    * is therefore the call's working set under
    * [[TextDedup.withWorkingSet]]: in the default eager mode it is
    * persisted for the duration of the call (one scan + tokenize, three
    * cache reads) and released before returning; under
    * `spark.graft.dedup.materialize=none` the plan stays lazy and a
    * cluster caller manages persistence itself.
    */
  def bigramNll(docs: DataFrame): DataFrame = {
    val toksAll = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    TextDedup.withWorkingSet(toksAll) { toks =>
      val pairs = toks.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), expr(
          """explode(zip_with(slice(toks, 1, size(toks) - 1),
            |                 slice(toks, 2, size(toks) - 1),
            |                 (a, b) -> struct(a AS w1, b AS w2))) AS p""".stripMargin))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val uni = toks.select(explode(col("toks")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1"))
      val vocab = uni.count() // O(1) driver scalar, paid once
      val big = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      pairs
        .join(big, Seq("w1", "w2"))
        .join(uni, Seq("w1"))
        .select(col("doc_id"),
          floor(log((col("c2") + lit(1.0)) / (col("c1") + lit(vocab.toDouble))) * 1e6 + 0.5)
            .cast("bigint").as("micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_pairs"), sum("micro").as("s"))
        .select(col("doc_id"), col("n_pairs"),
          round4(-col("s").cast("double") / 1e6 / col("n_pairs")).as("avg_nll"))
    }
  }

  /** Fixed-size overlapping word chunks — the RAG / context-window
    * splitting primitive: every document becomes ceil(len/stride)
    * chunks of up to `chunkSize` [[tokens]], consecutive chunks
    * overlapping by `chunkSize - stride` words. Output
    * (doc_id, chunk_id, n_words, chunk_hash) — the md5 of the
    * space-joined chunk keeps the verifiable output small while pinning
    * the exact chunk text; a production sink would keep the text
    * column instead.
    *
    * Pure per-row projection + explode (ZERO shuffles): chunking a
    * 100 TB corpus is one scan, embarrassingly parallel, output
    * ~len/stride rows per document. Empty docs produce no chunks (same
    * dropped-doc semantics as the shingle pipeline).
    */
  def chunkDocuments(docs: DataFrame, chunkSize: Int = 50,
                     stride: Int = 40): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize], got $stride (chunkSize $chunkSize)")
    docs
      .select(col("doc_id"), tokens(col("text")).as("__w"))
      .withColumn("__len", size(col("__w")))
      .filter(col("__len") > 0)
      .select(col("doc_id"), col("__w"), col("__len"),
        explode(sequence(lit(0L),
          ceil(col("__len") / lit(stride.toDouble)).cast("long") - 1)).as("chunk_id"))
      .select(
        col("doc_id"), col("chunk_id"),
        least(lit(chunkSize), col("__len") - col("chunk_id") * stride)
          .cast("int").as("n_words"),
        md5(concat_ws(" ",
          slice(col("__w"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkSize))))
          .as("chunk_hash"))
  }
}
