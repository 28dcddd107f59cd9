package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a corpus pipeline
  * actually runs before tokenization —
  *
  *   exact dedup (min doc_id per identical text)
  *     → language ID (stopword-ratio heuristic, [[TextAnalysis.languageId]])
  *     → quality gate ([[TextAnalysis.qualityScore]] composite)
  *     → token floor
  *
  * Order is the scale strategy (same argument as [[TextDedup.fullDedup]]):
  * dedup first shrinks everything downstream; the language/quality
  * features then run ONE grouped pass each over survivors and join back
  * on doc_id. At 100 TB each stage is a hash shuffle on doc_id/text —
  * no all-pairs step anywhere.
  */
object TrainingPipeline {

  /** Curated corpus rows:
    * (doc_id, text, pred_lang, n_tokens, quality). Filters are applied
    * on the ROUNDED quality (round4) so the DuckDB oracle applies
    * bit-identical arithmetic at the threshold boundary.
    */
  def curate(docs: DataFrame,
             langs: Seq[String],
             minQuality: Double,
             minTokens: Long): DataFrame = {
    val survivors = docs
      .groupBy("text").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "text")
    val lang = TextAnalysis.languageId(survivors)
    val qual = TextAnalysis.qualityScore(survivors).select("doc_id", "n_tokens", "quality")
    survivors
      .join(lang, Seq("doc_id"))
      .join(qual, Seq("doc_id"))
      .filter(col("pred_lang").isin(langs: _*) &&
        col("quality") >= minQuality && col("n_tokens") >= minTokens)
  }

  /** Deterministic hash sampling: keeps rows whose md5(key) bucket falls
    * under `pct` of 100. Unlike `df.sample` this is reproducible across
    * runs, engines and partitionings (the bucket is a pure function of
    * the key), stable under re-partitioning, and consistent BY KEY — the
    * properties corpus downsampling at 100 TB actually needs (the same
    * document keeps or drops everywhere, every run, including in the
    * DuckDB oracle).
    */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be in [0,100], got $pct")
    df.filter(
      expr(s"CAST(conv(substring(md5(CAST($keyCol AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
        < pct)
  }

  /** Leakage-safe train/val/test split BY GROUP: every row of a group
    * (user, session, document family) lands in the same split, because
    * the split is a pure function of md5(group key) — the property
    * GroupShuffleSplit gives in scikit-learn, here with zero shuffles:
    * no group table, no join, just a map-side bucket expression per
    * row (identical rows of a group hash identically wherever they
    * are, across runs, partitionings and engines — the
    * [[deterministicSample]] discipline). Evaluation leakage (the same
    * user's behavior in train AND test) is THE classic split bug this
    * prevents at corpus scale.
    *
    * @return df plus a `split` column: bucket < pctTrain → "train",
    *         < pctTrain+pctVal → "val", else "test" */
  def groupSplit(df: DataFrame, groupCol: String,
                 pctTrain: Int, pctVal: Int): DataFrame = {
    require(pctTrain >= 0 && pctVal >= 0 && pctTrain + pctVal <= 100,
      s"invalid split percentages: train=$pctTrain val=$pctVal")
    val bucket =
      expr(s"CAST(conv(substring(md5(CAST($groupCol AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
    df.withColumn("split",
      when(bucket < pctTrain, "train")
        .when(bucket < pctTrain + pctVal, "val")
        .otherwise("test"))
  }

  /** Token-budget shard packing (sequence packing's shard-assignment
    * step): documents are laid out in `orderCol` order and cut into
    * shards of ~`budgetTokens` whitespace tokens — shard k spans the
    * docs whose EXCLUSIVE cumulative token count falls in
    * [k·budget, (k+1)·budget). Deterministic — a pure function of the
    * ordered corpus — PROVIDED `orderCol` is unique (the default doc_id
    * is): with ties, tied rows' relative order is shuffle-dependent and
    * shard assignment near a boundary would differ run to run. A doc
    * may straddle its shard's tail, the standard fixed-boundary
    * variant; null text counts as 0 tokens.
    *
    * Scale path: the cumulative sum is [[GlobalRank.withGlobalCumSum]]'s
    * two-phase range-partitioned prefix sum — no single-partition
    * window, no task ever holds more than one range partition.
    *
    * Output: (doc_id, n_tokens, shard_id).
    */
  def packShards(docs: DataFrame, budgetTokens: Long,
                 orderCol: String = "doc_id",
                 numPartitions: Option[Int] = None,
                 // Pluggable token counter (VERDICT r8 #6): default is the
                 // whitespace count the oracle can recompute; a real
                 // curation budget passes a subword counter, e.g.
                 // `c => graft.functions.bpe_count(c, vocab).cast("long")`.
                 tokenCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                   c => size(graft.functions.tokens(c)).cast("long")): DataFrame = {
    require(budgetTokens >= 1, s"budgetTokens must be >= 1, got $budgetTokens")
    val withTok = docs.select(col(orderCol),
      // coalesce here, not just inside the cumsum: the OUTPUT n_tokens
      // must agree with the arithmetic that placed the doc (null text
      // counts as 0 tokens in both)
      coalesce(tokenCount(col("text")), lit(0L)).as("n_tokens"))
    GlobalRank.withGlobalCumSum(withTok, Seq(col(orderCol)), col("n_tokens"),
        "cum_before", numPartitions)
      .select(col(orderCol), col("n_tokens"),
        // integer division: exact at any corpus size (a double division
        // would lose exactness past 2^53 cumulative tokens)
        expr(s"cum_before div ${budgetTokens}L").as("shard_id"))
  }

  /** Deterministic stratified sampling: at most `quota` rows per stratum,
    * chosen by md5(key) order — a reproducible uniform draw within each
    * stratum (same rows every run, every engine, any partitioning), the
    * way a corpus is rebalanced to a per-language budget. Keys must be
    * unique (md5 of a unique key is collision-free in practice; `keyCol`
    * breaks any residual tie).
    *
    * Plan shape: one hash shuffle on the stratum column + a per-stratum
    * window — parallel across strata, never a single-partition window.
    * Caveat at extreme scale: one stratum's rows land on one task; when
    * a stratum is both huge and quota is small, pre-thin with
    * [[deterministicSample]] (by the same md5 key, which preserves the
    * md5-order prefix exactly) before ranking.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       quota: Int): DataFrame = {
    require(quota >= 1, s"quota must be >= 1, got $quota")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Domain-mixture sampling: draw the LARGEST corpus whose stratum
    * composition matches `targetShares` exactly, using only
    * deterministic selection — the "data mixing" step of an LLM
    * training pipeline (e.g. The Pile / Dolma-style source weighting),
    * with the mixture target enforced by construction instead of by
    * expected value.
    *
    * The achievable total is bound by the scarcest stratum:
    * `ntot = min over strata of (count_g / share_g)`; each stratum then
    * contributes `floor(share_g * ntot)` rows, chosen in md5(key) order
    * (the same deterministic draw as [[stratifiedSample]], so the
    * selection is identical in every engine and under any
    * partitioning). Strata absent from `targetShares` are dropped —
    * that IS the mixing decision. A target stratum with NO rows in the
    * data contributes no count row, so it is skipped by the binding
    * min and simply contributes nothing — the emitted strata still
    * match their relative target shares.
    *
    * Plan shape: a tiny groupBy(stratum) count, a one-row min
    * aggregate, and a broadcast quota join onto the per-stratum
    * md5-order window — one data-sized shuffle total (the window's),
    * same scale posture and same hot-stratum caveat as
    * [[stratifiedSample]]. Zero driver-side collects.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, keyCol: String,
                    targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty, "targetShares must not be empty")
    require(targetShares.values.forall(_ > 0), "target shares must be > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val shares = targetShares.toSeq.toDF(stratumCol, "__share")
    val counts = df.groupBy(stratumCol).agg(count(lit(1)).as("__n"))
    val ntot = counts.join(shares, stratumCol)
      .agg(min(col("__n") / col("__share")).as("__ntot"))
    val quotas = shares.crossJoin(broadcast(ntot))
      .select(col(stratumCol), floor(col("__share") * col("__ntot")).as("__quota"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    // Quota join BEFORE the window: rows of strata outside the target
    // mix die in the broadcast join and never enter the ranking
    // shuffle — at scale the dropped strata can be most of the corpus.
    df.join(broadcast(quotas), Seq(stratumCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__quota"))
      .drop("__rk", "__quota")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis–
    * Spirakis A-ES): each row draws u ∈ (0,1] from a 48-bit md5 slice
    * of its key and ranks by ln(u)/weight — the k largest ranks are a
    * weighted sample, each row's inclusion probability proportional to
    * its weight. The draw is a pure function of the key, so the same
    * rows are selected in every engine, at any partitioning, on any
    * rerun (the md5-derived-uniform discipline of
    * [[deterministicSample]], extended to weights).
    *
    * Cross-engine determinism: maximize u^(1/w) ⇔ maximize ln(u)/w
    * (1/w > 0, ln monotone), and the exponent is micro-quantized with
    * `floor(x*1e6 + 0.5)` so a last-ulp `ln` difference between engines
    * is inert (the bigramNll micro-nat discipline); residual boundary
    * ties break on the key.
    *
    * Scale: one scan computing a per-row priority + a distributed
    * top-k (TakeOrdered — per-partition heaps, k rows to the driver),
    * never a global sort.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // 48-bit md5 slice + 1 → u in (0, 2^48] scaled: ln defined at the
    // all-zero slice; (long+1) is exact in double (48 < 53 bits).
    val u = (conv(substring(md5(col(keyCol).cast("string")), 1, 12), 16, 10)
      .cast("long") + 1).cast("double") / 281474976710656.0
    // E-S is defined for POSITIVE weights only: a negative weight flips
    // ln(u)/w positive and deterministically dominates the top-k (the
    // opposite of proportional), w = 0 divides by zero — both are data
    // bugs that must fail loudly, not skew the draw (review r13). The
    // branch is free on the happy path (codegen'd per-row CASE).
    val w = when(col(weightCol) <= 0, raise_error(concat(
        lit(s"weightedSample: non-positive $weightCol for $keyCol="),
        // coalesce: a null key would null-propagate the whole message
        coalesce(col(keyCol).cast("string"), lit("NULL"))))).otherwise(col(weightCol))
    val prio = floor(log(u) / w * 1e6 + 0.5).cast("long")
    df.withColumn("__prio", prio)
      .orderBy(col("__prio").desc, col(keyCol))
      .limit(k)
      .drop("__prio")
  }

  /** Per-language corpus budget over the curated set:
    * (pred_lang, n_docs, total_tokens, avg_quality). */
  /** Train/eval contamination check: for every training document, the
    * number of distinct word n-grams it shares with ANY held-out
    * document — the standard decontamination pass run before training
    * (n-gram containment, cf. GPT-3/PaLM appendix methodology). Returns
    * every train row: (doc_id, n_shared, contaminated).
    *
    * Plan shape: both sides explode to DISTINCT (doc, shingle) pairs;
    * the join is keyed on the shingle with the held-out side reduced to
    * distinct shingles first (holdout is the small side — eval sets are
    * orders of magnitude smaller than training corpora — so at scale
    * this is a broadcast of the holdout shingle set, no shuffle of the
    * train side beyond the explode). Never all-pairs.
    */
  def contaminationCheck(train: DataFrame, holdout: DataFrame, n: Int = 5,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val trainSh = TextDedup.shingleSet(train, idCol, textCol, n)
    val holdSh = TextDedup.shingleSet(holdout, idCol, textCol, n)
      .select("s").distinct()
    val counts = trainSh.join(holdSh, Seq("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    train.select(col(idCol).as("doc_id"))
      .join(counts, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("contaminated", col("n_shared") > 0)
  }

  def languageBudget(curated: DataFrame): DataFrame =
    curated.groupBy("pred_lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        graft.functions.round4(avg(col("quality"))).as("avg_quality"))
      .orderBy("pred_lang")

  /** Deterministic random negative sampling for contrastive training:
    * for each anchor, k pseudo-random other corpus rows, reproducible
    * bit-for-bit across runs, partitionings and engines (the md5
    * discipline — NOTES invariant 3 — so the DuckDB oracle replays the
    * identical draw).
    *
    * The naive draw is an anchors × corpus cross join ranked per
    * anchor. Instead, every corpus row is hashed into one of `buckets`
    * buckets, each anchor is hashed (domain-separated with an `a|`
    * prefix, so an anchor's target bucket is independent of its own
    * corpus bucket) to ONE target bucket, and candidates come from a
    * bucket-keyed equi-join: per-anchor work is |corpus| / buckets, a
    * knob that scales with the corpus, and the join co-partitions on
    * the bucket key. Within the candidate set, rank = row_number over
    * the pair hash md5(anchor|candidate) — i.e. a fresh deterministic
    * permutation per anchor — take the k smallest.
    *
    * Bucketing trades the uniform-over-corpus draw for
    * uniform-over-one-bucket (standard practice for in-batch/blocked
    * negatives); anchors never draw themselves, and `buckets` must be
    * sized so the expected bucket population comfortably exceeds k.
    */
  def negativeSample(df: DataFrame, idCol: String, anchors: DataFrame,
                     k: Int, buckets: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val pool = df.select(col(idCol).as("neg_id")).withColumn("__b",
      pmod(expr("CAST(conv(substring(md5(CAST(neg_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"),
        lit(buckets.toLong)))
    val a = anchors.select(col(idCol).as("anchor_id")).withColumn("__b",
      pmod(expr("CAST(conv(substring(md5(concat('a|', CAST(anchor_id AS STRING))), 1, 12), 16, 10) AS BIGINT)"),
        lit(buckets.toLong)))
    val cand = a.join(pool, "__b")
      .filter(col("anchor_id") =!= col("neg_id"))
      .withColumn("__h", expr("CAST(conv(substring(md5(concat(" +
        "CAST(anchor_id AS STRING), '|', CAST(neg_id AS STRING))), 1, 12), 16, 10) AS BIGINT)"))
    cand
      .withColumn("neg_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("anchor_id")
          .orderBy(col("__h"), col("neg_id"))))
      .filter(col("neg_rank") <= k)
      .drop("__b", "__h")
  }
}
