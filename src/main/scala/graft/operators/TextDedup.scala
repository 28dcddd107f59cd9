package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.{shingles, round4}

/** Document deduplication suite: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard. All operators are pure distributed DataFrame pipelines —
  * no driver-side collection — and every hash is derived from md5 so the
  * exact same algorithm is expressible in the DuckDB oracle SQL.
  *
  * Scale notes (100 TB stance):
  *   - the shingle explode shuffles (doc_id, shingle) pairs once and is
  *     reused by signatures and verification;
  *   - minhash signatures use map-side partial MIN, so the shuffle is
  *     |docs| × numHashes rows regardless of document length;
  *   - LSH banding turns the quadratic all-pairs problem into an
  *     equi-join on (band_id, band_key) — the only quadratic step left is
  *     within identical-band buckets, which is the point of LSH;
  *   - exact verification joins only LSH candidates, not all pairs.
  */
object TextDedup {

  /** Session conf gating eager materialization of dedup results.
    *
    *   - `"local"` (default): operators persist the shingle working set
    *     for the duration of the call, eagerly materialize the (small)
    *     result via `localCheckpoint`, and release the cache before
    *     returning. Right for local mode and static-allocation clusters:
    *     no cache outlives the call, and the result is computed exactly
    *     once. The trade-offs: `localCheckpoint` blocks are stored
    *     non-reliably on executors (lost executors lose the result —
    *     dynamic allocation beware) and eager execution happens at
    *     operator-call time, before any downstream filter could be
    *     pushed down.
    *   - `"none"`: operators return a fully lazy, unpersisted plan.
    *     Cluster-safe (nothing pinned, lineage intact, Catalyst pushdown
    *     applies through the result) at the cost of recomputing the
    *     shingle explode per downstream action — the caller owns
    *     persistence. In this mode the caller's `doc_id`/text columns
    *     must be DETERMINISTIC (no `monotonically_increasing_id`):
    *     multi-branch plans evaluate the input more than once.
    */
  val MaterializeConf = "spark.graft.dedup.materialize"

  /** True when the session runs dedup in eager materialization mode —
    * public so query-layer compositions over the dedup primitives (the
    * dd06 band-pair entry) honor [[MaterializeConf]] exactly like the
    * built-in operators instead of materializing unconditionally. */
  def eagerMode(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption(MaterializeConf).getOrElse("local") match {
      case "local" => true
      case "none"  => false
      case other => throw new IllegalArgumentException(
        s"$MaterializeConf must be 'local' or 'none', got '$other'")
    }

  private def eager(df: DataFrame): Boolean = eagerMode(df.sparkSession)

  /** The shared cache-lifetime discipline as a combinator: in eager mode
    * the working set is persisted for the duration of the call, the
    * (small) result is materialized, and the cache is released before
    * returning; in `none` mode everything stays lazy and unpersisted.
    * [[minhashDedupPairs]]/[[exactJaccardPairs]] and the dd06 entry all
    * route through this, so the conf is honored by every dedup shape.
    */
  def withWorkingSet(working: DataFrame)(build: DataFrame => DataFrame): DataFrame =
    if (eager(working)) {
      val w = working.persist(StorageLevel.MEMORY_AND_DISK)
      try materialize(build(w)) finally w.unpersist()
    } else build(working)

  /** Per-round materialization point for the iterative graph operators
    * (PageRank, BFS, Bellman–Ford): [[materialize]] in eager mode —
    * which upgrades to RELIABLE `checkpoint` when the session has a
    * checkpoint dir, the cluster-scale promise the round loops make —
    * and identity in `none` mode, so specs can gate the per-round plan
    * shape (join strategy, no Cartesian blowup) exactly like the dedup
    * family. Same conf, same semantics, one discipline. */
  def roundCheckpoint(df: DataFrame): DataFrame =
    if (eager(df)) materialize(df) else df

  /** Eager materialization point: reliable `checkpoint` when the session
    * has a checkpoint dir (cluster-safe — blocks live on the reliable
    * store, survive executor loss), `localCheckpoint` otherwise.
    *
    * Reliable-checkpoint files are NOT deleted by default; a long-lived
    * session calling dedup repeatedly should set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so
    * checkpoints are removed when their DataFrames are garbage
    * collected (or manage the checkpoint dir's lifecycle per job). */
  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Best-effort handle on the storage behind a [[materialize]]d
    * DataFrame, for releasing superseded intermediates eagerly instead
    * of waiting for GC + ContextCleaner. A checkpointed Dataset's plan
    * bottoms out at a `LogicalRDD` leaf wrapping the materialized RDD;
    * unpersisting that RDD frees its local-checkpoint blocks (for
    * reliable checkpoints the blocks-level unpersist is a no-op and file
    * cleanup stays with `spark.cleaner.referenceTracking.cleanCheckpoints`).
    * CAUTION: a local checkpoint's lineage is truncated, so releasing is
    * only safe once nothing can re-evaluate the DataFrame — callers must
    * release strictly superseded rounds only. Returns None (degrading to
    * the GC path) if the plan shape is not the expected single leaf.
    */
  private def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** Distinct word n-gram shingles per document: (doc_id, s).
    *
    * The per-document dedup happens IN-ROW (`array_distinct` over the
    * shingle array, the [[minhashSignaturesNoShuffle]] idiom) instead of
    * a global `.distinct()` over the exploded rows: identical output
    * (distinct (doc_id, s) ≡ per-document distinct shingles for
    * one-row-per-document input, the operator contract), but the
    * exploded shingle set — the largest intermediate of every dedup
    * entry — never crosses an Exchange just to be deduplicated (r22,
    * guide §2.4: the distinct was a full shuffle of |shingles| rows
    * before any consumer did real work). */
  def shingleSet(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(shingles(col(textCol), n))).as("s"))

  /** Stop-shingle removal: drops shingles present in more than
    * `maxDocFraction` of documents. A shared-shingle self-join explodes
    * quadratically on near-universal shingles (the "the quick brown"
    * problem); capping document frequency bounds the join's hottest key
    * at `maxDocFraction * |docs|` rows. The uncapped oracle queries
    * (dd02/dd03) keep exact Jaccard semantics; the capped metric is
    * oracle-checked end-to-end by dd09 ([[cappedJaccardPairs]]) and the
    * skew bound by the stuck-reducer spec — at production scale the cap
    * is the difference between a skew-safe join and a stuck reducer.
    */
  def dropStopShingles(sh: DataFrame, maxDocFraction: Double): DataFrame = {
    require(maxDocFraction > 0 && maxDocFraction <= 1)
    val nDocs = sh.select("doc_id").distinct().count()
    val cap = math.max(1L, (nDocs * maxDocFraction).toLong)
    val rare = sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
    sh.join(rare.select("s"), Seq("s"))
  }

  /** Wide MinHash signature matrix (doc_id, sig0..sig{H-1}): one md5 per
    * shingle yields two 48-bit integers (h1, h2); the hash family is
    * Carter-Wegman sig_j = MIN over shingles of (h1 + j*h2) mod 2^48 —
    * H signatures for the price of one digest (48-bit values keep j*h2
    * far from int64 overflow). All H mins are computed as parallel
    * aggregates in ONE grouped pass: no seed-explode, so the shuffle is
    * |docs| rows instead of |shingles| × H.
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 16): DataFrame = {
    val withH = sh
      .withColumn("h1", expr("CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT)"))
      .withColumn("h2", expr("CAST(conv(substring(md5(s), 13, 12), 16, 10) AS BIGINT)"))
    val aggs = (0 until numHashes)
      .map(j => min(expr(s"(h1 + $j * h2) % 281474976710656")).as(s"sig$j"))
    withH.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Zero-shuffle variant of [[minhashSignatures]]: the H mins are
    * computed per document directly over its shingle ARRAY with
    * higher-order functions (one md5 per shingle into (h1, h2), then H
    * `array_min` passes over the hashed array) — no explode, no groupBy,
    * no exchange. Bit-identical to the grouped form (duplicate shingles
    * cannot change a MIN), so either feeds the same banding/oracle.
    *
    * Trade-off: this computes signatures in the scan stage with zero
    * shuffle — the right shape when signatures are the ONLY thing needed
    * (pure fingerprinting). [[minhashDedupPairs]] keeps the grouped form
    * because it already pays for the exploded distinct shingle set that
    * verification needs, and the signature aggregation rides that
    * shuffle for free.
    */
  def minhashSignaturesNoShuffle(docs: DataFrame, idCol: String = "doc_id",
                                 textCol: String = "text", numHashes: Int = 16,
                                 shingleN: Int = 3): DataFrame = {
    val hashed = expr(
      s"transform(array_distinct(${shinglesSql(textCol, shingleN)}), s -> named_struct(" +
        "'h1', CAST(conv(substring(md5(s), 1, 12), 16, 10) AS BIGINT), " +
        "'h2', CAST(conv(substring(md5(s), 13, 12), 16, 10) AS BIGINT)))")
    val sigCols = (0 until numHashes).map { j =>
      expr(s"array_min(transform(__h, h -> (h.h1 + $j * h.h2) % 281474976710656))").as(s"sig$j")
    }
    docs.select(col(idCol).as("doc_id"), hashed.as("__h"))
      .select(col("doc_id") +: sigCols: _*)
  }

  /** SQL-expression text of [[graft.functions.shingles]] for use inside
    * HOF lambdas (Column lambdas can't nest into expr strings). */
  private def shinglesSql(textCol: String, n: Int): String = {
    val toks = s"filter(split(lower($textCol), ' '), w -> w <> '')"
    val len = s"greatest(size($toks) - ${n - 1}, 0)"
    val slices = (1 to n).map(k => s"slice($toks, $k, $len)")
    slices.reduce((a, b) => s"zip_with($a, $b, (x, y) -> concat(x, ' ', y))")
  }

  /** (doc_id, band_id, band_key) rows from a signature frame — the
    * banding step shared by the batch candidate join and the streaming
    * candidate operator ([[graft.streaming.StatefulOps.lshCandidateStream]]):
    * one banding definition, so batch and stream bucket identically.
    * Pure projection + explode — runs unchanged on a streaming Dataset.
    *
    * Shingle-less docs (fewer than n words, empty/null text) carry
    * all-NULL signatures on the no-shuffle path; `concat_ws` would
    * collapse every such doc into one shared "" bucket — a quadratic
    * spurious-candidate explosion among short docs at web-corpus scale,
    * and a divergence from the grouped path and the oracle (both drop
    * them with the shingle explode). They are filtered here so every
    * banding consumer gets the dropped-doc semantics.
    */
  def bandRows(sig: DataFrame, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = sig.columns.count(_.startsWith("sig"))
    require(numHashes % rowsPerBand == 0, s"$numHashes signatures not divisible into bands of $rowsPerBand")
    val bandStructs = (0 until numHashes / rowsPerBand).map { b =>
      val keyCols = (0 until rowsPerBand)
        .map(r => s"CAST(sig${b * rowsPerBand + r} AS STRING)").mkString(", ")
      expr(s"named_struct('band_id', $b, 'band_key', concat_ws('|', $keyCols))")
    }
    // sigs are all-null together (one empty shingle array), so sig0
    // alone decides
    sig.filter(col("sig0").isNotNull)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"), col("band.band_key").as("band_key"))
  }

  /** Fingerprint parameters persisted WITH a [[saveBandIndex]] index.
    * The read path derives its banding from this record instead of
    * trusting caller-supplied parameters — a numHashes/rowsPerBand
    * mismatch used to silently produce ZERO old-new collisions (band
    * keys never match); now it is structurally impossible (ADVICE r13).
    */
  final case class BandIndexMeta(numHashes: Int, rowsPerBand: Int, nBuckets: Int)

  /** Band-index sidecar format: v2 added the [[IndexWitness]]
    * fingerprint + append lifecycle (r19 directive #1) — a v1 index
    * predates `formatVersion` entirely and gets the named rebuild
    * message via [[IndexWitness.requireFormat]]. */
  val BandIndexFormatVersion = 2

  /** Read the persisted fingerprint parameters; fails LOUDLY on a
    * pre-metadata or foreign directory instead of silently joining with
    * mismatched band keys. */
  def readBandIndexMeta(path: String): BandIndexMeta = {
    val propsOpt = Layout.pathTableProps(path)
    require(propsOpt.isDefined,
      s"$path has no path-table metadata — not a graft band index " +
        "(or written by a pre-metadata version); rebuild with saveBandIndex")
    val props = propsOpt.get
    val pj = new java.util.Properties()
    props.foreach { case (k, v) => pj.setProperty(k, v) }
    IndexWitness.requireFormat(s"$path (band index sidecar)", pj,
      BandIndexFormatVersion, "rebuild with saveBandIndex")
    def get(k: String): Int = {
      require(props.contains(k), s"band index metadata at $path is missing '$k'")
      props(k).toInt
    }
    BandIndexMeta(get("numHashes"), get("rowsPerBand"), get("nBuckets"))
  }

  /** The witness + meta re-bless shared by save/append/compact: the
    * caller props plus the CURRENT data-file fingerprint, published
    * last — a crash before this leaves either a fingerprint-less
    * sidecar (save) or the stale old fingerprint (append/compact),
    * both loud on the next read. */
  private def blessBandIndex(path: String, meta: BandIndexMeta): Unit =
    Layout.rewritePathTableProps(path, Map(
      "formatVersion" -> BandIndexFormatVersion.toString,
      "numHashes" -> meta.numHashes.toString,
      "rowsPerBand" -> meta.rowsPerBand.toString,
      "dataFp" -> IndexWitness.fingerprint(path)))

  /** Loud staleness check before every index read/append/compact —
    * the [[ProductQuantizer]] two-crash-window adjudication: this only
    * fires post-commit (files landed, meta re-bless lost), where a
    * re-run would refuse the same state. */
  private def checkBandWitness(path: String, who: String): Unit = {
    val fp = Layout.pathTableProps(path).flatMap(_.get("dataFp")).getOrElse(
      sys.error(s"$path has no dataFp in its sidecar — the build crashed " +
        "before the witness bless; rebuild with saveBandIndex"))
    IndexWitness.check(path, fp,
      s"$who found a stale index: band files changed without their meta (an " +
        "append or compaction crashed after its file commit, before the meta " +
        "re-bless)",
      "re-running the append/compaction would refuse this same state — " +
        "rebuild with saveBandIndex to re-bless the index")
  }

  /** Persist the LSH band index of a corpus: the (band_id, band_key,
    * doc_id, bucket) rows, computed via the zero-shuffle signature path
    * (pure scan — the corpus is read once; the one shuffle is the
    * bucketed write itself, paid ONCE and amortized over every nightly
    * join). The saved index is what makes dedup INCREMENTAL: a later
    * ingest batch joins its own bands against this table instead of
    * re-fingerprinting the historical corpus.
    *
    * The layout is BUCKETED by a SINGLE composite key (`bucket` =
    * band_id '#' band_key — bucket keys must BE the join keys; a
    * band_key-only bucketing cannot co-partition with a two-column
    * join and reshuffles both sides), so every [[incrementalCandidatePairs]]
    * run reads the index side exchange-free (plan-gated in DedupSpec).
    * Persistence rides [[Layout.saveBucketedPath]] (portable directory:
    * survives fixture renames, fresh sessions, metastore loss) with the
    * fingerprint parameters in the sidecar metadata.
    */
  def saveBandIndex(docs: DataFrame, path: String,
                    numHashes: Int = 16, rowsPerBand: Int = 4,
                    nBuckets: Int = 8): Unit = {
    val bands = bandRows(minhashSignaturesNoShuffle(docs, numHashes = numHashes), rowsPerBand)
      .withColumn("bucket", concat_ws("#", col("band_id"), col("band_key")))
    Layout.saveBucketedPath(bands, path, "bucket", nBuckets,
      extraProps = Map(
        "formatVersion" -> BandIndexFormatVersion.toString,
        "numHashes" -> numHashes.toString,
        "rowsPerBand" -> rowsPerBand.toString))
    blessBandIndex(path, BandIndexMeta(numHashes, rowsPerBand, nBuckets))
  }

  /** Append a batch's band rows into a persisted [[saveBandIndex]]
    * corpus — the lifecycle step after [[incrementalCandidatePairs]]
    * (r19 directive #1, the [[Similarity.appendToSemanticIndex]]
    * discipline for the minhash family): fingerprint the batch with the
    * index's OWN persisted parameters (a caller-side mismatch cannot
    * exist), bucketed-append under the existing spec so nightly
    * candidate joins stay exchange-free on the index side, re-bless the
    * witness last. The pre-append witness check makes a previously-
    * interrupted append fail loudly before compounding. Contract: rows
    * are SURVIVORS of the batch dedup with doc_ids new to the index —
    * re-appending an indexed doc_id would double its band rows and
    * double-emit its pairs (the appendToSemanticIndex contract). */
  def appendToBandIndex(newDocs: DataFrame, indexPath: String): Unit = {
    val meta = readBandIndexMeta(indexPath)
    checkBandWitness(indexPath, "appendToBandIndex")
    val bands = bandRows(
        minhashSignaturesNoShuffle(newDocs, numHashes = meta.numHashes),
        meta.rowsPerBand)
      .withColumn("bucket", concat_ws("#", col("band_id"), col("band_key")))
    Layout.appendBucketedPath(bands, indexPath)
    blessBandIndex(indexPath, meta)
  }

  /** Compact the per-night small files [[appendToBandIndex]] accretes
    * (r19 directive #2 — the [[ProductQuantizer.compactPqIndex]]
    * lifecycle for the band-index family): witness first (a stale index
    * must never be rewritten into "clean" files), rewrite to one file
    * per bucket through the BUCKETED writer
    * ([[Layout.compactBucketedPath]] — bucket ids preserved, candidate
    * joins stay exchange-free), re-bless the meta. Band rows are
    * untouched, so incremental candidates hash identically pre/post
    * (spec-gated). */
  def compactBandIndex(spark: SparkSession, indexPath: String,
                       targetFileBytes: Long = 128L * 1024 * 1024)
      : graft.ingest.Compaction.CompactionStats = {
    val meta = readBandIndexMeta(indexPath)
    checkBandWitness(indexPath, "compactBandIndex")
    val stats = Layout.compactBucketedPath(spark, indexPath, targetFileBytes)
    if (stats.compacted) blessBandIndex(indexPath, meta)
    stats
  }

  /** Open a [[saveBandIndex]] directory as the bucketed catalog table
    * the candidate join consumes ([[Layout.loadBucketedPath]]),
    * witness-checked loudly up front. */
  def loadBandIndex(spark: SparkSession, path: String): DataFrame = {
    readBandIndexMeta(path) // band-specific loud failure on foreign dirs
    checkBandWitness(path, "loadBandIndex")
    Layout.loadBucketedPath(spark, path)._1
  }

  /** Candidate pairs INVOLVING a new batch of documents, against a
    * persisted [[saveBandIndex]] corpus: (indexed x new) bucket
    * collisions plus (new x new) — never (indexed x indexed), those
    * were emitted when the index was built. The historical corpus costs
    * one index READ — and that read is the bucketed table, so the
    * index side joins with ZERO exchange whatever its size; the
    * recurring nightly cost is fingerprinting + shuffling the NEW batch
    * alone. Banding parameters come from the index's own metadata (a
    * caller-side mismatch cannot exist). Output (doc_a < doc_b),
    * distinct.
    */
  def incrementalCandidatePairs(newDocs: DataFrame, indexPath: String): DataFrame = {
    val spark = newDocs.sparkSession
    val meta = readBandIndexMeta(indexPath)
    val idx = loadBandIndex(spark, indexPath)
    // The new batch's band rows feed THREE join branches (old-new probe
    // + both sides of the new-new self-join); working-set
    // materialization keeps the fingerprint pipeline — the dominant
    // cost — at one evaluation, as the docstring promises.
    withWorkingSet(
      bandRows(minhashSignaturesNoShuffle(newDocs, numHashes = meta.numHashes), meta.rowsPerBand)
        .withColumn("bucket", concat_ws("#", col("band_id"), col("band_key")))) { nb =>
      val oldNew = idx.select(col("doc_id").as("doc_o"), col("bucket"))
        .join(nb.select(col("doc_id").as("doc_n"), col("bucket")), Seq("bucket"))
        .filter(col("doc_o") =!= col("doc_n"))
        .select(least(col("doc_o"), col("doc_n")).as("doc_a"),
          greatest(col("doc_o"), col("doc_n")).as("doc_b"))
      val newNew = nb.select(col("doc_id").as("doc_a"), col("bucket"))
        .join(nb.select(col("doc_id").as("doc_b"), col("bucket")), Seq("bucket"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b")
      oldNew.union(newNew).distinct()
    }
  }

  /** LSH banding over the wide signature matrix: docs agreeing on every
    * signature of a band become a candidate pair. Returns distinct
    * (doc_a, doc_b), a < b. The band explode happens on |docs| rows —
    * cheap — and the pair generation is an equi-join on
    * (band_id, band_key), the step that makes this scale.
    */
  def lshCandidatePairs(sig: DataFrame, rowsPerBand: Int = 4): DataFrame = {
    val bands = bandRows(sig, rowsPerBand)
    val a = bands.select(col("doc_id").as("doc_a"), col("band_id"), col("band_key"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band_id"), col("band_key"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Exact Jaccard over (doc_a, doc_b) candidate pairs; keeps pairs with
    * similarity >= threshold. Output: (doc_a, doc_b, jaccard[round4]).
    */
  def jaccardVerify(cand: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .filter(col("jac") >= threshold)
      .select(col("doc_a"), col("doc_b"), round4(col("jac")).as("jaccard"))
  }

  /** MinHash+LSH near-dup pairs, exact-verified at `threshold`.
    *
    * Candidate recall follows the banding s-curve
    * P(candidate | jaccard=j) = 1 - (1 - j^r)^b with r=rowsPerBand,
    * b=numHashes/r; at the defaults (r=4, b=4): j=0.8 → 0.88,
    * j=0.9 → 0.993, j=0.95 → 0.9998. The exact-Jaccard verification
    * step removes false positives entirely, so precision is 1.0 and the
    * curve governs recall only. Tune (numHashes, rowsPerBand) to move
    * the threshold knee.
    */
  def minhashDedupPairs(docs: DataFrame, threshold: Double = 0.8,
                        numHashes: Int = 16, rowsPerBand: Int = 4,
                        shingleN: Int = 3): DataFrame = {
    // The shingle set feeds signatures AND both sides of the exact
    // verification join — in eager mode it is persisted once instead of
    // re-exploding the corpus four times (spills to disk at scale), the
    // verified pairs (orders of magnitude smaller than the working set)
    // are materialized, and the cache is released before returning: a
    // long-lived session never accumulates shingle blocks across calls.
    // See [[MaterializeConf]] for the lazy cluster-mode alternative.
    withWorkingSet(shingleSet(docs, n = shingleN)) { sh =>
      jaccardVerify(lshCandidatePairs(minhashSignatures(sh, numHashes), rowsPerBand),
        sh, threshold).orderBy("doc_a", "doc_b")
    }
  }

  /** Exact n-gram Jaccard pairs (no LSH): candidates = docs sharing at
    * least one shingle. Quadratic in the worst case — the LSH variant is
    * the scale path; this is the ground-truth/oracle variant.
    */
  def exactJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
                        shingleN: Int = 3): DataFrame = {
    // Same cache-lifetime discipline as [[minhashDedupPairs]] (see
    // [[MaterializeConf]]): the shingle set is cached only for the
    // duration of this call in eager mode, not at all in lazy mode.
    withWorkingSet(shingleSet(docs, n = shingleN)) { sh =>
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("doc_a"), col("s"))
        .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("i"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
        .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
        .filter(col("jac") >= threshold)
        .select(col("doc_a"), col("doc_b"), round4(col("jac")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }
  }

  /** Jaccard pairs over the CAPPED shingle set ([[dropStopShingles]]):
    * the skew-safe variant of [[exactJaccardPairs]] — the self-join's
    * hottest key is bounded at `maxDocFraction * |docs|` rows, so no
    * near-universal shingle can melt a reducer at production scale.
    * Jaccard is computed over the capped sets (sizes shrink with the
    * cap, by definition of the capped metric), and the output carries
    * the capped sizes `na`/`nb` so the oracle hash is sensitive to the
    * cap arithmetic itself, not just to which pairs survive.
    */
  def cappedJaccardPairs(docs: DataFrame, maxDocFraction: Double = 0.01,
                         threshold: Double = 0.5, shingleN: Int = 3): DataFrame = {
    // [[dropStopShingles]] reads the raw shingle stream three times
    // (the nDocs count, the document-frequency aggregate, the join
    // back). r21 persisted that stream (MEMORY_AND_DISK) so the
    // explode ran once — and it was the round's one bad trade (r21
    // verdict): the raw exploded multiset is the query's LARGEST
    // intermediate, and holding it while the quadratic self-join runs
    // on top is a §5 spill bomb (driver-window median 15.4 s, 8 cores
    // beating 32 by 3.7x — memory-pressure thrash). Reverted: with the
    // shingle dedup now in-row ([[shingleSet]]), each re-read is a
    // shuffle-free scan+explode — three cheap passes beat one giant
    // persist at every scale. Only the CAPPED set (post-drop, feeding
    // sizes + both self-join sides) is working-set-persisted, the r20
    // shape.
    withWorkingSet(
      dropStopShingles(shingleSet(docs, n = shingleN), maxDocFraction)) { sh =>
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("doc_a"), col("s"))
        .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("i"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
        .withColumn("jac", col("i").cast("double") / (col("na") + col("nb") - col("i")))
        .filter(col("jac") >= threshold)
        .select(col("doc_a"), col("doc_b"), col("na"), col("nb"),
          round4(col("jac")).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }
  }

  /** Corpus-wide paragraph-level dedup (the C4/RefinedWeb curation
    * step): every paragraph that occurs more than once ACROSS the whole
    * corpus survives only at its first occurrence — ordered by
    * (doc_id, position) — and each document is reassembled from its
    * surviving paragraphs in original order. Documents left with no
    * surviving paragraph are dropped (their content exists verbatim
    * elsewhere).
    *
    * One shuffle keyed on the paragraph text (global first-occurrence
    * aggregation) + one shuffle back on doc_id for reassembly — never
    * all-pairs. At 100 TB the group key would be a 128-bit content hash
    * instead of the raw paragraph string (same plan shape, narrower
    * exchange); the raw string is used here so the DuckDB oracle can
    * express the identical algorithm.
    *
    * Output: (doc_id, text) with `text` the surviving paragraphs joined
    * by `sep`.
    */
  def paragraphDedup(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", sep: String = "\n\n"): DataFrame =
    paragraphDedupFromParas(
      docs.select(col(idCol).as("doc_id"),
          posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
            .as(Seq("para_idx", "para")))
        .filter(length(trim(col("para"))) > 0),
      sep)

  /** [[paragraphDedup]] over already-exploded (doc_id, para_idx, para)
    * rows — for callers that derive paragraphs some other way (chunked
    * tokens, markup-aware splitters) and must not round-trip them
    * through a separator-joined string (a paragraph containing the
    * separator would re-split differently). */
  def paragraphDedupFromParas(paras: DataFrame, sep: String = "\n\n"): DataFrame = {
    // Global first occurrence per paragraph: min (doc_id, para_idx).
    val keepers = paras.groupBy("para")
      .agg(min(struct(col("doc_id"), col("para_idx"))).as("keep"))
      .select(col("para"), col("keep.doc_id").as("doc_id"),
        col("keep.para_idx").as("para_idx"))
    paras.join(keepers, Seq("para", "doc_id", "para_idx"), "left_semi")
      .groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("para_idx"), col("para")))),
        x => x("para")), sep).as("text"))
  }

  /** Cross-corpus duplicated-SPAN statistics — the token-window
    * granularity of the exact-substring-dedup idea from the LLM
    * training-data literature (suffix-array dedup's measurable half):
    * for each document, how many of its `n`-token windows also occur
    * elsewhere in the corpus (any doc including itself — a repeated
    * span is a repeated span). Finer than [[paragraphDedup]] (spans
    * cross sentence/paragraph structure), coarser than a suffix
    * array (fixed window, no maximal-match extension — the documented
    * trade; windows overlap, so a duplicated run of length L marks
    * ~L−n+1 windows).
    *
    * Window identity is md5 of the space-joined window (house
    * invariant #3: the oracle replicates bit-for-bit). Pipeline: one
    * token pass + window explode (O(len·n) per doc), one hash-keyed
    * count aggregate, one join back on the same key (co-partitioned
    * after the aggregate), one doc-keyed reduction; the doc universe
    * rides a left join so zero-window (short) docs still report.
    *
    * @return (doc_id, n_windows, n_dup_windows, dup_frac) per doc —
    *         dup_frac rounded to 6, null when the doc has no windows
    */
  def duplicatedSpanStats(docs: DataFrame, n: Int = 8): DataFrame = {
    require(n >= 2, s"span window must be >= 2 tokens, got $n")
    val toks = docs.select(col("doc_id"),
      graft.functions.tokens(col("text")).as("__t"))
    withWorkingSet(toks) { tk =>
      // sequence(1, size-n+1) would run DESCENDING for short docs
      // (Spark generates [1, 0]); gate on size >= n instead.
      val w = tk.select(col("doc_id"),
          explode(when(size(col("__t")) >= n,
            sequence(lit(1), size(col("__t")) - (n - 1)))
            .otherwise(array().cast("array<int>"))).as("__i"),
          col("__t"))
        .select(col("doc_id"),
          md5(concat_ws(" ", slice(col("__t"), col("__i"), lit(n)))).as("h"))
      val counts = w.groupBy("h").agg(count(lit(1)).as("__c"))
      val perDoc = w.join(counts, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          sum(when(col("__c") > 1, 1L).otherwise(0L)).as("n_dup_windows"))
      tk.select("doc_id").join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_windows"), lit(0L)).as("n_windows"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
          graft.functions.roundFp(when(col("n_windows") > 0,
            col("n_dup_windows").cast("double") / col("n_windows")), 6)
            .as("dup_frac"))
    }
  }

  /** SimHash fingerprints (doc_id, fp): `bits`-bit simhash over the
    * shingle set. Bit k of a shingle = bit (k%4) of hex digit (k/4) of
    * md5(shingle); fp bit k = sign of the ±1 vote sum.
    *
    * The oracle SQL extracts each bit with string arithmetic
    * (position / floor / pow / %) per (shingle, bit); here the first 8
    * hex digits are parsed ONCE per shingle into a 32-bit integer and
    * each bit is a codegen'd shift+mask — value-identical, because hex
    * digit d (0-based from the left) is nibble (7-d) of that integer, so
    * bit (k%4) of digit (k/4) is bit 4*(7-k/4)+(k%4). Measured: drops
    * per-shingle cost from 32 string scans to one conv + 32 integer ops.
    */
  def simhashFingerprints(sh: DataFrame, bits: Int = 32): DataFrame = {
    require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")
    // md5 once per shingle; all `bits` vote-sums as parallel aggregates
    // in one grouped pass (no per-bit explode — shuffle stays |docs|).
    val withHex = sh.withColumn("h32",
      expr("CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)"))
    val aggs = (0 until bits).map { k =>
      val shift = 4 * (7 - k / 4) + (k % 4)
      sum(expr(
        s"CASE WHEN shiftright(h32, $shift) % 2 = 1 THEN 1 ELSE -1 END")).as(s"sgn$k")
    }
    val fpExpr = (0 until bits)
      .map(k => s"CASE WHEN sgn$k > 0 THEN CAST(${1L << k} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    withHex.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), expr(fpExpr).as("fp"))
  }

  /** Zero-shuffle variant of [[simhashFingerprints]]: the 32 vote sums
    * accumulate per document over its shingle array with one
    * `aggregate` HOF pass (md5 once per shingle, 32 bit-extractions per
    * hash folded into a 32-slot accumulator) — no explode, no groupBy,
    * no exchange. Bit-identical to the grouped form: same hash, same
    * bit arithmetic, same sign rule, and duplicate shingles are removed
    * by `array_distinct` exactly as [[shingleSet]]'s `distinct()` does.
    *
    * Measured trade-off (sf0.1, local[32]): ~1.6× more CPU than the
    * grouped form — higher-order-function lambdas evaluate interpreted,
    * while the 32 wide aggregates stay in whole-stage codegen. The
    * grouped form is the default; choose this one when eliminating the
    * exchange matters more than per-core throughput (e.g. fingerprints
    * computed inline in a scan-only pipeline).
    */
  def simhashFingerprintsNoShuffle(docs: DataFrame, idCol: String = "doc_id",
                                   textCol: String = "text", bits: Int = 32,
                                   shingleN: Int = 3): DataFrame = {
    require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")
    val votes =
      s"""aggregate(
         |  transform(array_distinct(${shinglesSql(textCol, shingleN)}),
         |    s -> CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT)),
         |  array_repeat(0L, $bits),
         |  (acc, h) -> zip_with(acc, transform(sequence(0, ${bits - 1}), k ->
         |    CASE WHEN shiftright(h, CAST(4 * (7 - k div 4) + k % 4 AS INT)) % 2 = 1
         |    THEN 1L ELSE -1L END), (a, b) -> a + b))""".stripMargin
    val fp =
      s"""aggregate(zip_with($votes, sequence(0, ${bits - 1}), (v, k) ->
         |  CASE WHEN v > 0 THEN shiftleft(1L, k) ELSE 0L END), 0L, (s, x) -> s + x)""".stripMargin
    docs.select(col(idCol).as("doc_id"), expr(fp).as("fp"))
  }

  /** Near-dup pairs by simhash Hamming distance <= maxDist, using
    * byte-band blocking (two fingerprints within Hamming distance d of a
    * 32-bit hash share at least one of 4 bytes when d <= 3). Library
    * scale path; verified by ScalaTest rather than the SQL oracle.
    */
  def simhashNearDupPairs(fps: DataFrame, maxDist: Int = 3): DataFrame = {
    val banded = fps.withColumn("byte_idx", explode(sequence(lit(0), lit(3))))
      .withColumn("byte_val", expr("(fp div CAST(POW(256, byte_idx) AS BIGINT)) % 256"))
    val a = banded.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"), col("byte_idx"), col("byte_val"))
    val b = banded.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"), col("byte_idx"), col("byte_val"))
    a.join(b, Seq("byte_idx", "byte_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** Exact content dedup: one surviving id per identical value of `byCol`
    * plus the duplicate count. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", byCol: String = "text"): DataFrame =
    docs.groupBy(byCol)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Connected components over undirected near-dup pairs, by alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014 — the standard
    * bounded-round formulation):
    *
    *   - large-star(u): every neighbor v > u re-attaches to
    *     m = min(Γ(u) ∪ {u});
    *   - small-star(u): u and its smaller neighbors all attach to the
    *     minimum among them.
    *
    * Both steps preserve connectivity, and the alternation converges to
    * star graphs rooted at each component's MINIMUM id in O(log n)
    * rounds — independent of component diameter. The previous min-label
    * propagation needed diameter rounds, which is fine for shallow
    * near-dup clusters but pathological on chain-shaped components (a
    * 63-diameter chain needed 63 rounds; this converges in ~6); at
    * 100 TB diameter is data-dependent and unbounded, so the log-round
    * variant is the one to ship. Each round is two groupBy-min
    * aggregations + two equi-joins — no driver-side graph, no graph
    * library. Returns (doc_id, component) for every vertex that appears
    * in a pair.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame =
    connectedComponentsWithRounds(pairs, maxIter)._1

  /** [[connectedComponents]] plus the number of alternation rounds used —
    * exposed so the round-bound (≤ ~log₂(max component size) + c) is a
    * testable property, not a comment. */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, maxIter: Int = 25): (DataFrame, Int) = {
    // The caller's `pairs` plan is executed EXACTLY ONCE, into this
    // checkpoint; the vertex set and the edge worklist both derive from
    // it. Deriving either from `pairs` directly would re-run the whole
    // upstream pair-generation pipeline (the dominant cost in dedup
    // jobs) on every downstream action in lazy mode — and with a
    // nondeterministic doc_id source could even disagree with the edges
    // the labels were computed from.
    val raw = materialize(pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
    // One row per undirected edge, self-loops dropped. Orientation is
    // irrelevant: each step symmetrizes or re-orients as needed. NOT
    // separately checkpointed: `raw` is the single checkpoint (measured:
    // a second one here cost dd08 ~1.5× at sf0.1), and this narrow
    // filter+distinct over it is cheap to evaluate in the first round's
    // lineage before the per-round checkpoints take over.
    val init = raw.filter(col("u") =!= col("v")).distinct()

    // large-star: E' = { (v, min(Γ(u) ∪ {u})) : v ∈ Γ(u), v > u }.
    // Emitted targets satisfy m ≤ u < v, so no self-loops arise.
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      nbrs.join(mins, Seq("u")).filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct()
    }

    // small-star: orient each edge toward the smaller endpoint; for each
    // u, Γ⁻(u) ∪ {u} all attach to m = min(Γ⁻(u)) (m < u by
    // construction). The (u, m) edge keeps u connected to its new root.
    def smallStar(e: DataFrame): DataFrame = {
      val directed = e.select(
        greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      val mins = directed.groupBy("u").agg(min("v").as("m"))
      val reattached = directed.join(mins, Seq("u"))
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      reattached.union(mins.select(col("u"), col("m").as("v"))).distinct()
    }

    // Eager checkpoint per round truncates the logical plan: without it
    // each round re-analyzes the whole accumulated lineage and Catalyst
    // analysis time grows super-linearly with rounds — measured
    // catastrophic by the round-2 scale probe long before any executor
    // work became the bottleneck. Unlike the gated result
    // materialization ([[MaterializeConf]]) this is load-bearing for the
    // algorithm itself, so it always happens; [[materialize]] upgrades
    // it to a RELIABLE checkpoint whenever the session has a checkpoint
    // dir, which is what a dynamic-allocation cluster should configure.
    var e = init
    // -1 sentinel defers the first count: round 1 can never test equal
    // against it, which is correct (an already-star input just spends
    // one identity round before round 2 detects the fixpoint — so a
    // NON-empty graph always needs maxIter >= 2) and saves a full
    // standalone evaluation of `init` before the loop.
    var eCount = -1L
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = materialize(smallStar(largeStar(e)))
      val nextCount = next.count()
      // Set equality via one anti-join + the counts: next⊆e ∧ |next|=|e|
      // ⇒ next=e. At the star-forest fixpoint both steps are identities.
      // The 0-count arm short-circuits the sentinel: star rounds never
      // empty a non-empty edge set (edges re-attach, never vanish), so
      // nextCount == 0 ⟺ the input graph had no non-self-loop edges —
      // converged at round 1, which keeps maxIter = 1 legal for the
      // trivially empty graph instead of throwing 'did not converge'.
      converged = nextCount == 0 ||
        (nextCount == eCount && next.except(e).isEmpty)
      // The previous round's checkpoint is now strictly superseded (its
      // only remaining reader was the except() above): release its
      // blocks eagerly so a long-lived session running dedup repeatedly
      // doesn't accumulate every intermediate round in executor storage
      // until GC. iter 0's `e` is `init` — un-checkpointed lineage over
      // `raw` — so there is nothing to release; `raw` itself and the
      // FINAL round stay live (the returned labels' lineage needs both).
      if (iter > 0) release(e)
      e = next
      eCount = nextCount
      iter += 1
    }
    // Silently returning partially-contracted edges would make every
    // downstream survivor decision wrong with no error signal (and
    // diverge from any exact-closure oracle); a graph that hasn't
    // reached its star form within maxIter must FAIL, not degrade.
    // Rounds scale with log(component size), so the default bound
    // covers any realistic graph — hitting it means something is wrong.
    if (!converged) throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds — " +
        "raise maxIter (rounds needed ≈ log₂ of the largest component)")
    // Fixpoint edges form (child, root) stars; roots appear only on the
    // right. Labels = children→root plus each root→itself, plus the
    // vertices whose ONLY pair was a self-loop (x, x): the init filter
    // drops that edge, so without this arm x would vanish from the
    // output instead of labelling itself (contract: every vertex that
    // appears in a pair). The anti-join arm is near-free in the common
    // no-self-loop case — the filtered side is empty — where a
    // join-back against ALL vertices would shuffle the full vertex set
    // on every downstream action.
    val starLabels = e.select(col("u").as("doc_id"), col("v").as("component"))
      .union(e.select(col("v").as("doc_id"), col("v").as("component")).distinct())
    val selfLoopOnly = raw.filter(col("u") === col("v"))
      .select(col("u").as("doc_id"), col("u").as("component")).distinct()
      .join(starLabels.select("doc_id"), Seq("doc_id"), "left_anti")
    (starLabels.union(selfLoopOnly), iter)
  }

  /** The production dedup pipeline: exact dedup FIRST (identical copies
    * collapse to one survivor via a cheap hash groupBy), then MinHash+LSH
    * near-dup detection among the survivors, keeping ONE representative
    * (the minimum doc_id) per connected component of verified pairs —
    * transitive-closure-safe: chains a~b~c collapse to a single
    * survivor, and no two retained docs share a verified pair. Ordering
    * matters at scale: exact-duplicate clusters (ubiquitous in crawled
    * corpora) would otherwise enter the LSH verification join as
    * all-pairs identity groups — measured 9× slower on a 20×-replicated
    * 100k-doc corpus.
    *
    * Returns the retained (doc_id, text) rows.
    */
  /** Quality-aware survivor selection: given component labels (from
    * [[connectedComponents]]) and a per-doc score table, pick each
    * component's survivor as the HIGHEST-scoring member (ties → min
    * doc_id) instead of the min-id default — what a curation pipeline
    * actually wants: when near-dups differ (truncation, boilerplate,
    * OCR noise), keep the best copy, not the numerically-first one.
    *
    * One component-keyed window pass — `first_value` over
    * (score DESC, doc_id) labels every member with its survivor in the
    * same shuffle that ranks it; no join-back. Output
    * (doc_id, component, survivor_id) for every labelled doc.
    */
  def survivorsByQuality(components: DataFrame, scores: DataFrame,
                         scoreCol: String = "quality"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("component").orderBy(col(scoreCol).desc, col("doc_id"))
    // LEFT join: a member missing from the scores table must stay in
    // the output and remain a (last-ranked) survivor candidate — an
    // inner join would silently drop it from both, breaking the
    // "every labelled doc" contract (review r13). Spark's DESC ranks
    // NULL scores last, which is exactly "unscored loses to any score".
    components.join(scores.select(col("doc_id"), col(scoreCol)), Seq("doc_id"), "left")
      .select(col("doc_id"), col("component"),
        first(col("doc_id")).over(w).as("survivor_id"))
  }

  def fullDedup(docs: DataFrame, threshold: Double = 0.8,
                numHashes: Int = 16, rowsPerBand: Int = 4,
                shingleN: Int = 3): DataFrame = {
    val exact = docs
      .groupBy("text").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id", "text")
    if (eager(docs)) {
      val cached = exact.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val pairs = minhashDedupPairs(cached, threshold, numHashes, rowsPerBand, shingleN)
        val drop = connectedComponents(pairs)
          .filter(col("doc_id") =!= col("component")) // keep each component's min id
          .select("doc_id")
        // Materialize the SURVIVORS before releasing the cache: the
        // final anti-join must see the exact rows `drop` was computed
        // from. Re-deriving survivors at action time is only safe when
        // the caller's doc_id is deterministic — with e.g.
        // monotonically_increasing_id the recomputed ids can disagree
        // with `drop` and retain the wrong rows. `drop` itself needs no
        // extra materialization: connectedComponents checkpoints its
        // input pairs once up front and its labels derive only from
        // that checkpoint and the per-round checkpointed edges.
        materialize(cached).join(drop, Seq("doc_id"), "left_anti")
      } finally cached.unpersist()
    } else {
      // Lazy mode: nothing materialized, so consistency rests on the
      // input being deterministic — documented at [[MaterializeConf]].
      val pairs = minhashDedupPairs(exact, threshold, numHashes, rowsPerBand, shingleN)
      val drop = connectedComponents(pairs)
        .filter(col("doc_id") =!= col("component"))
        .select("doc_id")
      exact.join(drop, Seq("doc_id"), "left_anti")
    }
  }
}
