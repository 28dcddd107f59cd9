package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
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

  /** Distinct word n-gram shingles per document: (doc_id, s). */
  def shingleSet(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(shingles(col(textCol), n)).as("s"))
      .distinct()

  /** MinHash signatures (doc_id, seed, sig): sig_j = MIN over shingles of
    * md5(j ":" shingle). md5 acts as the hash family; lexicographic MIN
    * over the hex digest is the permutation-min. Deterministic and
    * cross-engine reproducible (unlike hash seeds tied to an engine).
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 16): DataFrame =
    sh.withColumn("seed", explode(sequence(lit(0), lit(numHashes - 1))))
      .groupBy("doc_id", "seed")
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("s")))).as("sig"))

  /** LSH banding over signatures: docs agreeing on every row of a band
    * become a candidate pair. Returns distinct (doc_a, doc_b), a < b.
    */
  def lshCandidatePairs(sig: DataFrame, rowsPerBand: Int = 4): DataFrame = {
    val bands = sig
      .groupBy(col("doc_id"), expr(s"seed div $rowsPerBand").as("band_id"))
      .agg(concat_ws("|",
        transform(array_sort(collect_list(struct(col("seed"), col("sig")))),
          x => x.getField("sig"))).as("band_key"))
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

  /** MinHash+LSH near-dup pairs, exact-verified at `threshold`. */
  def minhashDedupPairs(docs: DataFrame, threshold: Double = 0.8,
                        numHashes: Int = 16, rowsPerBand: Int = 4,
                        shingleN: Int = 3): DataFrame = {
    val sh = shingleSet(docs, n = shingleN)
    val cand = lshCandidatePairs(minhashSignatures(sh, numHashes), rowsPerBand)
    jaccardVerify(cand, sh, threshold).orderBy("doc_a", "doc_b")
  }

  /** Exact n-gram Jaccard pairs (no LSH): candidates = docs sharing at
    * least one shingle. Quadratic in the worst case — the LSH variant is
    * the scale path; this is the ground-truth/oracle variant.
    */
  def exactJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
                        shingleN: Int = 3): DataFrame = {
    val sh = shingleSet(docs, n = shingleN)
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

  /** SimHash fingerprints (doc_id, fp): `bits`-bit simhash over the
    * shingle set. Bit k of a shingle = bit (k%4) of hex digit (k/4) of
    * md5(shingle); fp bit k = sign of the ±1 vote sum. The bit-extraction
    * arithmetic (position / floor / pow / %) is chosen to be expressible
    * identically in the oracle SQL.
    */
  def simhashFingerprints(sh: DataFrame, bits: Int = 32): DataFrame = {
    require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")
    sh.withColumn("k", explode(sequence(lit(0), lit(bits - 1))))
      .withColumn("contrib", expr(
        "CASE WHEN CAST(FLOOR((position(substring(md5(s), 1 + (k div 4), 1) IN " +
          "'0123456789abcdef') - 1) / POW(2, k % 4)) AS INT) % 2 = 1 THEN 1 ELSE -1 END"))
      .groupBy("doc_id", "k")
      .agg(sum("contrib").as("sgn"))
      .groupBy("doc_id")
      .agg(sum(when(col("sgn") > 0, expr("CAST(POW(2, k) AS BIGINT)"))
        .otherwise(lit(0L))).as("fp"))
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
}
