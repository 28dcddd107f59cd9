package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.{functions => F}

/** graft's column-function surface: native expressions exposed as
  * `Column` builders plus SQL registration, and composed helpers for the
  * text/dedup/similarity operators. Everything here stays declarative
  * (catalyst expressions / built-in functions) so Catalyst can push down,
  * prune and codegen around it.
  */
package object functions {

  /** Cosine similarity between two `array<float|double>` columns (native,
    * codegen'd — see [[CosineSimilarity]]). Requires [[registerAll]] to
    * have run on the session (GraftSession does this automatically).
    */
  def cosine_similarity(a: Column, b: Column): Column =
    F.call_function("cosine_similarity", a, b)

  def rolling_hash(text: Column): Column =
    F.call_function("rolling_hash", text)

  /** Jaro–Winkler similarity in [0, 1] between two string columns
    * (native, codegen'd — see [[JaroWinkler]] for the pinned
    * semantics). */
  def jaro_winkler(a: Column, b: Column): Column =
    F.call_function("jaro_winkler", a, b)

  /** Subword tokens / token count under a BPE vocabulary (native,
    * codegen'd — see [[BpeVocab]]). The vocab travels as a foldable
    * literal in [[BpeVocab.encode]] wire form, parsed once per operator.
    */
  def bpe_tokens(text: Column, vocab: BpeVocab): Column =
    F.call_function("bpe_tokens", text, F.lit(vocab.encoded))
  def bpe_count(text: Column, vocab: BpeVocab): Column =
    F.call_function("bpe_count", text, F.lit(vocab.encoded))

  /** Lower-cased whitespace tokens with empties removed. */
  def tokens(text: Column): Column =
    F.filter(F.split(F.lower(text), " "), w => w =!= "")

  /** Word n-gram shingles (default 3) over [[tokens]]; empty array when
    * the document has fewer than `n` tokens. Shingles are the unit set
    * for minhash / jaccard dedup.
    *
    * Built from `n` shifted `slice`s zipped together rather than
    * `transform` + `element_at`: per-index element_at lambdas get the
    * token expression inlined per access (O(tokens²) per document —
    * measured 12× slower); the slice/zip_with form evaluates the token
    * array once and streams it.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    require(n >= 2, s"shingle size must be >= 2, got $n")
    val t = tokens(text)
    val len = F.greatest(F.size(t) - (n - 1), F.lit(0))
    val shifted = (1 to n).map(k => F.slice(t, F.lit(k), len))
    shifted.reduce((acc, next) => F.zip_with(acc, next, (a, b) => F.concat(a, F.lit(" "), b)))
  }

  /** Round a double to `scale` decimals the way C engines (DuckDB,
    * Trino, ...) do: `round(x * 10^scale) / 10^scale` in pure FP.
    *
    * Spark's `round` instead goes through `BigDecimal.valueOf` (shortest
    * decimal repr of the double), which disagrees with the FP path on
    * boundary values like 91628.614999999991 (→ .61 vs .62). Emulating
    * the FP path keeps rounded doubles bit-identical to the DuckDB
    * oracle: the multiply, integer-round (both half-away-from-zero) and
    * divide are all IEEE-identical.
    */
  def roundFp(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    // + 0.0 normalizes IEEE negative zero (DuckDB's FP round yields -0.0
    // for tiny negatives; the oracle SQL carries the same "+ 0")
    F.round(c * p) / p + F.lit(0.0)
  }
  def round2(c: Column): Column = roundFp(c, 2)
  def round4(c: Column): Column = roundFp(c, 4)

  /** True iff `tz` denotes a fixed offset equal to UTC (accepts "UTC",
    * "Z", "+00:00", "Etc/UTC", ... — anything whose rules are a fixed
    * zero offset). */
  private[graft] def isUtcZone(tz: String): Boolean = {
    val rules = java.time.ZoneId.of(tz).getRules
    rules.isFixedOffset &&
      rules.getOffset(java.time.Instant.EPOCH) == java.time.ZoneOffset.UTC
  }

  /** Precondition guard for every NTZ→TIMESTAMP normalization cast in the
    * library (Tables.events, RangeJoin.intervalJoin): the cast
    * reinterprets a naive wall time in the SESSION zone, so it is
    * lossless — and stable against the epoch-comparing oracle — only
    * under fixed-offset UTC. In any other zone (including DST zones,
    * where the wall-time offset is non-uniform across the data's time
    * range) the cast would silently shift timestamps; failing loudly at
    * the operator that owns the cast beats a wrong answer with no error.
    */
  private[graft] def requireUtcSession(spark: SparkSession, context: String): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(isUtcZone(tz),
      s"$context requires spark.sql.session.timeZone=UTC (got '$tz') — use " +
        "GraftSession or call graft.functions.registerAll(spark) first")
  }

  /** Register graft SQL functions and session confs on `spark`
    * (idempotent — safe to call per query).
    *
    * SIDE EFFECT: pins `spark.sql.session.timeZone` to UTC (see below).
    * If the session arrived with an explicitly configured non-UTC zone,
    * the override is logged at WARN so the semantic change to the user's
    * own timestamp queries is observable rather than silent.
    */
  def registerAll(spark: SparkSession): Unit = {
    // Driver testdata writes events.ts as TIMESTAMP(NANOS); read as long
    // nanos (converted to microsecond timestamps in Tables.events).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The engine's timestamp semantics are defined under UTC: the
    // loader's TIMESTAMP_NTZ→TIMESTAMP normalization (Tables.events,
    // RangeJoin) is lossless only when the session zone is UTC, and the
    // DuckDB oracle compares epoch values under the same convention.
    // GraftSession.builder pins this for library-built sessions; pinning
    // it here too covers externally-built sessions routed through init()
    // — without it, a host-local zone would shift every normalized NTZ
    // timestamp by the zone offset.
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    if (!isUtcZone(prevTz)) {
      org.slf4j.LoggerFactory.getLogger("graft.functions").warn(
        s"graft.functions.registerAll: overriding spark.sql.session.timeZone " +
          s"'$prevTz' with 'UTC' — graft's timestamp semantics (NTZ " +
          "normalization, epoch functions) are defined under UTC; timestamp " +
          "queries outside graft running on this session are affected too")
    }
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Parquet writes must carry timestamp statistics (legacy INT96 has
    // none — no time-predicate pruning on anything the engine writes);
    // see the GraftSession.builder comment for the measured impact.
    // Same observability contract as the timeZone override above: an
    // externally-built session gets one WARN, because this changes the
    // encoding of the user's OWN parquet writes too (a reader fleet
    // pinned to INT96-era expectations should know when it flipped).
    val prevEnc = spark.conf.get("spark.sql.parquet.outputTimestampType")
    if (prevEnc != "TIMESTAMP_MICROS") {
      org.slf4j.LoggerFactory.getLogger("graft.functions").warn(
        s"graft.functions.registerAll: overriding spark.sql.parquet.outputTimestampType " +
          s"'$prevEnc' with 'TIMESTAMP_MICROS' — INT96 carries no column statistics " +
          "(no time-predicate pruning); all parquet written on this session is affected")
    }
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"))) {
      reg.createOrReplaceTempFunction(
        "cosine_similarity",
        es => CosineSimilarity(es.head, es(1)),
        "built-in")
    }
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash"))) {
      reg.createOrReplaceTempFunction(
        "rolling_hash",
        es => RollingHash(es.head),
        "built-in")
    }
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_tokens"))) {
      reg.createOrReplaceTempFunction(
        "bpe_tokens",
        es => BpeTokens(es.head, es(1)),
        "built-in")
    }
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("bpe_count"))) {
      reg.createOrReplaceTempFunction(
        "bpe_count",
        es => BpeCount(es.head, es(1)),
        "built-in")
    }
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("jaro_winkler"))) {
      reg.createOrReplaceTempFunction(
        "jaro_winkler",
        es => JaroWinkler(es.head, es(1)),
        "built-in")
    }
  }
}
