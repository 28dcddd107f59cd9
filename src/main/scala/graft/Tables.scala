package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the TPC-H-ish star schema used by the correctness gate
  * (see /root/repo/TESTDATA.md). One parquet file per table under `dir`.
  *
  * Reads are plain `spark.read.parquet` so Catalyst's predicate pushdown,
  * column pruning and (when the layout has them) partition pruning apply
  * unchanged to every downstream query.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // Memoized per (session, path): re-running 47 queries shouldn't
  // re-list files and re-read footers 47 times. DataFrames are
  // immutable logical plans, so sharing is safe; testdata is read-only.
  private def t(name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    Tables.memo(spark, path)(spark.read.parquet(path))
  }

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` has shipped in three parquet shapes across testdata
    * regenerations, all normalized HERE (not at call sites) to session-TZ
    * TIMESTAMP so every downstream consumer (`unix_millis`/`unix_micros`,
    * event-time windows, as-of joins) sees one type:
    *
    *   - TIMESTAMP(NANOS): Spark's reader rejects it natively; with
    *     `spark.sql.legacy.parquet.nanosAsLong` (set by GraftSession.init)
    *     it arrives as LONG nanos and is truncated to microseconds — the
    *     same truncation DuckDB applies. Integer division (`div`) avoids
    *     the double-path precision loss on ~1e18 nano values.
    *   - timestamp[us] with isAdjustedToUTC=false (pandas/pyarrow
    *     default): Spark 4 reads TIMESTAMP_NTZ, which the epoch functions
    *     reject. The session time zone is pinned UTC, so casting the
    *     naive wall time to TIMESTAMP is lossless and matches DuckDB's
    *     epoch interpretation of the same naive value.
    *   - timestamp[us] UTC-adjusted: already TIMESTAMP, passes through.
    */
  def events: DataFrame = {
    val df = t("events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // The NTZ→TIMESTAMP cast reinterprets the naive wall time in the
        // SESSION zone; it is lossless (and oracle-stable) only under
        // UTC. GraftSession.builder and functions.registerAll both pin
        // UTC, but Tables is public API — a session that reached here
        // un-pinned (e.g. extensions-only packaging on a non-UTC host)
        // would get every timestamp silently shifted by the zone offset,
        // so the precondition is enforced where the cast lives.
        graft.functions.requireUtcSession(spark,
          "events.ts is TIMESTAMP_NTZ; normalizing it")
        df.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType => df
      // A FOURTH shape must fail here, once, with a loader-level message
      // — not as a confusing per-query analysis error downstream (or,
      // worse, a silently wrong cast interpretation).
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported type $other — teach Tables.events " +
          "to normalize this shape (see TimestampShapeSpec for the known ones)")
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** Derived `partsupp` fixture — the driver testdata has no partsupp
    * table, which blocked the TPC-H shapes Q2/Q8-adjacent family (see
    * VERDICT r7 §"What's missing"). The table is DERIVED from the
    * existing `part`/`supplier`/`lineitem` keys with pure integer
    * arithmetic, so the DuckDB oracle can recompute the identical rows
    * as a CTE (PartsuppQueries.psCte) with zero cross-engine FP risk:
    *
    *   pairs  = { (p_partkey, (p_partkey*7 + i*13) % |supplier|) : i ∈ 0..3 }
    *          ∪ distinct (l_partkey, l_suppkey)        — referential
    *            integrity: every lineitem pair exists in partsupp,
    *            like real TPC-H, so Q9/Q20-shape joins are total;
    *   ps_availqty    = (pk*31 + sk*17) % 9999 + 1               (INT)
    *   ps_supplycost  = ((pk*13 + sk*7) % 99900 + 100) / 1000.0  (DOUBLE,
    *     exact: same integer, same correctly-rounded division in both
    *     engines).
    *
    * The derivation is materialized ONCE per sf dir to a parquet fixture
    * (under fixtures/ in the repo working dir) and read back, so
    * downstream scans get real pushdown/pruning/statistics instead of an
    * in-memory plan — and the oracle hash gate then proves
    * file == derivation on every run.
    */
  def partsupp: DataFrame =
    // The memo is catalog-backed (no CHM mapping function), so running
    // the derivation's Spark jobs — which re-enter the memo for
    // supplier/part/lineitem — inside the load thunk is safe; racing
    // threads at worst derive identical bytes (Fixtures publishes
    // atomically) and replace the view with an identical plan.
    Tables.memo(spark, s"$dir#partsupp") {
      val fixture = Fixtures.ensure(
        s"partsupp/${Fixtures.pathTag(dir)}", Tables.PartsuppDerivationVersion) {
        f => derivePartsupp().write.mode("overwrite").parquet(f.toString)
      }
      spark.read.parquet(fixture)
    }

  private def derivePartsupp(): DataFrame = {
    val nSupp = supplier.count() // O(1) driver-side scalar, paid once
    // Keys arrive as int64 in the driver parquet (verified), but the
    // explicit bigint cast pins 64-bit arithmetic on BOTH engines even
    // if a future testdata build ships int32 keys — Spark would wrap
    // silently at p_partkey*31 past ~69M parts while DuckDB raises,
    // diverging fixture from oracle (ADVICE r8). psCte mirrors the cast.
    val formula = part.select(col("p_partkey").cast("bigint").as("ps_partkey"))
      .crossJoin(spark.range(4).select(col("id").as("i")))
      .select(col("ps_partkey"),
        ((col("ps_partkey") * 7 + col("i") * 13) % nSupp).as("ps_suppkey"))
    val fromFacts = lineitem
      .select(col("l_partkey").cast("bigint").as("ps_partkey"),
        col("l_suppkey").cast("bigint").as("ps_suppkey"))
    formula.union(fromFacts).distinct()
      .select(col("ps_partkey"), col("ps_suppkey"),
        ((col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 9999 + 1)
          .cast("int").as("ps_availqty"),
        (((col("ps_partkey") * 13 + col("ps_suppkey") * 7) % 99900 + 100)
          .cast("bigint") / 1000.0).as("ps_supplycost"))
  }

  /** Register all tables as temp views (for SQL-surface queries).
    * `events` goes through the normalizing accessor so SQL consumers see
    * the same TIMESTAMP-typed `ts` as the DataFrame surface.
    */
  def registerViews(): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(n => t(n).createOrReplaceTempView(n))
    events.createOrReplaceTempView("events")
  }
}

object Tables {
  /** Per-session table memo whose entries release WITH their session
    * (VERDICT r8 "What's wrong" #2: the old process-global
    * `(session, dir) → DataFrame` map never evicted, so a service
    * cycling sessions retained every session's plans forever).
    *
    * The memo is the session's OWN temp-view catalog: the loaded
    * DataFrame's analyzed plan (with its resolved FileIndex — the
    * expensive footer/listing work) is stored as a hidden
    * `__graft_memo_*` temp view, and later hits resolve the stored plan
    * via `spark.table`. No process-global state exists at all, so the
    * lifetime question answers itself — views die with their session,
    * and an unreferenced session (views, plans and all) is one
    * collectable cycle. The obvious alternatives both leak: a
    * WeakHashMap's value would pin its key (DataFrame → session), and
    * anchoring via a registered `QueryExecutionListener` pins the graph
    * in the SHARED context bus (ExecutionListenerManager registers its
    * bus on `sparkContext.listenerBus`, which strongly holds every
    * listener until the context stops). [[graft.TablesCacheSpec]] pins
    * collectability empirically.
    */
  // Per-(session, view) load serialization (review r9): the
  // catalog-backed memo alone is check-then-act, so a cold start under
  // Verify's thread pool would run the SAME load thunk (footer listing;
  // for partsupp, fixture materialization) once per racing thread. The
  // lock is per VIEW, not per session — one session-wide lock would
  // convoy every unrelated cold load behind partsupp's multi-second
  // materialization. No deadlock: partsupp's thunk acquires other
  // views' locks while holding its own, but no thunk ever acquires
  // partsupp's, so the acquisition graph is acyclic. Weak keys keep the
  // outer map from pinning sessions — the values hold no back-ref.
  private val loadLocks =
    new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[String, AnyRef]]()
  private def lockFor(spark: SparkSession, view: String): AnyRef = {
    val perView = loadLocks.synchronized {
      var m = loadLocks.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
        loadLocks.put(spark, m)
      }
      m
    }
    perView.computeIfAbsent(view, _ => new Object)
  }

  private def memo(spark: SparkSession, key: String)(load: => DataFrame): DataFrame = {
    // '.' must not reach the view name (spark.table would parse it as a
    // namespace separator); the md5 in pathTag keeps names collision-free.
    val view = "__graft_memo_" + Fixtures.pathTag(key).replace('.', '_')
    if (spark.catalog.tableExists(view)) spark.table(view)
    else lockFor(spark, view).synchronized {
      if (spark.catalog.tableExists(view)) spark.table(view)
      else {
        val df = load
        df.createOrReplaceTempView(view)
        spark.table(view)
      }
    }
  }

  /** Bump WHENEVER `derivePartsupp`'s formula changes (multipliers,
    * moduli, the pair union) — the version is part of the fixture path,
    * so stale fixtures from an older formula self-invalidate instead of
    * failing the oracle gate with a confusing fixture-vs-CTE mismatch.
    * PartsuppQueries.psCte must change in the same commit. (v2: explicit
    * bigint key casts — byte-identical on the current int64 testdata,
    * bumped anyway so the fixture provably comes from the cast formula.) */
  private[graft] val PartsuppDerivationVersion = "v2"
}
