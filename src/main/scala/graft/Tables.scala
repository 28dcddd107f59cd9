package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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
  private def t(name: String): DataFrame =
    Tables.cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => spark.read.parquet(key._2))

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's reader
    * rejects natively; with `spark.sql.legacy.parquet.nanosAsLong` (set by
    * GraftSession.init) it arrives as LONG nanos and is truncated to
    * microseconds here — the same truncation DuckDB applies, keeping the
    * oracle comparable. Integer division (`div`) avoids the double-path
    * precision loss on ~1e18 nano values.
    */
  def events: DataFrame = {
    val df = t("events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
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
  def partsupp: DataFrame = {
    val key = (spark, s"$dir#partsupp")
    val cached = Tables.cache.get(key)
    if (cached != null) cached
    else {
      // Materialize OUTSIDE computeIfAbsent: derivePartsupp reads the
      // same cache (supplier/part/lineitem) and runs Spark jobs —
      // neither may happen inside a CHM mapping function (reentrant
      // computeIfAbsent can throw "Recursive update", and a multi-second
      // job would run under a bin lock). Racing threads at worst derive
      // identical bytes; putIfAbsent keeps one canonical plan.
      val fixture = Fixtures.ensure(
        s"partsupp/${Fixtures.pathTag(dir)}", Tables.PartsuppDerivationVersion) {
        f => derivePartsupp().write.mode("overwrite").parquet(f.toString)
      }
      val df = spark.read.parquet(fixture)
      val prev = Tables.cache.putIfAbsent(key, df)
      if (prev != null) prev else df
    }
  }

  private def derivePartsupp(): DataFrame = {
    val nSupp = supplier.count() // O(1) driver-side scalar, paid once
    val formula = part.select(col("p_partkey").as("ps_partkey"))
      .crossJoin(spark.range(4).select(col("id").as("i")))
      .select(col("ps_partkey"),
        ((col("ps_partkey") * 7 + col("i") * 13) % nSupp).as("ps_suppkey"))
    val fromFacts = lineitem
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
    formula.union(fromFacts).distinct()
      .select(col("ps_partkey"), col("ps_suppkey"),
        ((col("ps_partkey") * 31 + col("ps_suppkey") * 17) % 9999 + 1)
          .cast("int").as("ps_availqty"),
        (((col("ps_partkey") * 13 + col("ps_suppkey") * 7) % 99900 + 100)
          .cast("bigint") / 1000.0).as("ps_supplycost"))
  }

  /** Register all tables as temp views (for SQL-surface queries). */
  def registerViews(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(n => t(n).createOrReplaceTempView(n))
}

object Tables {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Bump WHENEVER `derivePartsupp`'s formula changes (multipliers,
    * moduli, the pair union) — the version is part of the fixture path,
    * so stale fixtures from an older formula self-invalidate instead of
    * failing the oracle gate with a confusing fixture-vs-CTE mismatch.
    * PartsuppQueries.psCte must change in the same commit. */
  private[graft] val PartsuppDerivationVersion = "v1"
}
