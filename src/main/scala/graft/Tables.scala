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

  /** Register all tables as temp views (for SQL-surface queries). */
  def registerViews(): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
      .foreach(n => t(n).createOrReplaceTempView(n))
}

object Tables {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
}
