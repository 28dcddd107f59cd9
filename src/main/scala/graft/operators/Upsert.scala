package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert materialization / CDC compaction: collapse an append-only
  * change stream to the LATEST record per key — the batch half of the
  * reference's at-least-once ingestion story (replays and re-deliveries
  * append duplicates; downstream readers want one current row per key).
  *
  * Scale shape: ONE hash shuffle on the key columns; the window is
  * PARTITIONED per key, so every task ranks only its own keys' rows —
  * no global sort, no single-partition stage (the thing
  * [[GlobalRank]] exists to avoid does not arise here). Skewed keys are
  * the usual caveat: salt upstream ([[Layout.saltedJoin]] pattern) or
  * lean on AQE skew handling.
  */
object Upsert {

  /** One row per distinct `keys` combination: the first row under
    * `ordering` (pass descending columns for "latest"). The ordering
    * must be tie-free for deterministic output — include a unique
    * column (e.g. an event id) last.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    require(keys.nonEmpty, "latestByKey needs at least one key column")
    require(ordering.nonEmpty, "latestByKey needs an ordering")
    require(!df.columns.contains("__rn"),
      "input must not already have a '__rn' column (it would be replaced and dropped)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
