package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate (materialized-view) maintenance: keep a
  * per-key (count, sum) aggregate current under signed CDC deltas —
  * inserts (+1) and deletes (-1) — WITHOUT rescanning the base. At
  * 100 TB the base aggregate is the thing you cannot afford to
  * recompute per batch; count/sum are self-maintainable (each delta
  * row's effect is additive), so maintenance cost scales with the
  * delta, not the base.
  *
  * The merge is a union + re-aggregate on the key — one shuffle of
  * base-aggregate cardinality (keys, not rows) plus the delta. Keys
  * whose maintained count reaches zero are REMOVED, not left as
  * zero-rows: a fully-retracted key must disappear exactly as it would
  * under recompute (the subtlety most hand-rolled maintenance gets
  * wrong — asserted by spec and by the oracle hash).
  *
  * Non-self-maintainable aggregates (min/max under deletes) need the
  * base data or an auxiliary structure by definition; this operator is
  * the additive family only.
  */
object IncrementalAgg {

  /** Aggregate a signed delta: (keys..., __n = Σ sign,
    * __s = Σ sign·value). `signCol` holds +1 (insert) / -1 (delete).
    */
  def signedAgg(delta: DataFrame, keys: Seq[String], valueCol: String,
                signCol: String): DataFrame =
    delta.groupBy(keys.map(col): _*)
      .agg(sum(col(signCol)).cast("long").as("__n"),
        sum(col(signCol) * col(valueCol)).cast("long").as("__s"))

  /** Apply a signed delta aggregate to a base aggregate with the same
    * key columns and (`nCol`, `sCol`) value columns; returns the
    * maintained aggregate with fully-retracted keys dropped.
    */
  def applyDelta(baseAgg: DataFrame, deltaAgg: DataFrame, keys: Seq[String],
                 nCol: String, sCol: String): DataFrame = {
    val renamed = deltaAgg
      .withColumnRenamed("__n", nCol).withColumnRenamed("__s", sCol)
    baseAgg.unionByName(renamed)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(nCol)).cast("long").as(nCol), sum(col(sCol)).cast("long").as(sCol))
      .filter(col(nCol) =!= 0)
  }
}
