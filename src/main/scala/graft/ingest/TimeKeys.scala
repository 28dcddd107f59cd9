package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** UTC time-partition key layout, mirroring the reference's
  * `YYYY/MM/DD/HH/<unique-file>` object-key scheme
  * (/root/reference/ingestor/ingestor.go:771-798). In Spark the key
  * becomes hive-style partition directories `y=YYYY/m=MM/d=DD/h=HH` with
  * task-unique part-file names — the same prunable time layout with
  * collision-free files, produced in parallel per partition instead of
  * one key per flush.
  */
object TimeKeys {
  val PartitionColumns: Seq[String] = Seq("y", "m", "d", "h")

  /** Adds y/m/d/h string columns derived from `ts` (UTC — session time
    * zone is pinned to UTC by GraftSession).
    */
  def withUtcKeys(df: DataFrame, ts: Column): DataFrame =
    df.withColumn("y", date_format(ts, "yyyy"))
      .withColumn("m", date_format(ts, "MM"))
      .withColumn("d", date_format(ts, "dd"))
      .withColumn("h", date_format(ts, "HH"))
}
