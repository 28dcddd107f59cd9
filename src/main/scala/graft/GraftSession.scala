package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Tuned for the driver's local[32] harness but every setting is the one
  * you'd want on a real cluster too: AQE on (runtime join-strategy switch,
  * skew-join splitting, partition coalescing), UTC session time zone for
  * cross-engine timestamp parity, shuffle partitions sized to the core
  * count rather than the 200 default.
  */
object GraftSession {

  def builder(master: String = "local[32]", appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def apply(master: String = "local[32]", appName: String = "graft"): SparkSession = {
    val spark = builder(master, appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    init(spark)
  }

  /** Register graft SQL functions + optimizer rules on an
    * externally-built session (idempotent). */
  def init(spark: SparkSession): SparkSession = {
    functions.registerAll(spark)
    if (!spark.experimental.extraOptimizations.contains(FoldConstantCosine))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FoldConstantCosine
    spark
  }
}
