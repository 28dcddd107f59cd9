import graft.GraftSession

import org.apache.spark.sql.functions._

/** Round-18 experiment: where does the st02/st03 interval-join replay
  * time go, and do the remaining knobs move it? Times the inner and
  * leftOuter replays at sf0.1 under (a) the default HDFS-backed state
  * store and (b) RocksDB, and with per-phase timers around the feed.
  * `Test/runMain Round18StProbe [sfDir]`. */
object Round18StProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "graft-st-probe18")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    val events = graft.Tables(spark, sfDir).events.select("user_id", "event_id", "ts")
      .cache()
    println(s"PROBE18S events: ${events.count()}")

    def run(tag: String): Unit = {
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        val n1 = graft.streaming.StreamReplay.intervalJoinReplay(
          spark, events, nChunks = 4).count()
        val t1 = System.nanoTime()
        val n2 = graft.streaming.StreamReplay.intervalJoinReplay(
          spark, events, joinType = "leftOuter", nChunks = 4).count()
        val t2 = System.nanoTime()
        println(f"PROBE18S $tag pass$pass inner: ${(t1 - t0) / 1e9}%.2f s ($n1 rows); " +
          f"outer: ${(t2 - t1) / 1e9}%.2f s ($n2 rows)")
      }
    }
    run("hdfs-default")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    run("rocksdb")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
    // stateStore.* keys propagate into the replay child (and bust its
    // session cache), so this leg genuinely runs with fewer snapshots
    spark.conf.set("spark.sql.streaming.stateStore.minDeltasForSnapshot", "1000")
    run("hdfs-fewsnap")
    spark.stop()
  }
}
