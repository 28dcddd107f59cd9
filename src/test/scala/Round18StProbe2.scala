import graft.GraftSession
import graft.streaming.StreamingOps

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-18 experiment #2: per-micro-batch duration breakdown of the
  * st02 interval-join replay (progress JSON durationMs), to decide
  * whether the floor is state-store machinery or something shaveable.
  * `Test/runMain Round18StProbe2`. */
object Round18StProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", "graft-st-probe18b")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.init(spark)
    import java.sql.Timestamp
    val rows = graft.Tables(spark, sfDir).events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts").cast("timestamp"))
      .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.TIMESTAMP))
      .collect().sortBy(r => (r._3.getTime, r._2))
    val nChunks = 4
    val chunks = rows.grouped((rows.length + nChunks - 1) / nChunks).toArray
    val spanMs = chunks.map(c => c.last._3.getTime - c.head._3.getTime).max
    val delayHours = math.max(1L, 2 * spanMs / 3600000L + 1)
    val maxTs = rows.last._3.getTime
    val delayMs = delayHours * 3600000L

    val replay = spark.newSession()
    replay.conf.set("spark.sql.shuffle.partitions", "8")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = replay.sqlContext
    import replay.implicits._
    val msL = MemoryStream[(Long, Long, Timestamp)]
    val msR = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingOps.intervalJoin(
      msL.toDF.toDF("user_id", "l_event", "lts"),
      msR.toDF.toDF("user_id", "r_event", "rts"),
      key = "user_id", leftTs = "lts", rightTs = "rts",
      band = "5 minutes", watermark = s"$delayHours hours", joinType = "inner")
    val cp = java.nio.file.Files.createTempDirectory("probe18b-cp").toString
    val t0 = System.nanoTime()
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("probe18b")
      .option("checkpointLocation", cp)
      .start()
    try {
      chunks.foreach { batch =>
        val (l, r) = batch.partition(_._2 % 2 == 0)
        if (l.nonEmpty) msL.addData(l.toSeq)
        if (r.nonEmpty) msR.addData(r.toSeq)
        q.processAllAvailable()
      }
      msL.addData(Seq((-1L, -2L, new Timestamp(maxTs + 2 * delayMs))))
      msR.addData(Seq((-3L, -1L, new Timestamp(maxTs + 2 * delayMs))))
      q.processAllAvailable()
      msL.addData(Seq((-1L, -4L, new Timestamp(maxTs + 4 * delayMs))))
      msR.addData(Seq((-3L, -3L, new Timestamp(maxTs + 4 * delayMs))))
      q.processAllAvailable()
      println(f"PROBE18B total feed: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      q.recentProgress.foreach { p =>
        println(s"PROBE18B batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durations=${p.durationMs} state=${p.stateOperators.map(s =>
            s"commit=${s.commitTimeMs}ms rows=${s.numRowsTotal}").mkString(",")}")
      }
    } finally q.stop()
    spark.stop()
  }
}
