package graft.ingest

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Stamped(id: Long, ts: Timestamp)

class StampedTransformer extends Transformer[Stamped] {
  override def transform(e: Envelope): Seq[Stamped] = {
    val Array(id, ts) = e.payload.split(',')
    Seq(Stamped(id.toLong, Timestamp.valueOf(ts)))
  }
}

/** The payoff test for the y/m/d/h key layout (A9): a time-filtered read
  * of the ingested sink must prune to the matching partition directories
  * — at 100 TB this is the difference between scanning an hour and
  * scanning a year.
  */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("event-time keyed sink prunes partitions on h= filters") {
    val (sink, cp) = (tmpDir("sink"), tmpDir("cp"))
    val p = IngestPipeline[Stamped](
      new StampedTransformer, sink, cp,
      policy = BatchPolicy(flushIntervalMs = 0L),
      eventTimeCol = Some("ts"))
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Envelope]
    val q = p.start(ms.toDS())
    try {
      val payloads =
        (1 to 6).map(i => s"$i,2024-03-01 10:0$i:00") ++
          (7 to 9).map(i => s"$i,2024-03-01 11:0$i:00")
      ms.addData(payloads.map(Envelope(_, Map.empty)))
      q.processAllAvailable()
    } finally q.stop()

    val hour10 = spark.read.parquet(sink).filter($"h" === "10")
    assert(hour10.count() == 6)
    val plan = hour10.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(h") || plan.contains("PartitionFilters: [(h"),
      s"expected partition pruning on h:\n${plan.take(600)}")
    // directory layout carries both hours
    val hours = java.nio.file.Files.walk(java.nio.file.Paths.get(sink)).iterator()
    val hDirs = scala.jdk.CollectionConverters.IteratorHasAsScala(hours).asScala
      .map(_.getFileName.toString).filter(_.startsWith("h=")).toSet
    assert(hDirs == Set("h=10", "h=11"))
  }

  test("hour-range backfill read prunes to the requested hours across day boundaries") {
    val dir = tmpDir("range-sink")
    val rows = Seq(
      (1L, "2024-03-01 22:10:00"), (2L, "2024-03-01 23:10:00"),
      (3L, "2024-03-02 00:10:00"), (4L, "2024-03-02 01:10:00"),
      (5L, "2024-03-02 02:10:00"))
      .toDF("id", "raw").select($"id", $"raw".cast("timestamp").as("ts"))
    TimeKeys.withUtcKeys(rows, $"ts")
      .write.mode("overwrite").partitionBy(TimeKeys.PartitionColumns: _*).parquet(dir)

    // 23:00 through 01:59 spans a midnight boundary — the composite-key
    // predicate must still select exactly those three hour partitions
    val got = TimeKeys.readHourRange(spark, dir, "2024-03-01 23", "2024-03-02 01")
    assert(got.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))

    // and it really prunes: the scan's own listing returns 3 of 5 hour dirs
    val scan = got.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val parts = scan.relation.location.listFiles(scan.partitionFilters, scan.dataFilters)
    assert(parts.length == 3, s"expected 3 pruned hour partitions, got ${parts.length}")

    intercept[IllegalArgumentException] {
      TimeKeys.hourRange("2024-3-1 9", "2024-03-02 01")
    }
  }
}
