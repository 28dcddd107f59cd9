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
}
