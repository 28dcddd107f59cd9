package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Effectively-once guard for `foreachBatch` sinks that are not
  * natively idempotent (JDBC upserts, remote-queue acks, plain parquet
  * appends): Spark's contract after a crash is to REPLAY the last
  * uncommitted micro-batch with the same batchId (at-least-once), so a
  * sink that records committed batchIds and skips replays upgrades the
  * pipeline to effectively-once — the same recovery envelope the
  * reference gets from SQS redelivery + idempotent S3 puts
  * (ingestor.go:57-60 discussion).
  *
  * The marker write happens AFTER the body (commit-after-write, the A14
  * invariant): a crash between body and marker re-runs the body, which
  * is exactly the at-least-once half the downstream must tolerate or
  * the body must make idempotent.
  *
  * Markers go through the Hadoop FileSystem API, so `markerDir` may be
  * local, HDFS, or s3a:// — same as the checkpoint location.
  */
object IdempotentSink {

  /** Runs `body` unless `batchId` already committed under `markerDir`.
    * Returns true when the body ran, false when the replay was skipped.
    */
  def once(spark: SparkSession, markerDir: String, batchId: Long)(body: => Unit): Boolean = {
    val dir = new Path(markerDir)
    val marker = new Path(dir, f"batch-$batchId%020d")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(marker)) {
      IngestMetrics.inc(BatchReplaysSkipped)
      false
    } else {
      body
      fs.mkdirs(dir)
      // overwrite=false: two concurrent writers of the same batch would
      // both run the body (at-least-once), but only one marker wins.
      val out = fs.create(marker, false)
      out.close()
      true
    }
  }

  /** Committed batch ids currently recorded under `markerDir`. */
  def committedBatches(spark: SparkSession, markerDir: String): Seq[Long] = {
    val dir = new Path(markerDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("batch-"))
      .map(_.stripPrefix("batch-").toLong)
      .sorted
  }

  val BatchReplaysSkipped = "ingestor_batch_replays_skipped_total"
}
