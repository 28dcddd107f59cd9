package graft.sources.remote

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.ingest.LeaseRunner

/** Pipeline-side glue for the remote-queue connector: distributed
  * post-write acknowledgement and visibility-lease keep-alive — the two
  * ingestor responsibilities the reference layers on top of its source
  * (ingestor.go:235-255 ack-after-flush, :618-648 lease goroutine).
  */
object RemoteIngest {

  /** Acknowledge every `ack_handle` in `batch`, distributed: one client
    * per partition, chunked ≤ 10 per service call
    * ([[AckDispatcher.ackAll]]). Call AFTER the sink write succeeded —
    * never before — to preserve the ack-after-durable-write invariant.
    * A partial failure throws, failing the micro-batch: already-acked
    * chunks stay acked, everything else redelivers after its lease
    * lapses (at-least-once, the reference's envelope).
    *
    * No driver-side collect: at 100 TB the handles never leave the
    * executors.
    */
  /** `ackRetry` is the SEPARATE acknowledgement retry policy
    * (SetAckRetryPolicy, ingestor.go:247-255), independent of the sink
    * write's policy: the default single attempt mirrors the reference's
    * no-retry default — an ack failure is non-fatal to the DATA (the
    * messages simply redeliver), so retries are an opt-in latency trade.
    * Handles are materialized per partition for the retry closure; the
    * per-trigger admission budget bounds that list. Re-deleting an
    * already-acked handle on retry is safe (delete is idempotent).
    */
  def ackAfterWrite(batch: DataFrame, factory: RemoteQueueClientFactory,
                    handleCol: String = "ack_handle",
                    ackRetry: graft.ingest.SimpleRetry = graft.ingest.SimpleRetry(attempts = 1)): Unit =
    batch.select(col(handleCol)).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val handles = rows.map(_.getString(0)).toVector
      val client = factory.create()
      try { ackRetry { AckDispatcher.ackAll(client, handles.iterator) }; () }
      finally client.close()
    }

  /** Failure routing WITHOUT a DLQ: reset the visibility lease of the
    * failed rows' messages so the queue redelivers them after
    * `delaySec` — the reference's `Message.Fail` path
    * (source_sqs.go:510-524: ChangeMessageVisibility with
    * FailVisibilityTimeoutSeconds on transform/size-estimation
    * failure; 0 = immediately redeliverable). The alternative to the
    * DLQ route when the failure is transient (schema service down,
    * enrichment timeout): do NOT ack the failed rows, call this
    * instead, and the messages re-enter the queue after the delay —
    * with DLQ routing (A5) reserved for poison payloads.
    *
    * Distributed like [[ackAfterWrite]]: one client per partition,
    * chunked ≤ 10 via [[AckDispatcher.extendAll]] (the service's batch
    * form of the reference's per-message call). A partial failure
    * throws — the affected messages simply redeliver when their
    * ORIGINAL lease lapses, so the failure path degrades to a longer
    * delay, never to loss.
    */
  def failWithDelay(batch: DataFrame, factory: RemoteQueueClientFactory,
                    delaySec: Int, handleCol: String = "ack_handle"): Unit = {
    require(delaySec >= 0, s"fail visibility delay must be non-negative, got $delaySec")
    batch.select(col(handleCol)).foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      val client = factory.create()
      try { AckDispatcher.extendAll(client, rows.map(_.getString(0)), delaySec); () }
      finally client.close()
    }
  }

  /** Start a keep-alive that re-extends the visibility lease of
    * `handles` every `renewEveryMs` while a long flush runs — the
    * reference's per-flush lease goroutine (ingestor.go:618-648) on the
    * engine's [[LeaseRunner]]. Stops on the first failed extension.
    * Close the returned runner when the flush completes.
    *
    * The handle set is the driver-known in-flight frontier (e.g. one
    * representative handle per source partition, or all handles of a
    * small control batch); for bulk data the initial
    * `visibilityTimeoutSec` should be sized to cover the flush instead —
    * extending millions of leases per renewal would be the scale bug.
    */
  def keepAlive(handles: Seq[String], factory: RemoteQueueClientFactory,
                extendBySec: Int, renewEveryMs: Long): LeaseRunner = {
    val client = factory.create()
    new LeaseRunner(
      () => AckDispatcher.extendAll(client, handles.iterator, extendBySec) == handles.count(_.nonEmpty),
      renewEveryMs)
  }

  /** Convenience reader: the connector's stream as a DataFrame. */
  def readStream(spark: org.apache.spark.sql.SparkSession,
                 factoryClass: String,
                 cfg: RemoteQueueConfig = RemoteQueueConfig(),
                 queueId: Option[String] = None): DataFrame = {
    var r = spark.readStream.format("graft.sources.remote.RemoteQueueSource")
      .option("factoryClass", factoryClass)
      .option("waitTimeSeconds", cfg.waitTimeSeconds)
      .option("maxMessages", cfg.maxMessages)
      .option("visibilityTimeoutSec", cfg.visibilityTimeoutSec)
      .option("pollers", cfg.pollers)
      .option("maxPerTrigger", cfg.maxPerTrigger)
      .option("receiveBackoffMs", cfg.receiveBackoffMs)
      .option("maxReceiveRetries", cfg.maxReceiveRetries)
    queueId.foreach(q => r = r.option("queueId", q))
    r.load()
  }
}
