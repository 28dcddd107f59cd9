package graft.sources.remote

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.IngestMetrics

/** Executor-side remote-queue connector — the distributed realization of
  * the reference's SQS source (/root/reference/source/source_sqs.go):
  * each micro-batch plans `pollers` input partitions, and each partition
  * READER long-polls a [[RemoteQueueClient]] (instantiated executor-side
  * from the `factoryClass` option) until its share of the per-trigger
  * admission budget is met, the queue drains, or the poll deadline
  * passes. Rows carry the receipt handle (`ack_handle` column) so the
  * pipeline can acknowledge AFTER the durable sink write via
  * [[RemoteIngest.ackAfterWrite]] — the reference's flush-then-AckBatch
  * order (ingestor.go:57-60) expressed over Spark's execution model.
  *
  * Contract mapping (reference → here):
  *   - poll loop w/ 250 ms error backoff (source_sqs.go:204-247) →
  *     [[RemoteQueuePartitionReader]] receive loop, bounded consecutive
  *     retries then fail the task (Spark's task retry takes over);
  *   - SetPollers runtime scaling (:249-285) → [[PollerControl.set]],
  *     consulted at every `planInputPartitions` — the next micro-batch
  *     runs with the new poller count;
  *   - BufSize bounded buffer (:55-57) → `maxPerTrigger` admission cap
  *     split across pollers (the buffer that decouples poll from process
  *     is the micro-batch itself);
  *   - recovery: the source is NOT offset-replayable (neither is SQS) —
  *     an uncommitted batch's messages simply reappear after their
  *     visibility lease lapses, the exact at-least-once envelope the
  *     reference relies on.
  *
  * Scale note: pollers here are distributed across executors (the
  * reference's goroutines share one process); at 1000 executors the
  * admission budget, not the poller count, is the throughput governor.
  */
class RemoteQueueSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RemoteQueueSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = properties.asScala.map { case (k, v) => k.toLowerCase -> v }
    val factoryClass = opts.getOrElse("factoryclass",
      throw new IllegalArgumentException("remote queue source requires option 'factoryClass'"))
    val cfg = RemoteQueueConfig(
      waitTimeSeconds = opts.getOrElse("waittimeseconds", "20").toInt,
      maxMessages = opts.getOrElse("maxmessages", "10").toInt,
      visibilityTimeoutSec = opts.getOrElse("visibilitytimeoutsec", "30").toInt,
      pollers = opts.getOrElse("pollers", "3").toInt,
      maxPerTrigger = opts.getOrElse("maxpertrigger", "256").toInt,
      receiveBackoffMs = opts.getOrElse("receivebackoffms", "250").toLong,
      maxReceiveRetries = opts.getOrElse("maxreceiveretries", "3").toInt)
    val queueId = opts.getOrElse("queueid", factoryClass)
    new RemoteQueueTable(factoryClass, queueId, cfg)
  }
}

object RemoteQueueSource {
  val Schema: StructType = StructType(Seq(
    StructField("payload", StringType, nullable = false),
    StructField("attributes", MapType(StringType, StringType), nullable = false),
    StructField("ack_handle", StringType, nullable = false)))

  // source_sqs metric family (README.md:170-186 naming convention)
  val ReceiveCalls = "source_queue_receive_calls_total"
  val MessagesReceived = "source_queue_messages_received_total"
  val ReceiveErrors = "source_queue_receive_errors_total"
  val PollersGauge = "source_queue_pollers"
}

/** Runtime poller scaling (SetPollers analog, source_sqs.go:249-285):
  * the adaptive runtime writes the desired count here; the next
  * micro-batch's `planInputPartitions` reads it. Shares the
  * [[graft.ingest.ControlKnob]] mechanism (clamp-to-1 + gauge) with
  * [[graft.ingest.WorkerControl]].
  */
object PollerControl extends graft.ingest.ControlKnob(RemoteQueueSource.PollersGauge)

private[remote] class RemoteQueueTable(factoryClass: String, queueId: String,
                                       cfg: RemoteQueueConfig)
  extends Table with SupportsRead {
  override def name(): String = s"graft-remote-queue($queueId)"
  override def schema(): StructType = RemoteQueueSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = RemoteQueueSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new RemoteQueueMicroBatchStream(factoryClass, queueId, cfg)
    }
}

/** Offset = trigger epoch. The underlying queue is not offset-addressable
  * (messages are identified by lease, not position), so the offset only
  * sequences micro-batches; exactly-what-replays is governed by the
  * service's visibility timeout, not the checkpoint.
  */
private[remote] case class EpochOffset(epoch: Long) extends Offset {
  override def json(): String = epoch.toString
}

private[remote] class RemoteQueueMicroBatchStream(factoryClass: String, queueId: String,
                                                  cfg: RemoteQueueConfig)
  extends MicroBatchStream with SupportsAdmissionControl {
  private var epoch = 0L

  // Driver-side client used ONLY for the cheap backlog probe; message
  // traffic stays executor-side in the partition readers.
  private lazy val probe: RemoteQueueClient =
    Class.forName(factoryClass).getDeclaredConstructor().newInstance()
      .asInstanceOf[RemoteQueueClientFactory].create()

  override def initialOffset(): Offset = EpochOffset(0L)

  /** Restart path, part 1: a fresh stream instance starts at epoch 0,
    * but the checkpoint may hold a later committed offset. Every offset
    * Spark hands back through deserialization raises the epoch floor.
    * This alone is NOT sufficient — the engine deserializes restored
    * offsets lazily, after the first scheduling decision — hence the
    * admission-control path below; the floor here is defense in depth.
    */
  override def deserializeOffset(json: String): Offset = {
    val restored = json.toLong
    epoch = math.max(epoch, restored)
    EpochOffset(restored)
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Restart path, part 2 (the one the engine actually exercises):
    * `SupportsAdmissionControl.latestOffset(start, _)` receives the
    * RESTORED start offset before the first scheduling comparison, so
    * the epoch counter re-bases on it. Without this, a restarted
    * stream's first latestOffset returned `restoredEpoch` itself (a
    * fresh counter incremented once), the engine compared it equal to
    * the restored start, concluded "no new data", and a
    * `processAllAvailable` caller saw a permanent stall while backlog
    * sat in the queue. The per-trigger admission budget stays enforced
    * in `planInputPartitions` (budget split across pollers), so the
    * ReadLimit is `allAvailable`.
    *
    * Advances (schedules a batch) only when the queue reports backlog —
    * otherwise `processAllAvailable`/idle triggers would spin empty
    * micro-batches forever against a source with no replayable offsets.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    // robust to either form the engine hands over (deserialized or raw)
    val startEpoch = start match {
      case e: EpochOffset => e.epoch
      case other => other.json().toLong
    }
    epoch = math.max(epoch, startEpoch)
    if (probe.approximateBacklog() > 0) epoch += 1
    EpochOffset(epoch)
  }

  /** Plain-MicroBatchStream variant; the engine prefers the
    * admission-control overload above when both are present. */
  override def latestOffset(): Offset = {
    if (probe.approximateBacklog() > 0) epoch += 1
    EpochOffset(epoch)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    if (start.asInstanceOf[EpochOffset].epoch == end.asInstanceOf[EpochOffset].epoch)
      return Array.empty
    val n = PollerControl.get(queueId, cfg.pollers)
    IngestMetrics.gauge(RemoteQueueSource.PollersGauge, n.toDouble)
    // Ceiling split so n readers jointly admit >= maxPerTrigger when the
    // queue has that much backlog, never more than maxPerTrigger + n - 1.
    val budget = (cfg.maxPerTrigger + n - 1) / n
    (0 until n).map(i => RemoteQueuePartition(factoryClass, i, budget, cfg): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = RemoteQueueReaderFactory

  /** Source-level commit is a no-op BY DESIGN: acknowledgement happens
    * after the durable sink write ([[RemoteIngest.ackAfterWrite]]), not
    * at offset commit — receipt handles live in the rows, executor-side,
    * and the reference's ingestor likewise acks explicitly post-flush
    * rather than implicitly at receive. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = probe.close()
}

private[remote] case class RemoteQueuePartition(factoryClass: String, pollerId: Int,
                                                budget: Int, cfg: RemoteQueueConfig)
  extends InputPartition

private[remote] object RemoteQueueReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RemoteQueuePartitionReader(partition.asInstanceOf[RemoteQueuePartition])
}

/** The poll loop (source_sqs.go:204-247 analog), executor-side: receive
  * up to `maxMessages` at a time until the partition's admission budget
  * is met or the queue drains (empty receive). A transport error counts,
  * backs off `receiveBackoffMs`, and retries; more than
  * `maxReceiveRetries` CONSECUTIVE failures fails the task — Spark's
  * task retry (and ultimately the visibility timeout) takes recovery
  * from there, where the reference's forever-loop relies on context
  * cancellation instead.
  */
private[remote] class RemoteQueuePartitionReader(p: RemoteQueuePartition)
  extends PartitionReader[InternalRow] {

  private val client: RemoteQueueClient =
    Class.forName(p.factoryClass).getDeclaredConstructor().newInstance()
      .asInstanceOf[RemoteQueueClientFactory].create()

  private var received = 0
  private var drained = false
  private var buf: Iterator[QueueMessage] = Iterator.empty
  private var current: QueueMessage = _

  private def poll(): Unit = {
    var consecutiveErrors = 0
    while (buf.isEmpty && !drained && received < p.budget) {
      val want = math.min(p.cfg.maxMessages, p.budget - received)
      try {
        val msgs = client.receive(want, p.cfg.waitTimeSeconds * 1000L, p.cfg.visibilityTimeoutSec)
        consecutiveErrors = 0
        IngestMetrics.inc(RemoteQueueSource.ReceiveCalls)
        IngestMetrics.inc(RemoteQueueSource.MessagesReceived, msgs.size.toLong)
        if (msgs.isEmpty) drained = true
        else { received += msgs.size; buf = msgs.iterator }
      } catch {
        case e: Throwable =>
          IngestMetrics.inc(RemoteQueueSource.ReceiveErrors)
          consecutiveErrors += 1
          if (consecutiveErrors > p.cfg.maxReceiveRetries) throw e
          Thread.sleep(p.cfg.receiveBackoffMs)
      }
    }
  }

  override def next(): Boolean = {
    if (buf.isEmpty) poll()
    if (buf.hasNext) { current = buf.next(); true } else false
  }

  override def get(): InternalRow = new GenericInternalRow(Array[Any](
    UTF8String.fromString(current.payload),
    ArrayBasedMapData(current.attributes,
      (k: Any) => UTF8String.fromString(k.toString),
      (v: Any) => UTF8String.fromString(v.toString)),
    UTF8String.fromString(current.handle)))

  override def close(): Unit = client.close()
}
