package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-process bounded message queue with explicit acknowledgement — the
  * test/reference implementation of the reference's queue-source contract
  * (`Sourcer { Receive; AckBatch }`, /root/reference/source/source.go:41-44;
  * SQS realization source/source_sqs.go:204-315).
  *
  * Semantics mirrored:
  *   - the producer side is elastic (SQS producers never block); the
  *     `capacity` (default 256, the reference's source-buffer size)
  *     bounds admission instead: `latestOffset` exposes at most
  *     `capacity` messages beyond the highest sequence already read —
  *     the reference's bounded buffer drains as the ingestor RECEIVES
  *     messages (ack is a separate, later step), and this is that
  *     receive-gated window expressed as per-trigger admission control;
  *   - messages stay in the queue until ACKED; the ack happens in
  *     [[QueueMicroBatchStream.commit]], i.e. only after the micro-batch
  *     durably completed — exactly the reference's
  *     ack-after-successful-write invariant (ingestor.go:57-60) mapped
  *     onto Spark's offset-commit contract (A14);
  *   - ack removes messages ≤ the committed sequence (the
  *     DeleteMessageBatch analog); unacked messages are replayed to the
  *     next reader (at-least-once). Note Spark's commit timing: batch
  *     N's `commit` fires as batch N+1 is constructed, so the ack
  *     TRAILS the durable write — strictly safe (never early), with
  *     redelivery possible on crash between write and ack, exactly the
  *     reference's at-least-once envelope.
  *
  * Poller scaling / visibility leases (A15/A18) are remote-connector
  * concerns (keep-alive loops inside a real SQS partition reader) and are
  * documented, not implemented, here.
  */
object QueueRegistry {
  final case class Msg(seq: Long, payload: String, attributes: Map[String, String])

  final class Queue(val capacity: Int) {
    private val nextSeq = new AtomicLong(0L)
    private val buf = mutable.TreeMap.empty[Long, Msg] // seq -> msg, unacked
    private var acked = -1L

    def enqueue(payload: String, attributes: Map[String, String] = Map.empty): Long =
      synchronized {
        val seq = nextSeq.getAndIncrement()
        buf.put(seq, Msg(seq, payload, attributes))
        seq
      }

    def latestSeq: Long = nextSeq.get() - 1

    private var readThrough = -1L

    /** Highest sequence the engine may read now: at most `capacity`
      * messages beyond what has already been read into a batch (the
      * bounded-buffer admission gate).
      */
    def admissibleThrough: Long =
      synchronized(math.min(latestSeq, readThrough + capacity))

    /** Messages in (after, until] that are still unacked; marks them as
      * read (refilling the admission window). */
    def slice(after: Long, until: Long): Seq[Msg] =
      synchronized {
        readThrough = math.max(readThrough, until)
        buf.range(after + 1, until + 1).values.toSeq
      }

    /** Ack everything ≤ seq: remove from the buffer, widen admission. */
    def ack(seq: Long): Unit = synchronized {
      val ackedKeys = buf.rangeTo(seq).keys.toSeq
      ackedKeys.foreach(buf.remove)
      acked = math.max(acked, seq)
    }

    def ackedThrough: Long = synchronized(acked)
    def pending: Int = synchronized(buf.size)
  }

  private val queues = new ConcurrentHashMap[String, Queue]()

  def get(name: String, capacity: Int = 256): Queue =
    queues.computeIfAbsent(name, _ => new Queue(capacity))

  def drop(name: String): Unit = queues.remove(name)
}

/** `spark.readStream.format("graft.sources.QueueSource").option("name", q)`
  * — schema: value STRING, attributes MAP<STRING,STRING> (the Envelope
  * shape).
  */
class QueueSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = QueueSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new QueueTable(properties.asScala.getOrElse("name",
      throw new IllegalArgumentException("queue source requires option 'name'")))
}

object QueueSource {
  val Schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("attributes", MapType(StringType, StringType), nullable = false)))
}

private[sources] class QueueTable(queueName: String) extends Table with SupportsRead {
  override def name(): String = s"graft-queue($queueName)"
  override def schema(): StructType = QueueSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = QueueSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new QueueMicroBatchStream(queueName)
    }
}

private[sources] case class QueueOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

private[sources] class QueueMicroBatchStream(queueName: String) extends MicroBatchStream {
  private def queue = QueueRegistry.get(queueName)

  override def initialOffset(): Offset = QueueOffset(-1L)
  override def deserializeOffset(json: String): Offset = QueueOffset(json.toLong)
  override def latestOffset(): Offset = QueueOffset(queue.admissibleThrough)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val msgs = queue.slice(start.asInstanceOf[QueueOffset].seq, end.asInstanceOf[QueueOffset].seq)
    // Messages ride inside the partition (driver-fed source, like rate/
    // memory sources); a remote-queue connector would instead ship
    // receive cursors and poll inside the partition reader (A1).
    Array(QueuePartition(msgs.map(m => (m.payload, m.attributes)).toArray))
  }

  override def createReaderFactory(): PartitionReaderFactory = QueueReaderFactory

  /** The ack: called by the engine only after the micro-batch fully
    * committed downstream. */
  override def commit(end: Offset): Unit = queue.ack(end.asInstanceOf[QueueOffset].seq)

  override def stop(): Unit = ()
}

private[sources] case class QueuePartition(msgs: Array[(String, Map[String, String])])
  extends InputPartition

private[sources] object QueueReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val msgs = partition.asInstanceOf[QueuePartition].msgs
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < msgs.length }
      override def get(): InternalRow = {
        val (payload, attrs) = msgs(i)
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(payload),
          ArrayBasedMapData(attrs, (k: Any) => UTF8String.fromString(k.toString),
            (v: Any) => UTF8String.fromString(v.toString))))
      }
      override def close(): Unit = ()
    }
  }
}
