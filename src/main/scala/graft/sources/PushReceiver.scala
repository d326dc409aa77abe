package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.FlowEventModel

/** In-process push receiver: a custom DataSource V2 MicroBatchStream fed
  * by an in-memory channel queue — the transport seam of the reference's
  * network receivers (receiver_http.go:125-158 reads the request body into
  * a message, query params into meta, and pushes onto a channel; the
  * tcp/udp/unix receivers differ only in framing). A real deployment
  * mounts an HTTP/TCP listener that calls `PushReceiver.push`; tests and
  * local pipelines push directly.
  *
  * Emits the engine's event schema (body binary, meta map, ingest_ts).
  * Offsets are message counts per channel, so Structured Streaming's
  * checkpointing gives exactly-once delivery into the DAG as long as the
  * channel buffer outlives query restarts (at-least-once from the
  * network's perspective, matching the reference's ack model).
  *
  * `maxMsgsPerTrigger` caps each micro-batch — source-side admission
  * control, the scale knob SURVEY §2.6.3 maps backpressure onto.
  */
object PushReceiver {
  final case class Msg(body: Array[Byte], meta: Map[String, String], tsMicros: Long)

  /** Default channel capacity — the reference's buffer bound
    * (buffer.go:11: 65,536 messages). */
  val DefaultCapacity: Int = 65536

  private val channels = new ConcurrentHashMap[String, ArrayBuffer[Msg]]()
  private val capacities = new ConcurrentHashMap[String, Integer]()

  private def buf(channel: String): ArrayBuffer[Msg] =
    channels.computeIfAbsent(channel, _ => ArrayBuffer.empty[Msg])

  /** Bound a channel's buffer; pushes beyond it are rejected (the
    * backpressure edge: listeners surface it as THROTTLED). */
  def configure(channel: String, capacity: Int): Unit =
    capacities.put(channel, capacity)

  /** Push one message; returns its offset in the channel, or -1 if the
    * channel is at capacity (rejected, reference buffer-full path). */
  def push(channel: String, body: Array[Byte],
           meta: Map[String, String] = Map.empty,
           tsMicros: Long = System.currentTimeMillis() * 1000L): Long = {
    val b = buf(channel)
    val cap = Option(capacities.get(channel)).map(_.intValue).getOrElse(DefaultCapacity)
    b.synchronized {
      if (b.size >= cap) -1L
      else { b += Msg(body, meta, tsMicros); b.size.toLong }
    }
  }

  def size(channel: String): Long = { val b = buf(channel); b.synchronized(b.size.toLong) }

  /** Snapshot of everything pushed so far (batch-mode consumption). */
  def snapshot(channel: String): Seq[Msg] = slice(channel, 0L, size(channel))

  private[sources] def slice(channel: String, from: Long, until: Long): Seq[Msg] = {
    val b = buf(channel)
    b.synchronized(b.slice(from.toInt, until.toInt).toVector)
  }

  def clear(channel: String): Unit = { val b = buf(channel); b.synchronized(b.clear()) }
}

/** `spark.readStream.format(classOf[PushReceiverProvider].getName)
  *   .option("channel", "my-channel").load()` */
class PushReceiverProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FlowEventModel.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new PushReceiverTable(
      Option(opts.get("channel")).getOrElse("default"),
      Option(opts.get("maxMsgsPerTrigger")).map(_.toLong))
  }
}

private class PushReceiverTable(channel: String, maxPerTrigger: Option[Long])
    extends Table with SupportsRead {
  override def name(): String = s"graft-push-receiver($channel)"
  override def schema(): StructType = FlowEventModel.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = FlowEventModel.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new PushReceiverStream(channel, maxPerTrigger)
    }
}

private final case class CountOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private class PushReceiverStream(channel: String, maxPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Trigger.AvailableNow: drain up to the size captured at query start,
  // still honoring the per-trigger cap batch by batch
  private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(PushReceiver.size(channel))

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = availableTarget.getOrElse(PushReceiver.size(channel))
    val s = start.asInstanceOf[CountOffset].n
    val capped = limit match {
      case mr: ReadMaxRows => math.min(target, s + mr.maxRows())
      case _ => target
    }
    CountOffset(capped)
  }

  override def reportLatestOffset(): Offset = CountOffset(PushReceiver.size(channel))

  override def initialOffset(): Offset = CountOffset(0L)
  override def deserializeOffset(json: String): Offset = CountOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control latestOffset(start, limit) is used instead")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(PushPartition(channel,
      start.asInstanceOf[CountOffset].n, end.asInstanceOf[CountOffset].n))

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[PushPartition]
      new PartitionReader[InternalRow] {
        private val msgs = PushReceiver.slice(p.channel, p.from, p.until).iterator
        private var current: PushReceiver.Msg = _
        override def next(): Boolean =
          if (msgs.hasNext) { current = msgs.next(); true } else false
        override def get(): InternalRow = {
          val keys = current.meta.keys.toArray.map(k => UTF8String.fromString(k): Any)
          val vals = current.meta.values.toArray.map(v => UTF8String.fromString(v): Any)
          new GenericInternalRow(Array[Any](
            current.body,
            ArrayBasedMapData(keys, vals),
            current.tsMicros))
        }
        override def close(): Unit = ()
      }
    }
}

private final case class PushPartition(channel: String, from: Long, until: Long)
    extends InputPartition
