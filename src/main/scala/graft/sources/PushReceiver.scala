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
  private val journals = new ConcurrentHashMap[String, Journal]()

  private def buf(channel: String): ArrayBuffer[Msg] =
    channels.computeIfAbsent(channel, _ => ArrayBuffer.empty[Msg])

  /** Bound a channel's buffer; pushes beyond it are rejected (the
    * backpressure edge: listeners surface it as THROTTLED). */
  def configure(channel: String, capacity: Int): Unit =
    capacities.put(channel, capacity)

  /** Switch a channel to DURABLE journal mode: every push appends a
    * length-framed record to `<dir>/<channel>.log` and is flushed to
    * the OS before its offset is acked, so offsets stay stable across
    * driver restarts and a restarted query RE-SERVES every acked but
    * uncommitted message from disk — the missing exactly-once leg of
    * the in-memory buffer (Structured Streaming's checkpoint already
    * replays offset ranges; this makes the data behind those offsets
    * survive the process). Calling it again on an existing journal
    * RECOVERS it: complete records are re-indexed; a torn tail from a
    * crash mid-append is truncated away — that push was never acked,
    * so at-least-once holds from the sender's view, exactly-once from
    * the ack's. At production scale this seat belongs to Kafka (SURVEY
    * §2.1); the journal is the same contract for single-driver
    * deployments and tests. */
  def configureJournal(channel: String, dir: String): Unit = {
    val j = new Journal(java.nio.file.Paths.get(dir, s"$channel.log"))
    j.recover()
    val old = journals.put(channel, j)
    if (old != null) old.close()
  }

  /** Push one message; returns its offset in the channel, or -1 if the
    * channel is at capacity (rejected, reference buffer-full path).
    * In journal mode the returned offset is an ACK: the record is on
    * disk (flushed) before this returns. */
  def push(channel: String, body: Array[Byte],
           meta: Map[String, String] = Map.empty,
           tsMicros: Long = System.currentTimeMillis() * 1000L): Long = {
    val cap = Option(capacities.get(channel)).map(_.intValue).getOrElse(DefaultCapacity)
    val j = journals.get(channel)
    if (j != null) j.synchronized {
      if (j.count >= cap) -1L else j.append(Msg(body, meta, tsMicros))
    } else {
      val b = buf(channel)
      b.synchronized {
        if (b.size >= cap) -1L
        else { b += Msg(body, meta, tsMicros); b.size.toLong }
      }
    }
  }

  def size(channel: String): Long = {
    val j = journals.get(channel)
    if (j != null) j.synchronized(j.count)
    else { val b = buf(channel); b.synchronized(b.size.toLong) }
  }

  /** Snapshot of everything pushed so far (batch-mode consumption). */
  def snapshot(channel: String): Seq[Msg] = slice(channel, 0L, size(channel))

  private[sources] def slice(channel: String, from: Long, until: Long): Seq[Msg] = {
    val j = journals.get(channel)
    if (j != null) j.synchronized(j.read(from, until))
    else {
      val b = buf(channel)
      b.synchronized(b.slice(from.toInt, until.toInt).toVector)
    }
  }

  def clear(channel: String): Unit = {
    val j = journals.remove(channel)
    if (j != null) j.delete()
    val b = buf(channel); b.synchronized(b.clear())
  }

  /** Test hook: drop EVERY in-memory trace of a channel — buffer,
    * journal handle, offset index — exactly what a driver crash loses.
    * The journal FILE survives; the next [[configureJournal]] recovers
    * from it. */
  private[graft] def simulateCrash(channel: String): Unit = {
    val j = journals.remove(channel)
    if (j != null) j.close()
    channels.remove(channel)
  }

  /** Append-only length-framed record log with torn-tail-safe recovery.
    * Layout per record: bodyLen(int) body metaCount(int)
    * (writeUTF key, writeUTF value)* tsMicros(long). The offset index
    * (one long per record) lives in memory and is rebuilt by a single
    * forward scan on recovery. */
  private final class Journal(path: java.nio.file.Path) {
    private val positions = ArrayBuffer[Long]()
    private var end: Long = 0L
    private var out: java.io.DataOutputStream = _

    def count: Long = positions.size.toLong

    def recover(): Unit = {
      java.nio.file.Files.createDirectories(path.getParent)
      positions.clear(); end = 0L
      if (java.nio.file.Files.exists(path)) {
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          java.nio.file.Files.newInputStream(path), 1 << 16))
        try {
          var pos = 0L
          var ok = true
          while (ok) {
            try {
              val bodyLen = in.readInt()
              val body = new Array[Byte](bodyLen)
              in.readFully(body)
              var rec = 4L + bodyLen
              val nMeta = in.readInt(); rec += 4
              for (_ <- 0 until nMeta) {
                val k = in.readUTF(); val v = in.readUTF()
                rec += 4 + utfLen(k) + utfLen(v) // same measure as append
              }
              in.readLong(); rec += 8
              positions += pos
              pos += rec
            } catch { case _: java.io.EOFException => ok = false }
          }
          end = pos
        } finally in.close()
        // torn tail from a crash mid-append: drop the un-acked bytes
        val fileLen = java.nio.file.Files.size(path)
        if (fileLen > end) {
          val ch = java.nio.channels.FileChannel.open(path,
            java.nio.file.StandardOpenOption.WRITE)
          try ch.truncate(end) finally ch.close()
        }
      }
      out = openAppend()
    }

    private def openAppend(): java.io.DataOutputStream =
      new java.io.DataOutputStream(new java.io.BufferedOutputStream(
        java.nio.file.Files.newOutputStream(path,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND), 1 << 16))

    /** Appends are ALL-OR-NOTHING: the record is serialized off-stream
      * first, so a writeUTF failure (UTFDataFormatException on a meta
      * value whose modified-UTF-8 form exceeds 64 KB) rejects the push
      * before a single byte reaches the file, and a mid-write
      * IOException triggers a truncate back to `end` — partial record
      * bytes can never sit between `end` and the next append's start,
      * which would shift every later record's offset and corrupt
      * already-acked reads. `end` advances by the exact byte count
      * written, the same measure recovery's forward scan re-derives. */
    def append(msg: Msg): Long = {
      val bos = new java.io.ByteArrayOutputStream(msg.body.length + 64)
      val rec = new java.io.DataOutputStream(bos)
      rec.writeInt(msg.body.length)
      rec.write(msg.body)
      rec.writeInt(msg.meta.size)
      msg.meta.foreach { case (k, v) => rec.writeUTF(k); rec.writeUTF(v) }
      rec.writeLong(msg.tsMicros)
      val bytes = bos.toByteArray
      try {
        out.write(bytes)
        out.flush()
      } catch {
        case e: java.io.IOException =>
          // the buffered stream may hold an unknown partial prefix:
          // drop it, cut the file back to the last acked record, and
          // reopen so later pushes land at the recorded end
          try out.close() catch { case _: java.io.IOException => () }
          val ch = java.nio.channels.FileChannel.open(path,
            java.nio.file.StandardOpenOption.WRITE)
          try ch.truncate(end) finally ch.close()
          out = openAppend()
          throw e
      }
      positions += end
      end += bytes.length
      positions.size.toLong
    }

    // writeUTF emits MODIFIED UTF-8 (nulls and astral chars inflate);
    // meta keys/values here are short header-ish strings, measured
    // exactly the way recovery re-measures them
    private def utfLen(s: String): Long = {
      var n = 0L
      s.foreach { c =>
        n += (if (c >= 0x0001 && c <= 0x007f) 1
              else if (c <= 0x07ff) 2 else 3)
      }
      n
    }

    def read(from: Long, until: Long): Seq[Msg] = {
      if (from >= until) return Vector.empty
      val raf = new java.io.RandomAccessFile(path.toFile, "r")
      try {
        raf.seek(positions(from.toInt))
        val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
          new java.io.FileInputStream(raf.getFD), 1 << 16))
        (from until math.min(until, count)).map { _ =>
          val body = new Array[Byte](in.readInt())
          in.readFully(body)
          val nMeta = in.readInt()
          val meta = (0 until nMeta).map(_ => in.readUTF() -> in.readUTF()).toMap
          Msg(body, meta, in.readLong())
        }.toVector
      } finally raf.close()
    }

    def close(): Unit = if (out != null) { out.close(); out = null }

    def delete(): Unit = {
      close()
      java.nio.file.Files.deleteIfExists(path)
    }
  }
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
