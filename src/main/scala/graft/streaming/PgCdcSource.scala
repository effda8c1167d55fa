package graft.streaming

import java.util
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.cdc.{ChangeEvent, TransactionAssembler}
import graft.pgproto.Lsn

/** `spark.readStream.format("pgcdc")` — the Structured Streaming face of the
  * engine (SURVEY §2.1 S1-S3, §3.1 steps 5-8).
  *
  * Execution model: the driver owns the single replication feed (a logical
  * slot is inherently single-consumer — same constraint the reference works
  * under), pumps frames through [[TransactionAssembler]], and buffers
  * committed change events. Micro-batch offsets are dense event sequence
  * numbers; `commit(end)` acks the LSN of the last event in the batch, the
  * analogue of the reference's standby status update with the confirmed
  * position (`pq/replication/stream.go:510-520,735-751`). Events fan out to
  * executors as serialized slices, partitioned by `maxRowsPerPartition`, so
  * downstream transforms parallelize while the wire stays single-reader.
  *
  * Options:
  *  - `path`              WAL frame file (FileWalSource) — required unless a
  *                        test injected a source via [[PgCdcTestHook]]
  *  - `heartbeatSchema`/`heartbeatTable`  P5 suppression target
  *  - `maxRowsPerPartition` slice size per executor task (default 8192)
  *  - `maxEventsPerTrigger` admission control (ReadMaxRows)
  */
class PgCdcSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "pgcdc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ChangeEvent.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PgCdcTable
}

/** Test seam: lets specs inject an [[InMemoryWalSource]] under a key. */
object PgCdcTestHook {
  private val sources = new java.util.concurrent.ConcurrentHashMap[String, WalSource]()
  def register(key: String, s: WalSource): Unit = sources.put(key, s)
  def get(key: String): Option[WalSource] = Option(sources.get(key))
}

class PgCdcTable extends Table with SupportsRead {
  override def name(): String = "pgcdc"
  override def schema(): StructType = ChangeEvent.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ChangeEvent.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new PgCdcMicroBatchStream(options)
      }
    }
}

/** Dense sequence-number offset; json form is just the number. */
case class SeqOffset(seq: Long) extends Offset {
  override def json(): String = seq.toString
}

class PgCdcMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val maxRowsPerPartition =
    math.max(1, options.getInt("maxRowsPerPartition", 8192))
  private val defaultMaxPerTrigger =
    options.getLong("maxEventsPerTrigger", Long.MaxValue)

  private val heartbeat: Option[(String, String)] = {
    val s = options.get("heartbeatSchema"); val t = options.get("heartbeatTable")
    if (t != null) Some((if (s == null) "public" else s, t)) else None
  }

  private val wal: WalSource = {
    val hook = Option(options.get("testSourceKey")).flatMap(PgCdcTestHook.get)
    hook.getOrElse {
      val path = options.get("path")
      require(path != null, "pgcdc: 'path' option (WAL frame file) is required")
      new FileWalSource(path)
    }
  }
  private val assembler = new TransactionAssembler(heartbeat)

  // Committed change events buffered on the driver, trimmed on commit().
  // seq of buffer(i) == baseSeq + i.
  private val buffer = mutable.ArrayBuffer.empty[ChangeEvent]
  private var baseSeq = 0L
  private var opened = false

  private def ensureOpen(): Unit = if (!opened) { wal.open(Lsn.Zero); opened = true }

  /** Pump everything currently available from the feed into the buffer. */
  private def pump(): Unit = {
    ensureOpen()
    var f = wal.poll()
    while (f.isDefined) {
      buffer ++= assembler.onCopyData(f.get)
      f = wal.poll()
    }
  }

  override def initialOffset(): Offset = SeqOffset(0L)
  override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)

  override def latestOffset(): Offset = latestOffset(SeqOffset(baseSeq + buffer.size), getDefaultReadLimit)

  override def getDefaultReadLimit: ReadLimit =
    if (defaultMaxPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(defaultMaxPerTrigger)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    pump()
    val available = baseSeq + buffer.size
    val startSeq = start.asInstanceOf[SeqOffset].seq
    val capped = limit match {
      case r: ReadMaxRows => math.min(available, startSeq + r.maxRows())
      case _ => available
    }
    SeqOffset(capped)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SeqOffset].seq
    val e = end.asInstanceOf[SeqOffset].seq
    if (e <= s) return Array.empty
    require(s >= baseSeq,
      s"pgcdc: batch start $s below trimmed base $baseSeq — checkpoint older than buffer")
    // honor replays of the last uncommitted batch: slice [s, e) from buffer
    val events = buffer.slice((s - baseSeq).toInt, (e - baseSeq).toInt).toArray
    events.grouped(maxRowsPerPartition).map(g => PgCdcInputPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = PgCdcReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[SeqOffset].seq
    val n = (e - baseSeq).toInt
    if (n > 0 && n <= buffer.size) {
      // T3: ack the last delivered event's LSN (monotonic in WalSource).
      wal.ack(buffer(n - 1).lsn)
      buffer.remove(0, n)
      baseSeq = e
    }
  }

  override def stop(): Unit = wal.close()
}

/** Events ride inside the partition (driver → executor), like any
  * collect-free broadcast of a micro-batch slice.
  */
final case class PgCdcInputPartition(events: Array[ChangeEvent]) extends InputPartition

object PgCdcReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val events = partition.asInstanceOf[PgCdcInputPartition].events
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < events.length }
      override def get(): InternalRow = toInternalRow(events(i))
      override def close(): Unit = ()
    }
  }

  private def utf8Map(m: Map[String, String]): ArrayBasedMapData =
    if (m == null) null
    else {
      val keys = new Array[Any](m.size)
      val vals = new Array[Any](m.size)
      var i = 0
      m.foreach { case (k, v) =>
        keys(i) = UTF8String.fromString(k)
        vals(i) = if (v == null) null else UTF8String.fromString(v)
        i += 1
      }
      new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
    }

  def toInternalRow(e: graft.cdc.ChangeEvent): InternalRow = {
    val r = new GenericInternalRow(11)
    r.setLong(0, e.lsn)
    r.setLong(1, e.commitLsn)
    r.setLong(2, e.xid)
    r.update(3, UTF8String.fromString(e.op))
    r.update(4, UTF8String.fromString(e.schema))
    r.update(5, UTF8String.fromString(e.table))
    r.setLong(6, e.messageTimeMicros) // TimestampType is µs since epoch
    r.setLong(7, e.commitTimeMicros)
    r.update(8,
      if (e.keyNames == null) null
      else new GenericArrayData(e.keyNames.map(UTF8String.fromString).toArray[Any]))
    r.update(9, utf8Map(e.before))
    r.update(10, utf8Map(e.after))
    r
  }
}
