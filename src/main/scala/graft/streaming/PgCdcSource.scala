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

/** Durable streaming offset (checkpointed as JSON by Spark).
  *
  * `seq` is the dense event counter used for batch slicing and admission
  * control; `resumeLsn`/`skip` make the offset restartable: `resumeLsn` is the
  * commit end-LSN of the last fully-delivered transaction, and `skip` counts
  * events already delivered past that boundary (a batch boundary can fall
  * mid-transaction). On restart the source reopens the feed from `resumeLsn`
  * — the server (or [[ResumeFilter]]) re-sends whole transactions committing
  * after it, the same contract as `START_REPLICATION` from a confirmed LSN
  * (reference `pq/replication/stream.go:95-98,148`) — and drops the first
  * `skip` re-emitted events to realign with `seq`: no duplicates, no loss.
  */
case class CdcOffset(seq: Long, resumeLsn: Long, skip: Long) extends Offset {
  override def json(): String = s"""{"seq":$seq,"lsn":$resumeLsn,"skip":$skip}"""
}

object CdcOffset {
  private val Pat = """\{"seq":(\d+),"lsn":(\d+),"skip":(\d+)\}""".r
  def fromJson(json: String): CdcOffset = json.trim match {
    case Pat(s, l, k) => CdcOffset(s.toLong, l.toLong, k.toLong)
    case other => throw new IllegalArgumentException(s"pgcdc: malformed offset json '$other'")
  }
}

class PgCdcMicroBatchStream(options: CaseInsensitiveStringMap)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val maxRowsPerPartition =
    math.max(1, options.getInt("maxRowsPerPartition", 8192))
  private val defaultMaxPerTrigger =
    options.getLong("maxEventsPerTrigger", Long.MaxValue)

  /** B7 snapshot→CDC handoff seam: the snapshot records its consistent-point
    * LSN (slot creation's `consistent_point`, reference
    * `pq/replication/stream.go:635-711`) and the stream starts from it,
    * skipping every transaction already contained in the snapshot.
    */
  private val startLsn = options.getLong("startLsn", Lsn.Zero)

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
  // Txn boundaries inside/above the buffer: (seq just past the txn's last
  // event, commit end LSN), ascending. `floor` is the greatest boundary at or
  // below baseSeq — the resume point for offsets before the first entry.
  private val boundaries = mutable.ArrayBuffer.empty[(Long, Long)]
  private var floor: (Long, Long) = (0L, startLsn)
  private var pendingSkip = 0L
  private var opened = false

  /** First contact with the (possibly checkpoint-restored) start offset:
    * open the feed at its resume LSN and arm the skip-realignment.
    */
  private def ensureOpen(start: CdcOffset): Unit = if (!opened) {
    wal.open(start.resumeLsn)
    baseSeq = start.seq
    pendingSkip = start.skip
    floor = (start.seq - start.skip, start.resumeLsn)
    opened = true
  }

  /** Pump everything currently available from the feed into the buffer,
    * recording txn boundaries and dropping `pendingSkip` already-delivered
    * events after a restart.
    */
  private def pump(): Unit = {
    var f = wal.poll()
    while (f.isDefined) {
      val raw = f.get
      var evs = assembler.onCopyData(raw)
      if (pendingSkip > 0 && evs.nonEmpty) {
        val d = math.min(pendingSkip, evs.size.toLong)
        evs = evs.drop(d.toInt)
        pendingSkip -= d
      }
      buffer ++= evs
      // Commit / StreamCommit frames end a transaction: record the boundary.
      // (XLogData header = 25 bytes; payload tag at offset 25.)
      if (raw.length > 25 && raw(0) == graft.pgproto.WalFrames.TagXLogData) {
        raw(25) match {
          case 'C' =>
            boundaries += ((baseSeq + buffer.size, commitEndLsnAt(raw, 25, streamed = false)))
          case 'c' =>
            boundaries += ((baseSeq + buffer.size, commitEndLsnAt(raw, 25, streamed = true)))
          case _ =>
        }
      }
      f = wal.poll()
    }
  }

  private def commitEndLsnAt(raw: Array[Byte], p: Int, streamed: Boolean): Long = {
    // 'C': tag+flags(1)+commitLsn(8) → end at p+10; 'c': tag+xid(4)+flags(1)+commitLsn(8) → p+14.
    val off = if (streamed) p + 14 else p + 10
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (raw(off + i) & 0xffL); i += 1 }
    v
  }

  /** Durable offset for a batch ending at `seq`: resume LSN = last txn
    * boundary at or below it, skip = events past that boundary.
    */
  private def offsetFor(seq: Long): CdcOffset = {
    var b = floor
    var i = boundaries.length - 1
    while (i >= 0 && boundaries(i)._1 > seq) i -= 1
    if (i >= 0 && boundaries(i)._1 > b._1) b = boundaries(i)
    CdcOffset(seq, b._2, seq - b._1)
  }

  override def initialOffset(): Offset = CdcOffset(0L, startLsn, 0L)
  override def deserializeOffset(json: String): Offset = CdcOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    if (defaultMaxPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(defaultMaxPerTrigger)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("pgcdc implements SupportsAdmissionControl")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CdcOffset]
    ensureOpen(s)
    pump()
    val available = baseSeq + buffer.size
    val capped = limit match {
      case r: ReadMaxRows => math.min(available, s.seq + r.maxRows())
      case _ => available
    }
    offsetFor(capped)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset].seq
    val e = end.asInstanceOf[CdcOffset].seq
    ensureOpen(start.asInstanceOf[CdcOffset])
    if (e <= s) return Array.empty
    pump() // a restored uncommitted batch replans before any latestOffset call
    require(s >= baseSeq,
      s"pgcdc: batch start $s below trimmed base $baseSeq — checkpoint older than buffer")
    require(e - baseSeq <= buffer.size,
      s"pgcdc: batch end $e beyond buffered ${baseSeq + buffer.size} — feed did not replay far enough")
    val events = buffer.slice((s - baseSeq).toInt, (e - baseSeq).toInt).toArray
    events.grouped(maxRowsPerPartition).map(g => PgCdcInputPartition(g): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = PgCdcReaderFactory

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[CdcOffset].seq
    val n = e - baseSeq
    // Loud on any out-of-range commit — a silent no-op here would under-ack
    // after a restart and mask a broken checkpoint (round-2 verdict finding).
    require(n >= 0 && n <= buffer.size,
      s"pgcdc: commit($e) outside buffered range [$baseSeq, ${baseSeq + buffer.size}]")
    if (n == 0) return
    // T3: ack the resume LSN — the last fully-delivered txn's commit end LSN
    // (acking mid-txn would lose the tail of a split txn on restart).
    wal.ack(offsetFor(e).resumeLsn)
    buffer.remove(0, n.toInt)
    baseSeq = e
    boundaries.filterInPlace { b =>
      if (b._1 <= baseSeq) { if (b._1 > floor._1) floor = b; false } else true
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
