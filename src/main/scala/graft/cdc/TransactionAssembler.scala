package graft.cdc

import scala.collection.mutable
import graft.pgproto._
import graft.pgproto.Messages._

/** Assembles raw replication frames into commit-ordered, rollback-safe
  * [[ChangeEvent]]s — the heart of the engine (SURVEY.md §2.4).
  *
  * Reference semantics reproduced:
  *  - T1 one-message look-ahead (`pq/replication/stream.go:174-215,444-481`):
  *    the last DML of a non-streamed transaction is held back and its WAL
  *    position rewritten to `Commit.TransactionEndLSN`, so acking that event
  *    acks the whole transaction; earlier events flush immediately (O(1)
  *    memory per transaction).
  *  - T2 streamed-transaction buffer, proto v2 (`stream.go:217-278`): DML is
  *    buffered per-XID across interleaved STREAM START/STOP chunks, emitted
  *    only on STREAM COMMIT (last event rewritten to txn-end LSN), and
  *    discarded wholesale on STREAM ABORT — consumers never observe a
  *    rolled-back streamed transaction.
  *  - T4/T5 demarcation + relation cache (`format/begin.go`, `format/commit.go`,
  *    `message.go:64-69`): Begin carries the commit timestamp (WAL is written
  *    at commit), Relation messages replace the OID→schema cache entry.
  *  - P5 heartbeat suppression (`stream.go:543-561`): events on the heartbeat
  *    table are dropped but still advance progress.
  *  - P6 TOAST restoration (`format/update.go:100-108`): unchanged-TOAST
  *    columns in the new image are back-filled from the old image when present.
  *
  * Scale note: per-XID streamed buffers are in-memory, like the reference's
  * `streamTxBuffer.txns` map; `maxBufferedStreamEvents` bounds worst-case
  * memory, failing fast rather than OOMing an executor. (A spill path is the
  * documented follow-up for pathological multi-GB transactions.)
  */
final class TransactionAssembler(
    heartbeatTable: Option[(String, String)] = None,
    maxBufferedStreamEvents: Int = 1 << 20) {

  val relations = mutable.LongMap.empty[Relation]
  private val keyNameCache = mutable.LongMap.empty[Seq[String]]

  // current non-streamed transaction context (from Begin)
  private var curXid = 0L
  private var curCommitLsn = 0L
  private var curCommitTimeMicros = 0L
  // T1 look-ahead slot
  private var pending: ChangeEvent = null
  // T2 state
  private var inStreamBlock = false
  private var streamXid = 0L
  private val streamedTxns = mutable.LongMap.empty[mutable.ArrayBuffer[ChangeEvent]]
  private var streamedCount = 0L

  /** Count of events dropped as heartbeats (P5) — progress still advances. */
  var heartbeatsSuppressed: Long = 0L

  def bufferedStreamEvents: Long = streamedCount

  /** Feed one CopyData payload; returns events ready for downstream emission
    * in commit order. Keepalives produce no events (offset advance is the
    * stream reader's concern).
    */
  def onCopyData(copyData: Array[Byte]): Seq[ChangeEvent] =
    WalFrames.parse(copyData) match {
      case WalFrames.KeepaliveFrame(_) => Nil
      case WalFrames.XLogDataFrame(x) => onXLogData(x)
    }

  def onXLogData(x: WalFrames.XLogData): Seq[ChangeEvent] = {
    val msg = Messages.decode(x.data, inStreamBlock)
    onMessage(msg, x.walStart, x.serverTimeMicros)
  }

  /** Dispatch mirrors the reference's sink loop (`stream.go:444-481`). */
  def onMessage(msg: Msg, walStart: Long, serverTimeMicros: Long): Seq[ChangeEvent] = msg match {
    case b: Begin =>
      // Begin of a new txn: anything still pending belongs to a fully
      // delivered txn (its Commit flushed it); a leftover here means a
      // protocol violation — reference discards on Begin (`stream.go:447`).
      pending = null
      curXid = b.xid
      curCommitLsn = b.finalLsn
      curCommitTimeMicros = b.commitTimeMicros
      Nil

    case c: Commit =>
      // T1: flush the held-back last event with the txn-end LSN.
      if (pending != null) {
        val out = pending.copy(lsn = c.transactionEndLsn)
        pending = null
        Seq(out)
      } else Nil

    case r: Relation =>
      relations.update(r.oid, r)
      keyNameCache.update(r.oid, r.columns.filter(_.isKey).map(_.name).toSeq)
      Nil

    case s: StreamStart =>
      inStreamBlock = true
      streamXid = s.xid
      if (!streamedTxns.contains(s.xid)) streamedTxns.update(s.xid, mutable.ArrayBuffer.empty)
      Nil

    case StreamStop =>
      inStreamBlock = false
      Nil

    case sc: StreamCommit =>
      // T2: emit the whole buffered txn, commit-stamped; last event gets the
      // txn-end LSN (same rewrite as T1).
      streamedTxns.remove(sc.xid) match {
        case Some(buf) =>
          streamedCount -= buf.length
          if (buf.isEmpty) Nil
          else {
            val stamped = buf.map(e => e.copy(
              commitLsn = sc.commitLsn,
              commitTimeMicros = sc.commitTimeMicros))
            stamped(stamped.length - 1) =
              stamped(stamped.length - 1).copy(lsn = sc.transactionEndLsn)
            stamped.toSeq
          }
        case None => Nil
      }

    case sa: StreamAbort =>
      // Rolled-back streamed (sub)transaction (`format/stream.go:92-107`):
      // when subXid == xid the whole top-level txn aborted — drop everything;
      // when subXid != xid only a subtransaction rolled back — drop just its
      // events (each buffered event carries the sub-XID that wrote it, from
      // the v2 per-message XID prefix) and keep the parent's.
      if (sa.subXid == sa.xid || sa.subXid == 0L)
        streamedTxns.remove(sa.xid).foreach(b => streamedCount -= b.length)
      else streamedTxns.get(sa.xid).foreach { buf =>
        val before = buf.length
        buf.filterInPlace(_.xid != sa.subXid)
        streamedCount -= before - buf.length
      }
      Nil

    case i: Insert =>
      route(event(i.xid, "insert", i.relationOid, walStart, serverTimeMicros,
        before = null, afterTuple = i.newTuple))

    case u: Update =>
      val rel = relation(u.relationOid)
      // P6: TOAST back-fill from old image when REPLICA IDENTITY FULL sent one.
      val merged = if (u.oldTuple != null) TupleData.mergeToast(u.newTuple, u.oldTuple) else u.newTuple
      val before = if (u.oldTuple != null) tupleToMap(rel, u.oldTuple) else null
      route(event(u.xid, "update", u.relationOid, walStart, serverTimeMicros,
        before = before, afterTuple = merged))

    case d: Delete =>
      val rel = relation(d.relationOid)
      route(event(d.xid, "delete", d.relationOid, walStart, serverTimeMicros,
        before = tupleToMap(rel, d.oldTuple), afterTuple = null))

    case t: Truncate =>
      val evs = t.relationOids.toSeq.map { oid =>
        val rel = relation(oid)
        ChangeEvent(walStart, curCommitLsn, effXid(t.xid), "truncate",
          rel.namespace, rel.name, serverTimeMicros, effCommitTime(t.xid),
          keyNameCache.getOrElse(oid, Nil), null, null)
      }
      evs.flatMap(route)
  }

  /** Flush anything still pending (stream close). The reference's close path
    * flushes the final standby status instead (`stream.go:724-733`); for us a
    * pending event simply ships with its original LSN.
    */
  def flush(): Seq[ChangeEvent] = {
    val out = if (pending != null) Seq(pending) else Nil
    pending = null
    out
  }

  private def relation(oid: Long): Relation =
    relations.getOrElse(oid,
      // Same failure as the reference when DML precedes its Relation
      // (`format/insert.go:35-37`).
      throw new PgProtoException(s"relation not found for oid $oid"))

  private def effXid(msgXid: Long): Long = if (msgXid != 0) msgXid else curXid
  private def effCommitTime(msgXid: Long): Long =
    if (msgXid != 0 && msgXid != curXid) 0L else curCommitTimeMicros

  private def tupleToMap(rel: Relation, t: TupleData.Tuple): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    var i = 0
    val n = math.min(rel.columns.length, t.cols.length)
    while (i < n) {
      val c = t.cols(i)
      // 'u' (unchanged TOAST, no old image to merge from) is omitted from the
      // map — absent key ≠ null value, mirroring the reference leaving the
      // column out of the decoded map.
      if (!c.isToast) b += rel.columns(i).name -> (if (c.isNull) null else c.text)
      i += 1
    }
    b.result()
  }

  private def event(
      msgXid: Long, op: String, relOid: Long, walStart: Long,
      serverTimeMicros: Long, before: Map[String, String],
      afterTuple: TupleData.Tuple): ChangeEvent = {
    val rel = relation(relOid)
    val xid = effXid(msgXid)
    val streamed = msgXid != 0 && inStreamBlock
    ChangeEvent(
      lsn = walStart,
      commitLsn = if (streamed) 0L else curCommitLsn, // stamped at StreamCommit
      xid = xid,
      op = op,
      schema = rel.namespace,
      table = rel.name,
      messageTimeMicros = serverTimeMicros,
      commitTimeMicros = if (streamed) 0L else curCommitTimeMicros,
      keyNames = keyNameCache.getOrElse(relOid, Nil),
      before = before,
      after = if (afterTuple == null) null else tupleToMap(rel, afterTuple))
  }

  /** Route one decoded event through P5 suppression and the T1/T2 buffers. */
  private def route(e: ChangeEvent): Seq[ChangeEvent] = {
    if (heartbeatTable.contains((e.schema, e.table))) {
      heartbeatsSuppressed += 1
      return Nil
    }
    if (inStreamBlock) {
      val buf = streamedTxns.getOrElseUpdate(streamXid, mutable.ArrayBuffer.empty)
      buf += e
      streamedCount += 1
      if (streamedCount > maxBufferedStreamEvents)
        throw new PgProtoException(
          s"streamed-transaction buffer exceeded $maxBufferedStreamEvents events " +
            s"(xid=$streamXid); raise maxBufferedStreamEvents or enable spilling")
      Nil
    } else {
      // T1 look-ahead: hold this event, release the previous one.
      val out = pending
      pending = e
      if (out != null) Seq(out) else Nil
    }
  }
}
