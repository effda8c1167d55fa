package graft.cdc

import java.io.{BufferedInputStream, BufferedOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.file.{Files, Path}
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
  * Scale note: a streamed txn's buffer SPILLS to local disk once it exceeds
  * `spillThresholdEvents` in memory — a legitimate multi-GB bulk-load txn
  * streams through bounded memory instead of failing (the reference buffers
  * unboundedly in its `streamTxBuffer.txns` map; we beat that, not match
  * it). On STREAM COMMIT spilled events stream back from disk in order ahead
  * of the in-memory tail, commit-stamped lazily; the spill file is deleted
  * once fully consumed (and eagerly on abort). `maxBufferedStreamEvents`
  * still bounds total IN-MEMORY events across open txns, failing fast rather
  * than OOMing an executor if thousands of streams are open at once.
  */
final class TransactionAssembler(
    heartbeatTable: Option[(String, String)] = None,
    maxBufferedStreamEvents: Int = 1 << 20,
    spillThresholdEvents: Int = 1 << 16,
    spillDir: Option[Path] = None,
    dropForeignOrigin: Boolean = false,
    /** (schema, table) → the ROW-KEY columns to record as `key_names`
      * instead of the wire's replica-identity flags. Under REPLICA
      * IDENTITY FULL pgoutput flags EVERY column as identity ("REPLICA
      * IDENTITY FULL means all columns are sent as part of key",
      * backend/replication/logical/proto.c) — right for image
      * completeness, wrong as a row key: a consumer keying on
      * `key_names` (the lake fold, pg→pg apply) would treat every row
      * VERSION as a distinct key and never coalesce updates.
      * `GraftConnector.start` fills this from the catalog's primary keys
      * for tables it configures FULL; standalone `pgcdc` readers pass
      * the `keyOverrides` source option.
      */
    keyNameOverrides: Map[(String, String), Seq[String]] = Map.empty)
    extends AutoCloseable {

  val relations = mutable.LongMap.empty[Relation]
  private val keyNameCache = mutable.LongMap.empty[Seq[String]]

  /** Recorded key columns for a relation: the override when one is
    * present and matches the relation's live column set (a stale
    * override after DDL falls back to the wire flags), else the wire's
    * identity flags.
    */
  private def keyNamesFor(r: Relation): Seq[String] =
    keyNameOverrides.get((r.namespace, r.name)) match {
      case Some(cols) if cols.nonEmpty &&
          cols.forall(c => r.columns.exists(_.name == c)) => cols
      case _ => r.columns.filter(_.isKey).map(_.name).toSeq
    }

  /** Custom-type registry from 'Y' messages: oid → (namespace, name).
    * Values of these types still decode as text (PostgreSQL's wire form for
    * non-builtin OIDs); the registry tells consumers what the text IS.
    */
  val typeNames = mutable.LongMap.empty[(String, String)]

  /** Origin name of the current transaction (from an 'O' message after
    * Begin), null for locally-originated transactions.
    */
  private var curOrigin: String = null

  /** Events dropped because their transaction carried a replication origin
    * and `dropForeignOrigin` is set — the loop-breaker for bidirectional
    * setups (PostgreSQL 16's `origin = none` subscription semantic).
    */
  var foreignOriginDropped: Long = 0L

  // current non-streamed transaction context (from Begin)
  private var curXid = 0L
  private var curCommitLsn = 0L
  private var curCommitTimeMicros = 0L
  // T1 look-ahead slot
  private var pending: ChangeEvent = null
  // T2 state
  private var inStreamBlock = false
  private var streamXid = 0L
  private val streamedTxns = mutable.LongMap.empty[StreamBuf]
  private var streamedCount = 0L
  // Two-phase (protocol v3 `two_phase`): open PREPARED transactions keyed by
  // gid, buffered through the same spill-backed machinery (and counted
  // against the same in-memory bound) as streamed txns until the gid's
  // COMMIT PREPARED / ROLLBACK PREPARED decision arrives. curGid is non-null
  // between BeginPrepare and Prepare — the data section being buffered.
  private val preparedTxns = mutable.LinkedHashMap.empty[String, StreamBuf]
  private var curGid: String = null
  // Relations sent INSIDE a prepared data section describe the section's
  // uncommitted catalog — they must register immediately (the section's own
  // DML decodes against them) but must not survive a ROLLBACK PREPARED.
  // Per-gid undo ledger: oid → the registration that preceded the section
  // (None = the oid was unknown). First-prior wins across a replayed section.
  private val preparedRelUndo =
    mutable.HashMap.empty[String, mutable.HashMap[Long, Option[Relation]]]

  /** Count of events dropped as heartbeats (P5) — progress still advances. */
  var heartbeatsSuppressed: Long = 0L

  /** Events currently buffered IN MEMORY for open streamed + prepared txns. */
  def bufferedStreamEvents: Long = streamedCount

  /** Open prepared (two-phase) transactions awaiting COMMIT/ROLLBACK
    * PREPARED — metrics/test visibility.
    */
  def openPreparedTxns: Int = preparedTxns.size

  /** Events currently spilled to disk for open streamed txns. */
  def spilledStreamEvents: Long = streamedTxns.values.map(_.spilledCount).sum

  private var spilledTotal = 0L

  /** Cumulative events ever written to spill files by this assembler (a
    * sub-transaction-abort rewrite re-counts the survivors it re-writes) —
    * O(1), safe to sample from the decode hot path, and still non-zero
    * after a spilled txn commits and its buffer leaves the open map.
    */
  def totalSpilledEvents: Long = spilledTotal

  /** Per-XID stream buffer: an in-memory tail plus an optional disk spill
    * holding everything that overflowed `spillThresholdEvents`.
    */
  private final class StreamBuf {
    val mem = mutable.ArrayBuffer.empty[ChangeEvent]
    var spill: Spill = null
    def spilledCount: Long = if (spill == null) 0L else spill.count

    def add(e: ChangeEvent): Unit = {
      mem += e
      streamedCount += 1
      if (mem.length >= spillThresholdEvents) {
        if (spill == null) spill = new Spill(spillDirPath)
        spill.append(mem.iterator)
        streamedCount -= mem.length
        mem.clear()
      }
    }

    /** All events in arrival order; spilled prefix streams from disk. */
    def iterator: Iterator[ChangeEvent] =
      (if (spill == null) Iterator.empty else spill.read()) ++ mem.iterator

    def totalCount: Long = spilledCount + mem.length

    def discard(): Unit = {
      streamedCount -= mem.length
      mem.clear()
      if (spill != null) { spill.delete(); spill = null }
    }

    /** Sub-transaction abort: drop just subXid's events, keeping order. A
      * spilled buffer is rewritten through disk (bounded memory).
      */
    def dropSubXid(subXid: Long): Unit = {
      if (spill != null) {
        val old = spill
        val fresh = new Spill(spillDirPath)
        fresh.append(old.read().filter(_.xid != subXid))
        old.delete()
        spill = if (fresh.count > 0) fresh else { fresh.delete(); null }
      }
      val before = mem.length
      mem.filterInPlace(_.xid != subXid)
      streamedCount -= before - mem.length
    }
  }

  private lazy val spillDirPath: Path =
    spillDir.getOrElse(Path.of(System.getProperty("java.io.tmpdir")))

  // Every spill ever created by this assembler, so close() can delete files
  // whose commit-time read iterator was abandoned before exhaustion (e.g. a
  // downstream limit) — deletes are idempotent.
  private val liveSpills = mutable.ArrayBuffer.empty[Spill]

  /** Append-once, read-once event spill file (Java serialization with
    * periodic reset so the handle table can't grow unboundedly).
    */
  private final class Spill(dir: Path) {
    liveSpills += this
    val file: Path = Files.createTempFile(dir, "graft-stream-spill-", ".bin")
    private var out = new ObjectOutputStream(
      new BufferedOutputStream(Files.newOutputStream(file)))
    var count: Long = 0L

    def append(events: Iterator[ChangeEvent]): Unit = {
      events.foreach { e =>
        out.writeObject(e)
        count += 1
        spilledTotal += 1
        if (count % 1024 == 0) out.reset()
      }
      out.flush()
    }

    /** Close the writer and stream the events back; the file is deleted when
      * the iterator is exhausted (abort paths call [[delete]] instead).
      */
    def read(): Iterator[ChangeEvent] = {
      out.close()
      val in = new ObjectInputStream(new BufferedInputStream(Files.newInputStream(file)))
      val total = count
      new Iterator[ChangeEvent] {
        private var i = 0L
        override def hasNext: Boolean = {
          val more = i < total
          if (!more) { in.close(); Files.deleteIfExists(file); () }
          more
        }
        override def next(): ChangeEvent = {
          val e = in.readObject().asInstanceOf[ChangeEvent]
          i += 1
          e
        }
      }
    }

    def delete(): Unit = {
      try out.close() catch { case _: java.io.IOException => () }
      Files.deleteIfExists(file)
    }
  }

  /** Feed one CopyData payload; returns events ready for downstream emission
    * in commit order (lazy — a spilled streamed commit streams from disk).
    * Keepalives produce no events (offset advance is the stream reader's
    * concern).
    */
  def onCopyData(copyData: Array[Byte]): Iterator[ChangeEvent] =
    WalFrames.parse(copyData) match {
      case WalFrames.KeepaliveFrame(_) => Iterator.empty
      case WalFrames.XLogDataFrame(x) => onXLogData(x)
    }

  def onXLogData(x: WalFrames.XLogData): Iterator[ChangeEvent] = {
    val msg = Messages.decode(x.data, inStreamBlock)
    onMessage(msg, x.walStart, x.serverTimeMicros)
  }

  /** Dispatch mirrors the reference's sink loop (`stream.go:444-481`). */
  def onMessage(msg: Msg, walStart: Long, serverTimeMicros: Long): Iterator[ChangeEvent] = msg match {
    case b: Begin =>
      // Begin of a new txn: anything still pending belongs to a fully
      // delivered txn (its Commit flushed it); a leftover here means a
      // protocol violation — reference discards on Begin (`stream.go:447`).
      pending = null
      curGid = null
      curXid = b.xid
      curCommitLsn = b.finalLsn
      curCommitTimeMicros = b.commitTimeMicros
      curOrigin = null // an 'O' message (if any) follows this Begin
      Iterator.empty

    case bp: BeginPrepare =>
      // Two-phase data section opens: DML until 'P' buffers under the gid
      // (NOTHING may emit before COMMIT PREPARED — the rollback-safe
      // contract). A replayed BeginPrepare (restart mid-prepare) replaces
      // the gid's buffer wholesale, keeping the rebuild idempotent.
      pending = null
      curXid = bp.xid
      curCommitLsn = 0L // stamped by the gid's CommitPrepared
      curCommitTimeMicros = 0L
      curOrigin = null
      preparedTxns.remove(bp.gid).foreach(_.discard())
      preparedTxns.update(bp.gid, new StreamBuf)
      curGid = bp.gid
      Iterator.empty

    case _: Prepare =>
      // PREPARE TRANSACTION: the data section is complete; the buffer waits
      // on the gid's commit/rollback decision (arbitrarily later).
      curGid = null
      Iterator.empty

    case cp: CommitPrepared =>
      // COMMIT PREPARED: the gid's events become visible NOW — stamped with
      // the commit-prepared LSN/time, last event rewritten to the txn end
      // LSN (the same T1/T2 ack-the-whole-txn rewrite). An unknown gid
      // (prepared before this slot's start position) emits nothing, exactly
      // PostgreSQL's contract for a subscriber that already holds the
      // prepared data.
      preparedRelUndo.remove(cp.gid) // the decision makes the schema real
      preparedTxns.remove(cp.gid) match {
        case Some(buf) if buf.totalCount > 0 =>
          streamedCount -= buf.mem.length
          stampAndRewriteLast(buf.iterator, cp.commitLsn, cp.commitTimeMicros, cp.endLsn)
        case Some(buf) =>
          buf.discard()
          Iterator.empty
        case None => Iterator.empty
      }

    case rp: RollbackPrepared =>
      // ROLLBACK PREPARED: discard wholesale (spill file included) —
      // consumers never observe a rolled-back prepared transaction, and the
      // section's Relation registrations roll back with it.
      preparedRelUndo.remove(rp.gid).foreach(_.foreach {
        case (oid, Some(prior)) =>
          relations.update(oid, prior)
          keyNameCache.update(oid, keyNamesFor(prior))
        case (oid, None) =>
          relations.remove(oid)
          keyNameCache.remove(oid)
      })
      preparedTxns.remove(rp.gid).foreach(_.discard())
      Iterator.empty

    case sp: StreamPrepare =>
      // A streamed (v2) transaction ended in PREPARE TRANSACTION: its
      // buffered chunks move to the prepared ledger as-is and await
      // 'K'/'r'; nothing emits yet.
      streamedTxns.remove(sp.xid).foreach { buf =>
        preparedTxns.remove(sp.gid).foreach(_.discard())
        preparedTxns.update(sp.gid, buf)
      }
      Iterator.empty

    case o: Origin =>
      curOrigin = o.name
      Iterator.empty

    case ty: TypeMessage =>
      typeNames.update(ty.oid, (ty.namespace, ty.name))
      Iterator.empty

    case c: Commit =>
      // T1: flush the held-back last event with the txn-end LSN.
      if (pending != null) {
        val out = pending.copy(lsn = c.transactionEndLsn)
        pending = null
        Iterator.single(out)
      } else Iterator.empty

    case r: Relation =>
      if (curGid != null) {
        val undo = preparedRelUndo.getOrElseUpdate(curGid, mutable.HashMap.empty)
        if (!undo.contains(r.oid)) undo.update(r.oid, relations.get(r.oid))
      }
      relations.update(r.oid, r)
      keyNameCache.update(r.oid, keyNamesFor(r))
      Iterator.empty

    case s: StreamStart =>
      inStreamBlock = true
      streamXid = s.xid
      if (!streamedTxns.contains(s.xid)) streamedTxns.update(s.xid, new StreamBuf)
      Iterator.empty

    case StreamStop =>
      inStreamBlock = false
      Iterator.empty

    case sc: StreamCommit =>
      // T2: emit the whole buffered txn, commit-stamped; last event gets the
      // txn-end LSN (same rewrite as T1). Spilled events stream from disk.
      streamedTxns.remove(sc.xid) match {
        case Some(buf) if buf.totalCount > 0 =>
          streamedCount -= buf.mem.length
          stampAndRewriteLast(buf.iterator, sc.commitLsn, sc.commitTimeMicros, sc.transactionEndLsn)
        case Some(buf) =>
          buf.discard()
          Iterator.empty
        case None => Iterator.empty
      }

    case sa: StreamAbort =>
      // Rolled-back streamed (sub)transaction (`format/stream.go:92-107`):
      // when subXid == xid the whole top-level txn aborted — drop everything
      // (including any spill file); when subXid != xid only a subtransaction
      // rolled back — drop just its events (each buffered event carries the
      // sub-XID that wrote it, from the v2 per-message XID prefix).
      if (sa.subXid == sa.xid || sa.subXid == 0L)
        streamedTxns.remove(sa.xid).foreach(_.discard())
      else streamedTxns.get(sa.xid).foreach(_.dropSubXid(sa.subXid))
      Iterator.empty

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
      evs.iterator.flatMap(route)

    case m: LogicalMessage =>
      // Beyond-reference (it raises on 'M'): pg_logical_emit_message, the
      // outbox pattern's WAL payload. The payload surfaces in `after` —
      // `content_text` when the bytes are valid UTF-8 (the JSON outbox
      // case), always `content_hex` in bytea hex form (lossless for binary
      // payloads). Transactional messages ride the same T1/T2 buffers as
      // DML — commit-ordered, discarded with an aborted streamed txn;
      // non-transactional ones bypass buffering and ship immediately at
      // their WAL position, exactly PostgreSQL's delivery contract.
      val after = Map(
        "prefix" -> m.prefix,
        "content_text" -> utf8OrNull(m.content),
        "content_hex" -> ("\\x" + m.content.map("%02x".format(_)).mkString))
      if (m.transactional)
        route(ChangeEvent(walStart, if (inStreamBlock) 0L else curCommitLsn,
          effXid(m.xid), "message", "", "", serverTimeMicros,
          if (inStreamBlock) 0L else curCommitTimeMicros, Nil, null, after))
      else
        Iterator.single(ChangeEvent(walStart, 0L, 0L, "message", "", "",
          serverTimeMicros, 0L, Nil, null, after))
  }

  private def utf8OrNull(bytes: Array[Byte]): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Commit-stamp every event; the LAST one also gets its WAL position
    * rewritten to the transaction end LSN (one-element look-ahead, so a
    * disk-spilled stream never materializes).
    */
  private def stampAndRewriteLast(
      events: Iterator[ChangeEvent], commitLsn: Long,
      commitTimeMicros: Long, endLsn: Long): Iterator[ChangeEvent] =
    new Iterator[ChangeEvent] {
      private var nxt: ChangeEvent = if (events.hasNext) events.next() else null
      override def hasNext: Boolean = nxt != null
      override def next(): ChangeEvent = {
        val cur = nxt
        nxt = if (events.hasNext) events.next() else null
        val stamped = cur.copy(commitLsn = commitLsn, commitTimeMicros = commitTimeMicros)
        if (nxt == null) stamped.copy(lsn = endLsn) else stamped
      }
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

  /** Drop any open streamed buffers and their spill files (partition reader
    * close / task end).
    */
  override def close(): Unit = {
    streamedTxns.values.foreach(_.discard())
    streamedTxns.clear()
    preparedTxns.values.foreach(_.discard())
    preparedTxns.clear()
    preparedRelUndo.clear()
    liveSpills.foreach(_.delete())
    liveSpills.clear()
  }

  private def relation(oid: Long): Relation =
    relations.getOrElse(oid,
      // Same failure as the reference when DML precedes its Relation
      // (`format/insert.go:35-37`).
      throw new PgProtoException(s"relation not found for oid $oid"))

  private def effXid(msgXid: Long): Long = if (msgXid != 0) msgXid else curXid
  private def effCommitTime(msgXid: Long): Long =
    if (msgXid != 0 && msgXid != curXid) 0L else curCommitTimeMicros

  private[graft] def tupleToMap(rel: Relation, t: TupleData.Tuple): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    var i = 0
    val n = math.min(rel.columns.length, t.cols.length)
    while (i < n) {
      val c = t.cols(i)
      // 'u' (unchanged TOAST, no old image to merge from) is omitted from the
      // map — absent key ≠ null value, mirroring the reference leaving the
      // column out of the decoded map. Binary-format columns ('b', sent when
      // the publication requests binary) are rendered to the same canonical
      // text a 't' column carries, so everything downstream stays
      // format-agnostic (beyond the reference, which length-parses but never
      // decodes binary, tuple/data.go:63-71).
      if (!c.isToast) b += rel.columns(i).name -> (
        if (c.isNull) null
        else if (c.tag == TupleData.TagBinary)
          graft.types.PgBinary.toText(c.data, rel.columns(i).typeOid)
        else c.text)
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

  /** Route one decoded event through P5 suppression, origin filtering, and
    * the T1/T2 buffers.
    */
  private def route(e: ChangeEvent): Iterator[ChangeEvent] = {
    if (heartbeatTable.contains((e.schema, e.table))) {
      heartbeatsSuppressed += 1
      return Iterator.empty
    }
    if (dropForeignOrigin && curOrigin != null) {
      foreignOriginDropped += 1
      return Iterator.empty
    }
    if (inStreamBlock) {
      val buf = streamedTxns.getOrElseUpdate(streamXid, new StreamBuf)
      buf.add(e)
      if (streamedCount > maxBufferedStreamEvents)
        throw new PgProtoException(
          s"streamed-transaction buffer exceeded $maxBufferedStreamEvents in-memory events " +
            s"(xid=$streamXid); raise maxBufferedStreamEvents or lower spillThresholdEvents")
      Iterator.empty
    } else if (curGid != null) {
      // Two-phase data section: buffer under the gid (spill-backed), emit
      // nothing until COMMIT PREPARED.
      val buf = preparedTxns.getOrElseUpdate(curGid, new StreamBuf)
      buf.add(e)
      if (streamedCount > maxBufferedStreamEvents)
        throw new PgProtoException(
          s"prepared-transaction buffer exceeded $maxBufferedStreamEvents in-memory events " +
            s"(gid=$curGid); raise maxBufferedStreamEvents or lower spillThresholdEvents")
      Iterator.empty
    } else {
      // T1 look-ahead: hold this event, release the previous one.
      val out = pending
      pending = e
      if (out != null) Iterator.single(out) else Iterator.empty
    }
  }
}

object TransactionAssembler {

  /** String codec for the key override map, so it can ride a DataSource
    * option: `schema.table=col1+col2;schema2.t2=id`. Table and column
    * names with `. = + ;` in them are not representable — pass the map
    * directly (GraftConnector does) for exotic identifiers.
    */
  def encodeKeyOverrides(m: Map[(String, String), Seq[String]]): String =
    m.toSeq.sortBy { case ((s, t), _) => (s, t) }
      .map { case ((s, t), cols) => s"$s.$t=${cols.mkString("+")}" }
      .mkString(";")

  def parseKeyOverrides(s: String): Map[(String, String), Seq[String]] =
    s.split(";").iterator.map(_.trim).filter(_.nonEmpty).map { entry =>
      // FAIL LOUD on a malformed entry: silently dropping it would leave
      // the whole-row fold key in place — the exact corruption the
      // option exists to prevent — behind a one-character typo
      entry.split("=", 2) match {
        case Array(qual, cols) if cols.nonEmpty => qual.split("\\.", 2) match {
          case Array(sch, tbl) if sch.nonEmpty && tbl.nonEmpty =>
            (sch, tbl) -> cols.split("\\+").toSeq.filter(_.nonEmpty)
          case _ => throw new IllegalArgumentException(
            s"keyOverrides entry '$entry' is not schema.table=col1+col2")
        }
        case _ => throw new IllegalArgumentException(
          s"keyOverrides entry '$entry' is not schema.table=col1+col2")
      }
    }.toMap
}
