package graft.pgproto

/** Typed pgoutput logical-replication messages (protocol v1 + v2, plus the
  * protocol-v3 `two_phase` prepared-transaction tags 'b'/'P'/'K'/'r'/'p').
  *
  * Wire layouts follow the public PostgreSQL documentation ("Logical
  * Streaming Replication Protocol" → "Protocol Message Formats"). The
  * reference decodes the same tag set at `pq/message/message.go:42-73`
  * with per-message decoders in `pq/message/format/<msg>.go`; the tags the
  * reference rejects ('M' logical message, 'O' origin, 'Y' type) we decode
  * fully — see [[Messages.LogicalMessage]], [[Messages.Origin]],
  * [[Messages.TypeMessage]].
  *
  * Proto v2 nuance: when a DML/Relation/Truncate message arrives inside a
  * streamed (in-progress) transaction chunk, the message body is prefixed
  * with the 4-byte XID of that transaction (`message.go:36-49`,
  * `format/insert.go:56-66` in the reference). Callers tell [[Messages.decode]]
  * whether the stream is currently inside STREAM START/STOP.
  */
object Messages {

  sealed trait Msg { def tag: Char }

  /** 'B' — transaction begin (`format/begin.go:17-39`). */
  final case class Begin(finalLsn: Long, commitTimeMicros: Long, xid: Long) extends Msg {
    def tag = 'B'
  }

  /** 'C' — transaction commit (`format/commit.go:18-43`). */
  final case class Commit(
      flags: Int, commitLsn: Long, transactionEndLsn: Long, commitTimeMicros: Long)
      extends Msg { def tag = 'C' }

  /** 'R' — relation (table schema), sent in-band before first DML per table
    * (`format/relation.go:30-97`).
    */
  final case class Relation(
      xid: Long, // 0 unless inside a streamed transaction
      oid: Long,
      namespace: String,
      name: String,
      replicaIdentity: Byte, // 'd' default | 'n' nothing | 'f' full | 'i' index
      columns: Array[RelationColumn])
      extends Msg { def tag = 'R' }

  /** Column descriptor inside 'R' (`pq/message/tuple/data.go:32-37`).
    * `flags` bit 0 = column is part of the replica-identity key.
    */
  final case class RelationColumn(name: String, typeOid: Long, typeModifier: Int, flags: Int) {
    def isKey: Boolean = (flags & 1) != 0
  }

  /** 'I' (`format/insert.go`). */
  final case class Insert(xid: Long, relationOid: Long, newTuple: TupleData.Tuple) extends Msg {
    def tag = 'I'
  }

  /** 'U' (`format/update.go`). oldTupleType: 0 = absent, 'K' = key image,
    * 'O' = full old image (REPLICA IDENTITY FULL).
    */
  final case class Update(
      xid: Long,
      relationOid: Long,
      oldTupleType: Byte,
      oldTuple: TupleData.Tuple, // null when absent
      newTuple: TupleData.Tuple)
      extends Msg { def tag = 'U' }

  /** 'D' (`format/delete.go`). oldTupleType: 'K' or 'O'. */
  final case class Delete(xid: Long, relationOid: Long, oldTupleType: Byte, oldTuple: TupleData.Tuple)
      extends Msg { def tag = 'D' }

  /** 'T' (`format/truncate.go`). */
  final case class Truncate(xid: Long, options: Int, relationOids: Array[Long]) extends Msg {
    def tag = 'T'
    def cascade: Boolean = (options & 1) != 0
    def restartIdentity: Boolean = (options & 2) != 0
  }

  /** 'S' — stream start, proto v2 (`format/stream.go:19-45`). */
  final case class StreamStart(xid: Long, firstSegment: Boolean) extends Msg { def tag = 'S' }

  /** 'E' — stream stop (`format/stream.go`). */
  case object StreamStop extends Msg { def tag = 'E' }

  /** 'c' — stream commit (`format/stream.go:60-90`). */
  final case class StreamCommit(
      xid: Long, flags: Int, commitLsn: Long, transactionEndLsn: Long, commitTimeMicros: Long)
      extends Msg { def tag = 'c' }

  /** 'A' — stream abort (`format/stream.go:92-107`). */
  final case class StreamAbort(xid: Long, subXid: Long) extends Msg { def tag = 'A' }

  /** 'M' — logical decoding message (`pg_logical_emit_message`), sent when
    * the subscription enables `messages 'true'`. BEYOND the reference: it
    * raises on 'M' (`message.go:70-72`), but the outbox pattern — emitting
    * application payloads into WAL without a backing table — is one of the
    * main production uses of logical decoding, so we decode it.
    * `transactional` messages are delivered with their transaction (commit
    * order, rollback-safe); non-transactional ones are delivered
    * immediately at their WAL position.
    */
  final case class LogicalMessage(
      xid: Long, // 0 unless inside a streamed transaction
      transactional: Boolean,
      lsn: Long,
      prefix: String,
      content: Array[Byte])
      extends Msg { def tag = 'M' }

  /** 'O' — replication origin, sent after Begin for transactions that were
    * themselves replicated from elsewhere (cascaded / bidirectional
    * setups). BEYOND the reference (raises): knowing a txn's origin is how
    * a bidirectional pipeline breaks replication loops — see
    * [[graft.cdc.TransactionAssembler]]'s `dropForeignOrigin`.
    */
  final case class Origin(commitLsn: Long, name: String) extends Msg { def tag = 'O' }

  /** 'Y' — type metadata for a custom (non-builtin) column type, sent
    * before the Relation message that references it. BEYOND the reference
    * (raises): we cache oid → qualified name so envelope consumers can see
    * what a custom-typed column actually is (its values still decode as
    * text, PostgreSQL's wire representation for unknown-OID types).
    */
  final case class TypeMessage(xid: Long, oid: Long, namespace: String, name: String)
      extends Msg { def tag = 'Y' }

  /** 'b' — begin of a PREPARED transaction's data section (protocol v3,
    * `two_phase` publications). BEYOND the reference (raises on the tag —
    * two-phase distributed commits never reach it): the body that follows
    * is decoded AND buffered until the matching [[CommitPrepared]] /
    * [[RollbackPrepared]] arrives, which may be arbitrarily later.
    * Layout per the public docs ("Protocol Message Formats", Begin Prepare).
    */
  final case class BeginPrepare(
      prepareLsn: Long, endLsn: Long, prepareTimeMicros: Long, xid: Long, gid: String)
      extends Msg { def tag = 'b' }

  /** 'P' — end of the prepared transaction's data section (PREPARE
    * TRANSACTION itself). Nothing is emitted downstream until the gid's
    * commit/rollback decision arrives.
    */
  final case class Prepare(
      flags: Int, prepareLsn: Long, endLsn: Long, prepareTimeMicros: Long,
      xid: Long, gid: String)
      extends Msg { def tag = 'P' }

  /** 'K' — COMMIT PREPARED: the gid's buffered events become visible,
    * commit-stamped with THIS message's LSN/time (not the prepare's).
    */
  final case class CommitPrepared(
      flags: Int, commitLsn: Long, endLsn: Long, commitTimeMicros: Long,
      xid: Long, gid: String)
      extends Msg { def tag = 'K' }

  /** 'r' — ROLLBACK PREPARED: the gid's buffered events are discarded
    * wholesale; consumers never observe them.
    */
  final case class RollbackPrepared(
      flags: Int, prepareEndLsn: Long, rollbackEndLsn: Long,
      prepareTimeMicros: Long, rollbackTimeMicros: Long, xid: Long, gid: String)
      extends Msg { def tag = 'r' }

  /** 'p' — STREAM PREPARE: a streamed (v2 in-progress) transaction ends in
    * PREPARE TRANSACTION instead of a stream commit; its buffered chunks
    * move to the prepared-gid ledger and await 'K'/'r' like a plain
    * prepared transaction.
    */
  final case class StreamPrepare(
      flags: Int, prepareLsn: Long, endLsn: Long, prepareTimeMicros: Long,
      xid: Long, gid: String)
      extends Msg { def tag = 'p' }

  /** Decode one pgoutput message (the XLogData payload).
    *
    * @param inStreamedTx true when between STREAM START and STREAM STOP —
    *                     DML/Relation/Truncate bodies then carry an XID prefix.
    */
  def decode(payload: Array[Byte], inStreamedTx: Boolean): Msg = {
    if (payload.isEmpty) throw new PgProtoException("empty pgoutput message")
    val tag = payload(0).toChar
    val r = new ByteReader(payload, 1)
    def streamXid(): Long = if (inStreamedTx) r.readUint32("stream xid") else 0L

    tag match {
      case 'B' =>
        Begin(
          r.readUint64("finalLsn"),
          PgEpoch.toUnixMicros(r.readUint64("commitTime")),
          r.readUint32("xid"))

      case 'C' =>
        Commit(
          r.readUint8("flags"),
          r.readUint64("commitLsn"),
          r.readUint64("transactionEndLsn"),
          PgEpoch.toUnixMicros(r.readUint64("commitTime")))

      case 'R' =>
        val xid = streamXid()
        val oid = r.readUint32("relation oid")
        val ns = r.readCString("namespace")
        val name = r.readCString("relation name")
        val ri = r.readByte("replica identity")
        val ncols = r.readUint16("column count")
        val cols = Array.tabulate(ncols) { _ =>
          val flags = r.readUint8("column flags")
          val cname = r.readCString("column name")
          val typeOid = r.readUint32("column type oid")
          val typmod = r.readUint32("column typmod").toInt
          RelationColumn(cname, typeOid, typmod, flags)
        }
        Relation(xid, oid, ns, name, ri, cols)

      case 'I' =>
        val xid = streamXid()
        val oid = r.readUint32("relation oid")
        val n = r.readByte("new tuple marker")
        if (n != 'N') throw new PgProtoException(s"insert: expected 'N' tuple, got '${n.toChar}'")
        Insert(xid, oid, TupleData.read(r))

      case 'U' =>
        val xid = streamXid()
        val oid = r.readUint32("relation oid")
        val marker = r.readByte("tuple marker")
        marker match {
          case 'K' | 'O' =>
            val old = TupleData.read(r)
            val n = r.readByte("new tuple marker")
            if (n != 'N')
              throw new PgProtoException(s"update: expected 'N' after old tuple, got '${n.toChar}'")
            Update(xid, oid, marker, old, TupleData.read(r))
          case 'N' =>
            Update(xid, oid, 0, null, TupleData.read(r))
          case other =>
            throw new PgProtoException(s"update: unexpected tuple marker '${other.toChar}'")
        }

      case 'D' =>
        val xid = streamXid()
        val oid = r.readUint32("relation oid")
        val marker = r.readByte("old tuple marker")
        if (marker != 'K' && marker != 'O')
          throw new PgProtoException(s"delete: expected 'K'/'O' tuple, got '${marker.toChar}'")
        Delete(xid, oid, marker, TupleData.read(r))

      case 'T' =>
        val xid = streamXid()
        val nrel = r.readUint32("truncate relation count").toInt
        // each relation OID costs 4 bytes, so the count can never exceed
        // remaining/4 — reject a corrupt header before Array.fill trusts it
        if (nrel < 0 || nrel.toLong * 4L > r.remaining)
          throw new PgProtoException(
            s"truncate relation count $nrel exceeds frame (${r.remaining} bytes left)")
        val options = r.readUint8("truncate options")
        Truncate(xid, options, Array.fill(nrel)(r.readUint32("truncate relation oid")))

      case 'S' =>
        StreamStart(r.readUint32("xid"), r.readByte("first segment") == 1)

      case 'E' => StreamStop

      case 'c' =>
        StreamCommit(
          r.readUint32("xid"),
          r.readUint8("flags"),
          r.readUint64("commitLsn"),
          r.readUint64("transactionEndLsn"),
          PgEpoch.toUnixMicros(r.readUint64("commitTime")))

      case 'A' =>
        StreamAbort(r.readUint32("xid"), r.readUint32("subXid"))

      case 'M' =>
        val xid = streamXid()
        val flags = r.readUint8("message flags")
        val lsn = r.readUint64("message lsn")
        val prefix = r.readCString("message prefix")
        val len = r.readUint32("message content length").toInt
        LogicalMessage(xid, (flags & 1) != 0, lsn, prefix, r.readBytes(len, "message content"))

      case 'O' =>
        Origin(r.readUint64("origin commit lsn"), r.readCString("origin name"))

      case 'b' =>
        BeginPrepare(
          r.readUint64("prepareLsn"),
          r.readUint64("prepareEndLsn"),
          PgEpoch.toUnixMicros(r.readUint64("prepareTime")),
          r.readUint32("xid"),
          r.readCString("gid"))

      case 'P' =>
        Prepare(
          r.readUint8("flags"),
          r.readUint64("prepareLsn"),
          r.readUint64("prepareEndLsn"),
          PgEpoch.toUnixMicros(r.readUint64("prepareTime")),
          r.readUint32("xid"),
          r.readCString("gid"))

      case 'K' =>
        CommitPrepared(
          r.readUint8("flags"),
          r.readUint64("commitLsn"),
          r.readUint64("commitEndLsn"),
          PgEpoch.toUnixMicros(r.readUint64("commitTime")),
          r.readUint32("xid"),
          r.readCString("gid"))

      case 'r' =>
        RollbackPrepared(
          r.readUint8("flags"),
          r.readUint64("prepareEndLsn"),
          r.readUint64("rollbackEndLsn"),
          PgEpoch.toUnixMicros(r.readUint64("prepareTime")),
          PgEpoch.toUnixMicros(r.readUint64("rollbackTime")),
          r.readUint32("xid"),
          r.readCString("gid"))

      case 'p' =>
        StreamPrepare(
          r.readUint8("flags"),
          r.readUint64("prepareLsn"),
          r.readUint64("prepareEndLsn"),
          PgEpoch.toUnixMicros(r.readUint64("prepareTime")),
          r.readUint32("xid"),
          r.readCString("gid"))

      case 'Y' =>
        val xid = streamXid()
        TypeMessage(xid, r.readUint32("type oid"),
          r.readCString("type namespace"), r.readCString("type name"))

      case other =>
        throw new PgProtoException(s"unknown pgoutput message tag '$other'")
    }
  }
}
