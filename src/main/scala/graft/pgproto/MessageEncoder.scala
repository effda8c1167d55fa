package graft.pgproto

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

/** Encoder for pgoutput messages and replication frames.
  *
  * PostgreSQL itself is the only real producer of these bytes; we encode them
  * to (a) build unit-test fixtures equivalent to the reference's hand-built
  * frames (`pq/message/format/<msg>_test.go`), and (b) drive the synthetic WAL
  * feed used by the streaming-source tests and ingest benchmarks, standing in
  * for a walsender when no PostgreSQL is available (the reference does the
  * same with fake frames in `pq/replication/stream_connmu_test.go`).
  */
object MessageEncoder {

  private final class W {
    val out = new ByteArrayOutputStream(64)
    def byte(b: Int): W = { out.write(b & 0xff); this }
    def u16(v: Int): W = { out.write((v >>> 8) & 0xff); out.write(v & 0xff); this }
    def u32(v: Long): W = {
      var i = 3
      while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
      this
    }
    def u64(v: Long): W = {
      var i = 7
      while (i >= 0) { out.write(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
      this
    }
    def cstr(s: String): W = { out.write(s.getBytes(UTF_8)); out.write(0); this }
    def raw(b: Array[Byte]): W = { out.write(b, 0, b.length); this }
    def bytes: Array[Byte] = out.toByteArray
  }

  def begin(finalLsn: Long, commitTimeUnixMicros: Long, xid: Long): Array[Byte] =
    new W().byte('B').u64(finalLsn).u64(PgEpoch.fromUnixMicros(commitTimeUnixMicros)).u32(xid).bytes

  def commit(commitLsn: Long, txEndLsn: Long, commitTimeUnixMicros: Long, flags: Int = 0): Array[Byte] =
    new W().byte('C').byte(flags).u64(commitLsn).u64(txEndLsn)
      .u64(PgEpoch.fromUnixMicros(commitTimeUnixMicros)).bytes

  def relation(
      oid: Long, namespace: String, name: String,
      columns: Seq[Messages.RelationColumn],
      replicaIdentity: Byte = 'd', streamedXid: Long = -1): Array[Byte] = {
    val w = new W().byte('R')
    if (streamedXid >= 0) w.u32(streamedXid)
    w.u32(oid).cstr(namespace).cstr(name).byte(replicaIdentity).u16(columns.size)
    columns.foreach { c => w.byte(c.flags).cstr(c.name).u32(c.typeOid).u32(c.typeModifier.toLong & 0xffffffffL) }
    w.bytes
  }

  /** Encode a tuple: Some(string) → 't' text col, None → 'n' null,
    * the sentinel [[Toast]] → 'u' unchanged TOAST.
    */
  val Toast: String = "\u0000T" // sentinel, never a real value

  def tuple(values: Seq[Option[String]]): Array[Byte] = {
    val w = new W().u16(values.size)
    values.foreach {
      case Some(s) if s == Toast => w.byte('u')
      case Some(s) =>
        val b = s.getBytes(UTF_8)
        w.byte('t').u32(b.length.toLong).raw(b)
      case None => w.byte('n')
    }
    w.bytes
  }

  def insert(relOid: Long, values: Seq[Option[String]], streamedXid: Long = -1): Array[Byte] = {
    val w = new W().byte('I')
    if (streamedXid >= 0) w.u32(streamedXid)
    w.u32(relOid).byte('N').raw(tuple(values))
  }.bytes

  /** Column payloads for [[tupleTagged]] — the full tag alphabet, including
    * binary-format ('b') values a `binary: true` publication sends.
    */
  sealed trait Col
  object Col {
    final case class Text(s: String) extends Col
    final case class Bin(bytes: Array[Byte]) extends Col
    case object Null extends Col
    case object Toasted extends Col
  }

  /** Like [[tuple]] but with explicit per-column tags. */
  def tupleTagged(cols: Seq[Col]): Array[Byte] = {
    val w = new W().u16(cols.size)
    cols.foreach {
      case Col.Text(s) =>
        val b = s.getBytes(UTF_8)
        w.byte('t').u32(b.length.toLong).raw(b)
      case Col.Bin(bytes) => w.byte('b').u32(bytes.length.toLong).raw(bytes)
      case Col.Null => w.byte('n')
      case Col.Toasted => w.byte('u')
    }
    w.bytes
  }

  /** INSERT whose new tuple carries explicitly-tagged (possibly binary)
    * columns.
    */
  def insertTagged(relOid: Long, cols: Seq[Col], streamedXid: Long = -1): Array[Byte] = {
    val w = new W().byte('I')
    if (streamedXid >= 0) w.u32(streamedXid)
    w.u32(relOid).byte('N').raw(tupleTagged(cols))
  }.bytes

  def update(
      relOid: Long, newValues: Seq[Option[String]],
      oldValues: Seq[Option[String]] = null, oldType: Byte = 'O',
      streamedXid: Long = -1): Array[Byte] = {
    val w = new W().byte('U')
    if (streamedXid >= 0) w.u32(streamedXid)
    w.u32(relOid)
    if (oldValues != null) w.byte(oldType).raw(tuple(oldValues))
    w.byte('N').raw(tuple(newValues))
  }.bytes

  def delete(
      relOid: Long, oldValues: Seq[Option[String]], oldType: Byte = 'K',
      streamedXid: Long = -1): Array[Byte] = {
    val w = new W().byte('D')
    if (streamedXid >= 0) w.u32(streamedXid)
    w.u32(relOid).byte(oldType).raw(tuple(oldValues))
  }.bytes

  def truncate(relOids: Seq[Long], options: Int = 0, streamedXid: Long = -1): Array[Byte] = {
    val w = new W().byte('T')
    if (streamedXid >= 0) w.u32(streamedXid)
    w.u32(relOids.size.toLong).byte(options)
    relOids.foreach(w.u32)
    w.bytes
  }

  def streamStart(xid: Long, firstSegment: Boolean): Array[Byte] =
    new W().byte('S').u32(xid).byte(if (firstSegment) 1 else 0).bytes

  def streamStop(): Array[Byte] = new W().byte('E').bytes

  def streamCommit(xid: Long, commitLsn: Long, txEndLsn: Long, commitTimeUnixMicros: Long): Array[Byte] =
    new W().byte('c').u32(xid).byte(0).u64(commitLsn).u64(txEndLsn)
      .u64(PgEpoch.fromUnixMicros(commitTimeUnixMicros)).bytes

  def streamAbort(xid: Long, subXid: Long): Array[Byte] =
    new W().byte('A').u32(xid).u32(subXid).bytes

  def origin(commitLsn: Long, name: String): Array[Byte] =
    new W().byte('O').u64(commitLsn).cstr(name).bytes

  // ---- two-phase (protocol v3 `two_phase`) prepared-transaction tags ----

  def beginPrepare(prepareLsn: Long, endLsn: Long, prepareTimeUnixMicros: Long,
      xid: Long, gid: String): Array[Byte] =
    new W().byte('b').u64(prepareLsn).u64(endLsn)
      .u64(PgEpoch.fromUnixMicros(prepareTimeUnixMicros)).u32(xid).cstr(gid).bytes

  def prepare(prepareLsn: Long, endLsn: Long, prepareTimeUnixMicros: Long,
      xid: Long, gid: String, flags: Int = 0): Array[Byte] =
    new W().byte('P').byte(flags).u64(prepareLsn).u64(endLsn)
      .u64(PgEpoch.fromUnixMicros(prepareTimeUnixMicros)).u32(xid).cstr(gid).bytes

  def commitPrepared(commitLsn: Long, endLsn: Long, commitTimeUnixMicros: Long,
      xid: Long, gid: String, flags: Int = 0): Array[Byte] =
    new W().byte('K').byte(flags).u64(commitLsn).u64(endLsn)
      .u64(PgEpoch.fromUnixMicros(commitTimeUnixMicros)).u32(xid).cstr(gid).bytes

  def rollbackPrepared(prepareEndLsn: Long, rollbackEndLsn: Long,
      prepareTimeUnixMicros: Long, rollbackTimeUnixMicros: Long,
      xid: Long, gid: String, flags: Int = 0): Array[Byte] =
    new W().byte('r').byte(flags).u64(prepareEndLsn).u64(rollbackEndLsn)
      .u64(PgEpoch.fromUnixMicros(prepareTimeUnixMicros))
      .u64(PgEpoch.fromUnixMicros(rollbackTimeUnixMicros)).u32(xid).cstr(gid).bytes

  def streamPrepare(prepareLsn: Long, endLsn: Long, prepareTimeUnixMicros: Long,
      xid: Long, gid: String, flags: Int = 0): Array[Byte] =
    new W().byte('p').byte(flags).u64(prepareLsn).u64(endLsn)
      .u64(PgEpoch.fromUnixMicros(prepareTimeUnixMicros)).u32(xid).cstr(gid).bytes

  def typeMessage(oid: Long, namespace: String, name: String, streamedXid: Long = -1): Array[Byte] = {
    val w = new W().byte('Y')
    if (streamedXid >= 0) w.u32(streamedXid)
    w.u32(oid).cstr(namespace).cstr(name)
  }.bytes

  def logicalMessage(
      prefix: String, content: Array[Byte], transactional: Boolean,
      lsn: Long = 0L, streamedXid: Long = -1): Array[Byte] = {
    val w = new W().byte('M')
    if (streamedXid >= 0) w.u32(streamedXid)
    w.byte(if (transactional) 1 else 0).u64(lsn).cstr(prefix)
      .u32(content.length.toLong).raw(content)
  }.bytes

  /** Wrap a pgoutput message in an XLogData ('w') CopyData payload. */
  def xlogData(walStart: Long, serverWalEnd: Long, serverTimeUnixMicros: Long, msg: Array[Byte]): Array[Byte] =
    new W().byte('w').u64(walStart).u64(serverWalEnd)
      .u64(PgEpoch.fromUnixMicros(serverTimeUnixMicros)).raw(msg).bytes

  def keepalive(serverWalEnd: Long, serverTimeUnixMicros: Long, replyRequested: Boolean): Array[Byte] =
    new W().byte('k').u64(serverWalEnd)
      .u64(PgEpoch.fromUnixMicros(serverTimeUnixMicros)).byte(if (replyRequested) 1 else 0).bytes
}
