package graft.pgproto

/** Replication-protocol frames that wrap pgoutput messages.
  *
  * A CopyData payload from the walsender starts with either `'w'` (XLogData)
  * or `'k'` (primary keepalive); we send back `'r'` (standby status update).
  * Layouts per PostgreSQL docs §55.4 "Streaming Replication Protocol";
  * the reference parses these at `pq/replication/wal.go:22-34` and
  * `pq/message/format/keepalive.go:14-41`, and writes status updates at
  * `pq/replication/stream.go:735-751`.
  */
object WalFrames {
  val TagXLogData: Byte = 'w'
  val TagKeepalive: Byte = 'k'
  val TagStandbyStatusUpdate: Byte = 'r'

  /** `'w'` frame: 24-byte header + embedded pgoutput message bytes. */
  final case class XLogData(
      walStart: Long,
      serverWalEnd: Long,
      serverTimeMicros: Long, // Unix µs (converted from pg epoch)
      data: Array[Byte])

  /** `'k'` frame: server liveness + reply request. */
  final case class Keepalive(
      serverWalEnd: Long,
      serverTimeMicros: Long, // Unix µs
      replyRequested: Boolean)

  sealed trait Frame
  final case class XLogDataFrame(x: XLogData) extends Frame
  final case class KeepaliveFrame(k: Keepalive) extends Frame

  /** Demux one CopyData payload. Mirrors `sinkLoop`'s dispatch
    * (`pq/replication/stream.go:302-348`).
    */
  def parse(copyData: Array[Byte]): Frame = {
    if (copyData.isEmpty) throw new PgProtoException("empty CopyData frame")
    copyData(0) match {
      case TagXLogData =>
        val r = new ByteReader(copyData, 1)
        val walStart = r.readUint64("walStart")
        val walEnd = r.readUint64("serverWalEnd")
        val t = PgEpoch.toUnixMicros(r.readUint64("serverTime"))
        XLogDataFrame(XLogData(walStart, walEnd, t, r.readBytes(r.remaining, "xlog payload")))
      case TagKeepalive =>
        val r = new ByteReader(copyData, 1)
        val walEnd = r.readUint64("serverWalEnd")
        val t = PgEpoch.toUnixMicros(r.readUint64("serverTime"))
        KeepaliveFrame(Keepalive(walEnd, t, r.readByte("replyRequested") != 0))
      case other =>
        throw new PgProtoException(f"unknown replication frame tag 0x$other%02x")
    }
  }

  /** Encode a standby status update (`'r'`): received/flushed/applied LSN ×3
    * + pg-epoch time + replyRequested. The reference sends the confirmed
    * position in all three LSN slots (`pq/replication/stream.go:735-751`);
    * we do the same.
    */
  def encodeStandbyStatusUpdate(
      confirmedLsn: Long,
      nowUnixMicros: Long,
      replyRequested: Boolean = false): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(1 + 8 * 4 + 1)
    out.put(TagStandbyStatusUpdate)
    out.putLong(confirmedLsn)
    out.putLong(confirmedLsn)
    out.putLong(confirmedLsn)
    out.putLong(PgEpoch.fromUnixMicros(nowUnixMicros))
    out.put(if (replyRequested) 1.toByte else 0.toByte)
    out.array()
  }
}
