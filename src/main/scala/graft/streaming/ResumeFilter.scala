package graft.streaming

import graft.pgproto.{Lsn, MessageEncoder, WalFrames}

/** Transaction-aware resume: replay only transactions whose commit end-LSN is
  * beyond the confirmed position — exactly how a resumed
  * `START_REPLICATION SLOT … LOGICAL <lsn>` behaves (logical decoding re-sends
  * whole transactions with commit > confirmed_flush_lsn; it never splits one).
  * Reference: `pq/replication/stream.go:95-98,148` resumes from the confirmed
  * LSN and relies on the server for this filtering; with file/in-memory feeds
  * we are the server, so the filter lives here and is shared by every
  * [[WalSource]] implementation and the snapshot→CDC seam query.
  *
  * Decisions are single-pass and zero-buffer:
  *  - non-streamed txns: Begin carries the txn end LSN (`finalLsn`), so the
  *    keep/drop decision is made at Begin; DML inside a dropped txn is dropped.
  *  - Relation messages always replay (a resumed slot re-sends schema before
  *    the first DML per table; our feeds won't, so the filter must preserve
  *    them) — as do keepalives.
  *  - streamed (v2) txns: segments pass through (the server would re-stream an
  *    in-progress txn from its start anyway); a StreamCommit at or below the
  *    confirmed LSN is rewritten to a StreamAbort so the downstream
  *    [[graft.cdc.TransactionAssembler]] frees the buffer and, critically,
  *    never re-emits the already-delivered events.
  *
  * Only message headers are peeked (tag + one LSN field) — no tuple decode.
  */
object ResumeFilter {

  /** End LSN of a 'c' StreamCommit payload: tag(1)+xid(4)+flags(1)+commitLsn(8). */
  private def streamCommitEndLsn(data: Array[Byte]): Long = readU64(data, 14)

  private def streamCommitXid(data: Array[Byte]): Long = readU32(data, 1)

  /** End LSN of a 'C' Commit payload: tag(1)+flags(1)+commitLsn(8). */
  def commitEndLsn(data: Array[Byte]): Long = readU64(data, 10)

  private def readU64(a: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 0
    while (i < 8) { v = (v << 8) | (a(off + i) & 0xffL); i += 1 }
    v
  }
  private def readU32(a: Array[Byte], off: Int): Long = {
    var v = 0L; var i = 0
    while (i < 4) { v = (v << 8) | (a(off + i) & 0xffL); i += 1 }
    v
  }

  def apply(frames: Iterator[Array[Byte]], fromLsn: Long): Iterator[Array[Byte]] =
    if (fromLsn == Lsn.Zero) frames
    else new Iterator[Array[Byte]] {
      private var dropTxn = false // inside a non-streamed txn decided "drop"
      private var pending: Array[Byte] = advance()

      private def advance(): Array[Byte] = {
        while (frames.hasNext) {
          val raw = frames.next()
          decide(raw) match {
            case null =>
            case out => return out
          }
        }
        null
      }

      /** Returns the frame to emit (possibly rewritten), or null to drop. */
      private def decide(raw: Array[Byte]): Array[Byte] = {
        if (raw.isEmpty || raw(0) != WalFrames.TagXLogData) return raw // keepalives pass
        // XLogData header is 1 + 24 bytes; payload tag at offset 25.
        val p = 25
        if (raw.length <= p) return raw
        raw(p) match {
          case 'B' =>
            dropTxn = Lsn.compare(beginFinalLsn(raw, p), fromLsn) <= 0
            if (dropTxn) null else raw
          case 'C' =>
            val keep = !dropTxn
            dropTxn = false
            if (keep) raw else null
          case 'R' => raw // schema always survives
          case 'c' =>
            val data = java.util.Arrays.copyOfRange(raw, p, raw.length)
            if (Lsn.compare(streamCommitEndLsn(data), fromLsn) > 0) raw
            else {
              // Already-delivered streamed txn: abort instead of re-committing,
              // so buffered segments are freed and no events re-emit. Keep the
              // original 25-byte XLogData header, swap the payload.
              val xid = streamCommitXid(data)
              java.util.Arrays.copyOfRange(raw, 0, p) ++
                MessageEncoder.streamAbort(xid, xid)
            }
          case 'S' | 'E' | 'A' => raw // stream segment control passes
          case 'b' =>
            // Two-phase: a prepared txn's body is re-sent only while the
            // confirmed position is below its PREPARE end — exactly
            // PostgreSQL's two_phase contract (a subscriber confirmed past
            // the prepare is assumed to hold the data durably).
            dropTxn = Lsn.compare(readU64(raw, p + 9), fromLsn) <= 0
            if (dropTxn) null else raw
          case 'P' =>
            val keep = !dropTxn
            dropTxn = false
            if (keep) raw else null
          case 'K' | 'r' =>
            // Commit/rollback-prepared at or below confirmed: already
            // processed downstream — drop the decision frame.
            if (Lsn.compare(readU64(raw, p + 10), fromLsn) > 0) raw else null
          case 'p' =>
            // Stream-prepare already confirmed: the chunks that preceded it
            // replayed above (segments always pass) — rewrite to an abort so
            // the buffer frees and nothing re-emits, like the 'c' case.
            if (Lsn.compare(readU64(raw, p + 10), fromLsn) > 0) raw
            else {
              val xid = readU32(raw, p + 26)
              java.util.Arrays.copyOfRange(raw, 0, p) ++
                MessageEncoder.streamAbort(xid, xid)
            }
          case _ => // DML/Truncate: streamed ones pass (decided at 'c'), plain ones follow dropTxn
            if (dropTxn) null else raw
        }
      }

      private def beginFinalLsn(raw: Array[Byte], payloadOff: Int): Long =
        readU64(raw, payloadOff + 1)

      override def hasNext: Boolean = pending != null
      override def next(): Array[Byte] = { val f = pending; pending = advance(); f }
    }
}
