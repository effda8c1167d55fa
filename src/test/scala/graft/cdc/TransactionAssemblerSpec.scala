package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import graft.pgproto._

/** Scala port of the reference's transactional semantics tests
  * (`integration_test/concurrent_tx_ordering_test.go`,
  * `transactional_large_rollback_test.go`, `streaming_transaction_test.go`,
  * `streaming_rollback_test.go`) at the frame level — no PostgreSQL needed,
  * the same way `pq/replication/stream_connmu_test.go` fakes frames.
  */
class TransactionAssemblerSpec extends AnyFunSuite {

  val RelOid = 16384L
  val Cols = Seq(
    Messages.RelationColumn("id", 23L, -1, 1),
    Messages.RelationColumn("name", 25L, -1, 0))
  val T0 = 1700000000000000L

  private def newAssembler(hb: Option[(String, String)] = None) = {
    val a = new TransactionAssembler(hb)
    a.onCopyData(MessageEncoder.xlogData(1, 1, T0,
      MessageEncoder.relation(RelOid, "public", "books", Cols)))
    a
  }

  private def feed(a: TransactionAssembler, frames: Array[Byte]*): Seq[ChangeEvent] =
    frames.flatMap(a.onCopyData).toSeq

  test("simple txn: events in order, last event carries txn-end LSN") {
    val a = newAssembler()
    val evs = feed(a,
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.begin(110, T0, 7)),
      MessageEncoder.xlogData(101, 101, T0, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")))),
      MessageEncoder.xlogData(102, 102, T0, MessageEncoder.insert(RelOid, Seq(Some("2"), Some("b")))),
      MessageEncoder.xlogData(103, 103, T0, MessageEncoder.insert(RelOid, Seq(Some("3"), None))),
      MessageEncoder.xlogData(109, 109, T0, MessageEncoder.commit(109, 110, T0)))
    assert(evs.map(_.after("id")) == Seq("1", "2", "3"))
    assert(evs.map(_.lsn) == Seq(101L, 102L, 110L)) // T1 rewrite on last
    assert(evs.forall(_.xid == 7L))
    assert(evs.forall(_.commitLsn == 110L))
    assert(evs.forall(_.op == "insert"))
    assert(evs.last.after("name") == null) // explicit SQL NULL
    assert(evs.head.keyNames == Seq("id"))
  }

  test("REPLICA IDENTITY FULL key flags: all columns by default, PK via keyNameOverrides") {
    // pgoutput under FULL flags EVERY column as identity — the wire truth.
    val fullCols = Seq(
      Messages.RelationColumn("id", 23L, -1, 1),
      Messages.RelationColumn("name", 25L, -1, 1))
    def drive(a: TransactionAssembler): Seq[ChangeEvent] = {
      a.onCopyData(MessageEncoder.xlogData(1, 1, T0,
        MessageEncoder.relation(RelOid, "public", "books", fullCols, 'f')))
      feed(a,
        MessageEncoder.xlogData(100, 100, T0, MessageEncoder.begin(110, T0, 7)),
        MessageEncoder.xlogData(101, 101, T0,
          MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")))),
        MessageEncoder.xlogData(109, 109, T0, MessageEncoder.commit(109, 110, T0)))
    }
    // no override: the wire flags stand — every column is a key column
    assert(drive(new TransactionAssembler()).head.keyNames == Seq("id", "name"))
    // override: the catalog PK is recorded instead, so key-folding
    // consumers (the lake, pg→pg apply) coalesce row versions
    assert(drive(new TransactionAssembler(keyNameOverrides =
      Map(("public", "books") -> Seq("id")))).head.keyNames == Seq("id"))
    // a STALE override (column renamed away) falls back to the wire flags
    assert(drive(new TransactionAssembler(keyNameOverrides =
      Map(("public", "books") -> Seq("gone")))).head.keyNames == Seq("id", "name"))
    // the source-option codec round-trips
    val m = Map(("public", "books") -> Seq("id"), ("s2", "t2") -> Seq("a", "b"))
    assert(TransactionAssembler.parseKeyOverrides(
      TransactionAssembler.encodeKeyOverrides(m)) == m)
  }

  test("interleaved commits stay commit-ordered (concurrent_tx_ordering)") {
    // WAL is already commit-ordered for non-streamed txns; assert we don't
    // reorder: txn B commits before txn A in WAL order.
    val a = newAssembler()
    val evs = feed(a,
      MessageEncoder.xlogData(200, 200, T0, MessageEncoder.begin(210, T0, 21)),
      MessageEncoder.xlogData(201, 201, T0, MessageEncoder.insert(RelOid, Seq(Some("10"), Some("B1")))),
      MessageEncoder.xlogData(209, 209, T0, MessageEncoder.commit(209, 210, T0)),
      MessageEncoder.xlogData(210, 210, T0, MessageEncoder.begin(220, T0 + 5, 20)),
      MessageEncoder.xlogData(211, 211, T0, MessageEncoder.insert(RelOid, Seq(Some("11"), Some("A1")))),
      MessageEncoder.xlogData(219, 219, T0, MessageEncoder.commit(219, 220, T0 + 5)))
    assert(evs.map(_.after("id")) == Seq("10", "11"))
    assert(evs.map(_.xid) == Seq(21L, 20L))
    assert(evs.map(_.lsn) == Seq(210L, 220L))
    assert(evs.map(_.commitTimeMicros) == Seq(T0, T0 + 5))
  }

  test("streamed txn (proto v2): buffered until STREAM COMMIT, interleaved XIDs kept apart") {
    val a = newAssembler()
    val pre = feed(a,
      // xid 900 chunk 1
      MessageEncoder.xlogData(300, 300, T0, MessageEncoder.streamStart(900, firstSegment = true)),
      MessageEncoder.xlogData(301, 301, T0, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("x")), streamedXid = 900)),
      MessageEncoder.xlogData(302, 302, T0, MessageEncoder.streamStop()),
      // xid 901 interleaves
      MessageEncoder.xlogData(303, 303, T0, MessageEncoder.streamStart(901, firstSegment = true)),
      MessageEncoder.xlogData(304, 304, T0, MessageEncoder.insert(RelOid, Seq(Some("2"), Some("y")), streamedXid = 901)),
      MessageEncoder.xlogData(305, 305, T0, MessageEncoder.streamStop()),
      // xid 900 chunk 2
      MessageEncoder.xlogData(306, 306, T0, MessageEncoder.streamStart(900, firstSegment = false)),
      MessageEncoder.xlogData(307, 307, T0, MessageEncoder.insert(RelOid, Seq(Some("3"), Some("z")), streamedXid = 900)),
      MessageEncoder.xlogData(308, 308, T0, MessageEncoder.streamStop()))
    assert(pre.isEmpty, "nothing emitted before stream commit")
    assert(a.bufferedStreamEvents == 3)

    // commit xid 900 → its two events emit, in arrival order, last LSN rewritten
    val c900 = feed(a, MessageEncoder.xlogData(310, 310, T0,
      MessageEncoder.streamCommit(900, 310, 311, T0 + 9)))
    assert(c900.map(_.after("id")) == Seq("1", "3"))
    assert(c900.map(_.lsn) == Seq(301L, 311L))
    assert(c900.forall(_.xid == 900L))
    assert(c900.forall(_.commitLsn == 310L))
    assert(c900.forall(_.commitTimeMicros == T0 + 9))

    // xid 901 still buffered
    assert(a.bufferedStreamEvents == 1)
    val c901 = feed(a, MessageEncoder.xlogData(312, 312, T0,
      MessageEncoder.streamCommit(901, 312, 313, T0 + 10)))
    assert(c901.map(_.after("id")) == Seq("2"))
  }

  test("STREAM ABORT discards the whole txn (streaming_rollback)") {
    val a = newAssembler()
    val pre = feed(a,
      MessageEncoder.xlogData(400, 400, T0, MessageEncoder.streamStart(950, firstSegment = true)),
      MessageEncoder.xlogData(401, 401, T0, MessageEncoder.insert(RelOid, Seq(Some("66"), Some("rollback-me")), streamedXid = 950)),
      MessageEncoder.xlogData(402, 402, T0, MessageEncoder.streamStop()),
      MessageEncoder.xlogData(403, 403, T0, MessageEncoder.streamAbort(950, 950)))
    assert(pre.isEmpty)
    assert(a.bufferedStreamEvents == 0)

    // rollback-then-commit: a later txn with the same table still flows
    val evs = feed(a,
      MessageEncoder.xlogData(410, 410, T0, MessageEncoder.begin(412, T0, 951)),
      MessageEncoder.xlogData(411, 411, T0, MessageEncoder.insert(RelOid, Seq(Some("67"), Some("keep-me")))),
      MessageEncoder.xlogData(411, 411, T0, MessageEncoder.commit(411, 412, T0)))
    assert(evs.map(_.after("name")) == Seq("keep-me"))
  }

  test("STREAM ABORT of a subtransaction drops only its events; parent commits survive") {
    // Reference: `pq/message/format/stream.go:92-107` — StreamAbort carries
    // (xid, subXid); subXid != xid means a subtransaction rollback, not the
    // whole transaction. Streamed DML carries the (sub)transaction XID that
    // wrote it in the v2 prefix.
    val a = newAssembler()
    val pre = feed(a,
      MessageEncoder.xlogData(420, 420, T0, MessageEncoder.streamStart(960, firstSegment = true)),
      MessageEncoder.xlogData(421, 421, T0, MessageEncoder.insert(RelOid, Seq(Some("70"), Some("parent-1")), streamedXid = 960)),
      MessageEncoder.xlogData(422, 422, T0, MessageEncoder.insert(RelOid, Seq(Some("71"), Some("in-subtxn")), streamedXid = 961)),
      MessageEncoder.xlogData(423, 423, T0, MessageEncoder.insert(RelOid, Seq(Some("72"), Some("parent-2")), streamedXid = 960)),
      MessageEncoder.xlogData(424, 424, T0, MessageEncoder.streamStop()),
      // subtransaction 961 of parent 960 rolls back
      MessageEncoder.xlogData(425, 425, T0, MessageEncoder.streamAbort(960, 961)))
    assert(pre.isEmpty)
    assert(a.bufferedStreamEvents == 2, "only the subtransaction's event drops")

    val evs = feed(a, MessageEncoder.xlogData(430, 430, T0,
      MessageEncoder.streamCommit(960, 430, 431, T0 + 4)))
    assert(evs.map(_.after("id")) == Seq("70", "72"), "parent rows survive a child abort")
    assert(evs.map(_.lsn) == Seq(421L, 431L))
  }

  test("update with REPLICA IDENTITY FULL: before image + TOAST restoration") {
    val a = newAssembler()
    val evs = feed(a,
      MessageEncoder.xlogData(500, 500, T0, MessageEncoder.begin(503, T0, 60)),
      MessageEncoder.xlogData(501, 501, T0, MessageEncoder.update(RelOid,
        newValues = Seq(Some("1"), Some(MessageEncoder.Toast)),
        oldValues = Seq(Some("1"), Some("big-old-toast")), oldType = 'O')),
      MessageEncoder.xlogData(502, 502, T0, MessageEncoder.commit(502, 503, T0)))
    assert(evs.size == 1)
    val e = evs.head
    assert(e.op == "update")
    assert(e.before("name") == "big-old-toast")
    assert(e.after("name") == "big-old-toast") // P6 restored
    assert(e.lsn == 503L)
  }

  test("delete carries key tuple as before image; after is null") {
    val a = newAssembler()
    val evs = feed(a,
      MessageEncoder.xlogData(600, 600, T0, MessageEncoder.begin(603, T0, 61)),
      MessageEncoder.xlogData(601, 601, T0, MessageEncoder.delete(RelOid, Seq(Some("9"), None), 'K')),
      MessageEncoder.xlogData(602, 602, T0, MessageEncoder.commit(602, 603, T0)))
    assert(evs.head.op == "delete")
    assert(evs.head.before("id") == "9")
    assert(evs.head.after == null)
  }

  test("truncate emits one event per relation") {
    val a = newAssembler()
    val evs = feed(a,
      MessageEncoder.xlogData(700, 700, T0, MessageEncoder.begin(703, T0, 62)),
      MessageEncoder.xlogData(701, 701, T0, MessageEncoder.truncate(Seq(RelOid))),
      MessageEncoder.xlogData(702, 702, T0, MessageEncoder.commit(702, 703, T0)))
    assert(evs.map(_.op) == Seq("truncate"))
    assert(evs.head.table == "books" && evs.head.after == null && evs.head.before == null)
  }

  test("heartbeat suppression drops events but counts them (P5)") {
    val a = new TransactionAssembler(Some(("public", "cdc_heartbeat")))
    a.onCopyData(MessageEncoder.xlogData(1, 1, T0,
      MessageEncoder.relation(999L, "public", "cdc_heartbeat",
        Seq(Messages.RelationColumn("id", 23L, -1, 1)))))
    val evs = feed(a,
      MessageEncoder.xlogData(800, 800, T0, MessageEncoder.begin(803, T0, 63)),
      MessageEncoder.xlogData(801, 801, T0, MessageEncoder.update(999L, Seq(Some("1")))),
      MessageEncoder.xlogData(802, 802, T0, MessageEncoder.commit(802, 803, T0)))
    assert(evs.isEmpty)
    assert(a.heartbeatsSuppressed == 1)
  }

  test("DML before its Relation message fails like the reference") {
    val a = new TransactionAssembler()
    a.onCopyData(MessageEncoder.xlogData(900, 900, T0, MessageEncoder.begin(903, T0, 64)))
    intercept[PgProtoException] {
      a.onCopyData(MessageEncoder.xlogData(901, 901, T0,
        MessageEncoder.insert(424242L, Seq(Some("1")))))
    }
  }

  test("keepalives produce no events") {
    val a = newAssembler()
    assert(a.onCopyData(MessageEncoder.keepalive(5000L, T0, replyRequested = true)).isEmpty)
  }

  private def streamedTxnFrames(nEvents: Int, xid: Long = 70L): Seq[Array[Byte]] = {
    val fs = Seq.newBuilder[Array[Byte]]
    fs += MessageEncoder.xlogData(1, 1, T0,
      MessageEncoder.relation(RelOid, "public", "books", Cols))
    fs += MessageEncoder.xlogData(10, 10, T0, MessageEncoder.streamStart(xid, true))
    (1 to nEvents).foreach { i =>
      fs += MessageEncoder.xlogData(10 + i, 10 + i, T0,
        MessageEncoder.insert(RelOid, Seq(Some(i.toString), Some(s"v$i")), streamedXid = xid))
    }
    fs += MessageEncoder.xlogData(900, 900, T0, MessageEncoder.streamStop())
    fs += MessageEncoder.xlogData(901, 901, T0, MessageEncoder.streamCommit(xid, 901, 902, T0))
    fs.result()
  }

  private def spillFiles(dir: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.list(dir)
    try s.count() finally s.close()
  }

  test("streamed txn beyond the threshold spills to disk; output identical to in-memory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spill-spec")
    val frames = streamedTxnFrames(50)
    val expected = frames.flatMap(new TransactionAssembler().onCopyData).toSeq

    val a = new TransactionAssembler(spillThresholdEvents = 8, spillDir = Some(dir))
    frames.init.foreach(f => a.onCopyData(f).foreach(_ => ()))
    // 50 events, threshold 8: six spill batches of 8 = 48 on disk, 2 in memory.
    assert(a.spilledStreamEvents == 48L, s"spilled=${a.spilledStreamEvents}")
    assert(a.bufferedStreamEvents == 2L)
    assert(spillFiles(dir) == 1L, "spill file must exist mid-transaction")

    val out = a.onCopyData(frames.last).toSeq
    assert(out == expected, "spilled commit must be byte-identical to the in-memory path")
    assert(out.size == 50 && out.last.lsn == 902L, "txn-end LSN rewrite survives the spill")
    assert(spillFiles(dir) == 0L, "spill file deleted once fully consumed")
  }

  test("stream abort deletes the spill file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spill-abort")
    val a = new TransactionAssembler(spillThresholdEvents = 4, spillDir = Some(dir))
    val frames = streamedTxnFrames(20)
    frames.dropRight(1).foreach(f => a.onCopyData(f).foreach(_ => ()))
    assert(spillFiles(dir) == 1L)
    a.onCopyData(MessageEncoder.xlogData(950, 950, T0, MessageEncoder.streamAbort(70, 70)))
    assert(spillFiles(dir) == 0L, "abort must delete the spill file")
    assert(a.spilledStreamEvents == 0L && a.bufferedStreamEvents == 0L)
    // the later commit for the aborted xid emits nothing
    assert(a.onCopyData(frames.last).isEmpty)
  }

  test("sub-transaction abort filters spilled events through disk") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spill-subxid")
    val a = new TransactionAssembler(spillThresholdEvents = 4, spillDir = Some(dir))
    a.onCopyData(MessageEncoder.xlogData(1, 1, T0,
      MessageEncoder.relation(RelOid, "public", "books", Cols)))
    a.onCopyData(MessageEncoder.xlogData(10, 10, T0, MessageEncoder.streamStart(70, true)))
    // interleave top-level (xid 70) and subtxn (xid 71) events, spilling both
    (1 to 12).foreach { i =>
      val sub = if (i % 2 == 0) 71L else 70L
      a.onCopyData(MessageEncoder.xlogData(10 + i, 10 + i, T0,
        MessageEncoder.insert(RelOid, Seq(Some(i.toString), Some(s"v$i")), streamedXid = sub)))
    }
    a.onCopyData(MessageEncoder.xlogData(900, 900, T0, MessageEncoder.streamStop()))
    assert(a.spilledStreamEvents == 12L)
    a.onCopyData(MessageEncoder.xlogData(950, 950, T0, MessageEncoder.streamAbort(70, 71)))
    assert(a.spilledStreamEvents == 6L, "only subtxn 71's events drop")
    val out = a.onCopyData(MessageEncoder.xlogData(960, 960, T0,
      MessageEncoder.streamCommit(70, 960, 961, T0))).toSeq
    assert(out.map(_.after("id")) == Seq("1", "3", "5", "7", "9", "11"))
    assert(out.forall(_.xid == 70L))
    assert(spillFiles(dir) == 0L)
  }

  test("close() releases open streamed buffers and spill files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spill-close")
    val a = new TransactionAssembler(spillThresholdEvents = 4, spillDir = Some(dir))
    streamedTxnFrames(20).dropRight(1).foreach(f => a.onCopyData(f).foreach(_ => ()))
    assert(spillFiles(dir) == 1L)
    a.close()
    assert(spillFiles(dir) == 0L)
    assert(a.bufferedStreamEvents == 0L && a.spilledStreamEvents == 0L)
  }

  test("close() deletes the spill file of an abandoned commit read iterator") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spill-abandon")
    val a = new TransactionAssembler(spillThresholdEvents = 4, spillDir = Some(dir))
    val frames = streamedTxnFrames(20)
    frames.init.foreach(f => a.onCopyData(f).foreach(_ => ()))
    val it = a.onCopyData(frames.last) // commit: lazy, file-backed iterator
    assert(it.next() != null) // consume one event, abandon the rest
    assert(spillFiles(dir) == 1L)
    a.close()
    assert(spillFiles(dir) == 0L, "abandoned read iterator must not leak its file")
  }

  test("streamed buffer cap fails fast instead of OOM") {
    val a = new TransactionAssembler(maxBufferedStreamEvents = 2)
    a.onCopyData(MessageEncoder.xlogData(1, 1, T0,
      MessageEncoder.relation(RelOid, "public", "books", Cols)))
    a.onCopyData(MessageEncoder.xlogData(2, 2, T0, MessageEncoder.streamStart(33, true)))
    a.onCopyData(MessageEncoder.xlogData(3, 3, T0, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")), streamedXid = 33)))
    a.onCopyData(MessageEncoder.xlogData(4, 4, T0, MessageEncoder.insert(RelOid, Seq(Some("2"), Some("b")), streamedXid = 33)))
    intercept[PgProtoException] {
      a.onCopyData(MessageEncoder.xlogData(5, 5, T0, MessageEncoder.insert(RelOid, Seq(Some("3"), Some("c")), streamedXid = 33)))
    }
  }
}
