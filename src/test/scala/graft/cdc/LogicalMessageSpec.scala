package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import graft.pgproto._

/** Logical decoding messages ('M', `pg_logical_emit_message`) — beyond the
  * reference (which raises on the tag): decode fidelity, transactional
  * delivery through the T1/T2 buffers, immediate non-transactional delivery,
  * and rollback safety inside streamed transactions.
  */
class LogicalMessageSpec extends AnyFunSuite {

  val RelOid = 16384L
  val Cols = Seq(
    Messages.RelationColumn("id", 23L, -1, 1),
    Messages.RelationColumn("name", 25L, -1, 0))
  val T0 = 1700000000000000L

  private def newAssembler() = {
    val a = new TransactionAssembler()
    a.onCopyData(MessageEncoder.xlogData(1, 1, T0,
      MessageEncoder.relation(RelOid, "public", "books", Cols)))
    a
  }

  private def feed(a: TransactionAssembler, frames: Array[Byte]*): Seq[ChangeEvent] =
    frames.flatMap(a.onCopyData).toSeq

  test("decode roundtrip: prefix, flags, lsn, content bytes") {
    val content = Array[Byte](1, 2, -1, 0, 42)
    val m = Messages.decode(
      MessageEncoder.logicalMessage("wal.audit", content, transactional = true, lsn = 0xABCDL),
      inStreamedTx = false).asInstanceOf[Messages.LogicalMessage]
    assert(m.prefix == "wal.audit")
    assert(m.transactional)
    assert(m.lsn == 0xABCDL)
    assert(m.content.toSeq == content.toSeq)
    assert(m.xid == 0L)

    val streamed = Messages.decode(
      MessageEncoder.logicalMessage("p", Array[Byte](9), transactional = false,
        lsn = 5L, streamedXid = 77L),
      inStreamedTx = true).asInstanceOf[Messages.LogicalMessage]
    assert(streamed.xid == 77L && !streamed.transactional)
  }

  test("transactional message rides the txn: commit order, T1 end-LSN rewrite when last") {
    val a = newAssembler()
    val evs = feed(a,
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.begin(110, T0, 7)),
      MessageEncoder.xlogData(101, 101, T0, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")))),
      MessageEncoder.xlogData(102, 102, T0,
        MessageEncoder.logicalMessage("outbox", """{"k":1}""".getBytes("UTF-8"),
          transactional = true, lsn = 102)),
      MessageEncoder.xlogData(109, 109, T0, MessageEncoder.commit(109, 110, T0)))
    assert(evs.map(_.op) == Seq("insert", "message"))
    val m = evs.last
    assert(m.lsn == 110L) // the message was the txn's last event — T1 rewrite
    assert(m.commitLsn == 110L && m.xid == 7L && m.commitTimeMicros == T0)
    assert(m.after("prefix") == "outbox")
    assert(m.after("content_text") == """{"k":1}""")
    assert(m.after("content_hex") == "\\x" + """{"k":1}""".getBytes("UTF-8").map("%02x".format(_)).mkString)
  }

  test("non-transactional message is delivered immediately, even mid-transaction") {
    val a = newAssembler()
    val pre = feed(a,
      MessageEncoder.xlogData(200, 200, T0, MessageEncoder.begin(210, T0, 8)),
      MessageEncoder.xlogData(201, 201, T0, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")))),
      MessageEncoder.xlogData(202, 202, T0,
        MessageEncoder.logicalMessage("audit", "ping".getBytes("UTF-8"),
          transactional = false, lsn = 202)))
    // The insert is still held by the T1 look-ahead; the message jumped it.
    assert(pre.map(_.op) == Seq("message"))
    assert(pre.head.xid == 0L && pre.head.commitLsn == 0L)
    val post = feed(a,
      MessageEncoder.xlogData(209, 209, T0, MessageEncoder.commit(209, 210, T0)))
    assert(post.map(_.op) == Seq("insert"))
  }

  test("streamed txn abort discards its transactional messages; commit delivers them") {
    val a = newAssembler()
    def chunk(xid: Long, tag: String): Seq[Array[Byte]] = Seq(
      MessageEncoder.xlogData(300, 300, T0, MessageEncoder.streamStart(xid, firstSegment = true)),
      MessageEncoder.xlogData(301, 301, T0,
        MessageEncoder.logicalMessage("outbox", tag.getBytes("UTF-8"),
          transactional = true, lsn = 301, streamedXid = xid)),
      MessageEncoder.xlogData(302, 302, T0, MessageEncoder.streamStop()))
    val pre = feed(a, chunk(900, "from-900") ++ chunk(901, "from-901"): _*)
    assert(pre.isEmpty)
    val aborted = feed(a,
      MessageEncoder.xlogData(310, 310, T0, MessageEncoder.streamAbort(900, 900)))
    assert(aborted.isEmpty)
    val committed = feed(a,
      MessageEncoder.xlogData(320, 320, T0, MessageEncoder.streamCommit(901, 320, 321, T0)))
    assert(committed.map(_.after("content_text")) == Seq("from-901"))
    assert(committed.head.lsn == 321L && committed.head.xid == 901L)
  }

  test("invalid UTF-8 payload: content_text is null, content_hex is lossless") {
    val a = newAssembler()
    val evs = feed(a,
      MessageEncoder.xlogData(400, 400, T0, MessageEncoder.begin(410, T0, 9)),
      MessageEncoder.xlogData(401, 401, T0,
        MessageEncoder.logicalMessage("blob", Array(0xc3.toByte, 0x28.toByte),
          transactional = true, lsn = 401)),
      MessageEncoder.xlogData(409, 409, T0, MessageEncoder.commit(409, 410, T0)))
    assert(evs.size == 1)
    assert(evs.head.after("content_text") == null)
    assert(evs.head.after("content_hex") == "\\xc328")
  }
}
