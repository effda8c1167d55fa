package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.TransactionAssembler
import graft.pgproto.{Messages, MessageEncoder}

/** Transaction-aware resume semantics, including the streamed-transaction
  * path: an already-delivered STREAM COMMIT must be rewritten to an abort so
  * re-fed segments free without re-emitting.
  */
class ResumeFilterSpec extends AnyFunSuite {
  val T0 = 1700000000000000L
  val RelOid = 16600L
  val Cols = Seq(Messages.RelationColumn("id", 23L, -1, 1))

  private def feed(frames: Seq[Array[Byte]], from: Long): Seq[String] = {
    val a = new TransactionAssembler()
    ResumeFilter(frames.iterator, from).toSeq
      .flatMap(a.onCopyData)
      .map(_.after("id"))
  }

  private def frames: Seq[Array[Byte]] = Seq(
    MessageEncoder.xlogData(1, 1, T0, MessageEncoder.relation(RelOid, "public", "t", Cols)),
    // plain txn A: ends at 105
    MessageEncoder.xlogData(100, 100, T0, MessageEncoder.begin(105, T0, 1)),
    MessageEncoder.xlogData(101, 101, T0, MessageEncoder.insert(RelOid, Seq(Some("1")))),
    MessageEncoder.xlogData(104, 104, T0, MessageEncoder.commit(104, 105, T0)),
    // streamed txn B (xid 900): segments, commit ends at 204
    MessageEncoder.xlogData(200, 200, T0, MessageEncoder.streamStart(900, firstSegment = true)),
    MessageEncoder.xlogData(201, 201, T0, MessageEncoder.insert(RelOid, Seq(Some("2")), streamedXid = 900)),
    MessageEncoder.xlogData(202, 202, T0, MessageEncoder.streamStop()),
    MessageEncoder.xlogData(203, 203, T0, MessageEncoder.streamCommit(900, 203, 204, T0)),
    // plain txn C: ends at 305
    MessageEncoder.xlogData(300, 300, T0, MessageEncoder.begin(305, T0, 2)),
    MessageEncoder.xlogData(301, 301, T0, MessageEncoder.insert(RelOid, Seq(Some("3")))),
    MessageEncoder.xlogData(304, 304, T0, MessageEncoder.commit(304, 305, T0)))

  test("fromLsn=0 passes everything through untouched") {
    assert(feed(frames, 0L) == Seq("1", "2", "3"))
  }

  test("resume past a plain txn skips it at Begin (zero-buffer decision)") {
    assert(feed(frames, 105L) == Seq("2", "3"))
  }

  test("resume past a streamed commit rewrites it to an abort: no re-emit") {
    // from=204: txn A and streamed B are delivered; only C replays. B's
    // segments still pass (a real server would re-stream them), so the
    // filter must turn B's commit into an abort or its rows would duplicate.
    assert(feed(frames, 204L) == Seq("3"))
  }

  test("resume past everything yields no events but relations still replay") {
    val a = new TransactionAssembler()
    val out = ResumeFilter(frames.iterator, 305L).toSeq
    assert(out.flatMap(a.onCopyData).isEmpty)
    assert(a.relations.contains(RelOid), "schema must survive resume")
  }
}
