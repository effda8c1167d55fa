package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import graft.pgproto._

/** Two-phase commit (protocol v3 `two_phase`) semantics — BEYOND the
  * reference, which raises on the 'b'/'P'/'K'/'r'/'p' tags: a prepared
  * transaction's events buffer under its gid at PREPARE TRANSACTION and
  * become visible only at COMMIT PREPARED (stamped with the commit's
  * LSN/time, last event rewritten to the txn-end LSN exactly like T1/T2);
  * ROLLBACK PREPARED discards them unseen. Wire layouts follow the public
  * PostgreSQL documentation ("Protocol Message Formats").
  */
class TwoPhaseSpec extends AnyFunSuite {

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

  test("golden bytes: all five two-phase tags decode to their fields") {
    val bp = Messages.decode(MessageEncoder.beginPrepare(100, 110, T0, 7, "gid-1"), false)
      .asInstanceOf[Messages.BeginPrepare]
    assert(bp.prepareLsn == 100 && bp.endLsn == 110 && bp.prepareTimeMicros == T0 &&
      bp.xid == 7 && bp.gid == "gid-1")

    val p = Messages.decode(MessageEncoder.prepare(100, 110, T0, 7, "gid-1"), false)
      .asInstanceOf[Messages.Prepare]
    assert(p.flags == 0 && p.prepareLsn == 100 && p.endLsn == 110 &&
      p.prepareTimeMicros == T0 && p.xid == 7 && p.gid == "gid-1")

    val k = Messages.decode(MessageEncoder.commitPrepared(300, 310, T0 + 9, 7, "gid-1"), false)
      .asInstanceOf[Messages.CommitPrepared]
    assert(k.commitLsn == 300 && k.endLsn == 310 && k.commitTimeMicros == T0 + 9 &&
      k.xid == 7 && k.gid == "gid-1")

    val r = Messages.decode(
      MessageEncoder.rollbackPrepared(110, 410, T0, T0 + 9, 7, "gid-1"), false)
      .asInstanceOf[Messages.RollbackPrepared]
    assert(r.prepareEndLsn == 110 && r.rollbackEndLsn == 410 &&
      r.prepareTimeMicros == T0 && r.rollbackTimeMicros == T0 + 9 &&
      r.xid == 7 && r.gid == "gid-1")

    val sp = Messages.decode(MessageEncoder.streamPrepare(100, 110, T0, 7, "gid-1"), false)
      .asInstanceOf[Messages.StreamPrepare]
    assert(sp.prepareLsn == 100 && sp.endLsn == 110 && sp.prepareTimeMicros == T0 &&
      sp.xid == 7 && sp.gid == "gid-1")
  }

  test("prepared txn: invisible until COMMIT PREPARED, then commit-stamped with end-LSN rewrite") {
    val a = newAssembler()
    val silent = feed(a,
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.beginPrepare(108, 110, T0, 7, "g1")),
      MessageEncoder.xlogData(101, 101, T0, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")))),
      MessageEncoder.xlogData(102, 102, T0, MessageEncoder.insert(RelOid, Seq(Some("2"), Some("b")))),
      MessageEncoder.xlogData(109, 109, T0, MessageEncoder.prepare(108, 110, T0, 7, "g1")))
    assert(silent.isEmpty, "nothing may emit before COMMIT PREPARED")
    assert(a.openPreparedTxns == 1)

    // An unrelated txn commits in between — ordering must be preserved.
    val between = feed(a,
      MessageEncoder.xlogData(200, 200, T0, MessageEncoder.begin(210, T0 + 1, 8)),
      MessageEncoder.xlogData(201, 201, T0, MessageEncoder.insert(RelOid, Seq(Some("9"), Some("z")))),
      MessageEncoder.xlogData(209, 209, T0, MessageEncoder.commit(209, 210, T0 + 1)))
    assert(between.map(_.after("id")) == Seq("9"))

    val evs = feed(a,
      MessageEncoder.xlogData(300, 300, T0, MessageEncoder.commitPrepared(300, 310, T0 + 9, 7, "g1")))
    assert(evs.map(_.after("id")) == Seq("1", "2"))
    assert(evs.forall(_.xid == 7L))
    assert(evs.forall(_.commitLsn == 300L), "stamped with the COMMIT PREPARED lsn")
    assert(evs.forall(_.commitTimeMicros == T0 + 9), "stamped with the COMMIT PREPARED time")
    assert(evs.map(_.lsn) == Seq(101L, 310L), "last event rewritten to txn-end LSN")
    assert(a.openPreparedTxns == 0)
  }

  test("ROLLBACK PREPARED discards the gid unseen; commit of an unknown gid emits nothing") {
    val a = newAssembler()
    val silent = feed(a,
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.beginPrepare(108, 110, T0, 7, "g2")),
      MessageEncoder.xlogData(101, 101, T0, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")))),
      MessageEncoder.xlogData(109, 109, T0, MessageEncoder.prepare(108, 110, T0, 7, "g2")),
      MessageEncoder.xlogData(400, 400, T0, MessageEncoder.rollbackPrepared(110, 410, T0, T0 + 9, 7, "g2")))
    assert(silent.isEmpty)
    assert(a.openPreparedTxns == 0)
    // COMMIT PREPARED for a gid prepared before this slot's start position:
    // PostgreSQL's contract is that the subscriber already holds the data.
    val evs = feed(a,
      MessageEncoder.xlogData(500, 500, T0, MessageEncoder.commitPrepared(500, 510, T0, 9, "unseen")))
    assert(evs.isEmpty)
  }

  test("streamed txn ending in STREAM PREPARE buffers under the gid until COMMIT PREPARED") {
    val a = newAssembler()
    val silent = feed(a,
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.streamStart(31, true)),
      MessageEncoder.xlogData(101, 101, T0,
        MessageEncoder.insert(RelOid, Seq(Some("1"), Some("s")), streamedXid = 31)),
      MessageEncoder.xlogData(102, 102, T0, MessageEncoder.streamStop()),
      MessageEncoder.xlogData(103, 103, T0, MessageEncoder.streamStart(31, false)),
      MessageEncoder.xlogData(104, 104, T0,
        MessageEncoder.insert(RelOid, Seq(Some("2"), Some("t")), streamedXid = 31)),
      MessageEncoder.xlogData(105, 105, T0, MessageEncoder.streamStop()),
      MessageEncoder.xlogData(109, 109, T0, MessageEncoder.streamPrepare(108, 110, T0, 31, "g3")))
    assert(silent.isEmpty, "stream prepare must not emit")
    assert(a.openPreparedTxns == 1)
    assert(a.bufferedStreamEvents == 2, "chunks moved to the prepared ledger, not dropped")

    val evs = feed(a,
      MessageEncoder.xlogData(300, 300, T0, MessageEncoder.commitPrepared(300, 310, T0 + 9, 31, "g3")))
    assert(evs.map(_.after("id")) == Seq("1", "2"))
    assert(evs.forall(_.xid == 31L))
    assert(evs.forall(_.commitLsn == 300L))
    assert(evs.map(_.lsn) == Seq(101L, 310L))
  }

  test("replayed BeginPrepare (restart mid-prepare) rebuilds the gid idempotently") {
    val a = newAssembler()
    feed(a,
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.beginPrepare(108, 110, T0, 7, "g4")),
      MessageEncoder.xlogData(101, 101, T0, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")))),
      MessageEncoder.xlogData(109, 109, T0, MessageEncoder.prepare(108, 110, T0, 7, "g4")))
    // The feed reopens below the prepare and replays the whole section.
    feed(a,
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.beginPrepare(108, 110, T0, 7, "g4")),
      MessageEncoder.xlogData(101, 101, T0, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")))),
      MessageEncoder.xlogData(109, 109, T0, MessageEncoder.prepare(108, 110, T0, 7, "g4")))
    assert(a.openPreparedTxns == 1)
    val evs = feed(a,
      MessageEncoder.xlogData(300, 300, T0, MessageEncoder.commitPrepared(300, 310, T0 + 9, 7, "g4")))
    assert(evs.map(_.after("id")) == Seq("1"), "replay must not double the events")
  }

  test("ROLLBACK PREPARED rolls back the section's Relation registrations too") {
    // A Relation inside the prepared section describes its UNCOMMITTED
    // catalog: it must decode the section's own DML, but on rollback the
    // prior registration is restored — later transactions re-decode against
    // the schema that actually exists.
    val a = newAssembler()
    val colsV2 = Cols :+ Messages.RelationColumn("extra", 25L, -1, 0)
    feed(a,
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.beginPrepare(108, 110, T0, 7, "g5")),
      MessageEncoder.xlogData(105, 105, T0,
        MessageEncoder.relation(RelOid, "public", "books", colsV2)),
      MessageEncoder.xlogData(106, 106, T0,
        MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a"), Some("x")))),
      MessageEncoder.xlogData(109, 109, T0, MessageEncoder.prepare(108, 110, T0, 7, "g5")))
    assert(a.relations(RelOid).columns.map(_.name).toSeq == Seq("id", "name", "extra"),
      "the section's own DML decodes against the in-section schema")
    feed(a, MessageEncoder.xlogData(400, 400, T0,
      MessageEncoder.rollbackPrepared(110, 410, T0, T0 + 9, 7, "g5")))
    assert(a.relations(RelOid).columns.map(_.name).toSeq == Seq("id", "name"),
      "rollback restores the pre-section registration")
    // And a later plain txn decodes against the restored (v1) schema.
    val evs = feed(a,
      MessageEncoder.xlogData(500, 500, T0, MessageEncoder.begin(510, T0 + 2, 9)),
      MessageEncoder.xlogData(501, 501, T0,
        MessageEncoder.insert(RelOid, Seq(Some("9"), Some("v9")))),
      MessageEncoder.xlogData(509, 509, T0, MessageEncoder.commit(509, 510, T0 + 2)))
    assert(evs.map(_.after("id")) == Seq("9"))
  }

  test("COMMIT PREPARED keeps the section's Relation registrations") {
    val a = newAssembler()
    val colsV2 = Cols :+ Messages.RelationColumn("extra", 25L, -1, 0)
    feed(a,
      MessageEncoder.xlogData(100, 100, T0, MessageEncoder.beginPrepare(108, 110, T0, 7, "g6")),
      MessageEncoder.xlogData(105, 105, T0,
        MessageEncoder.relation(RelOid, "public", "books", colsV2)),
      MessageEncoder.xlogData(106, 106, T0,
        MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a"), Some("x")))),
      MessageEncoder.xlogData(109, 109, T0, MessageEncoder.prepare(108, 110, T0, 7, "g6")))
    val evs = feed(a, MessageEncoder.xlogData(300, 300, T0,
      MessageEncoder.commitPrepared(300, 310, T0 + 9, 7, "g6")))
    assert(evs.map(_.after("extra")) == Seq("x"))
    assert(a.relations(RelOid).columns.map(_.name).toSeq == Seq("id", "name", "extra"),
      "the committed section's schema stays registered")
  }
}
