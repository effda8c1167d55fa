package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import graft.pgproto._

/** 'O' (replication origin) and 'Y' (custom type metadata) — beyond the
  * reference, which raises on both tags. Origin's real job is loop
  * prevention in bidirectional setups: `dropForeignOrigin` must suppress
  * exactly the transactions that carry an origin.
  */
class OriginTypeSpec extends AnyFunSuite {

  val RelOid = 16384L
  val Cols = Seq(
    Messages.RelationColumn("id", 23L, -1, 1),
    Messages.RelationColumn("mood", 99999L, -1, 0)) // custom type oid
  val T0 = 1700000000000000L

  private def newAssembler(dropForeign: Boolean) = {
    val a = new TransactionAssembler(dropForeignOrigin = dropForeign)
    a.onCopyData(MessageEncoder.xlogData(1, 1, T0,
      MessageEncoder.relation(RelOid, "public", "books", Cols)))
    a
  }

  private def txn(id: String, origin: Option[String], base: Long): Seq[Array[Byte]] = {
    val o = origin.toSeq.map(n =>
      MessageEncoder.xlogData(base, base, T0, MessageEncoder.origin(base, n)))
    Seq(MessageEncoder.xlogData(base, base, T0, MessageEncoder.begin(base + 10, T0, 7))) ++ o ++ Seq(
      MessageEncoder.xlogData(base + 1, base + 1, T0,
        MessageEncoder.insert(RelOid, Seq(Some(id), Some("happy")))),
      MessageEncoder.xlogData(base + 9, base + 9, T0,
        MessageEncoder.commit(base + 9, base + 10, T0)))
  }

  test("decode roundtrip: origin and type messages") {
    val o = Messages.decode(MessageEncoder.origin(0x1234L, "node_a"), inStreamedTx = false)
      .asInstanceOf[Messages.Origin]
    assert(o.commitLsn == 0x1234L && o.name == "node_a")

    val ty = Messages.decode(MessageEncoder.typeMessage(99999L, "public", "mood"),
      inStreamedTx = false).asInstanceOf[Messages.TypeMessage]
    assert(ty.oid == 99999L && ty.namespace == "public" && ty.name == "mood")

    val tyStreamed = Messages.decode(
      MessageEncoder.typeMessage(99999L, "public", "mood", streamedXid = 42L),
      inStreamedTx = true).asInstanceOf[Messages.TypeMessage]
    assert(tyStreamed.xid == 42L)
  }

  test("origin tracking without filtering: all events flow") {
    val a = newAssembler(dropForeign = false)
    val evs = (txn("1", None, 100) ++ txn("2", Some("node_b"), 200))
      .flatMap(a.onCopyData)
    assert(evs.map(_.after("id")) == Seq("1", "2"))
    assert(a.foreignOriginDropped == 0L)
  }

  test("dropForeignOrigin suppresses exactly originated transactions") {
    val a = newAssembler(dropForeign = true)
    val evs = (txn("1", None, 100) ++ txn("2", Some("node_b"), 200) ++
      txn("3", None, 300)).flatMap(a.onCopyData)
    // Local txns 1 and 3 flow; txn 2 (replicated from node_b) is dropped —
    // and the origin does NOT leak onto the following local transaction.
    assert(evs.map(_.after("id")) == Seq("1", "3"))
    assert(a.foreignOriginDropped == 1L)
  }

  test("type registry caches custom type names from 'Y' messages") {
    val a = newAssembler(dropForeign = false)
    a.onCopyData(MessageEncoder.xlogData(2, 2, T0,
      MessageEncoder.typeMessage(99999L, "public", "mood")))
    assert(a.typeNames(99999L) == (("public", "mood")))
  }
}
