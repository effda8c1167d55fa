package graft.cdc

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.pgproto.{MessageEncoder, PgProtoException}

/** Hostile-SEQUENCE fuzz over the transaction assembler: every message is
  * individually well-formed, but the ORDER is adversarial — commits without
  * begins, stream controls for unknown XIDs, DML against unregistered
  * relations, prepare/rollback interleavings, stream blocks that never
  * close. The chaos soak covers randomized VALID protocols; this covers the
  * protocol-violation space. The contract: the assembler either makes
  * progress or fails with its declared error types (the wire error or an
  * explicit state/argument rejection) — never an NPE, match error, class
  * cast, or index failure from assuming a message that never arrived.
  */
class AssemblerSequenceFuzzSpec extends AnyFunSuite {

  private val T0 = 1700000000000000L
  private val Cols = Seq(
    graft.pgproto.Messages.RelationColumn("id", 20L, -1, 1),
    graft.pgproto.Messages.RelationColumn("v", 25L, -1, 0))

  private val genMsg: Gen[Array[Byte]] = {
    val oid = Gen.chooseNum(16384L, 16388L) // 16386/7 never get a Relation
    val xid = Gen.chooseNum(0L, 3L)
    val lsn = Gen.chooseNum(1L, 1000L)
    val vals = Gen.listOfN(2, Gen.oneOf(
      Gen.const(None), Gen.alphaNumStr.map(s => Some(s.take(8)))))
    val gid = Gen.oneOf("g1", "g2", "")
    Gen.frequency[Array[Byte]](
      2 -> Gen.zip(oid).map(o => MessageEncoder.relation(o, "public", "t", Cols)),
      3 -> Gen.zip(lsn, xid).map { case (l, x) => MessageEncoder.begin(l, T0, x) },
      3 -> Gen.zip(lsn).map(l => MessageEncoder.commit(l, l + 1, T0)),
      4 -> Gen.zip(oid, vals).map { case (o, v) => MessageEncoder.insert(o, v) },
      2 -> Gen.zip(oid, vals).map { case (o, v) => MessageEncoder.update(o, v, v) },
      2 -> Gen.zip(oid, vals).map { case (o, v) => MessageEncoder.delete(o, v) },
      1 -> Gen.zip(oid).map(o => MessageEncoder.truncate(Seq(o))),
      2 -> Gen.zip(xid, Gen.oneOf(true, false)).map { case (x, f) =>
        MessageEncoder.streamStart(x, f) },
      2 -> Gen.const(MessageEncoder.streamStop()),
      2 -> Gen.zip(xid, lsn).map { case (x, l) =>
        MessageEncoder.streamCommit(x, l, l + 1, T0) },
      1 -> Gen.zip(xid).map(x => MessageEncoder.streamAbort(x, x)),
      1 -> Gen.zip(oid, vals, xid).map { case (o, v, x) =>
        MessageEncoder.insert(o, v, streamedXid = x) },
      1 -> Gen.zip(lsn, xid, gid).map { case (l, x, g) =>
        MessageEncoder.beginPrepare(l, l + 1, T0, x, g) },
      1 -> Gen.zip(lsn, xid, gid).map { case (l, x, g) =>
        MessageEncoder.prepare(l, l + 1, T0, x, g) },
      1 -> Gen.zip(lsn, xid, gid).map { case (l, x, g) =>
        MessageEncoder.commitPrepared(l, l + 1, T0, x, g) },
      1 -> Gen.zip(lsn, xid, gid).map { case (l, x, g) =>
        MessageEncoder.rollbackPrepared(l, l + 1, T0, T0, x, g) },
      1 -> Gen.zip(lsn).map(l => MessageEncoder.origin(l, "peer")),
      1 -> Gen.zip(lsn, Gen.oneOf(true, false)).map { case (l, tx) =>
        MessageEncoder.logicalMessage("pfx", Array[Byte](1, 2), tx, l) })
  }

  test("adversarial message orders never escape the declared error types") {
    val genSeqs: Gen[List[Array[Byte]]] =
      Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, genMsg))
    var lsnCounter = 0L
    val prop = Prop.forAll(genSeqs) { msgs =>
      val asm = new TransactionAssembler(None)
      try {
        msgs.forall { m =>
          lsnCounter += 1
          try { asm.onCopyData(MessageEncoder.xlogData(lsnCounter, lsnCounter, T0, m)).length; true }
          catch {
            // declared failure modes: wire error, explicit state/argument
            // rejection. Anything else is a hole.
            case _: PgProtoException => true
            case _: IllegalStateException => true
            case _: IllegalArgumentException => true
            case e: Throwable =>
              println(s"assembler hole: ${e.getClass.getName}: ${e.getMessage}")
              false
          }
        }
      } finally asm.close()
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(400)
        .withInitialSeed(Seed(20260814L)), prop)
    assert(res.passed, res.status.toString)
  }
}
