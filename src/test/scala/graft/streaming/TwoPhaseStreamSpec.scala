package graft.streaming

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.pgproto.{MessageEncoder, Messages}
import graft.tools.WalFile

/** Two-phase commit through the FULL DataSource V2 source — driver-side gid
  * grouping, commit-ordered delivery at COMMIT PREPARED, and the resume
  * hold-back that makes a checkpoint restart straddling an open prepare
  * exactly-once: pgoutput does not re-send a prepared body once the
  * confirmed position passes its PREPARE, so while a gid is open the offset
  * reopens BELOW the section and skips the replayed, already-delivered
  * transactions via `deliveredLsn`.
  */
class TwoPhaseStreamSpec extends AnyFunSuite {

  private val RelOid = 16384L
  private val Cols = Seq(
    Messages.RelationColumn("id", 23L, -1, 1),
    Messages.RelationColumn("name", 25L, -1, 0))
  private val T0 = 1700000000000000L

  private def x(lsn: Long, msg: Array[Byte]): Array[Byte] =
    MessageEncoder.xlogData(lsn, lsn, T0, msg)

  private val rel = x(1, MessageEncoder.relation(RelOid, "public", "books", Cols))
  private def ins(lsn: Long, id: Long): Array[Byte] =
    x(lsn, MessageEncoder.insert(RelOid, Seq(Some(id.toString), Some("v" + id))))

  // Prepared section g1: b@100 .. P@109 (prepare end 110), two rows.
  private val preparedSection = Seq(
    x(100, MessageEncoder.beginPrepare(108, 110, T0, 7, "g1")),
    ins(101, 1), ins(102, 2),
    x(109, MessageEncoder.prepare(108, 110, T0, 7, "g1")))
  // A plain txn committing while g1 is still prepared (id=3, end 210).
  private val plainTxn = Seq(
    x(200, MessageEncoder.begin(210, T0 + 1, 8)),
    ins(201, 3),
    x(209, MessageEncoder.commit(209, 210, T0 + 1)))
  private val commitPrepared =
    x(300, MessageEncoder.commitPrepared(300, 310, T0 + 9, 7, "g1"))

  private def rowIds(stream: PgCdcMicroBatchStream, start: CdcOffset, end: CdcOffset): Seq[Long] =
    stream.planInputPartitions(start, end).toSeq.flatMap { p =>
      val r = PgCdcReaderFactory.createReader(p)
      val out = Seq.newBuilder[Long]
      while (r.next()) {
        val row = r.get()
        val m = row.getMap(10)
        val keys = m.keyArray()
        val idx = (0 until m.numElements())
          .find(i => keys.getUTF8String(i).toString == "id").get
        out += m.valueArray().getUTF8String(idx).toString.toLong
      }
      out.result()
    }

  test("prepared txn delivers at COMMIT PREPARED, after independently-committed txns") {
    val wal = Files.createTempFile("wal-2pc", ".bin").toString
    WalFile.write(wal, (Seq(rel) ++ preparedSection ++ plainTxn ++ Seq(commitPrepared)).iterator)
    val s = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("path", wal)))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    val oEnd = s.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    val ids = rowIds(s, o0, oEnd)
    assert(ids == Seq(3, 1, 2),
      "commit order: the plain txn (end 210) precedes COMMIT PREPARED (end 310)")
    assert(oEnd == CdcOffset(2, 310L), "gid resolved: no hold-back in the final offset")
    s.commit(oEnd)
    s.stop()
  }

  test("restart straddling an open prepare: hold-back + replay dedupe, no dup no loss") {
    val wal = Files.createTempFile("wal-2pc-restart", ".bin").toString
    // Phase A: the decision for g1 has not arrived yet.
    WalFile.write(wal, (Seq(rel) ++ preparedSection ++ plainTxn).iterator)
    val s1 = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("path", wal)))
    val o0 = s1.initialOffset().asInstanceOf[CdcOffset]
    val o1 = s1.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    assert(rowIds(s1, o0, o1) == Seq(3), "only the plain txn is visible pre-decision")
    // The offset reopens BELOW the open prepared section (its first frame is
    // at 100) while recording the delivered position (210) for dedupe.
    assert(o1 == CdcOffset(1, 100L, 210L), s"hold-back offset wrong: $o1")
    s1.commit(o1)
    s1.stop()

    // Phase B: "crash", more WAL arrives (the commit-prepared decision), and
    // a fresh instance restores the JSON-round-tripped offset.
    WalFile.write(wal, (Seq(rel) ++ preparedSection ++ plainTxn ++ Seq(commitPrepared)).iterator)
    val restored = CdcOffset.fromJson(o1.json())
    assert(restored.deliveredLsn == 210L)
    val s2 = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("path", wal)))
    val oEnd = s2.latestOffset(restored, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    val ids = rowIds(s2, restored, oEnd)
    assert(ids == Seq(1, 2),
      s"exactly the prepared events deliver after restart (no id=3 duplicate): $ids")
    assert(oEnd == CdcOffset(2, 310L))
    s2.commit(oEnd)
    s2.stop()
  }

  test("ROLLBACK PREPARED through the stream: events never visible, offsets advance normally") {
    val wal = Files.createTempFile("wal-2pc-rollback", ".bin").toString
    val rollback = x(400,
      MessageEncoder.rollbackPrepared(110, 410, T0, T0 + 9, 7, "g1"))
    val laterTxn = Seq(
      x(500, MessageEncoder.begin(510, T0 + 2, 9)),
      ins(501, 9),
      x(509, MessageEncoder.commit(509, 510, T0 + 2)))
    WalFile.write(wal, (Seq(rel) ++ preparedSection ++ Seq(rollback) ++ laterTxn).iterator)
    val s = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("path", wal)))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    val oEnd = s.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    assert(rowIds(s, o0, oEnd) == Seq(9))
    assert(oEnd == CdcOffset(1, 510L), "rollback clears the hold-back")
    s.commit(oEnd)
    s.stop()
  }
}
