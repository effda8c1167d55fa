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

  test("restored hold-back survives until the replayed section re-registers the gid") {
    // A socket feed's replayed frames may still be in flight when Spark asks
    // for the next offset right after a restart: an offset emitted in that
    // window must keep the hold-back — checkpointing one that lost it would
    // strand the prepared transaction on the next restart.
    val q = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    val src = new WalSource {
      @volatile private var confirmed = 0L
      override def open(fromLsn: Long): Unit = ()
      override def poll(): Option[Array[Byte]] = Option(q.poll())
      override def ack(lsn: Long): Unit = confirmed = lsn
      override def confirmedLsn: Long = confirmed
      override def close(): Unit = ()
    }
    PgCdcTestHook.register("2pc-holdback", src)
    val s = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("testSourceKey", "2pc-holdback")))
    val restored = CdcOffset.fromJson(CdcOffset(1, 100L, 210L).json())
    val o1 = s.latestOffset(restored, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    assert(o1 == CdcOffset(1, 100L, 210L),
      s"offset emitted before the replay arrived lost the hold-back: $o1")
    // The replayed section (+ the decision) arrives; everything resolves.
    (Seq(rel) ++ preparedSection ++ plainTxn ++ Seq(commitPrepared)).foreach(q.add)
    val o2 = s.latestOffset(o1, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    assert(rowIds(s, o1, o2) == Seq(1, 2),
      "exactly the prepared rows deliver; the replayed plain txn dedupes")
    assert(o2 == CdcOffset(2, 310L))
    s.commit(o2)
    s.stop()
  }

  test("ROLLBACK PREPARED: the section's Relation never reaches the cache or registry") {
    val key = "2pc-rollback-rel"
    PgCdcRelations.clear(key)
    val colsV2 = Cols :+ Messages.RelationColumn("extra", 25L, -1, 0)
    val relV2 = x(105, MessageEncoder.relation(RelOid, "public", "books", colsV2))
    val section = Seq(
      x(100, MessageEncoder.beginPrepare(108, 110, T0, 7, "g1")),
      relV2,
      x(106, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("v1"), Some("x")))),
      x(109, MessageEncoder.prepare(108, 110, T0, 7, "g1")))
    val rollback = x(400,
      MessageEncoder.rollbackPrepared(110, 410, T0, T0 + 9, 7, "g1"))
    // The later txn writes against the REAL (v1) schema — a preamble that
    // leaked the rolled-back 3-column relation could not decode it.
    val later = Seq(
      x(500, MessageEncoder.begin(510, T0 + 2, 9)),
      ins(501, 9),
      x(509, MessageEncoder.commit(509, 510, T0 + 2)))
    PgCdcTestHook.register(key,
      new InMemoryWalSource(Seq(rel) ++ section ++ Seq(rollback) ++ later))
    val s = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("testSourceKey", key)))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    val oEnd = s.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    assert(rowIds(s, o0, oEnd) == Seq(9))
    assert(PgCdcRelations.relations(key)("public.books").columns.map(_.name).toSeq ==
      Seq("id", "name"), "rolled-back schema must not be published")
    s.commit(oEnd)
    s.stop()
  }

  test("COMMIT PREPARED folds the section's Relation into cache and registry") {
    val key = "2pc-commit-rel"
    PgCdcRelations.clear(key)
    val colsV2 = Cols :+ Messages.RelationColumn("extra", 25L, -1, 0)
    val relV2 = x(105, MessageEncoder.relation(RelOid, "public", "books", colsV2))
    val section = Seq(
      x(100, MessageEncoder.beginPrepare(108, 110, T0, 7, "g1")),
      relV2,
      x(106, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("v1"), Some("x")))),
      x(109, MessageEncoder.prepare(108, 110, T0, 7, "g1")))
    val decide = x(300, MessageEncoder.commitPrepared(300, 310, T0 + 9, 7, "g1"))
    val later = Seq(
      x(500, MessageEncoder.begin(510, T0 + 2, 9)),
      x(501, MessageEncoder.insert(RelOid, Seq(Some("9"), Some("v9"), Some("y")))),
      x(509, MessageEncoder.commit(509, 510, T0 + 2)))
    PgCdcTestHook.register(key,
      new InMemoryWalSource(Seq(rel) ++ section ++ Seq(decide) ++ later))
    val s = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("testSourceKey", key)))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    val oEnd = s.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    assert(rowIds(s, o0, oEnd) == Seq(1, 9),
      "the committed section's row and the later v2-schema row both decode")
    assert(PgCdcRelations.relations(key)("public.books").columns.map(_.name).toSeq ==
      Seq("id", "name", "extra"), "committed schema publishes at the decision")
    s.commit(oEnd)
    s.stop()
  }

  test("a plain Prepare replacing a streamed parked gid releases its frame accounting") {
    val key = "2pc-replace"
    val streamedSection = Seq(
      x(90, MessageEncoder.streamStart(7, firstSegment = true)),
      x(91, MessageEncoder.insert(RelOid, Seq(Some("1"), Some("a")), streamedXid = 7)),
      x(92, MessageEncoder.streamStop()),
      x(93, MessageEncoder.streamPrepare(108, 110, T0, 7, "g1")))
    val rollback = x(400,
      MessageEncoder.rollbackPrepared(110, 410, T0, T0 + 9, 7, "g1"))
    PgCdcTestHook.register(key, new InMemoryWalSource(
      Seq(rel) ++ streamedSection ++ preparedSection ++ Seq(rollback)))
    val s = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("testSourceKey", key)))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    s.latestOffset(o0, ReadLimit.allAvailable())
    val m = s.metrics(java.util.Optional.empty())
    assert(m.get("openPreparedTxns") == "0", "rollback resolved the only gid")
    assert(m.get("bufferedStreamFrames") == "0",
      "replacing a streamed parked gid must release its frame count")
    assert(m.get("bufferedPreparedBytes") == "0",
      "unpark must release the replaced and rolled-back sections' bytes")
    s.stop()
  }

  test("in-doubt prepared bytes are a fail-fast bound, not silent growth") {
    val wal = Files.createTempFile("wal-2pc-cap", ".bin").toString
    WalFile.write(wal, (Seq(rel) ++ preparedSection).iterator)
    val s = new PgCdcMicroBatchStream(new CaseInsensitiveStringMap(
      java.util.Map.of("path", wal, "maxBufferedPreparedBytes", "10")))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    val e = intercept[IllegalStateException] {
      s.latestOffset(o0, ReadLimit.allAvailable())
    }
    assert(e.getMessage.contains("g1"), s"error must name the in-doubt gid: ${e.getMessage}")
    s.stop()
  }

  test("top-bit-set LSNs: hold-back math is unsigned and offsets round-trip") {
    // A prepared section opening ABOVE the delivered position (unsigned)
    // must not pull the resume point up past 2^63: signed min would pick the
    // "negative" prepared floor and reopen at the wrong end of the keyspace.
    val big = 0x7ffffffffffffff0L // plain txn's commit end, just below 2^63
    val hiTxn = Seq(
      x(0x7fffffffffffff00L, MessageEncoder.begin(big, T0, 8)),
      x(0x7fffffffffffff01L,
        MessageEncoder.insert(RelOid, Seq(Some("3"), Some("v3")))),
      x(0x7fffffffffffff09L, MessageEncoder.commit(0x7fffffffffffff09L, big, T0)))
    val hiPrepared = Seq(
      x(0x8000000000000010L, MessageEncoder.beginPrepare(
        0x8000000000000018L, 0x8000000000000020L, T0, 7, "g2")),
      x(0x8000000000000011L,
        MessageEncoder.insert(RelOid, Seq(Some("1"), Some("v1")))),
      x(0x8000000000000019L, MessageEncoder.prepare(
        0x8000000000000018L, 0x8000000000000020L, T0, 7, "g2")))
    val wal = Files.createTempFile("wal-2pc-hi", ".bin").toString
    WalFile.write(wal, (Seq(rel) ++ hiTxn ++ hiPrepared).iterator)
    val s = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("path", wal)))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    val o1 = s.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    assert(o1 == CdcOffset(1, big),
      s"resume must stay at the unsigned-smaller delivered position: $o1")
    assert(rowIds(s, o0, o1) == Seq(3))
    s.commit(o1)
    s.stop()
    // Top-bit LSNs serialize as negative decimals; the parser accepts them.
    val hi = CdcOffset(5, 0x8000000000000010L, 0x8000000000000064L)
    assert(CdcOffset.fromJson(hi.json()) == hi)
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
