package graft.streaming

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.pgproto.MessageEncoder
import graft.pgproto.Messages

/** Randomized chaos soak over the socket walsender path — the closest local
  * stand-in for the reference's dockerized integration soak
  * (`integration_test/main_test.go:34-121`, which this sandbox cannot run):
  * a seeded random workload of plain, streamed-multi-segment (committed,
  * aborted, and stream-PREPARED), and two-phase (committed and rolled-back)
  * transactions is served over a real socket while the connection is cut
  * abruptly at a random schedule of points. The invariants checked across
  * every seed:
  *
  *  - exactly-once: the delivered id set equals the committed id set — no
  *    loss, no duplicate — regardless of where the cuts land (mid-txn,
  *    mid-segment, inside an undecided prepared section);
  *  - aborted streams and rolled-back prepares never surface;
  *  - every reconnect resumes at a non-decreasing LSN (no replay regression
  *    in the START_REPLICATION positions the client asks for).
  *
  * Each seed's workload is deterministic, so a failure reproduces exactly.
  */
class CdcChaosSoakSpec extends AnyFunSuite {

  private val RelOid = 16700L
  private val Cols = Seq(Messages.RelationColumn("id", 23L, -1, 1))
  private val T0 = 1700000000000000L

  private def x(lsn: Long, msg: Array[Byte]): Array[Byte] =
    MessageEncoder.xlogData(lsn, lsn, T0, msg)

  private case class Workload(
      frames: Seq[Array[Byte]],
      expectedIds: Seq[Long],
      drops: Seq[Int])

  /** Deterministic random workload: interleaved txn *blocks* (each plain /
    * streamed-segment / prepared body is contiguous, like pgoutput's
    * serialization) with stream and prepared decisions landing at random
    * later points. Returns the frames, the ids of every COMMITTED row, and
    * a random multi-cut schedule.
    */
  private def genWorkload(seed: Long): Workload = {
    val rnd = new scala.util.Random(seed)
    val fs = Seq.newBuilder[Array[Byte]]
    var lsn = 10L
    def at(): Long = { lsn += 1; lsn }
    var lastId = 0L
    def id(): Long = { lastId += 1; lastId }
    var lastXid = 100L
    def xid(): Long = { lastXid += 1; lastXid }
    val expect = Seq.newBuilder[Long]

    fs += x(1, MessageEncoder.relation(RelOid, "public", "chaos", Cols))

    // streamed txns with segments sent but no decision yet: xid -> ids
    val open = mutable.LinkedHashMap.empty[Long, mutable.ArrayBuffer[Long]]
    // prepared, undecided: (xid, gid, ids, prepareEndLsn)
    val prepared = mutable.ArrayBuffer.empty[(Long, String, Seq[Long], Long)]

    def plainTxn(): Unit = {
      val t = xid()
      val ids = Seq.fill(1 + rnd.nextInt(4))(id())
      val beginAt = at()
      val insAts = ids.map(_ => at())
      val commitAt = at()
      val endLsn = at()
      fs += x(beginAt, MessageEncoder.begin(endLsn, T0, t))
      ids.zip(insAts).foreach { case (i, l) =>
        fs += x(l, MessageEncoder.insert(RelOid, Seq(Some(i.toString))))
      }
      fs += x(commitAt, MessageEncoder.commit(commitAt, endLsn, T0))
      expect ++= ids
    }

    def segment(): Unit = {
      val (t, buf, first) =
        if (open.nonEmpty && rnd.nextBoolean()) {
          val k = open.keys.toSeq(rnd.nextInt(open.size))
          (k, open(k), false)
        } else {
          val k = xid()
          val b = mutable.ArrayBuffer.empty[Long]
          open(k) = b
          (k, b, true)
        }
      fs += x(at(), MessageEncoder.streamStart(t, firstSegment = first))
      (0 until 1 + rnd.nextInt(5)).foreach { _ =>
        val i = id()
        buf += i
        fs += x(at(), MessageEncoder.insert(RelOid, Seq(Some(i.toString)), streamedXid = t))
      }
      fs += x(at(), MessageEncoder.streamStop())
    }

    def decideStream(): Unit = if (open.nonEmpty) {
      val k = open.keys.toSeq(rnd.nextInt(open.size))
      val ids = open.remove(k).get
      rnd.nextInt(5) match {
        case 0 =>
          fs += x(at(), MessageEncoder.streamAbort(k, k))
        case 1 =>
          // Stream-prepare ('p'): the streamed buffer moves to the
          // prepared ledger and waits for COMMIT/ROLLBACK PREPARED.
          val g = s"sgid-$k"
          val pField = at()
          val pFrame = at()
          val pEnd = at()
          fs += x(pFrame, MessageEncoder.streamPrepare(pField, pEnd, T0, k, g))
          prepared += ((k, g, ids.toSeq, pEnd))
        case _ =>
          val commitAt = at()
          val endLsn = at()
          fs += x(commitAt, MessageEncoder.streamCommit(k, commitAt, endLsn, T0))
          expect ++= ids
      }
    }

    def preparedBody(): Unit = {
      val t = xid()
      val g = s"gid-$t"
      val ids = Seq.fill(1 + rnd.nextInt(3))(id())
      val beginAt = at()
      val insAts = ids.map(_ => at())
      val pField = at()
      val pFrame = at()
      val pEnd = at()
      fs += x(beginAt, MessageEncoder.beginPrepare(pField, pEnd, T0, t, g))
      ids.zip(insAts).foreach { case (i, l) =>
        fs += x(l, MessageEncoder.insert(RelOid, Seq(Some(i.toString))))
      }
      fs += x(pFrame, MessageEncoder.prepare(pField, pEnd, T0, t, g))
      prepared += ((t, g, ids, pEnd))
    }

    def decidePrepared(): Unit = if (prepared.nonEmpty) {
      val (t, g, ids, pEnd) = prepared.remove(rnd.nextInt(prepared.size))
      if (rnd.nextInt(4) == 0) {
        val rbAt = at()
        val rbEnd = at()
        fs += x(rbAt, MessageEncoder.rollbackPrepared(pEnd, rbEnd, T0, T0 + 9, t, g))
      } else {
        val commitAt = at()
        val endLsn = at()
        fs += x(commitAt, MessageEncoder.commitPrepared(commitAt, endLsn, T0 + 9, t, g))
        expect ++= ids
      }
    }

    (0 until 18 + rnd.nextInt(10)).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 => plainTxn()
        case 3 | 4 | 5 => segment()
        case 6 | 7 => decideStream()
        case 8 => preparedBody()
        case 9 => decidePrepared()
      }
    }
    // Every in-flight txn gets a decision — an undecided tail would hold
    // back delivery forever (correctly), and the soak asserts completion.
    while (open.nonEmpty) decideStream()
    while (prepared.nonEmpty) decidePrepared()

    val drops = Seq.fill(3 + rnd.nextInt(3))(5 + rnd.nextInt(30))
    Workload(fs.result(), expect.result(), drops)
  }

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

  private def startLsns(server: FakeWalsender): Seq[Long] =
    server.queries.synchronized {
      server.queries.toSeq.filter(_.startsWith("START_REPLICATION")).map { q =>
        val m = "LOGICAL ([0-9A-Fa-f]+)/([0-9A-Fa-f]+)".r.findFirstMatchIn(q).get
        (java.lang.Long.parseLong(m.group(1), 16) << 32) |
          java.lang.Long.parseLong(m.group(2), 16)
      }
    }

  for (seed <- Seq(0xC0FFEEL, 20260813L, 424242L))
    test(s"chaos soak seed=$seed: random txn mix + scheduled cuts stay exactly-once") {
      val w = genWorkload(seed)
      assert(w.frames.size > 40, "workload is large enough for cuts to land")
      val server = new FakeWalsender(w.frames, dropSchedule = w.drops,
        keepaliveEvery = 7)
      var s: PgCdcMicroBatchStream = null
      try {
        s = new PgCdcMicroBatchStream(new CaseInsensitiveStringMap(java.util.Map.of(
          "host", "127.0.0.1", "port", server.port.toString,
          "slot", "s1", "publication", "p1",
          "spillThresholdEvents", "8",
          "reconnectBackoffMs", "10")))
        var start = s.initialOffset().asInstanceOf[CdcOffset]
        val got = mutable.ArrayBuffer.empty[Long]
        val deadline = System.currentTimeMillis + 30000
        while (got.size < w.expectedIds.size && System.currentTimeMillis < deadline) {
          val end = s.latestOffset(start, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
          if (end.seq > start.seq) {
            got ++= rowIds(s, start, end)
            s.commit(end)
            start = end
          } else Thread.sleep(20)
        }
        val ids = got.toSeq.sorted
        val expected = w.expectedIds.sorted
        assert(ids == expected,
          s"seed=$seed: missing=${expected.diff(ids)} extra=${ids.diff(expected)}")
        val starts = startLsns(server)
        assert(starts.size >= 2, s"seed=$seed: at least one cut must have fired ($starts)")
        assert(starts == starts.sorted,
          s"seed=$seed: resume LSNs must never move backwards: $starts")
        // Interleaved reply-requested keepalives must have drawn standby
        // status updates through the chaos (liveness under fault load).
        // The 'r' frame is written by the async pump after commit() records
        // the confirmed LSN, so poll with a bounded deadline rather than
        // racing the socket right after the final commit().
        val statusDeadline = System.currentTimeMillis + 10000
        while (server.statusUpdates.synchronized { server.statusUpdates.isEmpty } &&
            System.currentTimeMillis < statusDeadline) Thread.sleep(20)
        assert(server.statusUpdates.synchronized { server.statusUpdates.nonEmpty },
          s"seed=$seed: no standby status update despite reply-requested keepalives")
      } finally {
        // Stop the stream even when an assertion fired — a live feed
        // thread spinning reconnects against the closed port would bleed
        // noise into every later suite in this JVM.
        if (s != null) try s.stop() catch { case _: Throwable => () }
        server.close()
      }
    }
}
