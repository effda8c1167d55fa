package graft.streaming

import scala.collection.mutable
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.SparkTestBase
import graft.pgproto.WalFrames
import graft.tools.WalGen

/** S1 closed: the walsender socket client against an in-process fake server
  * speaking real protocol bytes over a real socket pair — the reference's
  * own harness pattern (`pq/replication/stream_connmu_test.go:77`).
  */
class SocketWalSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def pollAll(src: WalSource, expect: Int, timeoutMs: Long = 10000): Seq[Array[Byte]] = {
    val out = mutable.ArrayBuffer.empty[Array[Byte]]
    val deadline = System.currentTimeMillis + timeoutMs
    while (out.size < expect && System.currentTimeMillis < deadline)
      src.poll() match {
        case Some(f) => out += f
        case None => Thread.sleep(5)
      }
    out.toSeq
  }

  private def awaitTrue(what: String, timeoutMs: Long = 10000)(cond: => Boolean): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (!cond && System.currentTimeMillis < deadline) Thread.sleep(10)
    assert(cond, s"timed out waiting for $what")
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

  test("startup handshake, IDENTIFY_SYSTEM, and frame flow over a real socket") {
    val frames = WalGen.frames(2, 2).toSeq
    val server = new FakeWalsender(frames)
    try {
      val src = new SocketWalSource("127.0.0.1", server.port, "u", "db", "slot1", "pub1")
      src.open(0L)
      assert(src.identity.systemId == "7000000000000000001")
      assert(src.identity.timeline == 1)
      assert(server.startupParams("replication") == "database")
      assert(server.startupParams("user") == "u")
      awaitTrue("START_REPLICATION issued") {
        server.queries.synchronized {
          server.queries.exists(q =>
            q.startsWith("START_REPLICATION SLOT slot1 LOGICAL 0/0") &&
              q.contains("proto_version '2'") && q.contains("streaming 'true'") &&
              q.contains("publication_names 'pub1'"))
        }
      }
      val got = pollAll(src, frames.size)
      assert(got.size == frames.size, "every served frame arrives through the socket")
      assert(got.map(_.toSeq) == frames.map(_.toSeq), "payloads are byte-identical")
      src.close()
    } finally server.close()
  }

  test("pgcdc end-to-end over the socket: decode, commit acks, resume") {
    val frames = WalGen.frames(4, 3).toSeq // txns end at LSN 105, 110, 115, 120
    val server = new FakeWalsender(frames)
    try {
      def opts = new CaseInsensitiveStringMap(java.util.Map.of(
        "host", "127.0.0.1", "port", server.port.toString,
        "slot", "s1", "publication", "p1"))

      val s1 = new PgCdcMicroBatchStream(opts)
      val o0 = s1.initialOffset().asInstanceOf[CdcOffset]
      var end = o0
      awaitTrue("all 4 txns pumped") {
        end = s1.latestOffset(end, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
        end.seq == 4L
      }
      assert(rowIds(s1, o0, end) == (1L to 12L))
      s1.commit(end)
      // T3 over the wire: the ack became a standby status update ('r').
      awaitTrue("standby status update received") {
        server.statusUpdates.synchronized {
          server.statusUpdates.exists(u =>
            u.nonEmpty && u(0) == WalFrames.TagStandbyStatusUpdate)
        }
      }
      s1.stop()

      // Restart from the checkpointed offset: a fresh stream instance must
      // START_REPLICATION at the confirmed LSN and deliver nothing new.
      val restored = CdcOffset.fromJson(end.json())
      val s2 = new PgCdcMicroBatchStream(opts)
      val end2 = s2.latestOffset(restored, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
      assert(end2.seq == restored.seq, "no replay past the confirmed LSN")
      awaitTrue("resumed START_REPLICATION at confirmed LSN") {
        server.queries.synchronized {
          server.queries.exists(_.startsWith("START_REPLICATION SLOT s1 LOGICAL 0/78"))
        }
      }
      s2.stop()
    } finally server.close()
  }

  test("cleartext password auth: right password connects, wrong one fails loudly") {
    val server = new FakeWalsender(WalGen.frames(1, 1).toSeq, requirePassword = Some("sekret"))
    try {
      val ok = new SocketWalSource("127.0.0.1", server.port, "u", "db", "s", "p",
        password = Some("sekret"))
      ok.open(0L)
      assert(ok.identity != null)
      ok.close()

      val bad = new SocketWalSource("127.0.0.1", server.port, "u", "db", "s", "p",
        password = Some("wrong"))
      val ex = intercept[IllegalStateException] { bad.open(0L) }
      assert(ex.getMessage.toLowerCase.contains("password"))

      val none = new SocketWalSource("127.0.0.1", server.port, "u", "db", "s", "p")
      val ex2 = intercept[IllegalStateException] { none.open(0L) }
      assert(ex2.getMessage.contains("none configured"))
    } finally server.close()
  }
}
