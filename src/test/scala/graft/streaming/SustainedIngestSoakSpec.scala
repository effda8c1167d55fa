package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.pgproto.MessageEncoder
import graft.pgproto.Messages

/** Sustained-ingest soak — the local analogue of the reference's headline
  * benchmark (`benchmark/benchmark_cdc/README.md:28-37`: 10 M rows pumped
  * through the pipe at a sustained 66.7 k events/s): ONE MILLION insert
  * events served over a real socket by [[FakeWalsender]], consumed as
  * BACKPRESSURED micro-batches (a txn cap per trigger, so the run spans
  * dozens of admission-controlled batches, not one giant poll), with the
  * connection CUT abruptly mid-run so the resume protocol replays under
  * load. Asserts:
  *
  *  - exactly-once at the row level: every one of the 1 M ids delivered
  *    exactly once (BitSet audit), across the reconnect;
  *  - ≥ 1 mid-run reconnect actually happened, resuming at a
  *    non-decreasing LSN;
  *  - multi-batch delivery (the backpressure cap forces ≥ 10 triggers);
  *  - a sustained-throughput floor of 33 k events/s end-to-end (half the
  *    reference's single-node figure, measured here through the full
  *    decode + row-materialization path in one driver thread — the
  *    distributed path shards partitions across executors).
  *
  * The measured rate is printed for SURVEY §6.
  */
class SustainedIngestSoakSpec extends AnyFunSuite {

  private val RelOid = 16800L
  private val Cols = Seq(Messages.RelationColumn("id", 23L, -1, 1))
  private val T0 = 1700000000000000L

  private val Events = 1000000
  private val RowsPerTxn = 200
  private val Txns = Events / RowsPerTxn

  private def frames(): Seq[Array[Byte]] = {
    def x(lsn: Long, msg: Array[Byte]): Array[Byte] =
      MessageEncoder.xlogData(lsn, lsn, T0, msg)
    val fs = new scala.collection.mutable.ArrayBuffer[Array[Byte]](
      Events + 2 * Txns + 1)
    var lsn = 10L
    def at(): Long = { lsn += 1; lsn }
    fs += x(1, MessageEncoder.relation(RelOid, "public", "firehose", Cols))
    var id = 0L
    (0 until Txns).foreach { t =>
      val beginAt = at()
      val endLsn = beginAt + RowsPerTxn + 1
      fs += x(beginAt, MessageEncoder.begin(endLsn, T0, 1000L + t))
      (0 until RowsPerTxn).foreach { _ =>
        id += 1
        fs += x(at(), MessageEncoder.insert(RelOid, Seq(Some(id.toString))))
      }
      val commitAt = at()
      fs += x(commitAt, MessageEncoder.commit(commitAt, commitAt, T0))
    }
    fs.toSeq
  }

  test("1M events sustain >=33k events/s through micro-batches across a mid-run reconnect") {
    val all = frames()
    assert(all.size > Events, s"workload holds ${all.size} frames")
    // abrupt cut mid-stream: roughly half the frames served, then the
    // socket dies without CopyDone — the client must reconnect and the
    // server replays from the confirmed LSN (ResumeFilter dedups whole
    // txns, so the overlap is re-served and must NOT double-deliver)
    val server = new FakeWalsender(all, dropSchedule = Seq(all.size / 2))
    var s: PgCdcMicroBatchStream = null
    try {
      s = new PgCdcMicroBatchStream(new CaseInsensitiveStringMap(java.util.Map.of(
        "host", "127.0.0.1", "port", server.port.toString,
        "slot", "s1", "publication", "p1",
        "reconnectBackoffMs", "10")))
      val seen = new java.util.BitSet(Events + 1)
      var dup = 0L
      var rows = 0L
      var batches = 0
      var start = s.initialOffset().asInstanceOf[CdcOffset]
      val t0 = System.nanoTime
      val deadline = System.currentTimeMillis + 120000
      // backpressure: at most 250 txns (50k rows) admitted per trigger —
      // the reference soak's sustained multi-batch shape, not one poll
      val limit = ReadLimit.maxRows(250)
      while (rows < Events && System.currentTimeMillis < deadline) {
        val end = s.latestOffset(start, limit).asInstanceOf[CdcOffset]
        if (end.seq > start.seq) {
          batches += 1
          s.planInputPartitions(start, end).foreach { p =>
            val r = PgCdcReaderFactory.createReader(p)
            while (r.next()) {
              val row = r.get()
              val m = row.getMap(10)
              val keys = m.keyArray()
              var idx = 0
              while (keys.getUTF8String(idx).toString != "id") idx += 1
              val i = m.valueArray().getUTF8String(idx).toString.toInt
              if (seen.get(i)) dup += 1 else seen.set(i)
              rows += 1
            }
          }
          s.commit(end)
          start = end
        } else Thread.sleep(5)
      }
      val elapsedSec = (System.nanoTime - t0) / 1e9
      val rate = rows / elapsedSec

      assert(dup == 0L, s"$dup duplicate rows across the reconnect")
      assert(seen.cardinality() == Events,
        s"delivered ${seen.cardinality()} of $Events distinct ids " +
          s"(first missing: ${(1 to Events).find(i => !seen.get(i))})")
      assert(batches >= 10,
        s"the txn cap must force multi-batch delivery, got $batches batches")
      // the reconnect actually happened, resuming at a non-decreasing LSN
      val starts = server.queries.synchronized {
        server.queries.toSeq.filter(_.startsWith("START_REPLICATION")).map { q =>
          val m = "LOGICAL ([0-9A-Fa-f]+)/([0-9A-Fa-f]+)".r.findFirstMatchIn(q).get
          (java.lang.Long.parseLong(m.group(1), 16) << 32) |
            java.lang.Long.parseLong(m.group(2), 16)
        }
      }
      assert(starts.size >= 2, s"mid-run cut must force a reconnect ($starts)")
      assert(starts == starts.sorted,
        s"resume LSNs must never move backwards: $starts")
      info(f"sustained ingest: $rows%d events in $elapsedSec%.1f s = " +
        f"$rate%.0f events/s across $batches batches, ${starts.size} connections")
      assert(rate >= 33000,
        f"sustained throughput floor: $rate%.0f events/s < 33000 " +
          "(reference single-node: 66.7k/s)")
    } finally {
      if (s != null) try s.stop() catch { case _: Throwable => () }
      server.close()
    }
  }
}
