package graft.streaming

import java.nio.file.Files
import scala.collection.concurrent.TrieMap
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.SparkTestBase
import graft.tools.{WalFile, WalGen}

/** Checkpoint-restart correctness for the pgcdc source — the Spark analogue
  * of the reference's `integration_test/sigterm_lsn_flush_test.go:18` and
  * `snapshot_consistency_test.go:25`: a stopped/killed/restarted stream must
  * deliver every event exactly once.
  */
class CheckpointRestartSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** foreachBatch collector, idempotent by batchId (the documented sink
    * contract: a replayed batch overwrites, never double-counts).
    */
  object Collector {
    val batches = TrieMap.empty[Long, Seq[Long]]
    def reset(): Unit = batches.clear()
    def ids: Seq[Long] = batches.values.flatten.toSeq
  }

  /** Decode a planned batch on the "executor" side (the real reader factory)
    * and extract after["id"] per event.
    */
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

  test("stop/restart from checkpoint: no duplicates, no loss") {
    val wal = Files.createTempFile("wal-restart", ".bin").toString
    val ckpt = Files.createTempDirectory("ckpt-restart").toString
    Collector.reset()

    def run(): Unit = {
      val q = spark.readStream.format("pgcdc")
        .option("path", wal)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val ids = df.select(element_at(col("after"), "id").cast("long"))
            .collect().map(_.getLong(0)).toSeq
          Collector.batches.put(batchId, ids)
          ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // Run 1: 5 txns x 4 rows = ids 1..20.
    WalFile.write(wal, WalGen.frames(5, 4))
    run()
    assert(Collector.ids.sorted == (1L to 20L), s"run 1 delivered ${Collector.ids.sorted}")

    // The feed grows (deterministic prefix — same as a walsender having more
    // WAL after the confirmed LSN). Restart from the checkpoint.
    WalFile.write(wal, WalGen.frames(12, 4))
    run()
    val ids = Collector.ids
    assert(ids.size == ids.distinct.size, s"duplicates after restart: ${ids.diff(ids.distinct)}")
    assert(ids.sorted == (1L to 48L), "loss after restart")
  }

  test("offset restore across a fresh stream instance: no dup, no loss") {
    val wal = Files.createTempFile("wal-txnalign", ".bin").toString
    // 4 txns x 5 rows = 20 events; admission control caps 2 txns per batch.
    WalFile.write(wal, WalGen.frames(4, 5))
    def opts = new CaseInsensitiveStringMap(java.util.Map.of("path", wal))

    val s1 = new PgCdcMicroBatchStream(opts)
    val o0 = s1.initialOffset().asInstanceOf[CdcOffset]
    val o2 = s1.latestOffset(o0, ReadLimit.maxRows(2)).asInstanceOf[CdcOffset]
    val run1 = rowIds(s1, o0, o2)
    s1.commit(o2)
    assert(run1 == (1L to 10L), s"pre-restart batch wrong: $run1")
    // txn structure: begin=100, 5 rows, end=107; txn2 ends at 114
    assert(o2 == CdcOffset(2, 114L), s"offset should be txn-aligned, got $o2")
    s1.stop()

    // "Crash" and restart: a fresh stream instance, only the checkpointed
    // offset survives (round-tripped through its JSON form like Spark does).
    val restored = CdcOffset.fromJson(o2.json())
    val s2 = new PgCdcMicroBatchStream(opts)
    val oEnd = s2.latestOffset(restored, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    val run2 = rowIds(s2, restored, oEnd)
    s2.commit(oEnd)
    assert(run2 == (11L to 20L), s"post-restart batch wrong: $run2")
    s2.stop()
  }

  test("commit outside the buffered range fails loudly") {
    val wal = Files.createTempFile("wal-loud", ".bin").toString
    WalFile.write(wal, WalGen.frames(2, 3))
    val s = new PgCdcMicroBatchStream(
      new CaseInsensitiveStringMap(java.util.Map.of("path", wal)))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    s.latestOffset(o0, ReadLimit.allAvailable())
    val ex = intercept[IllegalArgumentException] {
      s.commit(CdcOffset(999, 0))
    }
    assert(ex.getMessage.contains("outside buffered range"))
    s.stop()
  }

  test("startLsn option: stream begins after the snapshot consistent point") {
    val wal = Files.createTempFile("wal-startlsn", ".bin").toString
    WalFile.write(wal, WalGen.frames(4, 3)) // txns end at LSN 105, 110, 115, 120
    val s = new PgCdcMicroBatchStream(new CaseInsensitiveStringMap(
      java.util.Map.of("path", wal, "startLsn", "110")))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    assert(o0.resumeLsn == 110L)
    val oEnd = s.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    // txns 1-2 (ids 1..6) are inside the snapshot; only 7..12 stream.
    assert(rowIds(s, o0, oEnd) == (7L to 12L))
    s.stop()
  }

  test("sink failure: the uncommitted batch replays identically on restart") {
    val wal = Files.createTempFile("wal-fail", ".bin").toString
    val ckpt = Files.createTempDirectory("ckpt-fail").toString
    WalFile.write(wal, WalGen.frames(6, 2)) // 3 batches of 2 txns
    val seen = TrieMap.empty[Long, Vector[Seq[Long]]] // batchId -> each delivery's ids
    @volatile var failOnce = true

    def run(): Unit = {
      val q = spark.readStream.format("pgcdc")
        .option("path", wal)
        .option("maxTxnsPerTrigger", "2")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val ids = df.select(element_at(col("after"), "id").cast("long"))
            .collect().map(_.getLong(0)).toSeq.sorted
          seen.updateWith(batchId)(prev => Some(prev.getOrElse(Vector.empty) :+ ids))
          if (batchId == 1 && failOnce) {
            failOnce = false
            throw new RuntimeException("injected sink failure")
          }
          ()
        }
        .start()
      try q.processAllAvailable()
      catch { case _: Exception => () } // the injected failure kills the query
      finally q.stop()
    }

    run() // dies on batch 1
    run() // resumes: batch 1 must replay with identical content
    assert(seen(1L).size >= 2, "failed batch must be redelivered")
    assert(seen(1L).distinct.size == 1,
      s"replayed batch content must be identical: ${seen(1L)}")
    val all = seen.toSeq.sortBy(_._1).map(_._2.last).flatten
    assert(all.sorted == (1L to 12L), s"exactly-once after recovery, got $all")
  }

  test("backpressure: a feed 10x over the cap pumps incrementally, backlog stays bounded") {
    val wal = Files.createTempFile("wal-backpressure", ".bin").toString
    // 30 txns; cap the driver backlog at 3 committed txns.
    WalFile.write(wal, WalGen.frames(30, 2))
    val s = new PgCdcMicroBatchStream(new CaseInsensitiveStringMap(
      java.util.Map.of("path", wal, "maxBufferedTxns", "3")))
    var start = s.initialOffset().asInstanceOf[CdcOffset]
    val delivered = Seq.newBuilder[Long]
    var batches = 0
    var done = false
    while (!done) {
      val end = s.latestOffset(start, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
      if (end.seq == start.seq) done = true
      else {
        // The backlog never exceeds the cap even though the feed has 10x more.
        assert(s.backlogTxns <= 3, s"backlog ${s.backlogTxns} exceeded cap")
        delivered ++= rowIds(s, start, end)
        s.commit(end)
        batches += 1
        start = end
      }
    }
    assert(batches >= 10, s"expected incremental delivery, got $batches batches")
    assert(delivered.result() == (1L to 60L), "bounded pumping must still deliver everything")
    assert(s.backlogTxns == 0 && s.backlogBytes == 0L, "drained backlog must release bytes")
    s.stop()
  }

  test("backpressure byte cap also bounds the backlog") {
    val wal = Files.createTempFile("wal-bytecap", ".bin").toString
    WalFile.write(wal, WalGen.frames(20, 2))
    // A one-byte budget still always admits the txn being assembled (caps are
    // checked between polls), so each batch carries exactly one txn.
    val s = new PgCdcMicroBatchStream(new CaseInsensitiveStringMap(
      java.util.Map.of("path", wal, "maxBufferedBytes", "1")))
    var start = s.initialOffset().asInstanceOf[CdcOffset]
    val delivered = Seq.newBuilder[Long]
    var done = false
    while (!done) {
      val end = s.latestOffset(start, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
      if (end.seq == start.seq) done = true
      else {
        assert(end.seq - start.seq == 1, "byte cap of 1 admits one txn per batch")
        delivered ++= rowIds(s, start, end)
        s.commit(end)
        start = end
      }
    }
    assert(delivered.result() == (1L to 40L))
    s.stop()
  }

  test("keepalive with replyRequested gets a standby status update (T6)") {
    import graft.pgproto.{MessageEncoder, WalFrames}
    val frames = graft.tools.WalGen.frames(2, 3).toSeq :+
      MessageEncoder.keepalive(200L, 1700000000000000L, replyRequested = true)
    val src = new InMemoryWalSource(frames)
    PgCdcTestHook.register("keepalive-reply", src)
    val s = new PgCdcMicroBatchStream(new CaseInsensitiveStringMap(
      java.util.Map.of("testSourceKey", "keepalive-reply")))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    val oEnd = s.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    s.planInputPartitions(o0, oEnd)
    s.commit(oEnd)
    val updates = src.statusUpdates
    assert(updates.nonEmpty, "reply-requested keepalive must be answered")
    assert(updates.head(0) == WalFrames.TagStandbyStatusUpdate)
    s.stop()
  }

  test("executor partitions decode independently with relation preambles") {
    val wal = Files.createTempFile("wal-part", ".bin").toString
    // 6 txns x 2 rows, forced tiny partitions: each txn (4 frames) must land
    // in its own partition, each decoding with a preamble-provided relation.
    WalFile.write(wal, WalGen.frames(6, 2))
    val s = new PgCdcMicroBatchStream(new CaseInsensitiveStringMap(
      java.util.Map.of("path", wal, "maxFramesPerPartition", "4")))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    val oEnd = s.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    val parts = s.planInputPartitions(o0, oEnd)
    assert(parts.length == 6, s"expected 6 single-txn partitions, got ${parts.length}")
    // Every partition after the first relies on the preamble for schema —
    // decoding through the real reader must still produce all rows in order.
    assert(rowIds(s, o0, oEnd) == (1L to 12L))
    s.stop()
  }
}
