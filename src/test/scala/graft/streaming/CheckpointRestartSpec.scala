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

  test("mid-transaction offset restore realigns with skip: no dup, no loss") {
    val wal = Files.createTempFile("wal-midtxn", ".bin").toString
    // 4 txns x 5 rows = 20 events; batches of 7 split txns mid-way.
    WalFile.write(wal, WalGen.frames(4, 5))
    def opts = new CaseInsensitiveStringMap(java.util.Map.of("path", wal))

    def readAfterIds(stream: PgCdcMicroBatchStream, start: CdcOffset, end: CdcOffset): Seq[Long] =
      stream.planInputPartitions(start, end).flatMap {
        case PgCdcInputPartition(events) => events.map(_.after("id").toLong)
      }.toSeq

    val s1 = new PgCdcMicroBatchStream(opts)
    val o0 = s1.initialOffset().asInstanceOf[CdcOffset]
    val o7 = s1.latestOffset(o0, ReadLimit.maxRows(7)).asInstanceOf[CdcOffset]
    val o14 = s1.latestOffset(o7, ReadLimit.maxRows(7)).asInstanceOf[CdcOffset]
    val run1 = readAfterIds(s1, o0, o7) ++ readAfterIds(s1, o7, o14)
    s1.commit(o7)
    s1.commit(o14)
    assert(run1 == (1L to 14L), s"pre-restart batches wrong: $run1")
    assert(o14.seq == 14 && o14.skip == 4,
      s"offset 14 should be 4 events past the 2nd txn boundary (seq 10), got $o14")
    s1.stop()

    // "Crash" and restart: a fresh stream instance, only the checkpointed
    // offset survives (round-tripped through its JSON form like Spark does).
    val restored = CdcOffset.fromJson(o14.json())
    val s2 = new PgCdcMicroBatchStream(opts)
    val oEnd = s2.latestOffset(restored, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    val run2 = readAfterIds(s2, restored, oEnd)
    s2.commit(oEnd)
    assert(run2 == (15L to 20L), s"post-restart batch wrong: $run2")
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
      s.commit(CdcOffset(999, 0, 0))
    }
    assert(ex.getMessage.contains("outside buffered range"))
    s.stop()
  }

  test("startLsn option: stream begins after the snapshot consistent point") {
    val wal = Files.createTempFile("wal-startlsn", ".bin").toString
    WalFile.write(wal, WalGen.frames(4, 3)) // txn ends at 105, 110, 115, 120
    val s = new PgCdcMicroBatchStream(new CaseInsensitiveStringMap(
      java.util.Map.of("path", wal, "startLsn", "110")))
    val o0 = s.initialOffset().asInstanceOf[CdcOffset]
    assert(o0.resumeLsn == 110L)
    val oEnd = s.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[CdcOffset]
    val ids = s.planInputPartitions(o0, oEnd).flatMap {
      case PgCdcInputPartition(events) => events.map(_.after("id").toLong)
    }.toSeq
    // txns 1-2 (ids 1..6) are inside the snapshot; only 7..12 stream.
    assert(ids == (7L to 12L), s"got $ids")
    s.stop()
  }
}
