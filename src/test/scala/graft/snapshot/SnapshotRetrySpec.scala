package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite
import graft.services.SlotManager
import graft.snapshot.SnapshotOrchestrator._
import graft.snapshot.SnapshotErrors.SnapshotInvalidatedException

/** Snapshot-invalidation detection + bounded re-snapshot retry
  * (`pq/snapshot/helpers.go:166-183`, `pq/snapshot/snapshot.go:22-25`,
  * `connector.go:446-487`): an injected mid-chunk invalidation must produce
  * a clean re-export (fresh slot, fresh snapshot id) with no duplicate rows
  * across the retried handoff.
  */
class SnapshotRetrySpec extends AnyFunSuite {

  /** Fixture walsender: tracks slot existence so createFresh/drop interplay
    * is exercised for real; every CREATE exports a NEW numbered snapshot at
    * a NEW consistent point, like a restarted coordinator would.
    */
  private class FakeSlotServer {
    var slotExists = false
    var exports = 0
    var drops = 0
    val slots = new SlotManager({ sql =>
      if (sql.startsWith("CREATE_REPLICATION_SLOT")) {
        require(!slotExists, "CREATE on an existing slot")
        slotExists = true
        exports += 1
        Seq(Seq("s1", s"0/${exports}00", s"snap-$exports", "pgoutput"))
      } else if (sql.startsWith("DROP_REPLICATION_SLOT")) {
        slotExists = false; drops += 1; Nil
      } else if (slotExists)
        Seq(Seq("s1", "logical", "f", null, "0/80", s"0/${exports}00", "reserved", "0/F000"))
      else Nil
    }, "s1")
  }

  test("mid-chunk invalidation re-exports cleanly: fresh slot+snapshot, no duplicate rows") {
    val srv = new FakeSlotServer
    val store = new SnapshotJobStore.InMemory
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var attempts = 0

    val rows = executeWithRetry(srv.slots, store, "s1", sleep = sleeps += _) { job =>
      attempts += 1
      // Every attempt reads the snapshot its OWN slot exported.
      assert(job.snapshotId == s"snap-$attempts", "job re-prepared per attempt")
      val partial = Seq(s"row-under-${job.snapshotId}-1", s"row-under-${job.snapshotId}-2")
      if (attempts < 3)
        throw new java.sql.SQLException(
          s"ERROR: invalid snapshot identifier: \"${job.snapshotId}\"", "22023")
      partial
    }

    assert(attempts == 3)
    assert(rows == Seq("row-under-snap-3-1", "row-under-snap-3-2"),
      "only the successful attempt's rows survive — failed partials are discarded")
    assert(srv.drops == 2, "each retry dropped the invalidated attempt's slot")
    assert(srv.exports == 3)
    assert(sleeps.toSeq == Seq(10000L, 20000L), "10s initial delay, doubling")
    val job = store.load("s1").get
    assert(job.snapshotId == "snap-3" && !job.completed,
      "job row tracks the attempt that actually ran; completion stays with the caller")
    assert(job.snapshotLsn == graft.pgproto.Lsn.parse("0/300"),
      "stream handoff LSN is the WINNING export's consistent point — not a stale one")
  }

  test("non-invalidation errors propagate immediately, no retry") {
    val srv = new FakeSlotServer
    var attempts = 0
    val ex = intercept[RuntimeException] {
      executeWithRetry(srv.slots, new SnapshotJobStore.InMemory, "s1",
        sleep = _ => fail("must not sleep")) { _ =>
        attempts += 1
        throw new RuntimeException("connection refused")
      }
    }
    assert(ex.getMessage.contains("connection refused"))
    assert(attempts == 1 && srv.drops == 0)
  }

  test("retries exhaust at maxRetries with the capped 10→60s backoff") {
    val srv = new FakeSlotServer
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var attempts = 0
    val ex = intercept[IllegalStateException] {
      executeWithRetry(srv.slots, new SnapshotJobStore.InMemory, "s1",
        maxRetries = 7, sleep = sleeps += _) { _ =>
        attempts += 1
        throw new SnapshotInvalidatedException("coordinator restart")
      }
    }
    assert(ex.getMessage.contains("maximum retries"))
    assert(attempts == 7)
    assert(sleeps.toSeq == Seq(10000L, 20000L, 40000L, 60000L, 60000L, 60000L),
      "exponential doubling capped at 60s (connector.go:448-454)")
  }

  test("isInvalidated matches the reference's error family and nothing else") {
    import graft.snapshot.SnapshotErrors.isInvalidated
    // Typed path: SQLSTATE 22023 + the message (helpers.go:172-178).
    assert(isInvalidated(new java.sql.SQLException(
      "ERROR: invalid snapshot identifier: \"00000003-1\"", "22023")))
    // 22023 covers other parameter errors too — message must also match.
    assert(!isInvalidated(new java.sql.SQLException("invalid parameter", "22023")))
    // Message fallback, case-insensitive (helpers.go:181-183).
    assert(isInvalidated(new RuntimeException("Invalid Snapshot Identifier: x")))
    // The sentinel (snapshot.go:22-25).
    assert(isInvalidated(new SnapshotInvalidatedException("restart")))
    // Wrapped causes are walked.
    assert(isInvalidated(new RuntimeException("chunk 12 failed",
      new java.sql.SQLException("invalid snapshot identifier", "22023"))))
    assert(!isInvalidated(new RuntimeException("disk full")))
  }
}
