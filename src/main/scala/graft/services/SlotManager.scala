package graft.services

import graft.pgproto.Lsn
import graft.snapshot.CatalogReader.SqlExecutor

/** T7 replication-slot lifecycle: create-if-missing, status introspection,
  * activity capture, and the snapshot→CDC handoff metadata — the driver-side
  * state machine of the reference's `pq/slot/slot.go:63-173` and
  * `connector.go:631-652`.
  *
  * All SQL goes through the same pluggable executor as
  * [[graft.snapshot.CatalogReader]] (JDBC in production, fixtures in tests —
  * no PostgreSQL in this environment). `CREATE_REPLICATION_SLOT` must run on
  * a replication-protocol connection in real PostgreSQL; the seam makes that
  * the caller's wiring concern, not the state machine's.
  */
final class SlotManager(exec: SqlExecutor, slotName: String, createIfNotExists: Boolean = true) {
  import SlotManager._

  /** Slot status, or None when the slot does not exist
    * (`slot.go:119-152` Info; `SELECT 0` → ErrorSlotIsNotExists).
    * A non-logical slot of the same name is a configuration error — fail
    * loudly (`slot.go:146-148`).
    */
  def info(): Option[SlotInfo] =
    exec(statusSql(slotName)).headOption.map(decodeInfo).map { i =>
      require(i.slotType == "logical",
        s"'${i.name}' replication slot must be logical but it is ${i.slotType}")
      i
    }

  /** Create-if-missing state machine (`slot.go:63-97`): existing slot is
    * returned as-is (warn-and-reuse); a missing slot is created via
    * `CREATE_REPLICATION_SLOT … LOGICAL pgoutput` and re-introspected.
    * For the snapshot→CDC handoff use [[createFresh]], which captures the
    * CREATE result instead of discarding it.
    */
  def create(): SlotInfo =
    info() match {
      case Some(existing) => existing
      case None =>
        if (!createIfNotExists)
          throw new IllegalStateException(s"replication slot '$slotName' does not exist")
        exec(createSql(slotName))
        info().getOrElse(
          throw new IllegalStateException(s"slot '$slotName' missing after CREATE_REPLICATION_SLOT"))
    }

  /** B7: create a FRESH slot and capture what `CREATE_REPLICATION_SLOT`
    * returns — `consistent_point` (the exact LSN the stream must start from)
    * and `snapshot_name` (the snapshot exported BY the slot creation, which
    * the initial load must read under; PG guarantees the two are consistent).
    * Loud when the slot already exists: an old slot's position can NOT be
    * consistent with a snapshot taken now — resuming an existing deployment
    * goes through the recorded snapshot job instead
    * ([[graft.snapshot.SnapshotOrchestrator.streamStartLsn]]).
    */
  def createFresh(): CreatedSlot = {
    info().foreach { existing =>
      throw new IllegalStateException(
        s"slot '${existing.name}' already exists (active=${existing.active}); " +
          "a snapshot taken now would not be consistent with its position — " +
          "resume from the recorded snapshot job, or drop the slot first")
    }
    exec(createSql(slotName)).headOption match {
      case Some(Seq(name, cp, snap, _)) =>
        CreatedSlot(name, Lsn.parse(cp), Option(snap).filter(_.nonEmpty))
      case other => throw new IllegalStateException(
        s"CREATE_REPLICATION_SLOT: expected (slot_name, consistent_point, " +
          s"snapshot_name, output_plugin), got $other")
    }
  }

  /** Pin a consistent point + exported snapshot on a TEMPORARY slot (no
    * exists-check: the name is caller-chosen and the server holds it only
    * for this connection's lifetime). Same result row as [[createFresh]].
    */
  def createTemporary(): CreatedSlot =
    exec(SlotManager.createTemporarySql(slotName)).headOption match {
      case Some(Seq(name, cp, snap, _)) =>
        SlotManager.CreatedSlot(name, Lsn.parse(cp), Option(snap).filter(_.nonEmpty))
      case other => throw new IllegalStateException(
        s"CREATE_REPLICATION_SLOT TEMPORARY: expected (slot_name, consistent_point, " +
          s"snapshot_name, output_plugin), got $other")
    }

  /** `DROP_REPLICATION_SLOT … WAIT` if the slot exists — the cleanup half of
    * a re-snapshot: an invalidated export's slot must be dropped before
    * [[createFresh]] can pin a new consistent point.
    */
  def drop(): Unit =
    if (info().isDefined) exec(dropSql(slotName))

  /** CaptureSlot (`connector.go:631-652`): poll until the slot is inactive
    * (the previous holder released it), then take over. `sleep` is injected
    * so tests drive the loop with a fake clock.
    */
  def capture(maxPolls: Int, sleep: () => Unit = () => Thread.sleep(1000)): SlotInfo = {
    var polls = 0
    while (polls < maxPolls) {
      info() match {
        case Some(i) if !i.active => return i
        case _ => // active or transient error-shaped absence: keep polling
      }
      polls += 1
      sleep()
    }
    throw new IllegalStateException(
      s"slot '$slotName' still active after $maxPolls polls — another consumer holds it")
  }

  /** One metrics poll (`slot.go:154-177` without the ticker): the five gauges
    * the reference exports, for the caller's metrics sink.
    */
  def metricsPoll(): Option[SlotMetrics] =
    info().map(i => SlotMetrics(i.active, i.currentLsn, i.confirmedFlushLsn, i.retainedWalSize, i.lag))
}

object SlotManager {

  /** `pg_replication_slots` status row (`slot.go:44` statusSQL). */
  final case class SlotInfo(
      name: String,
      slotType: String,
      active: Boolean,
      activePid: Option[Long],
      restartLsn: Long,
      confirmedFlushLsn: Long,
      walStatus: String,
      currentLsn: Long) {
    /** WAL the slot pins on the server — the T8 heartbeat exists to bound this. */
    def retainedWalSize: Long = currentLsn - restartLsn
    def lag: Long = currentLsn - confirmedFlushLsn
  }

  final case class SlotMetrics(
      active: Boolean, currentLsn: Long, confirmedFlushLsn: Long, retainedWal: Long, lag: Long)

  /** The `CREATE_REPLICATION_SLOT` result row: the consistent point and the
    * snapshot it exported (the pair that makes the snapshot→CDC handoff
    * exactly-once).
    */
  final case class CreatedSlot(
      name: String, consistentPoint: Long, snapshotName: Option[String])

  def statusSql(name: String): String =
    s"SELECT slot_name, slot_type, active, active_pid, restart_lsn, confirmed_flush_lsn, " +
      s"wal_status, PG_CURRENT_WAL_LSN() AS current_lsn " +
      s"FROM pg_replication_slots WHERE slot_name = " +
      graft.snapshot.CatalogReader.sqlLiteral(name)

  def createSql(name: String): String =
    s"CREATE_REPLICATION_SLOT $name LOGICAL pgoutput"

  /** Temporary slot: pins a consistent point + exported snapshot for the
    * lifetime of the creating connection, then vanishes server-side — no
    * cleanup obligation, no stranded-WAL hazard. The pinning tool for
    * side-channel snapshots (e.g. adding a table to a running pipeline)
    * that must never interfere with the durable slot.
    */
  def createTemporarySql(name: String): String =
    s"CREATE_REPLICATION_SLOT $name TEMPORARY LOGICAL pgoutput"

  def dropSql(name: String): String =
    s"DROP_REPLICATION_SLOT $name WAIT"

  /** NULL/empty LSN columns are skipped (left Zero): confirmed_flush_lsn is
    * NULL on a not-yet-reserved slot and `ParseLSN("")` is a cryptic failure
    * in the reference (`slot.go:189-204`).
    */
  private def decodeInfo(row: Seq[String]): SlotInfo = {
    def lsn(s: String): Long =
      if (s == null || s.isEmpty) Lsn.Zero else Lsn.parse(s)
    SlotInfo(
      name = row(0),
      slotType = row(1),
      active = row(2) == "t" || row(2) == "true",
      activePid = Option(row(3)).filter(_.nonEmpty).map(_.toLong),
      restartLsn = lsn(row(4)),
      confirmedFlushLsn = lsn(row(5)),
      walStatus = Option(row(6)).getOrElse(""),
      currentLsn = lsn(row(7)))
  }
}
