package graft.services

import graft.snapshot.CatalogReader.SqlExecutor

/** T8 WAL-protection heartbeat: a periodic tiny write on a dedicated table so
  * an idle/low-traffic database still advances the slot's confirmed LSN —
  * without it, `restart_lsn` pins WAL forever and the server disk fills
  * (reference `pq/heartbeat/heartbeat.go:40-171`). The P5 half (suppressing
  * the heartbeat's own events in the stream) already lives in
  * [[graft.cdc.TransactionAssembler]]; this is the writing half.
  *
  * Same executor seam as [[SlotManager]]; `runOnce` is the loop body of the
  * reference's `Run` ticker, driven by the caller's scheduler (tests use a
  * fake tick).
  */
final class HeartbeatService(exec: SqlExecutor, schema: String = "public", table: String = "cdc_heartbeat") {
  import HeartbeatService._

  /** EnsureTable (`heartbeat.go:40-63`): create only when missing (a
    * replication-only user may lack DDL rights on an existing table), then
    * seed the single row idempotently.
    */
  def ensureTable(): Unit = {
    val exists = exec(tableExistsSql(schema, table))
      .headOption.flatMap(_.headOption).exists(v => v == "t" || v == "true")
    if (!exists) exec(createTableSql(schema, table))
    exec(insertRowSql(schema, table))
  }

  /** One heartbeat beat (`heartbeat.go:120-165` execute): UPDATE RETURNING —
    * zero rows back means the row vanished (manual delete); re-seed it.
    * Returns true when the beat wrote something.
    */
  def runOnce(): Boolean = {
    val rows = exec(updateSql(schema, table))
    if (rows.isEmpty) {
      exec(insertRowSql(schema, table))
      false
    } else true
  }

  /** The Run loop (`heartbeat.go:97-118`) for `ticks` iterations: errors are
    * logged-and-continue in the reference — here surfaced via the returned
    * failure count so callers/tests observe them without the loop dying.
    */
  def run(ticks: Int, sleep: () => Unit = () => Thread.sleep(1000)): Int = {
    var failures = 0
    var i = 0
    while (i < ticks) {
      try runOnce()
      catch { case _: Exception => failures += 1 }
      i += 1
      if (i < ticks) sleep()
    }
    failures
  }
}

object HeartbeatService {

  /** Identifier quoting (`heartbeat.go:16-19`): double-quote, double embedded
    * quotes — heartbeat table names are user-configured.
    */
  def quoteIdent(name: String): String = graft.snapshot.CatalogReader.quoteIdent(name)

  def tableExistsSql(schema: String, table: String): String = {
    import graft.snapshot.CatalogReader.sqlLiteral
    s"SELECT EXISTS (SELECT 1 FROM information_schema.tables " +
      s"WHERE table_schema = ${sqlLiteral(schema)} AND table_name = ${sqlLiteral(table)})"
  }

  /** Single-row table enforced by a CHECK constraint (`heartbeat.go:65-81`). */
  def createTableSql(schema: String, table: String): String =
    s"""CREATE TABLE ${quoteIdent(schema)}.${quoteIdent(table)} (
       |  id INTEGER PRIMARY KEY DEFAULT 1,
       |  last_heartbeat TIMESTAMPTZ NOT NULL DEFAULT NOW(),
       |  CONSTRAINT ${quoteIdent(table + "_single_row")} CHECK (id = 1)
       |)""".stripMargin

  def insertRowSql(schema: String, table: String): String =
    s"INSERT INTO ${quoteIdent(schema)}.${quoteIdent(table)} (id) VALUES (1) ON CONFLICT DO NOTHING"

  def updateSql(schema: String, table: String): String =
    s"UPDATE ${quoteIdent(schema)}.${quoteIdent(table)} SET last_heartbeat = NOW() WHERE id = 1 RETURNING 1"
}
